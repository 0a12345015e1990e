"""Native C++ extension tests (build + parity with scipy/numpy)."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from mhmocap_tpu import native


def test_native_builds():
    assert native.have_native(), "C++ extension failed to build"


def test_hungarian_matches_scipy_square(rng):
    for _ in range(20):
        cost = rng.rand(6, 6)
        r1, c1 = native.hungarian(cost)
        r2, c2 = linear_sum_assignment(cost)
        # optimal cost must match even if ties pick different perms
        np.testing.assert_allclose(cost[r1, c1].sum(),
                                   cost[r2, c2].sum(), rtol=1e-12)


def test_hungarian_rectangular(rng):
    cost = rng.rand(3, 5)
    r1, c1 = native.hungarian(cost)
    r2, c2 = linear_sum_assignment(cost)
    assert len(r1) == 3
    np.testing.assert_allclose(cost[r1, c1].sum(), cost[r2, c2].sum(),
                               rtol=1e-12)
    cost = rng.rand(7, 4)
    r1, c1 = native.hungarian(cost)
    r2, c2 = linear_sum_assignment(cost)
    assert len(r1) == 4
    np.testing.assert_allclose(cost[r1, c1].sum(), cost[r2, c2].sum(),
                               rtol=1e-12)


def _golden_fillin(x, mask, k):
    """Direct numpy re-derivation of one fill-in iteration."""
    H, W = mask.shape
    nx, nm = x.copy(), mask.copy()
    r = k // 2
    for i in range(H):
        for j in range(W):
            if mask[i, j]:
                continue
            ys = slice(max(0, i - r), min(H, i + r + 1))
            xs = slice(max(0, j - r), min(W, j + r + 1))
            m = mask[ys, xs] > 0
            if m.any():
                nx[i, j] = np.median(x[ys, xs][m])
                nm[i, j] = 1
    return nx, nm


def test_fillin_matches_golden(rng):
    x = rng.rand(20, 24).astype(np.float32)
    mask = (rng.rand(20, 24) > 0.4).astype(np.float32)
    ours_x, ours_m = native.fillin_values(x, mask, 5)
    gold_x, gold_m = _golden_fillin(x, mask, 5)
    np.testing.assert_array_equal(ours_m, gold_m)
    np.testing.assert_allclose(ours_x, gold_x, atol=1e-6)


def test_fillin_multichannel(rng):
    x = rng.rand(10, 10, 3).astype(np.float32)
    mask = np.ones((10, 10), np.float32)
    mask[4:6, 4:6] = 0
    ox, om = native.fillin_values(x, mask, 3)
    assert om.min() == 1.0
    assert ox.shape == x.shape
    # valid pixels untouched
    np.testing.assert_array_equal(ox[mask > 0], x[mask > 0])


def test_fillin_iterates_to_full(rng):
    x = rng.rand(16, 16).astype(np.float32)
    mask = np.zeros((16, 16), np.float32)
    mask[0, 0] = 1
    m = mask
    xx = x
    it = 0
    while m.min() < 1 and it < 50:
        xx, m = native.fillin_values(xx, m, 7)
        it += 1
    assert m.min() == 1.0


def test_cpu_cache_dir_fingerprint():
    """Host-fingerprinted CPU cache dirs: stable within a host, keyed
    under the given root, 8-hex suffix (mhmocap_tpu/cache.py)."""
    import re
    from mhmocap_tpu.cache import cpu_cache_dir, host_cpu_fingerprint

    fp = host_cpu_fingerprint()
    assert re.fullmatch(r"[0-9a-f]{8}", fp)
    assert host_cpu_fingerprint() == fp          # deterministic
    d = cpu_cache_dir("/some/root")
    assert d == f"/some/root/.jax_cache_cpu_{fp}"


def test_cpu_cache_fingerprint_keys_on_model_and_xla_version():
    """Round-3 verdict weak #2: equal CPU feature FLAGS are not enough
    — XLA's target-machine tuning attributes (+prefer-no-gather, …)
    vary with the CPU microarchitecture and the XLA build at equal
    flag sets. The digest must change when the model name or the
    jaxlib version changes, flags held fixed."""
    from mhmocap_tpu.cache import host_cpu_fingerprint

    base = host_cpu_fingerprint(flags="avx2 sse4_2",
                                model="Xeon Platinum 8481C",
                                xla_version="0.4.30")
    assert base == host_cpu_fingerprint(
        flags="avx2 sse4_2", model="Xeon Platinum 8481C",
        xla_version="0.4.30")                    # deterministic
    assert base != host_cpu_fingerprint(
        flags="avx2 sse4_2", model="EPYC 9B14", xla_version="0.4.30")
    assert base != host_cpu_fingerprint(
        flags="avx2 sse4_2", model="Xeon Platinum 8481C",
        xla_version="0.4.31")
    assert base != host_cpu_fingerprint(
        flags="avx2", model="Xeon Platinum 8481C",
        xla_version="0.4.30")
    # live digest uses the live jaxlib version: pinning a different
    # version must move it
    assert host_cpu_fingerprint() != host_cpu_fingerprint(
        xla_version="not-a-real-version")
