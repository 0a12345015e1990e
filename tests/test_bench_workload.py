"""Pin the bench.py workload's DERIVED configuration.

BENCH_r{N}.json is the harness-visible performance record; its
workload must stay the TS1-scale production shape (201 frames, 3
people, guard-grown 160 px window, the auto-tuned scan chunk) or the
recorded numbers silently stop being comparable across rounds. This
test locks the config the Predictor derives from bench.make_ts1_like_seq
so any change to the guard/auto-chunk logic that would shift the
benchmarked shape fails loudly here first.
"""

import tempfile
import types

import numpy as np
import pytest


@pytest.fixture(scope="module")
def bench_seq():
    import bench
    return bench.make_ts1_like_seq()


def _bench_args():
    import bench
    return types.SimpleNamespace(
        num_iter=2, batch_size=10, save_visualizations=False,
        verbose=False,
        proj2d_loss_coef=1.0, depth_loss_coef=0.05,
        silhouette_loss_coef=0.1, reg_poses_coef=0.002,
        reg_scales_coef=1e-4, reg_velocity_coef=0.05,
        reg_verts_filter_coef=0.002, reg_contact_coef=0.001,
        reg_foot_sliding_coef=0.01, joint_confidence_thr=0.5,
        raster_window=bench.WINDOW, spmd=False)


@pytest.mark.slow
def test_bench_workload_config_is_pinned(bench_seq):
    from mhmocap_tpu.engine.predictor import Predictor

    seq, model = bench_seq
    assert (seq.num_frames, seq.num_people) == (201, 3)
    assert seq.image_size == (256, 256)

    with tempfile.TemporaryDirectory() as tmp:
        pred = Predictor(seq, model, tmp, _bench_args())
    cfg = pred.cfg

    # the window guard must neither grow past the TS1 window nor
    # leave clipped supervision (bench.py places the nearest body at
    # z=3.4 specifically so the 99th-percentile bbox need lands just
    # under 160 px)
    assert cfg.window == 160
    assert pred.window_clip_rate == 0.0

    # per-person crop windows: one per depth (z = 3.4 / 4.2 / 5.0),
    # descending, multiples of 16 (kernel-cell geometry — see
    # Predictor._person_windows), zero residual clip for every person
    assert cfg.windows == (160, 128, 112)
    assert pred.window_clip_rates == (0.0, 0.0, 0.0)
    assert cfg.window_groups == ((160, (0,)), (128, (1,)), (112, (2,)))

    # auto-tuned scan chunk (docs/PERF.md round 3): 7 steps of 29 at
    # padded 203 — 1% padding, single-device, no remat at this scale
    assert cfg.chunk == 29
    assert cfg.padded_frames == 203
    assert cfg.num_chunks == 7
    assert not cfg.use_remat
    assert cfg.preordered_faces

    # bench pins the ONE-chip cadence: spmd must stay disengaged even
    # on a multi-device host (the test mesh has 8 CPU devices)
    assert cfg.frame_bucket == cfg.chunk


@pytest.mark.slow
def test_bench_workload_visibility(bench_seq):
    """Every person-frame must contribute 2D supervision (occupancy
    matches the MuPoTs working configuration the narrative claims)."""
    seq, _ = bench_seq
    conf = seq.pose2d[..., 2]
    assert float(np.min(conf)) > 0.5
    # projected joints stay inside the image for every body
    uv = seq.pose2d[..., :2]
    assert float(np.min(uv)) >= 0.0
    assert float(np.max(uv)) <= 256.0
