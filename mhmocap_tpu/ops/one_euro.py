"""One-Euro low-pass filter as a jittable `lax.scan`.

Capability parity with the reference `mhmocap/one_euro_filter.py`
(stateful python class looped frame-by-frame on the CPU;
one_euro_filter.py:16-53 and its three call sites:
 * 2D-pose smoothing fwd+bwd at ingestion (datautils.py:466-492),
 * filtered optimization targets (optimizer.py:664-675),
 * final output smoothing (optimizer.py:639-648)),
re-designed as a time-axis `lax.scan` so it runs on-device inside jit —
the reference round-trips device->host->device every time it filters.

The reference call sites use two different time bases:
 * 'ramp':  t_i = sum_k k/rate  => t_e at step i equals i/rate
   (the tensor wrapper at optimizer.py:664-675 and the ingestion loop
   at datautils.py:480-486 increment `time_i` by i/frame_rate);
 * 'uniform': t_i = i/rate => t_e = 1/rate constant
   (get_filtered_vertices_by_smpl, optimizer.py:646-648).
Both are reproduced exactly via the `dt` argument.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _alpha(t_e, cutoff):
    """Smoothing factor (reference one_euro_filter.py:7-9)."""
    r = 2.0 * jnp.pi * cutoff * t_e
    return r / (r + 1.0)


def one_euro_init(x0: jax.Array):
    """Initial filter state (x_prev, dx_prev) for `one_euro_step`."""
    return (x0, jnp.zeros_like(x0))


def one_euro_step(state, x, t_e, min_cutoff, beta, d_cutoff=1.0):
    """One unmasked filter update; returns (new_state, x_hat).

    The stateful building block used by chunked pipelines (e.g. the
    filtered-vertex targets computed chunk-by-chunk with the state
    carried across chunk boundaries).
    """
    x_prev, dx_prev = state
    a_d = _alpha(t_e, d_cutoff)
    dx = (x - x_prev) / t_e
    dx_hat = a_d * dx + (1 - a_d) * dx_prev
    cutoff = min_cutoff + beta * jnp.abs(dx_hat)
    a = _alpha(t_e, cutoff)
    x_hat = a * x + (1 - a) * x_prev
    return (x_hat, dx_hat), x_hat


def one_euro_filter(
    x: jax.Array,                    # (T, ...) signal over time
    min_cutoff: float = 0.004,
    beta: float = 0.7,
    d_cutoff: float = 1.0,
    dt: Optional[jax.Array] = None,  # (T,) t_e per step; default ramp
    frame_rate: float = 25.0,
    mask: Optional[jax.Array] = None,  # (T, ...) 1 = update, 0 = hold
    dt_mode: str = "ramp",
) -> jax.Array:
    """Filter a (T, ...) signal along axis 0.

    With `mask`, masked-out elements keep their previous filter state
    and pass the raw input through (reference one_euro_filter.py:49-53).
    """
    T = x.shape[0]
    if dt is None:
        i = jnp.arange(1, T, dtype=x.dtype)
        if dt_mode == "ramp":
            dt = i / frame_rate          # t_e grows linearly with i
        elif dt_mode == "uniform":
            dt = jnp.full((T - 1,), 1.0 / frame_rate, dtype=x.dtype)
        else:
            raise ValueError(f"unknown dt_mode {dt_mode!r}")
    else:
        dt = jnp.asarray(dt, dtype=x.dtype)
        if dt.shape[0] == T:
            dt = dt[1:]
    if mask is None:
        mask_seq = jnp.ones_like(x[1:])
    else:
        mask_seq = jnp.broadcast_to(mask, x.shape)[1:].astype(x.dtype)

    def step(carry, inp):
        x_prev, dx_prev, te_prev = carry
        xi, mi, te = inp
        # NOTE: the reference keeps a per-element t_prev under masking;
        # with t_e precomputed per step that reduces to accumulating
        # held time for masked elements.
        t_e = te + te_prev
        a_d = _alpha(t_e, d_cutoff)
        dx = (xi - x_prev) / t_e
        dx_hat = a_d * dx + (1 - a_d) * dx_prev
        cutoff = min_cutoff + beta * jnp.abs(dx_hat)
        a = _alpha(t_e, cutoff)
        x_hat = a * xi + (1 - a) * x_prev
        new_x_prev = (1 - mi) * x_prev + mi * x_hat
        new_dx_prev = (1 - mi) * dx_prev + mi * dx_hat
        new_te_prev = (1 - mi) * t_e    # held time accumulates
        out = (1 - mi) * xi + mi * x_hat
        return (new_x_prev, new_dx_prev, new_te_prev), out

    init = (x[0], jnp.zeros_like(x[0]), jnp.zeros_like(x[0]))
    _, ys = jax.lax.scan(step, init, (x[1:], mask_seq, dt))
    return jnp.concatenate([x[:1], ys], axis=0)


def one_euro_bidirectional(
    x: jax.Array,                    # (T, ...) signal
    valid: Optional[jax.Array],      # (T, ...) update mask or None
    min_cutoff: float,
    beta: float,
    frame_rate: float = 25.0,
) -> jax.Array:
    """Forward + backward filtering, averaged.

    Mirrors the ingestion-time 2D pose smoothing (datautils.py:466-492):
    both passes use the 'ramp' time base, the backward pass runs on the
    time-reversed signal, and the result is the mean of the two.
    """
    fwd = one_euro_filter(x, min_cutoff=min_cutoff, beta=beta,
                          frame_rate=frame_rate, mask=valid,
                          dt_mode="ramp")
    rmask = None if valid is None else jnp.flip(valid, axis=0)
    bwd = one_euro_filter(jnp.flip(x, axis=0), min_cutoff=min_cutoff,
                          beta=beta, frame_rate=frame_rate, mask=rmask,
                          dt_mode="ramp")
    return 0.5 * (fwd + jnp.flip(bwd, axis=0))
