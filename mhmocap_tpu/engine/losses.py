"""Loss terms for the space-time SMPL optimization.

Capability parity with the reference `mhmocap/losses.py` (eigen-style
log-depth loss, per-instance average log-disparity loss, masked MSE,
multiscale gradient loss; losses.py:6-103). All functions are pure,
shape-polymorphic, and sum-reduced with the same normalizations as the
reference so loss magnitudes (and therefore the tuned coefficients in
configs/*.yml) carry over unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp


def eigen_log_depth_loss(y_pred, y_true, mask, eps: float = 1e-3):
    """Masked mean of squared log-depth differences.

    Reference build_eigen_loss_fn (losses.py:6-16): normalized by
    (sum(mask) + 1).
    """
    d = mask * (jnp.log(jnp.clip(y_pred, eps))
                - jnp.log(jnp.clip(y_true, eps)))
    return jnp.sum(jnp.square(d)) / (jnp.sum(mask) + 1.0)


def avg_log_depth_loss(y_pred, y_true, mask, eps: float = 1e-3):
    """Per-instance *average* log-disparity alignment loss.

    Reference build_avg_depth_loss_fn (losses.py:19-30): inputs are
    (..., H, W) maps; the masked mean of log values is taken per
    leading index (normalized by sum(mask)+1), and the squared
    differences of those means are summed. This aligns each person's
    average rendered disparity with the average target disparity
    inside its mask — robust to per-pixel noise.
    """
    lp = mask * jnp.log(jnp.clip(y_pred, eps))
    lt = mask * jnp.log(jnp.clip(y_true, eps))
    n = jnp.sum(mask, axis=(-2, -1)) + 1.0
    mp = jnp.sum(lp, axis=(-2, -1)) / n
    mt = jnp.sum(lt, axis=(-2, -1)) / n
    return jnp.sum(jnp.square(mp - mt))


def masked_mse_loss(y1, y2, mask):
    """sum((mask*(y1-y2))^2) / (sum(mask)+1). Reference losses.py:33-40."""
    return jnp.sum(jnp.square(mask * (y1 - y2))) / (jnp.sum(mask) + 1.0)


def sum_sq(x):
    """Sum-reduced squared error (torch MSELoss(reduction='sum'))."""
    return jnp.sum(jnp.square(x))


def sum_abs(x):
    """Sum-reduced absolute error (torch L1Loss(reduction='sum'))."""
    return jnp.sum(jnp.abs(x))


def inv_depth_loss(diff_z):
    """softplus(dz)^2 (reference losses.py:43-44)."""
    return jnp.square(jnp.logaddexp(diff_z, 0.0))


def multiscale_gradient_loss(y_true, y_pred, mask,
                             num_levels: int = 4, alpha: float = 0.5,
                             eps: float = 1e-3):
    """L1-of-log-gradients pyramid + eigen log-depth base loss.

    Parity port of the reference build_multiscale_grad_loss
    (losses.py:47-103, defined but unused in the reference's main
    path). Inputs are (H, W) or (H, W, C).
    """
    loss = eigen_log_depth_loss(y_pred, y_true, mask, eps)
    if num_levels <= 0:
        return loss

    diff = jnp.log(jnp.clip(y_true, eps)) - jnp.log(jnp.clip(y_pred, eps))
    if diff.ndim < 3:
        diff = diff[..., None]
        mask = mask[..., None]

    def level_term(d, m):
        vg = jnp.abs(d[:-1] - d[1:])
        vm = m[:-1] * m[1:]
        vn = jnp.clip(jnp.sum(vm, axis=(0, 1)), 1, None)
        v = jnp.sum(vm * vg, axis=(0, 1)) / vn
        hg = jnp.abs(d[:, :-1] - d[:, 1:])
        hm = m[:, :-1] * m[:, 1:]
        hn = jnp.clip(jnp.sum(hm, axis=(0, 1)), 1, None)
        h = jnp.sum(hm * hg, axis=(0, 1)) / hn
        return jnp.mean(v + h)

    grad_loss = 0.0
    d, m = diff, mask
    for level in range(num_levels - 1):
        grad_loss = grad_loss + level_term(d, m)
        if level == num_levels - 2 or min(d.shape[:2]) < 8:
            break
        # 2x decimation into 4 phase-shifted stacks (losses.py:72-83)
        d = jnp.concatenate(
            [d[0::2, 0::2], d[0::2, 1::2], d[1::2, 0::2], d[1::2, 1::2]],
            axis=0)
        m = jnp.concatenate(
            [m[0::2, 0::2], m[0::2, 1::2], m[1::2, 0::2], m[1::2, 1::2]],
            axis=0)

    return loss + alpha * grad_loss
