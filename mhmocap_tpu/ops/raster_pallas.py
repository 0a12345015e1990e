"""Pallas TPU kernel for the depth + silhouette rasterizer.

The pure-JAX tiled rasterizer (ops/rasterizer.py) is bound by exactly
the things TPUs dislike: a (tiles, faces) binning matrix, top-k
selection, per-tile gathers in the forward and scatter-adds in the
backward. This kernel replaces all of it with dense streaming:

  * faces are pre-sorted by their window-local ymin (one cheap sort
    per body) and packed into a (16, F_pad) VMEM-resident table
    (faces on the lane axis);
  * the grid iterates over 8-pixel-high window strips; each strip
    streams the face table in chunks of 128, SKIPPING chunks whose
    y-ranges cannot touch the strip — thanks to the sort, a strip only
    does real work on the contiguous slice of chunks near it;
  * each active chunk is evaluated fully vectorized as a
    (strip_pixels=8*win, 128 faces) VPU block — no scalar loops, no
    gathers;
  * the backward pass is a mirrored kernel that recomputes active
    (strip, chunk) blocks and accumulates d(face table) rows with
    per-face sublane reductions, in place across the sequential grid —
    no scatter ever materializes. Face-table gradients are unsorted
    and unpacked to vertices outside the kernel.

Semantics match `ops/rasterizer._raster_window` (hard z-min with
screen-space barycentrics; silhouette = 1 - prod(1 - sigmoid(-d2/blur))
accumulated in log space).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cameras import project_points
from .rasterizer import RasterSettings, window_origin

STRIP_H = 8          # strip height in pixels
FACE_CHUNK = 128     # faces per streamed chunk (lane dim)
NCOLS = 16           # rows: x0 y0 x1 y1 x2 y2 z0 z1 z2 -- ymin ymax ok

ROW_YMIN = 10
ROW_YMAX = 11
ROW_OK = 12

BIG = 3.0e38         # finite stand-in for +inf


def _interpret() -> bool:
    """Run in interpreter mode off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"


def _pack_face_table(fuv_local, fz, face_ok, reach):
    """(F,3,2), (F,3), (F,) -> y-sorted (NCOLS, F_pad) table + perm."""
    F = fuv_local.shape[0]
    F_pad = ((F + FACE_CHUNK - 1) // FACE_CHUNK) * FACE_CHUNK
    lo_y = jnp.min(fuv_local[..., 1], axis=1) - reach
    hi_y = jnp.max(fuv_local[..., 1], axis=1) + reach
    table = jnp.concatenate([
        fuv_local.reshape(F, 6), fz,
        jnp.zeros((F, 1), jnp.float32),
        lo_y[:, None], hi_y[:, None],
        face_ok[:, None].astype(jnp.float32),
        jnp.zeros((F, NCOLS - 13), jnp.float32),
    ], axis=1)
    order = jnp.argsort(lo_y)
    table = table[order]
    if F_pad > F:
        pad = jnp.zeros((F_pad - F, NCOLS), jnp.float32)
        pad = pad.at[:, ROW_YMIN].set(BIG)
        table = jnp.concatenate([table, pad], axis=0)
    return table.T, order


def _pair_block(tab, px, py, znear, inv_blur):
    """Vectorized per-(pixel, face) quantities on a (NPX, CH) block.

    tab: dict of (CH,) face rows; px/py: (NPX, 1) pixel centers.
    """
    ax, ay = tab["ax"][None, :], tab["ay"][None, :]
    bx, by = tab["bx"][None, :], tab["by"][None, :]
    cx, cy = tab["cx"][None, :], tab["cy"][None, :]

    def edge(x0, y0, x1, y1):
        ex, ey = x1 - x0, y1 - y0
        pxr, pyr = px - x0, py - y0
        cross = pxr * ey - pyr * ex
        ee = jnp.maximum(ex * ex + ey * ey, 1e-12)
        t = jnp.clip((pxr * ex + pyr * ey) / ee, 0.0, 1.0)
        dx = pxr - t * ex
        dy = pyr - t * ey
        return cross, t, dx, dy

    c0, t0, dx0, dy0 = edge(ax, ay, bx, by)
    c1, t1, dx1, dy1 = edge(bx, by, cx, cy)
    c2, t2, dx2, dy2 = edge(cx, cy, ax, ay)
    d0 = dx0 * dx0 + dy0 * dy0
    d1 = dx1 * dx1 + dy1 * dy1
    d2 = dx2 * dx2 + dy2 * dy2
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    sgn = jnp.sign(area)
    inside = ((sgn * c0 <= 0) & (sgn * c1 <= 0) & (sgn * c2 <= 0)
              & (jnp.abs(area) > 1e-9))
    dmin = jnp.minimum(d0, jnp.minimum(d1, d2))
    d2s = jnp.where(inside, -dmin, dmin)

    inv_a = 1.0 / jnp.where(jnp.abs(area) > 1e-9, area, 1e-9)
    w0n = (bx - px) * (cy - py) - (by - py) * (cx - px)
    w1n = (cx - px) * (ay - py) - (cy - py) * (ax - px)
    w0 = w0n * inv_a
    w1 = w1n * inv_a
    w2 = 1.0 - w0 - w1
    z0, z1, z2 = (tab["z0"][None, :], tab["z1"][None, :],
                  tab["z2"][None, :])
    zi = w0 * z0 + w1 * z1 + w2 * z2

    ok = tab["ok"][None, :] > 0.5
    covered = inside & ok & (zi > znear)
    ls = jnp.where(ok, jax.nn.log_sigmoid(d2s * inv_blur), 0.0)
    return dict(d2s=d2s, inside=inside, zi=zi, covered=covered, ls=ls,
                inv_a=inv_a, w0=w0, w1=w1, w2=w2,
                t0=t0, dx0=dx0, dy0=dy0, t1=t1, dx1=dx1, dy1=dy1,
                t2=t2, dx2=dx2, dy2=dy2, d0=d0, d1=d1, d2=d2,
                dmin=dmin, ok=ok,
                ax=ax, ay=ay, bx=bx, by=by, cx=cx, cy=cy,
                z0=z0, z1=z1, z2=z2)


def _read_face_rows(table_ref, base):
    sl = lambda r: table_ref[r, pl.ds(base, FACE_CHUNK)]
    return dict(ax=sl(0), ay=sl(1), bx=sl(2), by=sl(3), cx=sl(4),
                cy=sl(5), z0=sl(6), z1=sl(7), z2=sl(8), ok=sl(ROW_OK))


def _strip_chunk_bounds(table, win: int):
    """Per-strip [lo, hi) chunk ranges from the y-sorted table.

    Faces are sorted by ymin; a strip [y0, y1) can only intersect
    faces with ymin < y1 and ymin > y0 - max_height, a contiguous
    range found by two vectorized searchsorted calls. Conservative
    (the kernel still checks per-chunk activity) but skips the long
    sorted tail/head entirely.
    """
    n_strips = win // STRIP_H
    ymin = table[ROW_YMIN]
    ymax = table[ROW_YMAX]
    ok = table[ROW_OK] > 0.5
    h_max = jnp.max(jnp.where(ok, ymax - ymin, 0.0))
    y0 = jnp.arange(n_strips, dtype=jnp.float32) * STRIP_H
    lo_face = jnp.searchsorted(ymin, y0 - h_max, side="left")
    hi_face = jnp.searchsorted(ymin, y0 + STRIP_H, side="left")
    lo_chunk = (lo_face // FACE_CHUNK).astype(jnp.int32)
    hi_chunk = (-(-hi_face // FACE_CHUNK)).astype(jnp.int32)
    return jnp.stack([lo_chunk, hi_chunk], axis=1)  # (n_strips, 2)


def _strip_pixels(s, win):
    npx = STRIP_H * win
    rows = jax.lax.broadcasted_iota(jnp.int32, (npx, 1), 0)
    px = (rows % win).astype(jnp.float32) + 0.5
    py = ((rows // win).astype(jnp.float32)
          + (s * STRIP_H).astype(jnp.float32) + 0.5)
    return px, py


def _fwd_kernel(bounds_ref, table_ref, zbuf_ref, logkeep_ref,
                amin_ref, *, win, n_chunks, inv_blur, znear):
    s = pl.program_id(0)
    npx = STRIP_H * win
    px, py = _strip_pixels(s, win)
    y_lo = (s * STRIP_H).astype(jnp.float32)
    y_hi = y_lo + STRIP_H

    def chunk_body(ch, carry):
        zmin, logkeep, amin = carry
        base = ch * FACE_CHUNK
        ymin_c = table_ref[ROW_YMIN, pl.ds(base, FACE_CHUNK)]
        ymax_c = table_ref[ROW_YMAX, pl.ds(base, FACE_CHUNK)]
        ok_c = table_ref[ROW_OK, pl.ds(base, FACE_CHUNK)]
        active = jnp.any((ymin_c < y_hi) & (ymax_c >= y_lo)
                         & (ok_c > 0.5))

        def do_chunk(carry):
            zmin, logkeep, amin = carry
            tab = _read_face_rows(table_ref, base)
            blk = _pair_block(tab, px, py, znear, inv_blur)
            zc = jnp.where(blk["covered"], blk["zi"], BIG)
            zrow = jnp.min(zc, axis=1, keepdims=True)       # (NPX, 1)
            fid = base + jax.lax.broadcasted_iota(jnp.int32, zc.shape,
                                                  1)
            arow = jnp.min(jnp.where(zc <= zrow, fid, 2 ** 30),
                           axis=1, keepdims=True)
            better = zrow < zmin
            zmin = jnp.where(better, zrow, zmin)
            amin = jnp.where(better, arow, amin)
            logkeep = logkeep + jnp.sum(blk["ls"], axis=1,
                                        keepdims=True)
            return zmin, logkeep, amin

        return jax.lax.cond(active, do_chunk, lambda c: c, carry)

    init = (jnp.full((npx, 1), BIG, jnp.float32),
            jnp.zeros((npx, 1), jnp.float32),
            jnp.full((npx, 1), -1, jnp.int32))
    zmin, logkeep, amin = jax.lax.fori_loop(
        bounds_ref[s, 0], bounds_ref[s, 1], chunk_body, init)
    zbuf_ref[:, :] = zmin
    logkeep_ref[:, :] = logkeep
    amin_ref[:, :] = amin


def _run_forward(table, win: int, inv_blur: float, znear: float):
    F_pad = table.shape[1]
    n_strips = win // STRIP_H
    npx = STRIP_H * win
    kernel = functools.partial(_fwd_kernel, win=win,
                               n_chunks=F_pad // FACE_CHUNK,
                               inv_blur=inv_blur, znear=znear)
    bounds = _strip_chunk_bounds(table, win)
    zzl = pl.pallas_call(
        kernel,
        grid=(n_strips,),
        in_specs=[pl.BlockSpec((n_strips, 2), lambda s: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((NCOLS, F_pad), lambda s: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((npx, 1), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((npx, 1), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((npx, 1), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_strips * npx, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_strips * npx, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_strips * npx, 1), jnp.int32),
        ],
        interpret=_interpret(),
    )(bounds, table)
    return tuple(x.reshape(win, win) for x in zzl)


def _bwd_kernel(bounds_ref, table_ref, dz_ref, dlk_ref, amin_ref,
                dtab_ref, *, win, n_chunks, inv_blur, znear):
    s = pl.program_id(0)
    px, py = _strip_pixels(s, win)
    y_lo = (s * STRIP_H).astype(jnp.float32)
    y_hi = y_lo + STRIP_H

    @pl.when(s == 0)
    def _init():
        dtab_ref[:, :] = jnp.zeros_like(dtab_ref)

    dz = dz_ref[:, :]            # (NPX, 1)
    dlk = dlk_ref[:, :]
    amin = amin_ref[:, :]

    def chunk_body(ch, _):
        base = ch * FACE_CHUNK
        ymin_c = table_ref[ROW_YMIN, pl.ds(base, FACE_CHUNK)]
        ymax_c = table_ref[ROW_YMAX, pl.ds(base, FACE_CHUNK)]
        ok_c = table_ref[ROW_OK, pl.ds(base, FACE_CHUNK)]
        active = jnp.any((ymin_c < y_hi) & (ymax_c >= y_lo)
                         & (ok_c > 0.5))

        def do_chunk(_):
            tab = _read_face_rows(table_ref, base)
            blk = _pair_block(tab, px, py, znear, inv_blur)

            # silhouette branch
            g_ls = dlk * jnp.where(blk["ok"], jax.nn.sigmoid(
                -blk["d2s"] * inv_blur), 0.0) * inv_blur
            g_dmin = g_ls * jnp.where(blk["inside"], -1.0, 1.0)
            use0 = blk["dmin"] == blk["d0"]
            use1 = (~use0) & (blk["dmin"] == blk["d1"])
            use2 = ~(use0 | use1)

            def seg_grads(use, t, dx, dy):
                g = jnp.where(use, g_dmin, 0.0)
                gdx = 2.0 * g * dx
                gdy = 2.0 * g * dy
                return (-gdx * (1.0 - t), -gdy * (1.0 - t),
                        -gdx * t, -gdy * t)

            s0 = seg_grads(use0, blk["t0"], blk["dx0"], blk["dy0"])
            s1 = seg_grads(use1, blk["t1"], blk["dx1"], blk["dy1"])
            s2 = seg_grads(use2, blk["t2"], blk["dx2"], blk["dy2"])
            g_ax = s0[0] + s2[2]
            g_ay = s0[1] + s2[3]
            g_bx = s0[2] + s1[0]
            g_by = s0[3] + s1[1]
            g_cx = s1[2] + s2[0]
            g_cy = s1[3] + s2[1]

            # depth branch (winner pixels only)
            fid = base + jax.lax.broadcasted_iota(jnp.int32,
                                                  g_ax.shape, 1)
            gz = jnp.where(amin == fid, dz, 0.0)
            w0, w1, w2 = blk["w0"], blk["w1"], blk["w2"]
            inv_a = blk["inv_a"]
            z0, z1, z2 = blk["z0"], blk["z1"], blk["z2"]
            ax, ay = blk["ax"], blk["ay"]
            bx, by = blk["bx"], blk["by"]
            cx, cy = blk["cx"], blk["cy"]
            zi = blk["zi"]
            dz_dw0n = (z0 - z2) * inv_a
            dz_dw1n = (z1 - z2) * inv_a
            dz_da = (z2 - zi) * inv_a
            g_ax = g_ax + gz * (dz_dw1n * (py - cy) + dz_da * (by - cy))
            g_ay = g_ay + gz * (dz_dw1n * (cx - px) + dz_da * (cx - bx))
            g_bx = g_bx + gz * (dz_dw0n * (cy - py) + dz_da * (cy - ay))
            g_by = g_by + gz * (dz_dw0n * (px - cx) + dz_da * (ax - cx))
            g_cx = g_cx + gz * (dz_dw0n * (py - by)
                                + dz_dw1n * (ay - py)
                                + dz_da * (ay - by))
            g_cy = g_cy + gz * (dz_dw0n * (bx - px)
                                + dz_dw1n * (px - ax)
                                + dz_da * (bx - ax))
            g_z0 = gz * w0
            g_z1 = gz * w1
            g_z2 = gz * w2

            for row, g in ((0, g_ax), (1, g_ay), (2, g_bx), (3, g_by),
                           (4, g_cx), (5, g_cy), (6, g_z0), (7, g_z1),
                           (8, g_z2)):
                dtab_ref[row, pl.ds(base, FACE_CHUNK)] += jnp.sum(
                    g, axis=0)
            return 0

        jax.lax.cond(active, do_chunk, lambda _: 0, 0)
        return 0

    jax.lax.fori_loop(bounds_ref[s, 0], bounds_ref[s, 1], chunk_body,
                      0)


def _run_backward(table, dz, dlk, amin, win, inv_blur, znear):
    F_pad = table.shape[1]
    n_strips = win // STRIP_H
    npx = STRIP_H * win
    kernel = functools.partial(_bwd_kernel, win=win,
                               n_chunks=F_pad // FACE_CHUNK,
                               inv_blur=inv_blur, znear=znear)
    as_col = lambda x: x.reshape(n_strips * npx, 1)
    bounds = _strip_chunk_bounds(table, win)
    return pl.pallas_call(
        kernel,
        grid=(n_strips,),
        in_specs=[
            pl.BlockSpec((n_strips, 2), lambda s: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((NCOLS, F_pad), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((npx, 1), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((npx, 1), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((npx, 1), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((NCOLS, F_pad), lambda s: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((NCOLS, F_pad), jnp.float32)],
        interpret=_interpret(),
    )(bounds, table, as_col(dz), as_col(dlk), as_col(amin))[0]


# ---------------------------------------------------------------------------
# Public API with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def raster_window_pallas(fuv_local, fz_and_ok, win: int,
                         inv_blur: float, znear: float):
    """(zbuf, sil) for one body's window from window-local face verts.

    fuv_local: (F, 3, 2); fz_and_ok: tuple(fz (F, 3), face_ok (F,)).
    zbuf is +inf where uncovered.
    """
    out, _ = _raster_fwd(fuv_local, fz_and_ok, win, inv_blur, znear)
    return out


def _raster_fwd(fuv_local, fz_and_ok, win, inv_blur, znear):
    fz, face_ok = fz_and_ok
    reach = 3.0 / np.sqrt(inv_blur) + 1.0
    table, order = _pack_face_table(fuv_local, fz, face_ok, reach)
    zmin, logkeep, amin = _run_forward(table, win, inv_blur, znear)
    zbuf = jnp.where(zmin >= BIG, jnp.inf, zmin)
    sil = 1.0 - jnp.exp(logkeep)
    return (zbuf, sil), (table, order, logkeep, amin,
                         fuv_local.shape[0])


def _raster_bwd(win, inv_blur, znear, res, cot):
    table, order, logkeep, amin, F = res
    d_zbuf, d_sil = cot
    d_z = jnp.where(jnp.isfinite(d_zbuf) & (amin >= 0), d_zbuf, 0.0)
    # sil = 1 - exp(logkeep) => d_logkeep = -exp(logkeep) * d_sil
    d_lk = -jnp.exp(logkeep) * d_sil
    dtab = _run_backward(table, d_z, d_lk, amin, win, inv_blur, znear)
    # unsort and unpack: sorted row r held face order[r]
    inv = jnp.zeros((F,), jnp.int32).at[order].set(
        jnp.arange(F, dtype=jnp.int32))
    dtab_f = jnp.take(dtab[:9], inv, axis=1)      # (9, F)
    d_fuv = dtab_f[0:6].T.reshape(F, 3, 2)
    d_fz = dtab_f[6:9].T
    return d_fuv, (d_fz, jnp.zeros((F,), bool))


raster_window_pallas.defvjp(_raster_fwd, _raster_bwd)


def rasterize_body_pallas(verts, faces, cam_K,
                          settings: RasterSettings):
    """Drop-in Pallas counterpart of rasterizer.rasterize_body."""
    uvz = project_points(verts, cam_K, return_depth=True)
    uv, z = uvz[..., :2], uvz[..., 2]
    origin = window_origin(uv, z, settings)
    fuv = uv[faces] - origin.astype(uv.dtype)
    fz = z[faces]
    face_ok = jnp.all(fz > settings.znear, axis=-1)
    inv_blur = 1.0 / settings.sil_blur_px2
    zbuf, sil = raster_window_pallas(
        fuv, (fz, face_ok), settings.window, inv_blur, settings.znear)
    return {"zbuf": zbuf, "sil": sil, "origin": origin}
