"""Raster schedule efficiency on the bench workload (CPU-only).

For a sample of posed bodies from bench.make_ts1_like_seq, reports
  - exact   : (cell, chunk) pairs whose reach-expanded chunk bbox
              truly overlaps the cell (the work floor the streaming
              kernel cannot go below at the current FACE_CHUNK),
  - sched   : pairs inside the per-cell [lo, hi) slice the kernel
              iterates (ops/raster_pallas._strip_chunk_lists); the
              excess over `exact` is non-contiguous reachability that
              the kernel's SMEM activity test cond-skips.

This is the instrument that motivated the prefix-max lo bound
(25.9k -> 19.4k sched at a 15.5k floor) and measured the template-
vs-init-pose face order (template wins on this workload). Run it
after changing FACE_CHUNK, the face order, or the schedule bounds.

Usage: python script/raster_sched_stats.py [--stride 20]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stride", type=int, default=20,
                    help="sample every Nth frame")
    ap.add_argument("--win", type=int, default=160)
    args = ap.parse_args()

    import bench
    from mhmocap_tpu.models.smpl import smpl_forward
    from mhmocap_tpu.ops import rasterizer as R
    from mhmocap_tpu.ops import raster_pallas as RP
    from mhmocap_tpu.ops.cameras import project_points

    seq, model = bench.make_ts1_like_seq()
    model = R.preorder_faces(model)
    win = args.win
    rs = R.RasterSettings(image_size=seq.image_size, window=win,
                          preordered=True)
    T, N = seq.num_frames, seq.num_people
    poses_T = bench.ts1_poses_T(T, N)[:, :, 0]   # (T, N, 3)
    K = jnp.asarray(seq.cam["K"])
    reach = 3.0 * float(np.sqrt(rs.sil_blur_px2)) + 1.0
    n_xb = RP._n_xb(win)
    xw = win // n_xb
    n_strips = win // RP.STRIP_H

    exact = sched = bodies = 0
    for t in range(0, T, args.stride):
        v = smpl_forward(model, jnp.asarray(seq.betas_smpl[t]),
                         jnp.asarray(seq.poses_smpl[t]))["verts"] \
            + poses_T[t][:, None]
        for n in range(N):
            uvz = project_points(v[n], K, return_depth=True)
            uv, z = uvz[..., :2], uvz[..., 2]
            origin = R.window_origin(uv, z, rs)
            fuv = uv[model.faces] - origin.astype(uv.dtype)
            planes, bbox, oks, okd = R.face_planes(
                fuv, z[model.faces], rs.znear)
            lo_y = bbox[:, 2] - reach
            hi_y = bbox[:, 3] + reach
            _, _, agg = RP._pack_face_table_static(
                planes, bbox, oks, okd, lo_y, hi_y, reach)
            lists, bounds = RP._strip_chunk_lists(agg, win)
            b_np = np.asarray(bounds)
            sched += int((b_np[:, 1] - b_np[:, 0]).sum())
            a = np.asarray(agg)
            for s in range(n_strips):
                ylo, yhi = s * RP.STRIP_H, (s + 1) * RP.STRIP_H
                act_y = ((a[:, RP.AGG_YLO] < yhi)
                         & (a[:, RP.AGG_YHI] >= ylo))
                for xb in range(n_xb):
                    xlo, xhi = xb * xw, (xb + 1) * xw
                    act = (act_y & (a[:, RP.AGG_XLO] < xhi)
                           & (a[:, RP.AGG_XHI] >= xlo))
                    exact += int(act.sum())
            bodies += 1

    print(f"bodies={bodies} window={win} FACE_CHUNK={RP.FACE_CHUNK}")
    print(f"exact-overlap pairs : {exact:8d} "
          f"({exact / bodies:.1f}/body)")
    print(f"scheduled pairs     : {sched:8d} "
          f"({sched / bodies:.1f}/body, "
          f"{100.0 * (sched - exact) / max(exact, 1):.1f}% slack)")


if __name__ == "__main__":
    main()
