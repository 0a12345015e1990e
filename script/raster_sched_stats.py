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
    ap.add_argument("--per_person", action="store_true",
                    help="use the Predictor-derived per-person "
                         "windows instead of one shared --win")
    args = ap.parse_args()

    import bench
    from mhmocap_tpu.models.smpl import smpl_forward
    from mhmocap_tpu.ops import rasterizer as R
    from mhmocap_tpu.ops import raster_pallas as RP
    from mhmocap_tpu.ops.cameras import project_points

    seq, model = bench.make_ts1_like_seq()
    model = R.preorder_faces(model)
    T, N = seq.num_frames, seq.num_people
    if args.per_person:
        import tempfile
        import types
        a = types.SimpleNamespace(raster_window=args.win,
                                  joint_confidence_thr=0.5,
                                  num_iter=1, batch_size=10,
                                  save_visualizations=False,
                                  verbose=False, spmd=False,
                                  proj2d_loss_coef=1.0,
                                  depth_loss_coef=0.05,
                                  silhouette_loss_coef=0.1,
                                  reg_poses_coef=0.002,
                                  reg_scales_coef=1e-4,
                                  reg_velocity_coef=0.05,
                                  reg_verts_filter_coef=0.002,
                                  reg_contact_coef=0.001,
                                  reg_foot_sliding_coef=0.01)
        from mhmocap_tpu.engine.predictor import Predictor
        with tempfile.TemporaryDirectory() as tmp:
            person_windows = Predictor(seq, model, tmp, a) \
                .cfg.person_windows
    else:
        person_windows = (args.win,) * N
    poses_T = bench.ts1_poses_T(T, N)[:, :, 0]   # (T, N, 3)
    K = jnp.asarray(seq.cam["K"])

    exact = sched = bodies = 0
    work = 0.0        # scheduled pairs x pixels/cell (kernel VPU work)
    for t in range(0, T, args.stride):
        v = smpl_forward(model, jnp.asarray(seq.betas_smpl[t]),
                         jnp.asarray(seq.poses_smpl[t]))["verts"] \
            + poses_T[t][:, None]
        for n in range(N):
            win = person_windows[n]
            rs = R.RasterSettings(image_size=seq.image_size,
                                  window=win, preordered=True)
            reach = 3.0 * float(np.sqrt(rs.sil_blur_px2)) + 1.0
            n_xb = RP._n_xb(win)
            xw = win // n_xb
            n_strips = win // RP.STRIP_H
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
            n_sched = int((b_np[:, 1] - b_np[:, 0]).sum())
            sched += n_sched
            work += n_sched * RP.STRIP_H * xw
            a_np = np.asarray(agg)
            for s in range(n_strips):
                ylo, yhi = s * RP.STRIP_H, (s + 1) * RP.STRIP_H
                act_y = ((a_np[:, RP.AGG_YLO] < yhi)
                         & (a_np[:, RP.AGG_YHI] >= ylo))
                for xb in range(n_xb):
                    xlo, xhi = xb * xw, (xb + 1) * xw
                    act = (act_y & (a_np[:, RP.AGG_XLO] < xhi)
                           & (a_np[:, RP.AGG_XHI] >= xlo))
                    exact += int(act.sum())
            bodies += 1

    print(f"bodies={bodies} windows={person_windows} "
          f"FACE_CHUNK={RP.FACE_CHUNK}")
    print(f"exact-overlap pairs : {exact:8d} "
          f"({exact / bodies:.1f}/body)")
    print(f"scheduled pairs     : {sched:8d} "
          f"({sched / bodies:.1f}/body, "
          f"{100.0 * (sched - exact) / max(exact, 1):.1f}% slack)")
    print(f"kernel work (pair-pixels x FACE_CHUNK): "
          f"{work * RP.FACE_CHUNK / bodies / 1e6:.1f} M/body")


if __name__ == "__main__":
    main()
