"""Realistic end-to-end benchmark: a TS1-length sequence through the
full Predictor pipeline on the real TPU chip.

Workload: synthetic MuPoTs-like tree (T=201 frames, N=3 people,
256x256, full-size 6890-vertex body), ingested through the real
loaders, then init solve + 250 stage-1 cycles with the reference
cycle schedule (scene rebuild every cycle and filtered-target
refreshes from cycle 30). Reports total wall-clock including all
remote compiles, plus the steady-state cycle time. This is the number
PERF.md's "Realistic end-to-end measurement" row records.

Usage: python script/bench_e2e.py [--frames 201] [--cycles 250]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=201)
    ap.add_argument("--people", type=int, default=3)
    ap.add_argument("--cycles", type=int, default=250)
    args = ap.parse_args()

    import types

    from mhmocap_tpu.data.synthetic import generate_sequence
    from mhmocap_tpu.data.ingestion import load_sequence
    from mhmocap_tpu.engine.predictor import Predictor
    from mhmocap_tpu.models.smpl import smpl_forward
    from mhmocap_tpu.models.synthetic import make_synthetic_smpl

    t_all = time.time()
    root = tempfile.mkdtemp(prefix="bench_e2e_")
    model = make_synthetic_smpl()        # full 6890 verts, 12.7k faces
    generate_sequence(root, num_frames=args.frames,
                      num_people=args.people, image_size=(256, 256),
                      model=model, seed=3)
    t_gen = time.time() - t_all

    jfn = jax.jit(lambda m, b, p: smpl_forward(m, b, p)[
        "joints_alphapose"])

    def jf(b, p):
        return np.asarray(jfn(model, jnp.asarray(b), jnp.asarray(p)))

    t0 = time.time()
    seq = load_sequence(root, jf, resize_factor=1.0,
                        post_process_depth=False,
                        renormalize_depth=False)
    t_ingest = time.time() - t0
    print(f"e2e: generate (test harness) {t_gen:.0f}s  "
          f"ingest (load_sequence) {t_ingest:.0f}s", flush=True)

    bc = (30, 55) if args.cycles > 55 else None
    pa = types.SimpleNamespace(
        num_iter=args.cycles, batch_size=10, save_visualizations=False,
        proj2d_loss_coef=1.0, depth_loss_coef=0.05,
        silhouette_loss_coef=0.1, reg_poses_coef=0.002,
        reg_scales_coef=1e-4, reg_velocity_coef=0.05,
        reg_verts_filter_coef=0.002, reg_contact_coef=0.001,
        reg_foot_sliding_coef=0.01, joint_confidence_thr=0.5,
        raster_window=128, spmd=False,
        # steady-state cadence window: one full filter-refresh period
        # past the scene/contact warmup boundary
        bench_cycles=bc)
    t0 = time.time()
    p = Predictor(seq, model, tempfile.mkdtemp(), pa)
    out = p.run()
    t_fit = time.time() - t0
    total = time.time() - t_all

    log = out["stage1_log"]
    print(f"e2e: T={args.frames} N={args.people} window={p.cfg.window}"
          f" cycles={args.cycles}")
    print(f"e2e: generate {t_gen:.0f}s  ingest {t_ingest:.0f}s  "
          f"fit+init {t_fit:.0f}s  "
          f"TOTAL {total:.0f}s ({total / 60:.1f} min) incl. compiles")
    if getattr(p, "bench_seconds", None) is not None:
        per_cycle = p.bench_seconds / (bc[1] - bc[0])
        print(f"e2e: steady-state cycle {per_cycle * 1e3:.0f}ms -> "
              f"{args.frames / per_cycle:.0f} frame-cycles/s "
              f"(cycles [{bc[0]}, {bc[1]}))")
    print(f"e2e: loss first/last = {log[0]['loss_pose24j']:.2f} / "
          f"{log[-1]['loss_pose24j']:.2f}")


if __name__ == "__main__":
    main()
