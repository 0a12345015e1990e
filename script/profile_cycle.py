"""Decompose one stage-1 cycle's TPU time into its pieces.

Runs the bench.py workload (T=64, N=3, 256x256, full-size body) and
times, with block_until_ready, each constituent: SMPL forward, face
plane prep, Pallas raster forward, raster forward+backward, the full
chunk loss, and the full cycle (value_and_grad + RMSprop update).
Prints one line per piece. Optionally writes a jax.profiler trace with
--trace <dir>.

Usage:  python script/profile_cycle.py [--trace /tmp/trace]
"""

import argparse
import os
import sys
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


def timeit(fn, *args, n=5, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:42s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    ap.add_argument("--T", type=int, default=64)
    ap.add_argument("--win", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=16)
    args = ap.parse_args()

    from mhmocap_tpu.engine import optimizer as E
    from mhmocap_tpu.models.smpl import smpl_forward
    from mhmocap_tpu.ops import rasterizer as R
    from mhmocap_tpu.ops.cameras import project_points
    from mhmocap_tpu.ops.raster_pallas import rasterize_body_pallas
    # the SAME synthetic TS1-scale workload bench.py measures
    # (including the z=3.4 window-guard tuning)
    from bench import make_ts1_like_seq

    T, N, side = args.T, 3, 256
    seq, model = make_ts1_like_seq(T=T)
    # production raster path: statically ordered faces (as bench.py
    # and the Predictor configure)
    model = R.preorder_faces(model)
    K = np.asarray(seq.cam["K"])
    poses_smpl, betas = seq.poses_smpl, seq.betas_smpl
    pose2d = seq.pose2d
    from bench import ts1_poses_T
    poses_T = ts1_poses_T(T, N)

    cfg = E.EngineConfig(image_size=(side, side), num_people=N,
                         num_frames=T, chunk=args.chunk, window=args.win,
                         face_chunk=128, preordered_faces=True)
    params, _, _ = E.init_params(model, pose2d, poses_smpl, betas, K,
                                 cfg, num_iter=5)
    data = E.prepare_seq_data(seq, cfg)
    aux = E.init_aux(cfg, model.num_vertices,
                     jnp.asarray(betas[:1].mean(0, keepdims=True)))
    coefs = E.default_coefs()
    opt = E.make_stage1_optimizer()
    opt_state = opt.init(params)

    C = cfg.chunk
    bodies = C * N
    pc = jnp.asarray(poses_smpl[:C].reshape(bodies, 72))
    bc = jnp.asarray(betas[:C].reshape(bodies, 10))

    # --- pieces -----------------------------------------------------
    smpl_fwd = jax.jit(lambda b, p: smpl_forward(model, b, p)["verts"])
    timeit(smpl_fwd, bc, pc, name=f"SMPL fwd ({bodies} bodies)")

    smpl_grad = jax.jit(jax.grad(
        lambda b, p: jnp.sum(smpl_forward(model, b, p)["verts"]),
        argnums=(0, 1)))
    timeit(smpl_grad, bc, pc, name="SMPL fwd+bwd")

    verts_abs = np.asarray(
        smpl_forward(model, bc, pc)["verts"]).reshape(C, N, -1, 3) \
        + poses_T[:C]
    verts_abs = jnp.asarray(verts_abs.reshape(bodies, -1, 3))
    rs = cfg.raster_settings

    one_raster = jax.jit(lambda v: jax.vmap(
        lambda vv: rasterize_body_pallas(vv, model.faces, jnp.asarray(K),
                                         rs))(v))
    timeit(one_raster, verts_abs, name=f"raster fwd ({bodies} bodies)")

    def raster_loss(v):
        o = jax.vmap(lambda vv: rasterize_body_pallas(
            vv, model.faces, jnp.asarray(K), rs))(v)
        zb = jnp.where(jnp.isfinite(o["zbuf"]), o["zbuf"], 0.0)
        return jnp.sum(zb) + jnp.sum(o["sil"])

    raster_g = jax.jit(jax.grad(raster_loss))
    timeit(raster_g, verts_abs, name="raster fwd+bwd")

    # prep only (face planes; no kernel)
    def prep_only(v):
        uvz = project_points(v, jnp.asarray(K), return_depth=True)
        uv2, z = uvz[..., :2], uvz[..., 2]
        origin = R.window_origin(uv2, z, rs)
        fuv = uv2[model.faces] - origin.astype(uv2.dtype)
        planes, bbox, oks, okd = R.face_planes(fuv, z[model.faces],
                                               rs.znear)
        return planes, bbox

    prep_j = jax.jit(lambda v: jax.vmap(prep_only)(v))
    timeit(prep_j, verts_abs, name="face-plane prep only")

    # full chunk loss fwd / fwd+bwd. data/aux/model MUST be traced
    # arguments: closing over them bakes the (Tp, N, V, 3) filter
    # targets etc. into the HLO as literals, and at T=2048 the
    # ~250 MB module blows the remote-compile tunnel's request limit
    # (HTTP 413).
    def chunk_loss(p, m, d, a):
        ch = E._slice_chunk(p, d, a, cfg, 0)
        l, _ = E._chunk_loss_core(ch, m, p.betas,
                                  E.scale_factor_of(p),
                                  d.cam_K, a, coefs, cfg)
        return l

    timeit(jax.jit(chunk_loss), params, model, data, aux,
           name="chunk loss fwd")
    timeit(jax.jit(jax.grad(chunk_loss)), params, model, data, aux,
           name="chunk loss fwd+bwd")

    # full cycle
    def cycle(p, s):
        return E.stage1_cycle(p, s, model, data, aux, coefs, cfg)

    def run_cycle(p, s):
        p2, s2, loss, parts = cycle(p, s)
        return loss

    # stage1_cycle donates its params/opt_state args — thread the
    # returned buffers, never reuse the originals
    p, s, loss, parts = cycle(params, opt_state)
    jax.block_until_ready(loss)
    t0 = time.time()
    n = 5
    for _ in range(n):
        p, s, loss, parts = cycle(p, s)
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / n
    print(f"{'FULL cycle (T=%d)' % T:42s} {dt * 1e3:9.2f} ms   "
          f"({T / dt:.0f} f-c/s)")

    if args.trace:
        with jax.profiler.trace(args.trace):
            p, s, loss, parts = cycle(p, s)
            jax.block_until_ready(loss)
        print("trace written to", args.trace)


if __name__ == "__main__":
    main()
