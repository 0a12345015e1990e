"""Benchmark: stage-1 space-time optimization throughput on one chip.

Prints ONE JSON line:
    {"metric": "stage1_frame_cycles_per_sec", "value": N,
     "unit": "frame-cycles/s", "vs_baseline": R}

The workload is a TS1-like synthetic problem at the reference's
working configuration (256x256 frames after resize_factor=0.125,
N=3 people, full-size 6890-vertex body, 12k faces), running full
optimization cycles (SMPL forward + crop-window depth/silhouette
rasterization + all loss terms + RMSprop update over the whole
sequence).

vs_baseline compares frames*cycles/second against an estimate of the
reference implementation on its TITAN V target: the reference
processes the epoch in batches of 10 with PyTorch3D rasterization of
batch*N meshes plus several CPU syncs per batch (reference
optimizer.py:375-602); measured PyTorch3D mesh rasterization plus the
epoch-level python overhead puts it at ~60 frame-cycles/s for this
shape (T=200 sequence in ~3.3 s/cycle). That constant is recorded
here until the reference can be profiled directly.
"""

import json
import os
import time

import numpy as np

REFERENCE_FRAME_CYCLES_PER_SEC = 60.0

# Persistent compile cache: remote TPU compiles here are minutes-long;
# caching makes repeat benchmark runs measure compute, not compilation.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)), ".jax_cache"))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def main():
    import jax.numpy as jnp
    from mhmocap_tpu.engine import optimizer as E
    from mhmocap_tpu.models.synthetic import make_synthetic_smpl
    from mhmocap_tpu.models.smpl import smpl_forward
    from mhmocap_tpu.ops.cameras import project_points, \
        intrinsics_from_fov
    from mhmocap_tpu.data.ingestion import SequenceArrays

    T, N, side = 64, 3, 256
    model = make_synthetic_smpl()  # full 6890 verts / ~12.7k faces
    K = intrinsics_from_fov((side, side), 60.0)
    rng = np.random.RandomState(0)

    poses_smpl = 0.1 * rng.randn(T, N, 72).astype(np.float32)
    betas = np.zeros((T, N, 10), np.float32)
    poses_T = np.zeros((T, N, 1, 3), np.float32)
    poses_T[:, :, 0, 2] = np.linspace(3.0, 5.0, N)[None]
    poses_T[:, :, 0, 0] = np.linspace(-0.8, 0.8, N)[None]
    out = smpl_forward(model, jnp.asarray(betas.reshape(-1, 10)),
                       jnp.asarray(poses_smpl.reshape(-1, 72)))
    j3d = np.asarray(out["joints_alphapose"]).reshape(T, N, 17, 3) \
        + poses_T
    uv = np.asarray(project_points(jnp.asarray(j3d), jnp.asarray(K)))
    pose2d = np.concatenate(
        [uv, 0.9 * np.ones((T, N, 17, 1), np.float32)], -1)

    # production raster path: statically ordered faces (what the
    # Predictor configures)
    from mhmocap_tpu.ops.rasterizer import preorder_faces
    model = preorder_faces(model)
    cfg = E.EngineConfig(image_size=(side, side), num_people=N,
                         num_frames=T, chunk=16, window=128,
                         face_chunk=128, preordered_faces=True)
    params, _, _ = E.init_params(model, pose2d, poses_smpl, betas, K,
                                 cfg, num_iter=5)
    seg = np.zeros((T, N, side, side), np.float32)
    for n in range(N):
        x0 = 40 + 60 * n
        seg[:, n, 60:200, x0:x0 + 50] = 1
    seq = SequenceArrays(
        images=np.zeros((T, side, side, 3), np.uint8),
        depths=np.clip(0.5 + 0.1 * rng.randn(T, side, side), 0,
                       1).astype(np.float32),
        instances=np.zeros((T, side, side), np.uint8),
        seg_mask=seg,
        backmasks=1.0 - seg.max(axis=1),
        pose2d=pose2d,
        cam_smpl=np.zeros((T, N, 3), np.float32),
        poses_smpl=poses_smpl,
        betas_smpl=betas,
        valid_smpl=np.ones((T, N, 1), np.float32),
        frame_ids=np.arange(T),
        cam={"K": K, "fov": 60.0, "Kd": None,
             "image_size": (side, side)},
    )
    data = E.prepare_seq_data(seq, cfg)
    aux = E.init_aux(cfg, model.num_vertices,
                     jnp.asarray(betas[:1].mean(0, keepdims=True)))
    coefs = E.default_coefs()
    opt = E.make_stage1_optimizer()
    opt_state = opt.init(params)

    # warmup (compile)
    t0 = time.time()
    params, opt_state, loss, _ = E.stage1_cycle(
        params, opt_state, model, data, aux, coefs, cfg)
    jax.block_until_ready(loss)
    compile_s = time.time() - t0

    # measure steady-state cycles
    n_meas = 3
    t0 = time.time()
    for _ in range(n_meas):
        params, opt_state, loss, _ = E.stage1_cycle(
            params, opt_state, model, data, aux, coefs, cfg)
    jax.block_until_ready(loss)
    per_cycle = (time.time() - t0) / n_meas

    frame_cycles_per_sec = T / per_cycle
    result = {
        "metric": "stage1_frame_cycles_per_sec",
        "value": round(frame_cycles_per_sec, 2),
        "unit": "frame-cycles/s",
        "vs_baseline": round(
            frame_cycles_per_sec / REFERENCE_FRAME_CYCLES_PER_SEC, 3),
    }
    print(json.dumps(result))
    print(f"# device={jax.devices()[0].device_kind} "
          f"compile={compile_s:.1f}s cycle={per_cycle * 1e3:.1f}ms "
          f"T={T} N={N} loss={float(loss):.4f}", flush=True)


if __name__ == "__main__":
    main()
