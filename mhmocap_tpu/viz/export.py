"""Visualization exports: loss curves, overlay renders, data pickles.

Capability parity with reference predict.py:54-257
(save_visualization_init_data / save_visualization_stage1): the same
output artifacts (fig_optim_curves_init/stage1.png, vis_init/ and
vis_stage1/ frame overlays, visualization_data_stage1.pkl with the
schema consumed by the interactive viewer).
"""

from __future__ import annotations

import os
import pickle
from pathlib import Path

import numpy as np
import jax.numpy as jnp

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ..models.smpl import smpl_forward  # noqa: E402
from ..ops.cameras import project_points  # noqa: E402

PLOT_COLORS = ["red", "green", "blue", "yellow", "cyan", "magenta",
               "gold", "olive", "deeppink", "darkorange", "navy"]

# COCO-17 limb links (reference predict.py:36-51)
ALPHAPOSE_LINKS = [
    [0, 1], [0, 2], [1, 3], [2, 4], [5, 7], [7, 9], [6, 8], [8, 10],
    [5, 11], [6, 12], [11, 13], [13, 15], [12, 14], [14, 16],
]


def _smpl_outputs(model, betas, poses):
    out = smpl_forward(model, jnp.asarray(betas.reshape(-1, 10)),
                       jnp.asarray(poses.reshape(-1, 72)))
    return (np.asarray(out["verts"]),
            np.asarray(out["joints_alphapose"]))


def save_visualization_init_data(output_path, seq, model, init_optvar,
                                 loss_2d, joints_thr=0.5,
                                 max_frames=25):
    """Init-stage loss curve + sparse frame overlays
    (reference predict.py:54-138)."""
    plt.rc("font", size=16)
    fig, ax = plt.subplots(1, 1, figsize=(16, 6))
    ax.plot(np.log(np.clip(loss_2d, 1e-12, None)), c="r",
            label="Pose 2D loss")
    ax.set_ylabel("log(loss)")
    ax.grid()
    fig.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(output_path, "fig_optim_curves_init.png"),
                pad_inches=0, dpi=150)
    plt.close(fig)

    vis_path = os.path.join(output_path, "vis_init")
    Path(vis_path).mkdir(parents=True, exist_ok=True)
    K = seq.cam["K"]
    scale = init_optvar["scale_factor"][0]

    # batched SMPL forward + projections for the exported frames (one
    # device call instead of 3 per frame; see save_visualization_stage1)
    n_f = min(len(seq), max_frames)
    N = init_optvar["poses_smpl"].shape[1]
    betas_t = np.broadcast_to(init_optvar["betas_smpl"][:1],
                              (n_f, N, 10))
    verts_b, joints_b = _smpl_outputs(
        model, betas_t.reshape(n_f * N, 10),
        init_optvar["poses_smpl"][:n_f].reshape(n_f * N, 72))
    v3d_all = (scale * verts_b.reshape(n_f, N, -1, 3)
               + init_optvar["poses_T"][:n_f])
    j3d_all = (scale * joints_b.reshape(n_f, N, -1, 3)
               + init_optvar["poses_T"][:n_f])
    v2d_all = np.asarray(project_points(
        jnp.asarray(v3d_all.reshape(-1, 3))[None],
        jnp.asarray(K)))[0].reshape(n_f, N, -1, 2)
    j2d_all = np.asarray(project_points(
        jnp.asarray(j3d_all.reshape(-1, 3))[None],
        jnp.asarray(K)))[0].reshape(n_f, N, -1, 2)

    for i in range(n_f):
        image = seq.images[i]
        v2d, j2d = v2d_all[i], j2d_all[i]
        ref2d = init_optvar["pose2d"][i]

        fig, axs = plt.subplots(1, 2, figsize=(16, 8))
        axs[0].imshow(image)
        axs[1].imshow(image)
        for n in range(N):
            c = PLOT_COLORS[n % len(PLOT_COLORS)]
            axs[1].scatter(v2d[n, :, 0], v2d[n, :, 1], marker="o",
                           color=c, alpha=0.05, s=2)
            for link in ALPHAPOSE_LINKS:
                p1, p2 = ref2d[n, link[0]], ref2d[n, link[1]]
                if p1[2] > joints_thr and p2[2] > joints_thr:
                    axs[0].plot([p1[0], p2[0]], [p1[1], p2[1]],
                                color=c, lw=2)
            axs[1].scatter(j2d[n, :, 0], j2d[n, :, 1], marker="^",
                           color="w", s=8)
        fig.tight_layout()
        fig.savefig(os.path.join(vis_path, f"vis_{i:04d}.png"),
                    pad_inches=0, dpi=120)
        plt.close(fig)


def save_visualization_stage1(output_path, seq, model, stage1_optvar,
                              poses2d, log, max_overlays=20):
    """Stage-1 loss curves, overlays and the visualization pickle
    (reference predict.py:141-257)."""
    plt.rc("font", size=16)
    fig, ax = plt.subplots(1, 1, figsize=(16, 6))
    for key, color in [
            ("loss_pose24j", "r"), ("loss_depth", "b"),
            ("loss_silhouette", "g"), ("reg_vel", "darkorange"),
            ("reg_filter_verts", "darkgreen"), ("reg_ref_poses", "m"),
            ("reg_scale", "y"), ("reg_contact", "k"),
            ("reg_foot_sliding", "gold")]:
        vals = np.asarray([v[key] for v in log], np.float64)
        ax.plot(np.log(np.clip(vals, 1e-12, None)), c=color, label=key)
    ax.set_ylabel("log(loss)")
    ax.grid()
    fig.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(output_path,
                             "fig_optim_curves_stage1.png"),
                pad_inches=0, dpi=150)
    plt.close(fig)

    vis_path = os.path.join(output_path, "vis_stage1")
    Path(vis_path).mkdir(parents=True, exist_ok=True)
    K = seq.cam["K"]
    scale = stage1_optvar["scale_factor"][0]
    T = len(seq)

    # ONE batched SMPL forward + projection for all T frames (per-frame
    # device dispatch costs ~a round trip each on the remote backend —
    # same batching as data/ingestion.assign_smpl_to_poses)
    N = stage1_optvar["poses_smpl"].shape[1]
    betas_t = np.broadcast_to(stage1_optvar["betas_smpl"][:1],
                              (T, N, 10))
    verts_b, joints_b = _smpl_outputs(
        model, betas_t.reshape(T * N, 10),
        stage1_optvar["poses_smpl"].reshape(T * N, 72))
    verts_b = verts_b.reshape(T, N, -1, 3)
    joints_b = joints_b.reshape(T, N, -1, 3)
    v3d_all = scale * verts_b + stage1_optvar["poses_T"]
    j3d_all = scale * joints_b + stage1_optvar["poses_T"]
    n_ov = min(T, max_overlays)
    j2d_all = np.asarray(project_points(
        jnp.asarray(j3d_all[:n_ov].reshape(-1, 3))[None],
        jnp.asarray(K)))[0].reshape(n_ov, N, -1, 2)
    v2d_all = np.asarray(project_points(
        jnp.asarray(v3d_all[:n_ov].reshape(-1, 3))[None],
        jnp.asarray(K)))[0].reshape(n_ov, N, -1, 2)

    verts_all = []
    depths = []
    for i in range(T):
        min_z = stage1_optvar["min_z"][i]
        max_z = stage1_optvar["max_z"][i]
        depth = 1.0 / (seq.depths[i] * (1.0 / min_z - 1.0 / max_z)
                       + 1.0 / max_z)
        verts_all.append(v3d_all[i])
        depths.append(depth)

        if i < max_overlays:
            j2d, v2d = j2d_all[i], v2d_all[i]
            fig, axs = plt.subplots(1, 3, figsize=(24, 8))
            axs[0].imshow(seq.images[i])
            axs[1].imshow(seq.images[i])
            axs[2].imshow(np.log(np.clip(depth, 1e-3, None)))
            for n in range(N):
                c = PLOT_COLORS[n % len(PLOT_COLORS)]
                for link in ALPHAPOSE_LINKS:
                    p1, p2 = j2d[n, link[0]], j2d[n, link[1]]
                    axs[0].plot([p1[0], p2[0]], [p1[1], p2[1]],
                                color=c, lw=2)
                ref = poses2d[i, n]
                vis = ref[:, 2] > 0.5
                axs[0].scatter(ref[vis, 0], ref[vis, 1], marker="^",
                               color="w", s=8)
                axs[1].scatter(v2d[n, :, 0], v2d[n, :, 1], marker=".",
                               color=c, alpha=0.05, s=2)
            fig.tight_layout()
            fig.savefig(os.path.join(vis_path, f"vis_{i:04d}.png"),
                        pad_inches=0, dpi=120)
            plt.close(fig)

    vis_data = {
        "images": seq.images,
        "depths": np.stack(depths, axis=0),
        "backmasks": seq.backmasks,
        "cam_smpl": seq.cam_smpl,
        "cam": seq.cam,
        "verts": np.stack(verts_all, axis=0),
        "valid": seq.valid_smpl,
        "pose2d": poses2d.copy(),
    }
    with open(os.path.join(output_path,
                           "visualization_data_stage1.pkl"), "wb") as f:
        pickle.dump(vis_data, f)
