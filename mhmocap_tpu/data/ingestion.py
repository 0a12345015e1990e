"""Sequence ingestion: load & align the four input modalities.

Capability parity with reference `mhmocap/datautils.py`
(H3DHCustomSequenceData + load_and_assign_instances,
datautils.py:364-641): for one video, loads images (bicubic resize),
DPT disparity maps (normalize + optional bilateral + outlier fill-in),
Mask2Former instance masks (anti-glue erosion), AlphaPose tracks and
ROMP SMPL predictions; Hungarian-assigns SMPL predictions and instance
masks to tracked 2D poses; imputes missing SMPL predictions from the
nearest valid frame; optionally One-Euro-smooths the 2D poses fwd+bwd.

Host-side by design: runs once per sequence, string/file heavy. The
output is a single `SequenceArrays` pytree of (T, ...) numpy arrays —
the only thing that crosses to the TPU.
"""

from __future__ import annotations

import copy
import glob
import os
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from ..ops.cameras import (weak_perspective_projection, fov_from_focal,
                           focal_from_fov)
from .alphapose import load_tracking_results, merge_pose_streams, \
    tracks_to_array
from .assignment import match_pose_sets, pose_distance_2d
from .romp import load_romp_sequence


# ---------------------------------------------------------------------------
# Modality loaders
# ---------------------------------------------------------------------------

def _host_map(fn, items):
    """Order-preserving threaded map for per-frame host decoding.

    PIL's zlib/JPEG decoders and cv2's filters release the GIL, so a
    thread pool parallelizes the file-heavy loaders (the reference
    gets the same effect from its num_workers DataLoader processes,
    datautils.py + predict_mupots.py DataLoader(num_workers=4))."""
    items = list(items)
    if len(items) <= 1:
        return [fn(x) for x in items]
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(min(16, os.cpu_count() or 4)) as ex:
        return list(ex.map(fn, items))


def load_images(paths: List[str], resize_factor: float) -> np.ndarray:
    """Bicubic-resized RGB frames -> (T, H, W, 3) uint8
    (datautils.py:43-54)."""
    def one(p):
        img = Image.open(p)
        if abs(resize_factor - 1.0) > 1e-3:
            w = int(round(resize_factor * img.size[0]))
            h = int(round(resize_factor * img.size[1]))
            img = img.resize((w, h), resample=Image.BICUBIC)
        return np.asarray(img)

    return np.stack(_host_map(one, paths), axis=0)


def load_disparity_maps(paths: List[str], image_size: Tuple[int, int],
                        renormalize: bool = False,
                        use_bilateral_filter: bool = False,
                        post_process: bool = True) -> np.ndarray:
    """Normalized disparity maps -> (T, H, W) float32
    (datautils.py:57-80). Post-processing (Sobel outlier removal +
    fill-in) runs BATCHED on the JAX device via ops.image — the
    per-frame device round-trips used to dominate ingestion wall
    time through the remote-TPU tunnel."""
    import cv2

    def one(p):
        img = Image.open(p)
        if img.size != tuple(image_size):
            img = img.resize(tuple(image_size), resample=Image.BICUBIC)
        disp = np.asarray(img, np.float32)
        disp = (disp - disp.min()) / max(disp.max() - disp.min(), 1e-8)
        if use_bilateral_filter:
            disp = cv2.bilateralFilter(disp, 15, sigmaColor=0.3,
                                       sigmaSpace=31)
        return disp

    stack = np.stack(_host_map(one, paths), axis=0)

    if post_process:
        import jax
        import jax.numpy as jnp
        from ..ops.image import postprocess_dispmap

        # one device call per 128-frame block (block-padded with the
        # last frame so every block compiles at one shape); the
        # fill-in while_loop body is idempotent once a frame's mask
        # is full, so batching never changes per-frame results
        B = min(128, stack.shape[0])
        f = jax.jit(jax.vmap(lambda d: postprocess_dispmap(
            d, minz=1, maxz=100, fillin_ksize=7)))
        out = []
        for i in range(0, stack.shape[0], B):
            blk = stack[i:i + B]
            pad = B - blk.shape[0]
            if pad:
                blk = np.concatenate(
                    [blk, np.repeat(blk[-1:], pad, axis=0)], axis=0)
            res = np.asarray(f(jnp.asarray(blk)))
            out.append(res[:B - pad] if pad else res)
        stack = np.concatenate(out, axis=0)

    if renormalize:
        lo = stack.min(axis=(1, 2), keepdims=True)
        rng = np.maximum(stack.max(axis=(1, 2), keepdims=True) - lo,
                         1e-8)
        stack = (stack - lo) / rng
    return stack


def load_segmentation_maps(paths: List[str], image_size: Tuple[int, int],
                           fg_erode_iters: int = 3,
                           bg_erode_iters: int = 9):
    """Instance + background masks -> ((T, H, W) uint8, (T, H, W) uint8).

    Mirrors datautils.py:83-110: nearest-neighbor resize; instance
    erosion starts with an erode/dilate-agreement pass so touching
    instances don't fuse; the background mask is eroded independently.
    """
    import cv2

    def one(p):
        img = Image.open(p)
        if img.size != tuple(image_size):
            img = img.resize(tuple(image_size), resample=Image.NEAREST)
        inst = np.asarray(img)
        back = (inst == 0).astype(inst.dtype)
        if fg_erode_iters > 0:
            e = cv2.erode(inst, np.ones((3, 3)), iterations=1)
            d = cv2.dilate(inst, np.ones((3, 3)), iterations=1)
            inst = ((e == d) * inst).astype(inst.dtype)
            if fg_erode_iters > 1:
                inst = cv2.erode(inst, np.ones((3, 3)),
                                 iterations=fg_erode_iters - 1)
        if bg_erode_iters > 0:
            back = cv2.erode(back, np.ones((3, 3)),
                             iterations=bg_erode_iters)
        return inst, back

    pairs = _host_map(one, paths)
    return (np.stack([p[0] for p in pairs], axis=0),
            np.stack([p[1] for p in pairs], axis=0))


def split_instance_masks(instances: np.ndarray,
                         num_classes: Optional[int] = None) -> np.ndarray:
    """(T, H, W) labels -> (T, N, H, W) per-person binary float masks
    (reference decouple_instance_segmentation_masks, utils.py:314-333).
    """
    if num_classes is None:
        num_classes = int(instances.max())
    cls = np.arange(1, num_classes + 1)
    return (instances[:, None] == cls[None, :, None, None]).astype(
        np.float32)


# ---------------------------------------------------------------------------
# Cross-modality assignment
# ---------------------------------------------------------------------------

def assign_instances_to_poses(instances: np.ndarray, pose2d: np.ndarray,
                              thr: float = 0.5) -> np.ndarray:
    """Relabel instance masks so mask value i+1 belongs to pose i.

    Per frame, each segment votes for the person whose confident
    joints land on it most often; zero-vote segments are erased
    (reference assign_instances_to_poses_v2, datautils.py:200-244).
    """
    H, W = instances.shape[1:]
    N = pose2d.shape[1]
    out = instances.copy()
    for f in range(len(instances)):
        inst = instances[f]
        labels = np.unique(inst)
        labels = labels[labels > 0]
        if len(labels) == 0:
            continue
        remap = {}
        for c in labels:
            mask = inst == c
            votes = np.zeros((N,))
            for k in range(N):
                vis = pose2d[f, k, :, 2] > thr
                xs = np.round(np.clip(pose2d[f, k, vis, 0], 0, W - 1)
                              ).astype(int)
                ys = np.round(np.clip(pose2d[f, k, vis, 1], 0, H - 1)
                              ).astype(int)
                votes[k] = mask[ys, xs].sum()
            win = int(np.argmax(votes)) + 1
            remap[c] = win if votes[win - 1] > 0 else 0
        new_inst = np.zeros_like(inst)
        for old, new in remap.items():
            new_inst[inst == old] = new
        out[f] = new_inst
    return out


def assign_smpl_to_poses(
    smpl_preds: List[Dict[str, np.ndarray]],
    pose2d: np.ndarray,
    image_size: Tuple[int, int],
    smpl_joints_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
):
    """Assign per-frame SMPL predictions to tracked 2D poses.

    Returns (smpl_preds, pose2d, lagged_tn): lagged_tn is a (T, N)
    bool mask of person-frames whose 2D pose is a STALE copy of the
    previous frame (lagged imputation below) that was NOT refreshed by
    a matching SMPL projection — i.e. frames with no current-frame 2D
    evidence at all. Callers can use it to decay the stale
    confidences (see load_sequence's `lagged_conf_decay`).

    Behavioral parity with reference assign_smpl_to_poses
    (datautils.py:247-361):
      * pad missing SMPL slots with zeros + valid=0;
      * project each SMPL body's sparse joints with its weak-persp cam
        and Hungarian-match against the tracked poses (SMPL joints get
        confidence 0.502, matched with thr=0.501 so only real 2D
        joints above ~0.5 participate);
      * frames with a lost 2D track inherit the previous frame's pose
        at confidence <= 0.502 ('lagged'); if the matched SMPL
        projection is close (< 5% of image size) it replaces the
        lagged pose;
      * afterwards, still-missing SMPL predictions are copied from the
        nearest valid frame (marked valid=0.51).

    `smpl_joints_fn(betas (P,10), poses (P,72)) -> (P, 17, 3)` supplies
    the sparse joint regressor (kept injectable so ingestion has no
    hard dependency on the device model).
    """
    smpl_preds = copy.deepcopy(smpl_preds)
    pose2d = pose2d.copy()
    T = len(pose2d)
    N = pose2d.shape[1]

    # Pass 1: pad every frame's predictions to one common body count M
    # (pure numpy, no sequential dependency). M can exceed N when a
    # frame carries more SMPL/ROMP detections than tracked people —
    # the Hungarian match in pass 2 then selects the best N (same as
    # the reference's per-frame `smpl[key][order]` trim).
    M = max([N] + [len(smpl_preds[f]["poses"]) for f in range(T)])
    for f in range(T):
        smpl = smpl_preds[f]
        smpl["valid"] = np.ones((len(smpl["poses"]), 1), np.float32)
        if len(smpl["poses"]) < M:
            miss = M - len(smpl["poses"])
            for key, fillval in (("cam", 1.0), ("valid", 0.0),
                                 ("poses", 0.0), ("betas", 0.0)):
                pad = np.full((miss,) + smpl[key].shape[1:], fillval,
                              smpl[key].dtype)
                smpl[key] = np.concatenate([smpl[key], pad], axis=0)

    # ONE batched sparse-joint regression + weak-persp projection for
    # all T*N bodies. The reference runs SMPL per frame
    # (datautils.py:247-361); per-frame dispatch to a remote TPU costs
    # ~0.5 s in compiles alone (varying per-frame body counts defeat
    # every cache), measured 75 s of an 80 s ingestion. The body count
    # is bucketed to a multiple of 512 so different sequence lengths
    # reuse the jitted program.
    betas_all = np.concatenate([smpl_preds[f]["betas"]
                                for f in range(T)], axis=0)
    poses_all = np.concatenate([smpl_preds[f]["poses"]
                                for f in range(T)], axis=0)
    cams_all = np.concatenate([smpl_preds[f]["cam"]
                               for f in range(T)], axis=0)
    P = T * M
    P_pad = -(-P // 512) * 512
    if P_pad > P:
        betas_all = np.concatenate(
            [betas_all, np.zeros((P_pad - P, betas_all.shape[1]),
                                 betas_all.dtype)])
        poses_all = np.concatenate(
            [poses_all, np.zeros((P_pad - P, poses_all.shape[1]),
                                 poses_all.dtype)])
    joints3d_all = np.asarray(
        smpl_joints_fn(betas_all, poses_all))[:P]
    joints2d_all = np.asarray(weak_perspective_projection(
        joints3d_all, cams_all, image_size)).reshape(T, M, -1, 2)

    # Pass 2: the sequential per-frame assignment (lagged-track
    # imputation reads the previous frame's already-updated pose).
    lagged_tn = np.zeros((T, N), bool)
    for f in range(T):
        smpl = smpl_preds[f]
        p2d = pose2d[f]
        n_people = N
        joints2d = joints2d_all[f]

        # lagged-track imputation for lost 2D poses. Frame 0 has no
        # previous pose to copy (the reference leaves it zero,
        # datautils.py:305 guards f > 0 — reproduced), but a person
        # with no frame-0 evidence is still STALE for lagged_tn
        # purposes: without the flag, a not-yet-entered person's stale
        # run starts at t=1 with frame 0 treated as observed, so
        # gapfill interpolates from frame 0's unconstrained fitted
        # pose instead of holding the true entry pose (round-4
        # advisor).
        lagged = np.zeros((n_people,), bool)
        missing = np.sum(p2d[..., 2] >= 0.2, axis=1) < 2
        lagged[missing] = True
        if f > 0 and missing.any():
            prev = pose2d[f - 1][missing].copy()
            prev[..., 2] = np.clip(prev[..., 2], 0, 0.502)
            p2d[missing] = prev

        conf = 0.502 * smpl["valid"][:, :, None] * np.ones(
            (joints2d.shape[0], joints2d.shape[1], 1), np.float32)
        smpl_as_pose = np.concatenate([joints2d, conf], axis=-1)
        ref_idx, pred_idx = match_pose_sets(p2d, smpl_as_pose, thr=0.501)
        order = pred_idx[ref_idx]
        for key in smpl:
            smpl[key] = smpl[key][order]

        stale = lagged.copy()
        if lagged.any():
            smpl_as_pose = smpl_as_pose[order]
            for n in range(n_people):
                if lagged[n] and pose_distance_2d(
                        p2d[n], smpl_as_pose[n], thr=0.501) \
                        < 0.05 * max(image_size):
                    p2d[n] = smpl_as_pose[n]
                    # refreshed from a current-frame SMPL detection —
                    # not stale for lagged_tn purposes
                    stale[n] = False
        lagged_tn[f] = stale

        pose2d[f] = p2d
        smpl_preds[f] = smpl

    # Impute still-missing SMPL predictions from the nearest valid frame
    N = len(smpl_preds[0]["poses"])
    valid_tn = np.array([[smpl_preds[f]["valid"][n].squeeze()
                          for n in range(N)] for f in range(T)])
    for f in range(T):
        for n in range(N):
            if valid_tn[f, n] >= 1e-4:
                continue
            # Scan outward for the nearest valid frame; past frames win
            # ties, and (reference parity, datautils.py:336-352) frame 0
            # is never used as a source (the reference tests f-k > 0
            # strictly).
            src = None
            for k in range(1, T - 1):
                if f - k > 0 and valid_tn[f - k, n] > 0.7:
                    src = f - k
                    break
                if f + k < T and valid_tn[f + k, n] > 0.7:
                    src = f + k
                    break
            if src is None:
                continue
            smpl_preds[f]["valid"][n] = 0.51
            for key in ("cam", "poses", "betas"):
                smpl_preds[f][key][n] = smpl_preds[src][key][n].copy()

    return smpl_preds, pose2d, lagged_tn


# ---------------------------------------------------------------------------
# Full-sequence assembly
# ---------------------------------------------------------------------------

def decay_lagged_confidences(pose2d: np.ndarray, lagged_tn: np.ndarray,
                             decay: float) -> np.ndarray:
    """Scale the k-th consecutive STALE (lagged, unrefreshed) frame's
    2D confidences by decay**k, per person; runs reset on any frame
    with real evidence. See load_sequence's `lagged_conf_decay`."""
    pose2d = pose2d.copy()
    run = np.zeros(pose2d.shape[1], np.float32)
    for f in range(len(pose2d)):
        run = np.where(lagged_tn[f], run + 1.0, 0.0)
        pose2d[f, ..., 2] *= decay ** run[:, None]
    return pose2d


@dataclass
class SequenceArrays:
    """All aligned per-sequence arrays (T frames, N tracked people)."""

    images: np.ndarray        # (T, H, W, 3) uint8
    depths: np.ndarray        # (T, H, W) f32 normalized disparity
    instances: np.ndarray     # (T, H, W) uint8 person labels
    seg_mask: np.ndarray      # (T, N, H, W) f32 per-person masks
    backmasks: np.ndarray     # (T, H, W) f32 background mask
    pose2d: np.ndarray        # (T, N, 17, 3)
    cam_smpl: np.ndarray      # (T, N, 3) ROMP weak-persp cams
    poses_smpl: np.ndarray    # (T, N, 72)
    betas_smpl: np.ndarray    # (T, N, 10)
    valid_smpl: np.ndarray    # (T, N, 1)
    frame_ids: np.ndarray     # (T,)
    cam: Dict = field(default_factory=dict)  # K, fov, Kd, image_size
    # (T, N) bool: person-frames with NO current-frame 2D evidence
    # (stale lagged-track copies, see assign_smpl_to_poses); consumed
    # by the opt-in gap_interpolate post-fit pass (engine/gapfill.py).
    # None when the caller built the arrays directly (bench/dryrun).
    lagged_tn: Optional[np.ndarray] = None

    @property
    def num_frames(self) -> int:
        return len(self.frame_ids)

    @property
    def num_people(self) -> int:
        return self.pose2d.shape[1]

    @property
    def image_size(self) -> Tuple[int, int]:
        return self.cam["image_size"]

    def __len__(self):
        return self.num_frames

    def sample(self, idx: int) -> Dict[str, np.ndarray]:
        """Per-frame dict view (parity with the reference Dataset's
        __getitem__ keys, datautils.py:531-542)."""
        return {
            "images": self.images[idx],
            "depths": self.depths[idx],
            "seg_mask": self.seg_mask[idx],
            "backmasks": self.backmasks[idx],
            "pose2d": self.pose2d[idx],
            "poses_smpl": self.poses_smpl[idx],
            "betas_smpl": self.betas_smpl[idx],
            "valid_smpl": self.valid_smpl[idx],
            "cam_smpl": self.cam_smpl[idx],
            "frame_ids": self.frame_ids[idx],
            "idxs": idx,
        }


def load_sequence(
    data_root: str,
    smpl_joints_fn: Callable,
    cam_K: Optional[np.ndarray] = None,
    cam_dist_coef=None,
    fov: float = 60.0,
    frame_ids=None,
    max_num_people: Optional[int] = None,
    resize_factor: float = 0.25,
    images_path: str = "images",
    alphapose_path: str = "AlphaPose",
    hrnet_pose_path: str = "HRNet2DPose",
    use_hrnet_pose: bool = False,
    joint_confidence_thr: float = 0.5,
    depth_path: str = "DPT_large_monodepth",
    smpl_pred_path: str = "ROMP_Predictions",
    segmentation_path: str = "Mask2Former_Instances",
    erode_segmentation_iters: int = 0,
    erode_backmask_iters: int = 0,
    renormalize_depth: bool = True,
    post_process_depth: bool = True,
    filter_2dpose: bool = False,
    filter_min_cutoff: float = 0.004,
    filter_beta: float = 30.0,
    min_visibility_fraction: float = 1.0 / 8,
    lagged_conf_decay: float = 1.0,
    id_swap_fix: float = 0.0,
    verbose: bool = True,
) -> SequenceArrays:
    """Load and align a full sequence (datautils.py:364-512 + the
    dataset constructor 515-641). Returns a `SequenceArrays`.

    `lagged_conf_decay` (default 1.0 = reference parity) is an opt-in
    robustness knob for detection dropout: the reference holds a lost
    track at its last seen 2D pose with confidence clipped to 0.502
    (datautils.py:326-333) — just above the 0.5 loss threshold — so
    the optimizer keeps anchoring the person to a STALE position for
    the whole gap. With decay d < 1, the k-th consecutive stale
    frame's confidences are scaled by d**k: after the anchor drops
    below the 0.5 threshold, the reprojection/depth/silhouette losses
    release the person and the temporal regularizers carry them
    through the gap. Measured on the degraded-tier sweep (real chip,
    d=0.8, docs/PARITY.md): positional accuracy improves on
    dropout-heavy inputs (all-combined pck_rel 89.9 -> 93.9) but
    re-entry jitter does NOT drop — the regularizers pull the
    unobserved gap toward zero motion, not toward the GT's motion.
    Frames whose lagged pose was refreshed by a matching
    current-frame SMPL projection are NOT decayed (fresh evidence;
    the run restarts after them).

    `id_swap_fix` (default 0.0 = off = reference parity) is the
    sibling knob for sustained tracker identity switches, forwarded
    to `tracks_to_array` (see its docstring for the position-over-id
    Hungarian margin test and the measured numbers)."""
    all_names = sorted(os.path.splitext(os.path.basename(p))[0]
                       for p in glob.glob(
                           os.path.join(data_root, images_path,
                                        "*.jpg")))
    if frame_ids is not None and len(frame_ids) > 0:
        names = [all_names[i] for i in frame_ids]
    else:
        names = all_names
        frame_ids = range(len(names))

    images = load_images(
        [os.path.join(data_root, images_path, s + ".jpg") for s in names],
        resize_factor)
    image_size = images.shape[1:3][::-1]  # (W, H)

    depths = load_disparity_maps(
        [os.path.join(data_root, depth_path, s + ".png") for s in names],
        image_size, renormalize=renormalize_depth,
        post_process=post_process_depth)

    instances, backmasks = load_segmentation_maps(
        [os.path.join(data_root, segmentation_path, s + ".png")
         for s in names],
        image_size, erode_segmentation_iters, erode_backmask_iters)

    annot = load_tracking_results(
        os.path.join(data_root, alphapose_path, "alphapose-results.json"),
        coef_thr=joint_confidence_thr,
        min_size=0.15 * min(image_size) / resize_factor)
    if use_hrnet_pose:
        hrnet = load_tracking_results(
            os.path.join(data_root, hrnet_pose_path, "hrnet-results.json"),
            coef_thr=0.2,
            min_size=0.15 * min(image_size) / resize_factor,
            ignore_tracking=True)
        annot = merge_pose_streams(annot, hrnet)

    romp = load_romp_sequence(
        [os.path.join(data_root, smpl_pred_path, s + ".npz")
         for s in names])

    # image_names anchors the track array to the FULL frame list so a
    # frame with zero surviving detections (total detector dropout)
    # becomes a zero row instead of shifting the tail (a deliberate
    # robustness deviation — the reference shifts and then crashes,
    # see tracks_to_array)
    pose2d = tracks_to_array(annot, frame_ids=list(frame_ids),
                             max_num_people=max_num_people,
                             verbose=verbose,
                             image_names=[n + ".jpg"
                                          for n in all_names],
                             id_swap_fix=id_swap_fix)
    pose2d[..., 0:2] *= resize_factor

    # joints outside the frame are not visible (datautils.py:441-447)
    pose2d[..., 2] *= ((pose2d[..., 0] >= 0)
                       * (pose2d[..., 0] < image_size[0] - 1)
                       * (pose2d[..., 1] >= 0)
                       * (pose2d[..., 1] < image_size[1] - 1))

    # drop people visible in too few frames (datautils.py:450-456)
    pvis = (pose2d[..., 2] > joint_confidence_thr).max(axis=2).mean(axis=0)
    pose2d = pose2d[:, pvis >= min_visibility_fraction]

    romp, pose2d, lagged_tn = assign_smpl_to_poses(romp, pose2d,
                                                   image_size,
                                                   smpl_joints_fn)
    instances = assign_instances_to_poses(instances, pose2d)

    if filter_2dpose:
        pose2d = _filter_pose2d(pose2d, image_size, joint_confidence_thr,
                                filter_min_cutoff, filter_beta)

    if lagged_conf_decay < 1.0:
        # decay stale-anchor confidences LAST so everything upstream
        # (SMPL Hungarian matching, instance-mask assignment, One-Euro
        # smoothing) sees the reference-parity values; only the
        # optimizer-visible confidences change
        pose2d = decay_lagged_confidences(pose2d, lagged_tn,
                                          lagged_conf_decay)

    seg_mask = split_instance_masks(instances,
                                    num_classes=pose2d.shape[1])

    if cam_K is not None:
        cam_K = resize_factor * np.asarray(cam_K, np.float32)
        cam_K[2, 2] = 1.0
        fov = fov_from_focal(min(image_size), min(cam_K[0, 0],
                                                  cam_K[1, 1]))
    else:
        f = focal_from_fov(min(image_size), fov)
        cam_K = np.array([[f, 0, image_size[0] / 2],
                          [0, f, image_size[1] / 2],
                          [0, 0, 1]], np.float32)

    return SequenceArrays(
        images=images,
        depths=depths.astype(np.float32),
        instances=instances,
        seg_mask=seg_mask,
        backmasks=backmasks.astype(np.float32),
        pose2d=pose2d.astype(np.float32),
        cam_smpl=np.stack([d["cam"] for d in romp]).astype(np.float32),
        poses_smpl=np.stack([d["poses"] for d in romp]).astype(np.float32),
        betas_smpl=np.stack([d["betas"] for d in romp]).astype(np.float32),
        valid_smpl=np.stack([d["valid"] for d in romp]).astype(np.float32),
        frame_ids=np.asarray(list(frame_ids), int),
        cam={"K": cam_K, "fov": fov, "Kd": cam_dist_coef,
             "image_size": tuple(image_size)},
        lagged_tn=lagged_tn,
    )


def _filter_pose2d(pose2d, image_size, joint_thr, min_cutoff, beta):
    """Fwd+bwd One-Euro smoothing of normalized 2D poses
    (datautils.py:466-492), on the JAX device."""
    import jax.numpy as jnp
    from ..ops.one_euro import one_euro_bidirectional

    W, H = image_size
    T, N = pose2d.shape[:2]
    norm = pose2d[..., 0:2] / np.array([W, H], np.float32)
    valid = np.repeat(pose2d[..., 2:] > joint_thr, 2, axis=-1)
    smoothed = np.asarray(one_euro_bidirectional(
        jnp.asarray(norm.reshape(T, N * 17, 2)),
        jnp.asarray(valid.reshape(T, N * 17, 2).astype(np.float32)),
        min_cutoff=min_cutoff, beta=beta))
    out = pose2d.copy()
    out[..., 0:2] = smoothed.reshape(T, N, 17, 2) * np.array(
        [W, H], np.float32)
    return out
