"""Prediction driver: init + stage-1 fit + output pickles.

Capability parity with reference `mhmocap/predict.py` (Predictor,
predict.py:260-357): wraps an ingested sequence and the sequence
optimizer, runs the init stage and the stage-1 fit, pickles
`optvar_init.pkl` / `optvar_stage1.pkl` with the reference's schema,
and optionally writes loss-curve plots, per-frame overlay renders and
`visualization_data_stage1.pkl`.

The fit host loop mirrors the reference cycle schedule
(optimizer.py:375-602): `num_iter` cycles; One-Euro filtered targets
refresh every `update_filters_every` cycles from cycle >= 30; the
scene point cloud refreshes every cycle from cycle >= 30. Each of
those is a single jitted device program (see engine/optimizer.py).
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.smpl import SMPLModel
from ..data.ingestion import SequenceArrays
from . import optimizer as E


def io_mkdir(path: str):
    os.makedirs(path, exist_ok=True)


class Predictor:
    """Run the two-stage optimization for one ingested sequence."""

    def __init__(self, seq: SequenceArrays, model: SMPLModel,
                 output_path: str, parsed_args, **_):
        io_mkdir(output_path)
        self.seq = seq
        self.model = model
        self.output_path = output_path
        self.args = parsed_args
        self.num_iter = parsed_args.num_iter
        self.save_visualizations = getattr(
            parsed_args, "save_visualizations", False)

        W, H = seq.image_size
        self.cfg = E.EngineConfig(
            image_size=(W, H),
            num_people=seq.num_people,
            num_frames=seq.num_frames,
            chunk=max(int(getattr(parsed_args, "batch_size", 10)), 2),
            window=min(int(getattr(parsed_args, "raster_window", 128)),
                       min(W, H)),
            joint_confidence_thr=getattr(
                parsed_args, "joint_confidence_thr", 0.5),
            cam_dist_coef=(tuple(seq.cam["Kd"])
                           if seq.cam.get("Kd") is not None else None),
        )
        self.coefs = {
            "proj2d": parsed_args.proj2d_loss_coef,
            "depth": parsed_args.depth_loss_coef,
            "silhouette": parsed_args.silhouette_loss_coef,
            "reg_poses": parsed_args.reg_poses_coef,
            "reg_scales": parsed_args.reg_scales_coef,
            "reg_velocity": parsed_args.reg_velocity_coef,
            "reg_verts_filter": parsed_args.reg_verts_filter_coef,
            "reg_contact": parsed_args.reg_contact_coef,
            "reg_foot_sliding": parsed_args.reg_foot_sliding_coef,
        }

    # ------------------------------------------------------------------
    def run(self) -> Dict:
        seq, cfg = self.seq, self.cfg

        params, init_hist, optimize_scale = E.init_params(
            self.model, seq.pose2d, seq.poses_smpl, seq.betas_smpl,
            seq.cam["K"], cfg,
            scale_factor=getattr(self.args, "scale_factor", None),
            num_iter=100)

        init_optvar = E.get_optimized_variables(
            params, cfg, seq.valid_smpl)
        init_optvar["pose2d"] = seq.pose2d
        with open(os.path.join(self.output_path, "optvar_init.pkl"),
                  "wb") as f:
            pickle.dump(init_optvar, f)

        init_log = [{"loss_2d": v} for v in init_hist]
        if self.save_visualizations:
            from ..viz.export import save_visualization_init_data
            save_visualization_init_data(
                self.output_path, seq, self.model, init_optvar,
                init_hist,
                joints_thr=cfg.joint_confidence_thr)

        log, scene_host = self.fit(params, optimize_scale)
        params = self._params

        stage1_optvar = E.get_optimized_variables(
            params, cfg, seq.valid_smpl, scene=scene_host)
        with open(os.path.join(self.output_path, "optvar_stage1.pkl"),
                  "wb") as f:
            pickle.dump(stage1_optvar, f)

        if self.save_visualizations:
            from ..viz.export import save_visualization_stage1
            save_visualization_stage1(
                self.output_path, seq, self.model, stage1_optvar,
                init_optvar["pose2d"], log)

        return {
            "init_log_loss": init_log,
            "init_optvar": init_optvar,
            "stage1_log": log,
            "stage1_optvar": stage1_optvar,
        }

    # ------------------------------------------------------------------
    def fit(self, params: E.StageParams, optimize_scale: bool,
            verbose: bool = True):
        """Stage-1 cycle loop (reference optimizer.py:324-602)."""
        seq, cfg, model = self.seq, self.cfg, self.model
        data = E.prepare_seq_data(seq, cfg)
        betas_ref = jnp.asarray(
            np.mean(seq.betas_smpl, axis=0, keepdims=True))
        aux = E.init_aux(cfg, model.num_vertices, betas_ref)
        opt = E.make_stage1_optimizer()
        opt_state = opt.init(params)

        log = []
        t_start = time.time()
        for cycle in range(self.num_iter):
            if (cycle >= cfg.warmup_cycles
                    and cycle % cfg.update_filters_every == 0):
                dvf = E.update_filtered_targets(params, model, cfg)
                aux = aux._replace(verts_filt_diff=dvf,
                                   have_filters=jnp.ones(()))
            if (cycle >= cfg.warmup_cycles
                    and cycle % cfg.scene_update_every == 0):
                pcd = E.update_scene(params, data, cfg)
                aux = aux._replace(scene=pcd, have_scene=jnp.ones(()))

            params, opt_state, loss, parts = E.stage1_cycle(
                params, opt_state, model, data, aux, self.coefs, cfg,
                optimize_scale=optimize_scale)
            parts = np.asarray(parts)
            log.append(dict(zip(E.LOG_KEYS, parts.tolist())))
            if verbose and (cycle % 25 == 0 or cycle == self.num_iter - 1):
                print(f"cycle {cycle:4d} loss={float(loss):.4f} "
                      f"({(time.time() - t_start):.1f}s)")

        self._params = params
        scene_host = self._final_scene(params, data, aux)
        return log, scene_host

    # ------------------------------------------------------------------
    def _final_scene(self, params, data, aux) -> Optional[Dict]:
        """Final scene RGB-D for the output pickle: median background
        image over time + iterative fill-in (optimizer.py:595-600),
        plus the last scene depth/mask."""
        seq, cfg = self.seq, self.cfg
        if float(aux.have_scene) == 0.0:
            return None
        from ..ops.image import fillin_masked

        backmask = (seq.backmasks > 0.5)
        ma_img = np.ma.array(
            seq.images,
            mask=np.repeat((~backmask)[..., None], 3, axis=-1))
        scene_img = np.ma.median(ma_img, axis=0).data.astype(np.float32)
        scene_mask = (~np.all(backmask == 0, axis=0)).astype(np.float32)

        filled = []
        mask_f = None
        for c in range(3):
            xf, mf = fillin_masked(jnp.asarray(scene_img[..., c]),
                                   jnp.asarray(scene_mask), 11)
            filled.append(np.asarray(xf))
            mask_f = np.asarray(mf)
        scene_img = np.stack(filled, axis=-1).astype(np.uint8)

        return {
            "scene_depth": np.asarray(aux.scene.depth),
            "scene_img": scene_img,
            "scene_mask": mask_f,
        }
