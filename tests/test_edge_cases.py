"""Degenerate-configuration regression tests: one person, one frame."""

import tempfile
import types

import numpy as np
import jax.numpy as jnp
import pytest

from mhmocap_tpu.data.synthetic import generate_sequence
from mhmocap_tpu.models.synthetic import make_synthetic_smpl
from mhmocap_tpu.data.ingestion import load_sequence
from mhmocap_tpu.engine.predictor import Predictor
from mhmocap_tpu.models.smpl import smpl_forward


def _args():
    return types.SimpleNamespace(
        num_iter=2, batch_size=2, save_visualizations=False,
        proj2d_loss_coef=1.0, depth_loss_coef=0.05,
        silhouette_loss_coef=0.1, reg_poses_coef=0.002,
        reg_scales_coef=1e-4, reg_velocity_coef=0.05,
        reg_verts_filter_coef=0.002, reg_contact_coef=0.001,
        reg_foot_sliding_coef=0.01, joint_confidence_thr=0.5,
        raster_window=32, frame_bucket=1, spmd=False)


def _run(num_frames, num_people):
    root = tempfile.mkdtemp()
    model = make_synthetic_smpl(num_vertices=256, seed=6)
    generate_sequence(root, num_frames=num_frames,
                      num_people=num_people, image_size=(64, 64),
                      model=model, seed=6)

    def jf(b, p):
        out = smpl_forward(model, jnp.asarray(b), jnp.asarray(p))
        return np.asarray(out["joints_alphapose"])

    seq = load_sequence(root, jf, resize_factor=1.0,
                        post_process_depth=False,
                        renormalize_depth=False)
    out = Predictor(seq, model, tempfile.mkdtemp(), _args()).run()
    ov = out["stage1_optvar"]
    assert ov["poses_T"].shape == (num_frames, num_people, 1, 3)
    assert np.isfinite(ov["poses_T"]).all()
    assert np.isfinite(ov["poses_smpl"]).all()


@pytest.mark.slow
def test_single_person():
    _run(num_frames=4, num_people=1)


@pytest.mark.slow
def test_single_frame():
    """num_frames=1: the reference documents that temporal losses are
    skipped (optimizer.py:175-177); here the pair-validity masks make
    them vanish."""
    _run(num_frames=1, num_people=2)
