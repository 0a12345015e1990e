"""Body-model resolution: real SMPL_NEUTRAL.pkl or synthetic fallback."""

from __future__ import annotations

import os

from .smpl import SMPLModel, load_smpl_model
from .synthetic import make_synthetic_smpl


def resolve_smpl_model(parameters_path: str,
                       allow_synthetic: bool = True) -> SMPLModel:
    """Load SMPL from `parameters_path` (a directory holding
    SMPL_NEUTRAL.pkl plus the auxiliary regressor .npy files, like the
    reference's model_data/parameters). When the pickle is absent and
    `allow_synthetic` is set (or MHMOCAP_SYNTHETIC_SMPL=1), fall back
    to the deterministic synthetic model so demo/e2e runs work without
    the license-gated download."""
    pkl = os.path.join(parameters_path, "SMPL_NEUTRAL.pkl")
    if os.path.exists(pkl):
        return load_smpl_model(pkl, parameters_path=parameters_path)
    env = os.environ.get("MHMOCAP_SYNTHETIC_SMPL", "")
    if allow_synthetic or env:
        print("WARNING: SMPL_NEUTRAL.pkl not found in "
              f"{parameters_path}; using the synthetic body model. "
              "Download the real model for meaningful results.")
        # MHMOCAP_SYNTHETIC_SMPL may carry a vertex count (e.g. "512")
        # for quick CPU demo runs; any other value means full size.
        num_v = int(env) if env.isdigit() and int(env) > 1 else 6890
        return make_synthetic_smpl(num_vertices=num_v)
    raise FileNotFoundError(
        f"SMPL_NEUTRAL.pkl not found under {parameters_path}")
