"""Small I/O helpers (parity with reference mhmocap/io.py)."""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image


def io_mkdir(newpath: str):
    """mkdir -p (reference io.py:6-11)."""
    Path(newpath).mkdir(parents=True, exist_ok=True)


def save_image(img, filename: str):
    """Save a [0, 1] float array (or uint8) as an image file
    (reference io.py:14-26; accepts jax arrays instead of torch
    tensors)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (255.9 * np.clip(img, 0.0, 1.0)).astype(np.uint8)
    Image.fromarray(img).save(filename)
