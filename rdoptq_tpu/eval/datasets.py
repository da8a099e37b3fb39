"""Dataset loading for evaluation and calibration.

Parity with the reference's data plumbing (`datasets/dataset.py:8-55`,
`test_datasets.py:76-117` loaders): Kodak24 / Tecnick / CLIC directories of
PNGs for evaluation, and random 256² crops as the calibration set. Images
are NHWC float32 in [0, 1]. Host-side IO is numpy/PIL; batching for the
device mesh happens in the harness.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

# Kodak ships with the reference checkout (light-uniform-PTQ/data/Kodak);
# fall back to any user-provided directory.
DEFAULT_KODAK = "/root/reference/light-uniform-PTQ/data/Kodak"


def load_image(path: str) -> np.ndarray:
    img = Image.open(path).convert("RGB")
    return np.asarray(img, dtype=np.float32)[None] / 255.0


def load_dir(directory: str, limit: Optional[int] = None) -> List[np.ndarray]:
    """Load every PNG/JPG in a directory (sorted), each as (1, H, W, 3)."""
    names = sorted(f for f in os.listdir(directory)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    if limit:
        names = names[:limit]
    return [load_image(os.path.join(directory, n)) for n in names]


def kodak(directory: str = DEFAULT_KODAK,
          limit: Optional[int] = None) -> List[np.ndarray]:
    return load_dir(directory, limit)


def random_crops(images: Sequence[np.ndarray], num: int, size: int = 256,
                 seed: int = 1005) -> np.ndarray:
    """Random-crop calibration patches (the reference crops 256² patches
    from CLIC41, config.yaml:58-61; `get_train_samples` concatenates to
    ``num`` samples, datasets/dataset.py:45-55)."""
    rng = np.random.default_rng(seed)
    out = []
    while len(out) < num:
        img = images[rng.integers(len(images))][0]
        h, w = img.shape[:2]
        if h < size or w < size:
            continue
        i = rng.integers(0, h - size + 1)
        j = rng.integers(0, w - size + 1)
        out.append(img[i:i + size, j:j + size, :])
    return np.stack(out)


__all__ = ["DEFAULT_KODAK", "load_image", "load_dir", "kodak",
           "random_crops"]
