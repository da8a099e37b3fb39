"""Model registry + checkpoint loading.

Parity with the reference's model/checkpoint layer (T15: `nic_tic`
quality registry ckpts/image.py:60-115, pickled-model loading
main2.py:160-162, TinyLIC `.pth.tar` quantize.py:133). Checkpoints load
from this framework's native .npz pytrees or are converted on the fly
from torch state dicts (utils.torch_convert).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax

from ..utils import checkpoint as ckpt
from ..utils import torch_convert
from .cheng2020 import cheng2020, cheng2020_attn, cheng2020_gmm
from .lu2022 import lu2022
from .minnen2018 import minnen2018
from .tinylic import tinylic

log = logging.getLogger(__name__)

ARCHS = ("Minnen2018", "Cheng2020", "Cheng2020Attn", "Cheng2020GMM",
         "Lu2022", "TinyLIC")


def build_model(arch: str, quality: int = 6, lam: Optional[float] = None,
                metric: str = "mse"):
    if arch == "Minnen2018":
        return minnen2018(quality)
    if arch == "Cheng2020":
        return cheng2020(quality)
    if arch == "Cheng2020Attn":
        return cheng2020_attn(quality)
    if arch == "Cheng2020GMM":
        return cheng2020_gmm(quality)
    if arch == "Lu2022":
        return lu2022(quality)
    if arch == "TinyLIC":
        if lam is None:
            # quality selects the rate-condition lambda (the model is
            # variable-rate: one parameter set serves every quality);
            # the metric picks the λ grid (mse vs ms-ssim objectives)
            from ..utils.config import lambda_for
            lam = lambda_for(quality, metric)
        return tinylic(lam=lam)
    raise ValueError(f"unknown arch {arch!r} (have {ARCHS})")


def load_params(model, arch: str, path: Optional[str] = None,
                seed: int = 0):
    """Load parameters from a checkpoint, or random-init when no path is
    given (pretrained reference checkpoints are not redistributable with
    this repo; conversion from them is supported via torch state dicts)."""
    if not path:
        log.info("no checkpoint for %s: random init (seed=%d)", arch, seed)
        return model.init(jax.random.PRNGKey(seed))
    if path.endswith(".npz"):
        return ckpt.load_pytree(path)
    if path.endswith((".pt", ".pth", ".tar", ".pth.tar")):
        import torch
        obj = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(obj, "state_dict"):
            obj = obj.state_dict()
        if isinstance(obj, dict) and "state_dict" in obj:
            obj = obj["state_dict"]
        return torch_convert.convert(arch, obj)
    raise ValueError(f"unrecognized checkpoint format: {path}")


__all__ = ["ARCHS", "build_model", "load_params"]
