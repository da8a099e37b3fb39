"""Conv + BatchNorm folding as a pytree transformation.

Parity with the reference's `fold_bn` module
(task-oriented-PTQ/quantization/fold_bn.py:14-80 and the light variant):
classic inference-time fusion  w' = w·γ/σ,  b' = (b − µ)·γ/σ + β. The LIC
model zoo itself contains no BatchNorm (as in the reference, where the
folding pass simply finds nothing), but the capability is part of the
quantization toolbox for models that do.

Convention: a foldable pair is a dict node holding a conv ``{"w", "b"}``
and a sibling ``"bn"`` subtree ``{"mean", "var", "scale", "bias", "eps"}``
(scale/bias optional for non-affine BN). Folding removes the ``bn`` node.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def fold_conv_bn(conv: Dict, bn: Dict) -> Dict:
    """Return the fused conv params (kernel HWIO: output channel last)."""
    eps = bn.get("eps", 1e-5)
    inv_std = 1.0 / jnp.sqrt(bn["var"] + eps)
    gamma = bn.get("scale", jnp.ones_like(bn["mean"]))
    beta = bn.get("bias", jnp.zeros_like(bn["mean"]))
    factor = gamma * inv_std  # per output channel
    w = conv["w"] * factor  # broadcasts over the trailing (output) axis
    b = conv.get("b", jnp.zeros_like(bn["mean"]))
    b = (b - bn["mean"]) * factor + beta
    return {"w": w, "b": b}


def search_fold_and_remove_bn(params):
    """Recursively fold every ``{conv..., "bn": {...}}`` pattern
    (the reference's `search_fold_and_remove_bn`, fold_bn.py:68-80).
    Returns a new pytree with fused convs and the bn nodes removed."""
    if not isinstance(params, dict):
        return params
    out = {}
    if "w" in params and "bn" in params:
        fused = fold_conv_bn(params, params["bn"])
        for k, v in params.items():
            if k in ("w", "b", "bn"):
                continue
            out[k] = search_fold_and_remove_bn(v)
        out.update(fused)
        return out
    for k, v in params.items():
        out[k] = search_fold_and_remove_bn(v)
    return out


__all__ = ["fold_conv_bn", "search_fold_and_remove_bn"]
