"""Quantization as a pytree transformation (the TPU-native replacement for
the reference's module surgery).

The reference rewrites the module tree (`QuantModel`/`QuantModule`,
quantization/quant_model.py:10-98, quant_layer.py:11-138) and keeps mutable
quantizer state on each wrapper. Here the same capabilities are three pure
pieces:

* **leaf discovery** — walk the parameter pytree and find quantizable
  leaves by convention (``w`` conv/linear kernels, ``gamma`` GDN kernels,
  ``scale`` LayerNorm gains), replacing the isinstance-based wrapping;
* **scale calibration** — build a ``{path: QParams}`` state with the
  vmapped channel-wise search (replaces init-on-first-forward,
  quantizer.py:163-173);
* **weight substitution** — produce a quantized params pytree given
  per-leaf modes ('fp' | 'nearest' | 'soft' | 'hard'), usable inside
  jit/grad. This one function expresses every quant-state combination the
  reference toggles through `set_quant_state` flags.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Optional, Sequence, Tuple

import jax

from ..models.base import get_leaf, set_leaf
from ..ops import adaround as AR
from ..ops import quant as Q

QUANT_KEYS = ("w", "gamma", "scale")


@dataclasses.dataclass(frozen=True)
class WeightQuantConfig:
    """Mirror of the reference's wq_params dict (main2.py:175)."""

    n_bits: int = 8
    channel_wise: bool = True
    scale_method: str = "max"
    sym: bool = False
    # per-leaf bit overrides (first/last-layer-8bit policy,
    # quant_model.py:81-91)
    bit_overrides: Tuple[Tuple[str, int], ...] = ()

    def bits_for(self, path: str) -> int:
        for p, b in self.bit_overrides:
            if p == path:
                return b
        return self.n_bits


@dataclasses.dataclass(frozen=True)
class LeafInfo:
    path: str
    channel_axis: Optional[int]  # None -> per-tensor


def find_quant_leaves(params, prefix: str = "") -> Tuple[LeafInfo, ...]:
    """Discover quantizable parameter leaves in deterministic (definition)
    order. Only dict nodes are traversed — entropy-model NamedTuples and
    other structured leaves are intentionally opaque (the reference likewise
    never quantizes entropy-model internals)."""
    out = []
    if not isinstance(params, dict):
        return ()
    for key, val in params.items():
        path = f"{prefix}{key}"
        if isinstance(val, dict):
            out.extend(find_quant_leaves(val, path + "/"))
        elif key in QUANT_KEYS and hasattr(val, "ndim"):
            if val.ndim >= 2:
                axis = val.ndim - 1  # output channels last (HWIO / (in,out))
            else:
                axis = None  # 1-D (LayerNorm scale): per-tensor
            out.append(LeafInfo(path, axis))
    return tuple(out)


def init_weight_qstate(params, leaves: Sequence[LeafInfo],
                       cfg: WeightQuantConfig) -> Dict[str, Q.QParams]:
    """Calibrate scale/zero-point for every leaf (vmapped channel-wise).

    The whole init is ONE jitted program — large models have hundreds of
    leaves and per-leaf eager dispatch would dominate startup."""
    import jax

    def compute(params):
        qstate = {}
        for leaf in leaves:
            w = get_leaf(params, leaf.path)
            bits = cfg.bits_for(leaf.path)
            if cfg.channel_wise and leaf.channel_axis is not None:
                qp = Q.init_scale_channelwise(w, bits, cfg.scale_method,
                                              cfg.sym, leaf.channel_axis)
            else:
                qp = Q.init_scale(w.ravel(), bits, cfg.scale_method,
                                  cfg.sym)
            qstate[leaf.path] = qp
        return qstate

    return jax.jit(compute)(params)


def init_alphas(params, qstate: Mapping[str, Q.QParams],
                paths: Sequence[str]) -> Dict[str, jax.Array]:
    """AdaRound alpha init for the given leaves (quantizer.py:454-466)."""
    return {p: AR.init_alpha(get_leaf(params, p), qstate[p]) for p in paths}


def quantize_leaves(params, qstate: Mapping[str, Q.QParams],
                    modes: Mapping[str, str], cfg: WeightQuantConfig,
                    alphas: Optional[Mapping[str, jax.Array]] = None):
    """Return a new params pytree with each leaf transformed per its mode.

    modes[path] in {'fp', 'nearest', 'soft', 'hard'}; leaves absent from
    ``modes`` stay FP32. 'soft'/'hard' require ``alphas[path]``. Pure and
    differentiable (gradients flow to ``alphas`` through 'soft' leaves).
    """
    out = params
    for path, mode in modes.items():
        if mode == "fp":
            continue
        w = get_leaf(params, path)
        qp = qstate[path]
        bits = cfg.bits_for(path)
        if mode == "nearest":
            wq = Q.fake_quant(w, qp, bits)
        elif mode in ("soft", "hard"):
            wq = AR.adaround_fake_quant(w, qp, alphas[path], bits,
                                        soft=(mode == "soft"))
        else:
            raise ValueError(f"unknown mode {mode!r} for {path}")
        out = set_leaf(out, path, wq)
    return out


def stage_paths(leaves: Sequence[LeafInfo],
                stage_leaf_paths: Sequence[str]) -> Tuple[str, ...]:
    known = {l.path for l in leaves}
    return tuple(p for p in stage_leaf_paths if p in known)


__all__ = ["QUANT_KEYS", "WeightQuantConfig", "LeafInfo",
           "find_quant_leaves", "init_weight_qstate", "init_alphas",
           "quantize_leaves", "stage_paths"]
