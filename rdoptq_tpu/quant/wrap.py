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


def group_leaves(params, leaves: Sequence[LeafInfo],
                 cfg: WeightQuantConfig):
    """Group leaves by (shape, dtype, bits, channel_axis) so same-shaped
    leaves share ONE vmapped program. Transformer zoo models repeat a few
    block shapes hundreds of times (Lu2022 q6: 232 leaves, 20 unique
    shapes; TinyLIC: 263/41) — a single flat program quantizing every
    leaf takes tens of minutes to compile over the remote-compile tunnel,
    while per-shape programs compile in seconds and cache across models."""
    groups: Dict[tuple, list] = {}
    for leaf in leaves:
        w = get_leaf(params, leaf.path)
        axis = leaf.channel_axis if cfg.channel_wise else None
        key = (tuple(w.shape), str(w.dtype), cfg.bits_for(leaf.path), axis)
        groups.setdefault(key, []).append(leaf.path)
    return groups


import functools as _ft


def leaf_qp_shape(w_shape: tuple, axis) -> tuple:
    """Shape of a leaf's delta/zero_point: broadcastable singletons with
    the channel count at ``axis`` (channel-wise), or scalar."""
    if axis is None:
        return ()
    shape = [1] * len(w_shape)
    shape[axis] = w_shape[axis]
    return tuple(shape)


@_ft.lru_cache(maxsize=64)
def _qstate_packed_fn(spec, method: str, sym: bool):
    """ONE jitted program computing every leaf's scale/zero-point:
    same-shaped leaves run as a vmapped subgraph (program size scales
    with unique shapes, not leaf count), and results come back as two
    flat buffers — a single device->host transfer. Anything per-leaf
    (eager slices, per-array device_get) pays a ~10-50 ms round trip
    over the remote-compile tunnel, which dominates at transformer-zoo
    leaf counts (Lu2022 q6: 232 leaves)."""
    import jax
    import jax.numpy as jnp

    def compute(params):
        fd, fz = [], []
        for paths, bits, axis in spec:
            ws = jnp.stack([get_leaf(params, p) for p in paths])

            def one(w, bits=bits, axis=axis):
                if axis is not None:
                    return Q.init_scale_channelwise(w, bits, method, sym,
                                                    axis)
                return Q.init_scale(w.ravel(), bits, method, sym)

            qp = jax.vmap(one)(ws)
            fd.append(qp.delta.ravel().astype(jnp.float32))
            fz.append(qp.zero_point.ravel().astype(jnp.float32))
        return jnp.concatenate(fd), jnp.concatenate(fz)

    return jax.jit(compute)


def init_weight_qstate(params, leaves: Sequence[LeafInfo],
                       cfg: WeightQuantConfig) -> Dict[str, Q.QParams]:
    """Calibrate scale/zero-point for every leaf (vmapped channel-wise).

    One jitted program for the whole init (grouped by unique leaf shape,
    see :func:`_qstate_packed_fn`); the returned QParams are host numpy
    arrays that re-enter later jitted programs as ordinary arguments."""
    import numpy as np

    groups = group_leaves(params, leaves, cfg)
    spec = tuple((tuple(paths), bits, axis)
                 for (shape, _, bits, axis), paths in groups.items())
    fd, fz = jax.device_get(
        _qstate_packed_fn(spec, cfg.scale_method, cfg.sym)(params))

    qstate: Dict[str, Q.QParams] = {}
    off = 0
    for (shape, _, bits, axis), paths in groups.items():
        qshape = leaf_qp_shape(shape, axis)
        n = int(np.prod(qshape, dtype=np.int64)) if qshape else 1
        for p in paths:
            qstate[p] = Q.QParams(fd[off:off + n].reshape(qshape),
                                  fz[off:off + n].reshape(qshape))
            off += n
    return qstate


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
