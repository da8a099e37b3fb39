"""True-INT8 serving path: int8×int8 MXU compute, not dequantize-then-f32.

The reference's INT8 model is *slower* than its FP32 model (0.375 s vs
0.323 s encode on a 2K image, single_test.ipynb) because it stores uint8
weights but dequantizes on the fly and convolves in float. On TPU, int8
convolutions run natively on the MXU at bf16 throughput, so this module
transforms a parameter pytree into integer-kernel nodes
(``{"w_int8", "s_w", "b"}``) that `models.layers.conv2d/conv_transpose2d/
linear` execute as int8→int32 accumulation with per-output-channel
dequantization of the accumulator and dynamic per-tensor int8 activation
quantization — W8A8 semantics with integer compute.

Kernels are quantized SYMMETRICALLY (zero-point 0) as the MXU int8 path
requires; masked context convs, GDN gammas and LayerNorm scales stay FP32
(negligible FLOPs, quantization there handled by the fake-quant path).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import get_leaf, set_leaf
from . import wrap

# parameter subtrees that must keep float kernels (masked convs multiply
# the kernel by a mask before use)
_FP_SUBTREES = ("context", "sc")


def int8_serving_params(params, skip_subtrees: Tuple[str, ...] = (),
                        act_scales: Optional[Dict[str, float]] = None):
    """Transform conv/linear leaves into int8-kernel nodes. Returns a new
    pytree runnable by the unmodified model code.

    ``act_scales`` (from :func:`calibrate_act_scales`) bakes a static
    per-node input scale ``s_x`` into each integer node, removing the
    dynamic per-call abs-max reduction — an extra full-tensor HBM pass
    per conv that made dynamic-int8 serving slower than f32 (the same
    dequantize-in-the-loop trap as the reference's INT8 TinyLIC,
    single_test.ipynb cells 6/15)."""
    leaves = wrap.find_quant_leaves(params)
    out = params
    skip = _FP_SUBTREES + tuple(skip_subtrees)
    for leaf in leaves:
        root = leaf.path.split("/", 1)[0]
        if root in skip:
            continue
        if not leaf.path.endswith("/w"):
            continue  # gamma (GDN) / scale (LN) stay float
        w = get_leaf(params, leaf.path)
        if w.ndim not in (2, 4):
            continue
        if w.ndim == 4 and w.shape[2] == 1 and w.shape[3] > 1:
            continue  # depthwise kernel (HW1C): custom conv impls read
            # p["w"] directly, and the FLOPs are negligible anyway
        axis = w.ndim - 1
        red = tuple(i for i in range(w.ndim) if i != axis)
        s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=red), 1e-8) / 127.0
        w_int8 = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
        node_path = leaf.path.rsplit("/", 1)[0]
        node = dict(get_leaf(params, node_path))
        del node["w"]
        node["w_int8"] = w_int8
        node["s_w"] = s_w
        if act_scales and node_path in act_scales:
            node["s_x"] = jnp.float32(max(act_scales[node_path], 1e-8)
                                      / 127.0)
        out = set_leaf(out, node_path, node)
    return out


def _node_paths(params, prefix: str = "") -> Dict[int, str]:
    """Map ``id(node_dict) -> path`` for every float-kernel node. The
    eager calibration forward indexes the SAME dict objects out of the
    tree, so object identity keys the probe reports back to paths."""
    out = {}
    if isinstance(params, dict):
        if "w" in params and getattr(params["w"], "ndim", 0) in (2, 4):
            out[id(params)] = prefix.rstrip("/")
        for k, v in params.items():
            out.update(_node_paths(v, f"{prefix}{k}/"))
    elif isinstance(params, (tuple, list)):
        for i, v in enumerate(params):
            out.update(_node_paths(v, f"{prefix}{i}/"))
    return out


def calibrate_act_scales(model, params, images, percentile: float = 100.0,
                         headroom: float = 1.0) -> Dict[str, float]:
    """Per-node input abs-max over calibration images — the static
    counterpart of the reference's dynamic `ActQuantizer` (the
    'generator' single-forward calibration, quantize.py:95-113, made
    static so serving never pays the runtime reduction).

    Serving inputs that exceed the calibrated range are hard-clipped at
    ±127; ``percentile`` < 100 clips calibration outliers (trading rare
    saturation for finer resolution on the bulk), ``headroom`` > 1
    multiplies the final scale to absorb out-of-distribution inputs.
    Each returned entry also lands in ``meta`` as
    ``{path: (scale, coverage)}`` where coverage = fraction of observed
    |x| values within the chosen range, so exporters can record how well
    the calibration set covered each node.

    Runs the FP32 forward EAGERLY (no jit) with a layer probe; per-op
    dispatch cost is irrelevant for a handful of calibration images.
    Returns ``{node_path: abs_max}``."""
    from ..models import layers as L

    paths = _node_paths(params)
    # per node: list of per-call |x| quantile curves (101 points) — a
    # bounded summary (full tensors per node per image would blow host
    # memory at transformer node counts)
    grid = np.linspace(0.0, 1.0, 101)
    obs: Dict[str, list] = {}

    def probe(node, x):
        path = paths.get(id(node))
        if path is not None:
            a = np.abs(np.asarray(x, np.float32)).ravel()
            obs.setdefault(path, []).append(np.quantile(a, grid))

    L._ACT_PROBE = probe
    try:
        for img in images:
            model.forward(params, jnp.asarray(img))
    finally:
        L._ACT_PROBE = None

    amax: Dict[str, float] = {}
    coverage: Dict[str, float] = {}
    for path, curves in obs.items():
        # max over calls of the per-call percentile: a conservative
        # (>=) estimate of the pooled percentile
        v = max(float(np.interp(percentile / 100.0, grid, q))
                for q in curves) * headroom
        amax[path] = v
        # coverage = mean fraction of observed |x| within the final range
        cov = [float(np.interp(v, q, grid)) if v < q[-1] else 1.0
               for q in curves]
        coverage[path] = round(float(np.mean(cov)), 6)
    amax["__coverage__"] = coverage  # type: ignore[assignment]
    return amax


__all__ = ["int8_serving_params", "calibrate_act_scales"]
