"""Light uniform PTQ: calibration-free one-shot INT8 / FP16 conversion.

Capability parity with the reference's light-uniform-PTQ sub-project
(`quant_int/quantizer.py`, `quant_int/quant_layer.py`, `quantize.py`):
channel-wise INT8 weights (max-range scales), true integer storage (uint8
weights, int16 rescaled biases in the layer-wise path), dynamic Q8.8
fixed-point activation quantization, and FP16 (bfloat16 on TPU) casting.

TPU-native differences:
* scales come straight from the weight pytree — no "generator" forward
  pass is needed (the reference runs one image through the net only to
  trigger init-on-first-forward, quantize.py:95-113);
* integer storage is a plain pytree of uint8/int16 arrays + QParams —
  serializable with numpy/orbax, which removes the reference's 2k-line
  vendored torch serialization workaround (quant_int/load.py, README.md:95);
* the dequantize-on-the-fly forward is a pytree transformation, so the
  same model code runs FP32, INT8 or bf16.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import get_leaf, set_leaf
from ..ops import quant as Q
from . import wrap


@dataclasses.dataclass(frozen=True)
class LightConfig:
    n_bits: int = 8
    channel_wise: bool = True
    scale_method: str = "max"
    act_quant: bool = True       # dynamic Q8.8 activations
    bias_bits: int = 16          # layer-wise path stores int16 biases
    # subtrees to leave FP32: ("g_a", "g_s") reproduces the reference's
    # QuantCodingModel — only the hyper + entropy-coding path quantized
    # (quant_int/quant_coding_model.py:23-26, light README.md:91)
    skip_subtrees: Tuple[str, ...] = ()


@dataclasses.dataclass
class LightQuantized:
    """True-integer model artifact: uint8 weight leaves + scales +
    (optionally) int16 biases; every other leaf kept as-is."""

    int_weights: Dict[str, np.ndarray]
    qparams: Dict[str, Q.QParams]
    int_biases: Dict[str, np.ndarray]
    bias_scales: Dict[str, jax.Array]
    base_params: dict  # pytree with quantized leaves zeroed (structure donor)
    cfg: LightConfig


import functools as _ft


@_ft.lru_cache(maxsize=16)
def _packed_quant_fn(spec, method: str):
    """ONE jitted program for the whole one-shot conversion: same-shaped
    leaves run as a vmapped subgraph (compile time scales with unique
    shapes — TinyLIC: 41 vs 263 leaves; a flat per-leaf program takes
    tens of minutes to compile over the remote tunnel), and the integer
    artifact comes back as 3 flat buffers — one dispatch, one
    device->host transfer (per-leaf transfers are ~10-50 ms RTT each)."""

    def compute(params):
        fw, fd, fz = [], [], []
        for paths, bits, axis in spec:
            ws = jnp.stack([get_leaf(params, p) for p in paths])

            def one(w, bits=bits, axis=axis):
                if axis is not None:
                    qp = Q.init_scale_channelwise(w, bits, method, False,
                                                  axis)
                else:
                    qp = Q.init_scale(w.ravel(), bits, method, False)
                return Q.quantize(w, qp, bits, dtype=jnp.uint8), qp

            w_int, qp = jax.vmap(one)(ws)
            fw.append(w_int.ravel())
            fd.append(qp.delta.ravel().astype(jnp.float32))
            fz.append(qp.zero_point.ravel().astype(jnp.float32))
        return (jnp.concatenate(fw), jnp.concatenate(fd),
                jnp.concatenate(fz))

    return jax.jit(compute)


@_ft.partial(jax.jit, static_argnums=(2, 3))
def _bias_int16(b, w_delta, bits: int = 16, scale_method: str = "max"):
    """Layer-wise path: bias rescaled by s_w and stored int16
    (quant_int/quant_layer.py:84-97). ``bits``/``scale_method`` set the
    quantization grid; the int16 container is the storage format."""
    bqp = Q.init_scale(b, bits, scale_method)
    b_int = Q.quantize(b, bqp, bits).astype(jnp.float32)
    b_int = jnp.round((b_int - bqp.zero_point) / w_delta * bqp.delta)
    return jnp.clip(b_int, -32768, 32767).astype(jnp.int16)


def quantize_model(params, cfg: LightConfig = LightConfig()
                   ) -> LightQuantized:
    """One-shot conversion (the reference's `quantize_int8`,
    quantize.py:116-157, minus the warm-up forward — scales come directly
    from the weights, one fused program per unique leaf shape)."""
    wcfg = wrap.WeightQuantConfig(n_bits=cfg.n_bits,
                                  channel_wise=cfg.channel_wise,
                                  scale_method=cfg.scale_method)
    leaves = tuple(l for l in wrap.find_quant_leaves(params)
                   if not l.path.split("/", 1)[0] in cfg.skip_subtrees)
    groups = wrap.group_leaves(params, leaves, wcfg)
    spec = tuple((tuple(paths), bits, axis)
                 for (shape, _, bits, axis), paths in groups.items())
    fw, fd, fz = jax.device_get(
        _packed_quant_fn(spec, cfg.scale_method)(params))

    int_w, qstate = {}, {}
    ow = od = 0
    for (shape, _, bits, axis), paths in groups.items():
        qshape = wrap.leaf_qp_shape(shape, axis)
        wn = int(np.prod(shape, dtype=np.int64))
        qn = int(np.prod(qshape, dtype=np.int64)) if qshape else 1
        for p in paths:
            int_w[p] = fw[ow:ow + wn].reshape(shape)
            qstate[p] = Q.QParams(fd[od:od + qn].reshape(qshape),
                                  fz[od:od + qn].reshape(qshape))
            ow += wn
            od += qn

    int_biases, b_scales = {}, {}
    if not cfg.channel_wise:
        bias_items = []
        for leaf in leaves:
            bias_path = leaf.path.rsplit("/", 1)[0] + "/b"
            try:
                b = get_leaf(params, bias_path)
            except (KeyError, TypeError):
                continue
            qp = qstate[leaf.path]
            bias_items.append((bias_path, b.shape,
                               _bias_int16(b, jnp.asarray(qp.delta),
                                           cfg.bias_bits,
                                           cfg.scale_method),
                               qp.delta))
        if bias_items:
            flat_b = jax.device_get(jnp.concatenate(
                [it[2].ravel() for it in bias_items]))
            ob = 0
            for bias_path, bshape, b_int, delta in bias_items:
                n = int(np.prod(bshape))
                int_biases[bias_path] = flat_b[ob:ob + n].reshape(bshape)
                ob += n
                b_scales[bias_path] = delta

    # base_params keeps the original tree as a structure donor; quantized
    # leaves are excluded from size accounting / replaced on dequantize
    return LightQuantized(int_w, qstate, int_biases, b_scales,
                          params, cfg)


def dequantized_params(lq: LightQuantized):
    """Materialize an FP32 params pytree that computes exactly what the
    integer model computes (dequantize-on-the-fly semantics,
    quant_int/quant_layer.py:100-128)."""
    out = lq.base_params
    for path, w_int in lq.int_weights.items():
        qp = lq.qparams[path]
        w = Q.dequantize(jnp.asarray(w_int.astype(np.int32)), qp)
        out = set_leaf(out, path, w)
    for path, b_int in lq.int_biases.items():
        b = jnp.asarray(b_int.astype(np.float32)) * lq.bias_scales[path]
        out = set_leaf(out, path, b)
    return out


def cast_params(params, dtype=jnp.bfloat16):
    """FP16-style conversion (the reference's `quantize_fp16` =
    model.half(), quantize.py:162-187). bfloat16 is the TPU-native
    half-precision format."""
    return jax.tree_util.tree_map(
        lambda v: v.astype(dtype)
        if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)
        else v, params)


def model_size_bytes(params) -> int:
    """Total parameter storage (reference model-size report,
    single_test.py)."""
    return sum(v.size * v.dtype.itemsize
               for v in jax.tree_util.tree_leaves(params)
               if hasattr(v, "dtype"))


def quantized_size_bytes(lq: LightQuantized) -> int:
    total = 0
    skip_paths = set(lq.int_weights) | set(lq.int_biases)
    # integer payloads + per-channel scales/zero-points
    for w in lq.int_weights.values():
        total += w.size
    for b in lq.int_biases.values():
        total += b.size * 2
    for qp in lq.qparams.values():
        total += qp.delta.size * 4 + qp.zero_point.size * 4

    # remaining FP leaves (biases, entropy model, quantiles, ...)
    def walk2(node, prefix=""):
        nonlocal total
        if isinstance(node, dict):
            for k, v in node.items():
                walk2(v, f"{prefix}/{k}" if prefix else k)
        elif hasattr(node, "dtype"):
            if prefix not in skip_paths:
                total += node.size * node.dtype.itemsize
        elif hasattr(node, "_fields"):  # NamedTuple (entropy params)
            for v in node:
                walk2(v, prefix)
        elif isinstance(node, (tuple, list)):
            for v in node:
                walk2(v, prefix)

    walk2(lq.base_params)
    return total


__all__ = ["LightConfig", "LightQuantized", "quantize_model",
           "dequantized_params", "cast_params", "model_size_bytes",
           "quantized_size_bytes"]
