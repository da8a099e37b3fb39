"""Functional NHWC layer library for the LIC model zoo.

TPU-first redesign of the reference's module-based layers
(task-oriented-PTQ/models/layers.py, light-uniform-PTQ/models/layers.py and
the CompressAI layers it consumes): every layer is a pure function
``f(params_subtree, x, ...)`` over a parameter pytree; there is no module
state, no hooks, no surgery. Conventions:

* activations are NHWC, conv kernels HWIO, linear weights (in, out) — the
  native layouts for XLA:TPU so kernels tile directly onto the MXU;
* parameter dicts use conventional keys (``w``/``b`` for conv & linear,
  ``scale``/``bias`` for layer norm, ``gamma``/``beta`` for GDN) so generic
  pytree walkers (quantization, conversion) can discover quantizable leaves
  without a registry;
* quantization hooks enter through a :class:`QuantCtx` — a *static*
  (hashable) object threaded through forwards. Weight quantization never
  appears here: it is a pytree transformation applied to ``params`` before
  the forward (see ``rdoptq_tpu.quant``). Activation quantization is
  stateless (dynamic) and fires at ``ctx.act(path, y)`` callsites, which is
  the functional equivalent of the reference's
  ``QuantModule.use_act_quant`` gate (quantization/quant_layer.py:130-134).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import quant as Q

Params = dict


# ---------------------------------------------------------------------------
# Quantization context (static; activation-side only)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class QuantCtx:
    """Static activation-quantization context.

    ``act_paths``: layer paths whose outputs get fake-quantized ("trained"
    layers in the reference's terminology — act quant only fires on layers
    that finished weight calibration, quant_layer.py:132).
    ``act_kind``: 'dynamic' (task-oriented per-channel 8-bit,
    quantizer.py:81-121) or 'q88' (light-uniform Q8.8 fixed point,
    quant_int/quantizer.py:120-128). ``skip_paths`` lets callers disable
    specific outputs (e.g. the network-output / last-decoder-layer policy,
    quant_model.py:93-98).
    """

    act_paths: frozenset = frozenset()
    act_kind: str = "dynamic"
    act_bits: int = 8
    skip_paths: frozenset = frozenset()
    use_pallas: bool = False  # fused TPU kernels (ops.pallas_quant)
    # Optional TRACED gating: {stage_name: bool scalar}. When set, a stage
    # quantizes iff its gate is True — the gate is a runtime value, so one
    # compiled program serves every act-quant on/off combination (the
    # calibration engine flips stages on as they finish training without
    # recompiling; ~2 elementwise passes of overhead per gated stage).
    gates: Optional[dict] = None

    def __hash__(self):  # gates hold tracers; identity-hash in that case
        if self.gates is None:
            return hash((self.act_paths, self.act_kind, self.act_bits,
                         self.skip_paths, self.use_pallas))
        return id(self)

    def _quantize(self, x: jax.Array) -> jax.Array:
        if self.act_kind == "dynamic":
            if self.use_pallas:
                from ..ops.pallas_quant import dynamic_act_quant_pallas
                return dynamic_act_quant_pallas(x, n_bits=self.act_bits)
            return Q.dynamic_act_fake_quant(x, n_bits=self.act_bits)
        if self.act_kind == "q88":
            if self.use_pallas:
                from ..ops.pallas_quant import fixed_point_quant_pallas
                return fixed_point_quant_pallas(x)
            return Q.fixed_point_act_quant(x)
        raise ValueError(f"unknown act_kind {self.act_kind!r}")

    def act(self, path: str, x: jax.Array) -> jax.Array:
        # internal hook sites use "stage#site" and inherit the stage's
        # enabled/skip status (e.g. attention-internal act quant)
        base = path.split("#", 1)[0]
        if path in self.skip_paths or base in self.skip_paths:
            return x
        if self.gates is not None:
            gate = self.gates.get(base)
            if gate is None:
                return x
            import jax.numpy as jnp
            return jnp.where(gate, self._quantize(x), x)
        if path not in self.act_paths and base not in self.act_paths:
            return x
        return self._quantize(x)


NULL_CTX = QuantCtx()


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------


def _fan_in_uniform(key, shape, fan_in):
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def conv_init(key, k: int, c_in: int, c_out: int,
              groups: int = 1) -> Params:
    """Kaiming-uniform conv kernel (HWIO) + bias, torch-style fan-in."""
    wk, bk = jax.random.split(key)
    fan_in = k * k * c_in // groups
    w = _fan_in_uniform(wk, (k, k, c_in // groups, c_out), fan_in)
    b = _fan_in_uniform(bk, (c_out,), fan_in)
    return {"w": w, "b": b}


def linear_init(key, d_in: int, d_out: int, bias: bool = True) -> Params:
    wk, bk = jax.random.split(key)
    p = {"w": _fan_in_uniform(wk, (d_in, d_out), d_in)}
    if bias:
        p["b"] = _fan_in_uniform(bk, (d_out,), d_in)
    return p


def layer_norm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def gdn_init(channels: int) -> Params:
    """GDN parameters stored post-reparametrization (non-negative):
    gamma as a (1, 1, C, C) 1x1-conv kernel, beta as the bias."""
    gamma = 0.1 * jnp.eye(channels, dtype=jnp.float32)
    return {"gamma": gamma.reshape(1, 1, channels, channels),
            "beta": jnp.ones((channels,))}


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------


def _match(x: jax.Array, a: jax.Array) -> jax.Array:
    """Cast a float parameter to the activation dtype when they differ —
    makes half-precision serving (params tree-cast to bfloat16) work
    end-to-end even where an f32 tensor enters the flow (entropy-model
    internals compute in f32), and vice versa. No-op when dtypes match."""
    if (jnp.issubdtype(x.dtype, jnp.floating)
            and jnp.issubdtype(a.dtype, jnp.floating)
            and a.dtype != x.dtype):
        return a.astype(x.dtype)
    return a


def _dyn_quant_int8(x: jax.Array):
    """Per-tensor symmetric int8 quantization of activations (dynamic)."""
    s = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8) / 127.0
    xi = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return xi, s


def _quant_in_int8(p: Params, x: jax.Array):
    """Activation quantization for an int8-kernel node. A calibrated
    static scale (``s_x``, quant.serve_int8.calibrate_act_scales) skips
    the dynamic abs-max reduction — one fewer full-tensor HBM pass per
    conv, which is what made dynamic-int8 serving slower than f32."""
    if "s_x" in p:
        s = p["s_x"]
        return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8), s
    return _dyn_quant_int8(x)


# Eager-mode activation probe used by serve_int8.calibrate_act_scales:
# when set to a callable, quantizable float-kernel layers report their
# input tensors as ``probe(node_dict, x)``. Never active under jit (the
# calibration forward runs eagerly) — pure-function semantics of the
# layer library are unchanged for every traced path.
_ACT_PROBE = None


def conv2d(p: Params, x: jax.Array, stride: int = 1,
           padding: Optional[int] = None, groups: int = 1) -> jax.Array:
    """2D convolution, NHWC x HWIO. ``padding=None`` -> torch-style
    'half' padding k//2 (the universal choice in the reference zoo).

    If the node carries an integer kernel (``w_int8`` + per-output-channel
    scale ``s_w``), the conv computes int8×int8→int32 on the MXU with
    dynamically-quantized activations and dequantizes the accumulator —
    the true-INT8 serving path (int8 convs run at bf16 speed on v5e)."""
    if "w_int8" in p:
        k = p["w_int8"].shape[0]
        pad = k // 2 if padding is None else padding
        xi, s_x = _quant_in_int8(p, x)
        from ..ops import phase_conv
        if (phase_conv.PHASE_CONV_DEFAULT and stride == 2
                and groups == 1 and pad == k // 2):
            # polyphase GEMM path: XLA's strided int8 conv lowering runs
            # at ~1% MXU peak on v5e (ops/phase_conv.py rationale)
            return phase_conv.phase_conv2d_int8(p, xi, s_x)
        acc = jax.lax.conv_general_dilated(
            xi, p["w_int8"], window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * (p["s_w"] * s_x)
        if "b" in p:
            out = out + p["b"]
        return out
    if _ACT_PROBE is not None:
        _ACT_PROBE(p, x)
    k = p["w"].shape[0]
    pad = k // 2 if padding is None else padding
    out = jax.lax.conv_general_dilated(
        x, _match(x, p["w"]), window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    if "b" in p:
        out = out + _match(out, p["b"])
    return out


def conv_transpose2d(p: Params, x: jax.Array, stride: int = 2) -> jax.Array:
    """Transposed conv producing exactly ``stride``× upsampling, with
    torch ConvTranspose2d(k, s, padding=k//2, output_padding=s-1)
    semantics — the universal deconv config in the reference zoo. Kernel
    HWIO, already spatially flipped relative to torch storage (see
    utils.torch_convert.tconv_kernel).

    Implemented as an input-dilated convolution with the asymmetric
    padding torch's output_padding implies (low = k-1-k//2,
    high = low + s-1); a symmetric 'SAME' conv_transpose would shift the
    output by half a pixel."""
    if "w_int8" in p:
        k = p["w_int8"].shape[0]
        pad_lo = k - 1 - k // 2
        pad_hi = pad_lo + stride - 1
        xi, s_x = _quant_in_int8(p, x)
        from ..ops import phase_conv
        if phase_conv.PHASE_CONV_DEFAULT and stride == 2:
            # 4 dense stride-1 phase convs instead of the zero-stuffed
            # input-dilated lowering (half the MACs hit structural zeros)
            return phase_conv.phase_tconv2d_int8(p, xi, s_x)
        acc = jax.lax.conv_general_dilated(
            xi, p["w_int8"], window_strides=(1, 1),
            padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
            lhs_dilation=(stride, stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * (p["s_w"] * s_x)
        if "b" in p:
            out = out + p["b"]
        return out
    if _ACT_PROBE is not None:
        _ACT_PROBE(p, x)
    k = p["w"].shape[0]
    pad_lo = k - 1 - k // 2
    pad_hi = pad_lo + stride - 1
    out = jax.lax.conv_general_dilated(
        x, _match(x, p["w"]), window_strides=(1, 1),
        padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        out = out + _match(out, p["b"])
    return out


def linear(p: Params, x: jax.Array) -> jax.Array:
    if "w_int8" in p:
        xi, s_x = _quant_in_int8(p, x)
        acc = jax.lax.dot_general(
            xi, p["w_int8"],
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * (p["s_w"] * s_x)
    else:
        if _ACT_PROBE is not None:
            _ACT_PROBE(p, x)
        out = jnp.einsum("...i,io->...o", x, _match(x, p["w"]))
    if "b" in p:
        out = out + _match(out, p["b"])
    return out


def layer_norm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return ((x - mu) * jax.lax.rsqrt(var + eps) * _match(x, p["scale"])
            + _match(x, p["bias"]))


def gdn(p: Params, x: jax.Array, inverse: bool = False,
        beta_min: float = 1e-6, use_pallas: bool = None) -> jax.Array:
    """(Inverse) generalized divisive normalization:
    y = x / sqrt(beta + gamma * x²) via a 1x1 conv over channels
    (functional form of the reference's f_gdn, quant_layer.py:142-154).
    ``use_pallas`` (default: ops.pallas_gdn.PALLAS_GDN_DEFAULT) routes
    the forward through the fused single-HBM-pass TPU kernel; gradients
    always take this jnp formula (custom VJP)."""
    if use_pallas is None:
        from ..ops import pallas_gdn
        use_pallas = pallas_gdn.PALLAS_GDN_DEFAULT
    if use_pallas:
        from ..ops import pallas_gdn
        c = x.shape[-1]
        return pallas_gdn.gdn_pallas(
            x, _match(x, p["gamma"]).reshape(c, c), _match(x, p["beta"]),
            inverse, beta_min)
    gamma = jnp.maximum(_match(x, p["gamma"]), 0.0)
    beta = jnp.maximum(_match(x, p["beta"]), beta_min)
    norm = jax.lax.conv_general_dilated(
        x * x, gamma, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + beta
    return x * jnp.sqrt(norm) if inverse else x * jax.lax.rsqrt(norm)


def masked_conv2d(p: Params, x: jax.Array, mask: jax.Array,
                  stride: int = 1) -> jax.Array:
    """Conv with a static binary mask on the kernel (autoregressive context
    models: causal 'A' mask, checkerboard mask)."""
    w = p["w"] * mask.astype(p["w"].dtype)
    pm = {"w": w, "b": p["b"]} if "b" in p else {"w": w}
    return conv2d(pm, x, stride=stride)


def causal_mask(k: int, c_in: int, c_out: int) -> jax.Array:
    """Type-'A' raster-order causal mask for a k×k kernel (HWIO),
    masking the center and everything after it."""
    m = jnp.ones((k, k), jnp.float32)
    m = m.at[k // 2, k // 2:].set(0.0)
    m = m.at[k // 2 + 1:, :].set(0.0)
    return m[:, :, None, None] * jnp.ones((1, 1, c_in, c_out), jnp.float32)


def checkerboard_mask(k: int, c_in: int, c_out: int) -> jax.Array:
    """Checkerboard context mask (reference CheckerboardMaskedConv2d,
    light-uniform-PTQ/models/layers.py:10-33): anchor positions only."""
    rows = jnp.arange(k)[:, None]
    cols = jnp.arange(k)[None, :]
    m = ((rows + cols) % 2 == 1).astype(jnp.float32)
    return m[:, :, None, None] * jnp.ones((1, 1, c_in, c_out), jnp.float32)


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """Depth-to-space, matching torch.nn.PixelShuffle channel ordering
    (C_out = C // r², block scan row-major)."""
    b, h, w, c = x.shape
    c_out = c // (r * r)
    x = x.reshape(b, h, w, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c_out)


def pixel_unshuffle(x: jax.Array, r: int) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // r, w // r, c * r * r)


def subpel_conv3x3_init(key, c_in: int, c_out: int, r: int) -> Params:
    """3x3 conv to c_out*r² channels followed by pixel shuffle
    (CompressAI subpel_conv3x3 used throughout Cheng2020)."""
    return conv_init(key, 3, c_in, c_out * r * r)


def subpel_conv3x3(p: Params, x: jax.Array, r: int) -> jax.Array:
    return pixel_shuffle(conv2d(p, x, stride=1), r)


def leaky_relu(x, slope: float = 0.01):
    return jax.nn.leaky_relu(x, slope)


# ---------------------------------------------------------------------------
# Composite blocks (Cheng2020 family — CompressAI layers the reference
# wraps in quant_block.py:219-328)
# ---------------------------------------------------------------------------


def residual_block_init(key, c_in: int, c_out: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"conv1": conv_init(k1, 3, c_in, c_out),
         "conv2": conv_init(k2, 3, c_out, c_out)}
    if c_in != c_out:
        p["skip"] = conv_init(k3, 1, c_in, c_out)
    return p


def residual_block(p: Params, x: jax.Array, ctx: QuantCtx = NULL_CTX,
                   name: str = "rb") -> jax.Array:
    out = ctx.act(f"{name}/conv1",
                  leaky_relu(conv2d(p["conv1"], x)))
    out = ctx.act(f"{name}/conv2",
                  leaky_relu(conv2d(p["conv2"], out)))
    skip = x if "skip" not in p else conv2d(p["skip"], x)
    return out + skip


def residual_block_with_stride_init(key, c_in: int, c_out: int) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {"conv1": conv_init(k1, 3, c_in, c_out),
            "conv2": conv_init(k2, 3, c_out, c_out),
            "gdn": gdn_init(c_out),
            "skip": conv_init(k4, 1, c_in, c_out)}


def residual_block_with_stride(p: Params, x: jax.Array, stride: int = 2,
                               ctx: QuantCtx = NULL_CTX,
                               name: str = "rbs") -> jax.Array:
    out = ctx.act(f"{name}/conv1",
                  leaky_relu(conv2d(p["conv1"], x, stride=stride)))
    out = conv2d(p["conv2"], out)
    out = ctx.act(f"{name}/gdn", gdn(p["gdn"], out))
    skip = conv2d(p["skip"], x, stride=stride)
    return out + skip


def residual_block_upsample_init(key, c_in: int, c_out: int,
                                 r: int = 2) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {"subpel": subpel_conv3x3_init(k1, c_in, c_out, r),
            "conv": conv_init(k2, 3, c_out, c_out),
            "gdn": gdn_init(c_out),
            "upsample": subpel_conv3x3_init(k3, c_in, c_out, r)}


def residual_block_upsample(p: Params, x: jax.Array, r: int = 2,
                            ctx: QuantCtx = NULL_CTX,
                            name: str = "rbu") -> jax.Array:
    out = ctx.act(f"{name}/subpel",
                  leaky_relu(subpel_conv3x3(p["subpel"], x, r)))
    out = conv2d(p["conv"], out)
    out = ctx.act(f"{name}/igdn", gdn(p["gdn"], out, inverse=True))
    return out + subpel_conv3x3(p["upsample"], x, r)


def attention_block_init(key, c: int) -> Params:
    """Cheng2020 simplified attention: two 3-unit residual-bottleneck
    branches, the mask branch ending in 1x1 conv + sigmoid."""
    keys = jax.random.split(key, 7)

    def unit(k):
        ka, kb, kc = jax.random.split(k, 3)
        half = c // 2
        return {"c1": conv_init(ka, 1, c, half),
                "c2": conv_init(kb, 3, half, half),
                "c3": conv_init(kc, 1, half, c)}

    # dict-keyed units (not lists) so find_quant_leaves discovers the convs
    return {"trunk": {f"u{i}": unit(keys[i]) for i in range(3)},
            "mask": {f"u{i}": unit(keys[3 + i]) for i in range(3)},
            "mask_out": conv_init(keys[6], 1, c, c)}


def _attn_unit(p: Params, x: jax.Array) -> jax.Array:
    out = jax.nn.relu(conv2d(p["c1"], x, padding=0))
    out = jax.nn.relu(conv2d(p["c2"], out))
    out = conv2d(p["c3"], out, padding=0)
    return x + out


def attention_block(p: Params, x: jax.Array, ctx: QuantCtx = NULL_CTX,
                    name: str = "attn") -> jax.Array:
    trunk = x
    for k in sorted(p["trunk"]):
        trunk = _attn_unit(p["trunk"][k], trunk)
    mask = x
    for k in sorted(p["mask"]):
        mask = _attn_unit(p["mask"][k], mask)
    mask = jax.nn.sigmoid(conv2d(p["mask_out"], mask, padding=0))
    return ctx.act(name, x + trunk * mask)


__all__ = [
    "Params", "QuantCtx", "NULL_CTX",
    "conv_init", "linear_init", "layer_norm_init", "gdn_init",
    "conv2d", "conv_transpose2d", "linear", "layer_norm", "gdn",
    "masked_conv2d", "causal_mask", "checkerboard_mask",
    "pixel_shuffle", "pixel_unshuffle",
    "subpel_conv3x3_init", "subpel_conv3x3", "leaky_relu",
    "residual_block_init", "residual_block",
    "residual_block_with_stride_init", "residual_block_with_stride",
    "residual_block_upsample_init", "residual_block_upsample",
    "attention_block_init", "attention_block",
]
