"""Core uniform-affine quantization math, as pure JAX functions.

Capability parity with the reference's quantizer layer
(`task-oriented-PTQ/quantization/quantizer.py` and
`light-uniform-PTQ/quant_int/quantizer.py`), redesigned for TPU:

* no mutable module state — quantization parameters are a ``QParams`` pytree
  produced by explicit calibration functions;
* the reference's per-channel Python loop
  (`quantization/quantizer.py:260-265`) becomes a single `vmap` over the
  channel axis;
* the MSE/L1/L2 grid search (`quantization/quantizer.py:300-370`, ten 5%
  shrink steps) is evaluated for all candidates at once with `vmap` + argmin,
  so channel-wise × candidate search is one fused XLA computation;
* the straight-through estimator is expressed with `stop_gradient` so the
  same function works under `jax.grad` inside jitted calibration scans.

All functions are shape-polymorphic, jit-safe (no data-dependent Python
control flow) and dtype-preserving.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

EPS = 1e-8  # minimum scale, matches reference eps (quantizer.py:144)

SCALE_METHODS = ("max", "mse", "gaussian", "l1", "l2")


class QParams(NamedTuple):
    """Affine quantizer parameters (a pytree leaf pair).

    ``delta`` is the step size (scale) and ``zero_point`` the integer offset,
    both broadcastable against the tensor they quantize. For per-tensor
    quantization these are scalars; for channel-wise quantization they carry
    a broadcast shape like ``(1, 1, 1, C)``.
    """

    delta: jax.Array
    zero_point: jax.Array


def round_ste(x: jax.Array) -> jax.Array:
    """Round with a straight-through gradient (identity backward)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def fake_quant(x: jax.Array, qp: QParams, n_bits: int) -> jax.Array:
    """Quantize-dequantize with STE: the reference's fake-quant forward
    (quantizer.py:175-184)."""
    n_levels = 2 ** n_bits
    x_int = round_ste(x / qp.delta) + qp.zero_point
    x_quant = jnp.clip(x_int, 0, n_levels - 1)
    return (x_quant - qp.zero_point) * qp.delta


def quantize(x: jax.Array, qp: QParams, n_bits: int,
             dtype=jnp.int32) -> jax.Array:
    """Quantize to true integers in [0, 2**n_bits - 1] (no gradient)."""
    n_levels = 2 ** n_bits
    x_int = jnp.round(x / qp.delta) + qp.zero_point
    return jnp.clip(x_int, 0, n_levels - 1).astype(dtype)


def dequantize(q: jax.Array, qp: QParams) -> jax.Array:
    return (q.astype(qp.delta.dtype) - qp.zero_point) * qp.delta


def lp_loss(pred: jax.Array, tgt: jax.Array, p: float = 2.0,
            reduction: str = "mean", channel_axis: int = -1) -> jax.Array:
    """L_p reconstruction loss.

    ``reduction='mean'`` is the reference's ``reduction='all'`` path;
    ``reduction='channel_sum'`` reproduces its default ``'none'`` path
    (sum over the channel axis, mean over the rest — quantizer.py:71-79,
    written for NCHW dim 1; here the channel axis is explicit because this
    framework is NHWC).
    """
    err = jnp.abs(pred - tgt) ** p
    if reduction == "mean":
        return jnp.mean(err)
    if reduction == "channel_sum":
        return jnp.mean(jnp.sum(err, axis=channel_axis))
    raise ValueError(f"unknown reduction {reduction!r}")


# ---------------------------------------------------------------------------
# Scale initialization ("calibration" of delta / zero_point)
# ---------------------------------------------------------------------------


def _affine_from_range(x_min: jax.Array, x_max: jax.Array,
                       n_bits: int) -> QParams:
    n_levels = 2 ** n_bits
    delta = jnp.maximum((x_max - x_min) / (n_levels - 1), EPS)
    zero_point = jnp.round(-x_min / delta)
    return QParams(delta, zero_point)


def _symmetrize(x_min: jax.Array, x_max: jax.Array, sym: bool):
    if not sym:
        return x_min, x_max
    absmax = jnp.maximum(jnp.abs(x_min), x_max)
    x_min = jnp.where(x_min < 0, -absmax, 0.0)
    return x_min, absmax


def _fake_quant_range(x, x_min, x_max, n_bits):
    """Quantize-dequantize against a candidate [min, max] range
    (the reference's `UniformAffineQuantizer.quantize`, quantizer.py:376)."""
    qp = _affine_from_range(x_min, x_max, n_bits)
    n_levels = 2 ** n_bits
    x_q = jnp.clip(jnp.round(x / qp.delta) + qp.zero_point, 0, n_levels - 1)
    return (x_q - qp.zero_point) * qp.delta


def init_scale_max(x: jax.Array, n_bits: int, sym: bool = False) -> QParams:
    """Min/max range calibration (reference 'max', quantizer.py:281-298)."""
    x_min = jnp.minimum(jnp.min(x), 0.0)
    x_max = jnp.maximum(jnp.max(x), 0.0)
    x_min, x_max = _symmetrize(x_min, x_max, sym)
    return _affine_from_range(x_min, x_max, n_bits)


def init_scale_gaussian(x: jax.Array, n_bits: int,
                        sym: bool = False) -> QParams:
    """Gaussian range calibration (reference 'gaussian',
    quantizer.py:318-336). NOTE: the reference uses mu ± 6·Var (variance,
    not std); we preserve that behavior for parity."""
    mu = jnp.mean(x)
    var = jnp.var(x, ddof=1)  # torch.var defaults to unbiased
    x_min = jnp.minimum(mu - 6.0 * var, 0.0)
    x_max = jnp.maximum(mu + 6.0 * var, 0.0)
    x_min, x_max = _symmetrize(x_min, x_max, sym)
    return _affine_from_range(x_min, x_max, n_bits)


def init_scale_grid(x: jax.Array, n_bits: int, p: float,
                    num_steps: int = 10, shrink: float = 0.05) -> QParams:
    """Grid search over shrunken ranges minimizing mean |x - Q(x)|^p.

    Reference 'mse' (p=3.5), 'l1' (p=1), 'l2' (p=2): ten candidates
    ``(1 - 0.05·i)·[min, max]`` (quantizer.py:300-370). All candidates are
    scored in one vmapped pass instead of a Python loop.
    """
    x_max = jnp.max(x)
    x_min = jnp.min(x)
    shrinks = 1.0 - shrink * jnp.arange(num_steps, dtype=x.dtype)

    def score(s):
        new_min, new_max = x_min * s, x_max * s
        x_q = _fake_quant_range(x, new_min, new_max, n_bits)
        return jnp.mean(jnp.abs(x - x_q) ** p)

    scores = jax.vmap(score)(shrinks)
    best = shrinks[jnp.argmin(scores)]
    return _affine_from_range(x_min * best, x_max * best, n_bits)


def init_scale(x: jax.Array, n_bits: int, method: str = "max",
               sym: bool = False) -> QParams:
    """Per-tensor scale/zero-point init dispatch (method is static)."""
    if method == "max":
        return init_scale_max(x, n_bits, sym)
    if method == "gaussian":
        return init_scale_gaussian(x, n_bits, sym)
    if method == "mse":
        return init_scale_grid(x, n_bits, p=3.5)
    if method == "l1":
        return init_scale_grid(x, n_bits, p=1.0)
    if method == "l2":
        return init_scale_grid(x, n_bits, p=2.0)
    raise ValueError(f"unknown scale method {method!r}")


def init_scale_channelwise(w: jax.Array, n_bits: int, method: str = "max",
                           sym: bool = False, channel_axis: int = -1) -> QParams:
    """Channel-wise scale init, vmapped over the channel axis.

    Replaces the reference's per-channel Python loop
    (quantizer.py:260-265) with one batched computation. The returned
    ``delta``/``zero_point`` have singleton dims everywhere except
    ``channel_axis`` so they broadcast against ``w`` directly.
    """
    axis = channel_axis % w.ndim
    w_c = jnp.moveaxis(w, axis, 0).reshape(w.shape[axis], -1)
    qp = jax.vmap(lambda v: init_scale(v, n_bits, method, sym))(w_c)
    shape = [1] * w.ndim
    shape[axis] = w.shape[axis]
    return QParams(qp.delta.reshape(shape), qp.zero_point.reshape(shape))


# ---------------------------------------------------------------------------
# Dynamic activation quantizers
# ---------------------------------------------------------------------------


def dynamic_act_fake_quant(x: jax.Array, n_bits: int = 8,
                           channel_axis: int = -1) -> jax.Array:
    """Per-channel *dynamic* (batch-statistics) fake quantization.

    Reference `Handle_Parameter`/`ActQuant`
    (task-oriented-PTQ/quantization/quantizer.py:81-121): per feature
    channel, shift by the channel min, normalize by max |x - min| and round
    to ``2**n_bits - 1`` levels. The reference loops channels in Python; here
    the channel statistics are keepdims reductions so the whole thing is one
    fused elementwise XLA op. No gradient flows through the rounding (the
    reference detaches); this is an eval-time quantizer.
    """
    bit_range = 2 ** n_bits - 1
    reduce_axes = tuple(i for i in range(x.ndim) if i != channel_axis % x.ndim)
    zero_point = jnp.min(x, axis=reduce_axes, keepdims=True)
    shifted = x - zero_point
    rng = jnp.maximum(jnp.max(jnp.abs(shifted), axis=reduce_axes,
                              keepdims=True), 1e-6)
    x01 = jnp.clip(shifted / rng, -1.0, 1.0)
    out = jnp.round(x01 * bit_range) / bit_range * rng + zero_point
    return jax.lax.stop_gradient(out - x) + x


def fixed_point_act_quant(x: jax.Array, int_bits: int = 8,
                          frac_bits: int = 8) -> jax.Array:
    """Q(int_bits).(frac_bits) fixed-point dynamic activation quantization.

    Reference light-uniform `ActQuantizer`
    (light-uniform-PTQ/quant_int/quantizer.py:120-128): clamp to
    ±2**(int_bits-1), then round to ``frac_bits`` fractional bits —
    i.e. a layer-wise 16-bit Q8.8 representation by default.
    """
    lo = -(2.0 ** (int_bits - 1))
    hi = 2.0 ** (int_bits - 1)
    mult = 2.0 ** frac_bits
    out = jnp.round(jnp.clip(x, lo, hi) * mult) / mult
    return jax.lax.stop_gradient(out - x) + x


__all__ = [
    "EPS", "SCALE_METHODS", "QParams", "round_ste", "fake_quant", "quantize",
    "dequantize", "lp_loss", "init_scale", "init_scale_max",
    "init_scale_gaussian", "init_scale_grid", "init_scale_channelwise",
    "dynamic_act_fake_quant", "fixed_point_act_quant",
]
