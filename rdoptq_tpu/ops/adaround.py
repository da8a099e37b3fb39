"""AdaRound learned rounding, as pure functions over an ``alpha`` pytree.

Capability parity with the reference `AdaRoundQuantizer`
(task-oriented-PTQ/quantization/quantizer.py:397-470) and its temperature
schedule (`quantization/utils.py:37-54`), but with no module state: ``alpha``
is an explicit optimization variable living in an optax-optimized pytree, so
the whole 20k-step calibration loop can be a single jitted `lax.scan`.

Math (AdaRound, Nagel et al. 2020):
    h(alpha) = clip(sigmoid(alpha) * (zeta - gamma) + gamma, 0, 1)
    w_soft   = delta * (clip(floor(w/delta) + h(alpha) + zp, 0, 2^b - 1) - zp)
    w_hard   = same with h -> (alpha >= 0)
    f_reg(b) = sum(1 - |2 h(alpha) - 1|^b)   with b annealed linearly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quant import QParams

GAMMA = -0.1
ZETA = 1.1


def rectified_sigmoid(alpha: jax.Array) -> jax.Array:
    """h(alpha) — the rectified sigmoid soft-rounding value in [0, 1]."""
    return jnp.clip(jax.nn.sigmoid(alpha) * (ZETA - GAMMA) + GAMMA, 0.0, 1.0)


def init_alpha(w: jax.Array, qp: QParams) -> jax.Array:
    """Initialize alpha so that h(alpha) equals the float rounding residue
    (reference quantizer.py:454-466): sigmoid(alpha) = rest."""
    rest = w / qp.delta - jnp.floor(w / qp.delta)  # in [0, 1)
    return -jnp.log((ZETA - GAMMA) / (rest - GAMMA) - 1.0)


def adaround_fake_quant(w: jax.Array, qp: QParams, alpha: jax.Array,
                        n_bits: int, soft: bool) -> jax.Array:
    """Fake-quantize weights with learned rounding.

    ``soft=True`` uses the differentiable rectified sigmoid (training);
    ``soft=False`` uses the hard (alpha >= 0) decision (inference). ``soft``
    is a Python bool — it selects which graph gets traced.
    """
    n_levels = 2 ** n_bits
    w_floor = jnp.floor(w / qp.delta)
    if soft:
        h = rectified_sigmoid(alpha)
    else:
        h = (alpha >= 0).astype(w.dtype)
    w_int = w_floor + h
    w_quant = jnp.clip(w_int + qp.zero_point, 0, n_levels - 1)
    return (w_quant - qp.zero_point) * qp.delta


def round_reg(alpha: jax.Array, b: jax.Array) -> jax.Array:
    """Rounding regularizer sum(1 - |2h - 1|^b) pushing h to {0, 1}
    (reference layer_opt.py:164-165)."""
    h = rectified_sigmoid(alpha)
    return jnp.sum(1.0 - jnp.abs(2.0 * h - 1.0) ** b)


def linear_temp_decay(t: jax.Array, t_max: int, rel_start_decay: float,
                      start_b: float, end_b: float) -> jax.Array:
    """Annealed temperature b(t): constant ``start_b`` until
    ``rel_start_decay * t_max``, then linear decay to ``end_b``
    (reference quantization/utils.py:37-54). ``t`` may be traced (works
    inside `lax.scan`)."""
    start_decay = rel_start_decay * t_max
    rel_t = (t - start_decay) / jnp.maximum(t_max - start_decay, 1e-9)
    decayed = end_b + (start_b - end_b) * jnp.maximum(0.0, 1.0 - rel_t)
    return jnp.where(t < start_decay, start_b, decayed)


__all__ = ["GAMMA", "ZETA", "rectified_sigmoid", "init_alpha",
           "adaround_fake_quant", "round_reg", "linear_temp_decay"]
