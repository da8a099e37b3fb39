"""Entropy models for learned image compression, in pure JAX.

TPU-native re-design of the two entropy models every model in the zoo
depends on (the reference consumes them from CompressAI —
`compressai.entropy_models.{EntropyBottleneck, GaussianConditional}`, used
at e.g. task-oriented-PTQ/models/nic_cvt.py:221-231):

* **Factorized bottleneck** ("EntropyBottleneck"): a learned univariate
  density per channel, built from a chain of monotone nonlinear layers.
  Channel-parallel evaluation is a single `einsum`-free batched matmul
  (vmap over channels) — XLA fuses the whole likelihood computation.
* **Gaussian conditional**: likelihoods of unit-quantized values under
  N(means, scales²), with the standard 64-entry log-spaced scale table.

Both expose (a) a differentiable `likelihood` path used for training /
fake-quant evaluation (all bpp metrics run on this path, entirely on TPU),
and (b) host-side quantized-CDF construction for the real rANS codec (see
``rdoptq_tpu.coding``). Noise quantization takes an explicit PRNG key
(JAX-style determinism instead of torch RNG state).

The quantile fitting for the factorized model is done by vectorized
bisection on the monotone CDF (`fit_quantiles`) rather than the reference's
auxiliary SGD loss — deterministic, jit-compiled, and converges in ~50
iterations; the aux-loss is still provided for training parity.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

LIKELIHOOD_BOUND = 1e-9
SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64


# ---------------------------------------------------------------------------
# Lower bound with CompressAI-compatible gradient semantics
# ---------------------------------------------------------------------------


@jax.custom_vjp
def lower_bound(x: jax.Array, bound: float) -> jax.Array:
    """max(x, bound) whose gradient passes when x >= bound OR the gradient
    pushes x upward (so clipped values can still recover)."""
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


def quantize_ste(x: jax.Array, means: Optional[jax.Array] = None) -> jax.Array:
    """Straight-through round (optionally around means): the reference's
    `quantize_ste` (light-uniform-PTQ/models/utils.py:149-152) and
    `round_ste` latent rounding (layer_opt.py:69)."""
    if means is not None:
        return means + quantize_ste(x - means)
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def quantize_noise(x: jax.Array, key: jax.Array) -> jax.Array:
    """Additive-uniform-noise 'quantization' used at training time."""
    return x + jax.random.uniform(key, x.shape, x.dtype, -0.5, 0.5)


# ---------------------------------------------------------------------------
# Factorized (fully learned) entropy bottleneck
# ---------------------------------------------------------------------------


class FactorizedParams(NamedTuple):
    """Per-channel univariate density parameters.

    ``matrices[k]``: (C, f_{k+1}, f_k); ``biases[k]``: (C, f_{k+1}, 1);
    ``factors[k]``: (C, f_{k+1}, 1) for all but the last layer;
    ``quantiles``: (C, 1, 3) = (lower tail, median, upper tail).
    """

    matrices: Tuple[jax.Array, ...]
    biases: Tuple[jax.Array, ...]
    factors: Tuple[jax.Array, ...]
    quantiles: jax.Array


def factorized_init(key: jax.Array, channels: int,
                    filters: Sequence[int] = (3, 3, 3, 3),
                    init_scale: float = 10.0) -> FactorizedParams:
    """Initialize the density network (same parametrization family the
    reference's entropy bottleneck uses, so torch checkpoints can be
    converted 1:1)."""
    dims = (1,) + tuple(filters) + (1,)
    scale = init_scale ** (1.0 / (len(dims) - 1))
    matrices, biases, factors = [], [], []
    for k in range(len(dims) - 1):
        key, k1 = jax.random.split(key)
        init = math.log(math.expm1(1.0 / scale / dims[k + 1]))
        matrices.append(jnp.full((channels, dims[k + 1], dims[k]), init,
                                 jnp.float32))
        biases.append(jax.random.uniform(k1, (channels, dims[k + 1], 1),
                                         jnp.float32, -0.5, 0.5))
        if k < len(dims) - 2:
            factors.append(jnp.zeros((channels, dims[k + 1], 1), jnp.float32))
    quantiles = jnp.tile(jnp.array([[-init_scale, 0.0, init_scale]],
                                   jnp.float32), (channels, 1, 1))
    return FactorizedParams(tuple(matrices), tuple(biases), tuple(factors),
                            quantiles)


def factorized_logits(params: FactorizedParams, x: jax.Array) -> jax.Array:
    """Evaluate the logit of the cumulative density at ``x``.

    ``x``: (C, 1, N) — channel-major samples. Monotone in x by construction
    (softplus-positive matrices, bounded tanh perturbations).
    """
    for k in range(len(params.matrices)):
        m = jax.nn.softplus(params.matrices[k])
        x = jnp.einsum("cij,cjn->cin", m, x) + params.biases[k]
        if k < len(params.factors):
            x = x + jnp.tanh(params.factors[k]) * jnp.tanh(x)
    return x


def _sign_stable_likelihood(logits_lower: jax.Array,
                            logits_upper: jax.Array) -> jax.Array:
    """sigmoid(upper) - sigmoid(lower), evaluated in the numerically stable
    half of the sigmoid via the sign trick."""
    sign = jax.lax.stop_gradient(-jnp.sign(logits_lower + logits_upper))
    return jnp.abs(jax.nn.sigmoid(sign * logits_upper)
                   - jax.nn.sigmoid(sign * logits_lower))


def factorized_likelihood(params: FactorizedParams,
                          x: jax.Array) -> jax.Array:
    """P(x - 0.5 < X <= x + 0.5) per channel. ``x``: (C, 1, N)."""
    lower = factorized_logits(params, x - 0.5)
    upper = factorized_logits(params, x + 0.5)
    return _sign_stable_likelihood(lower, upper)


def factorized_medians(params: FactorizedParams) -> jax.Array:
    return params.quantiles[:, 0, 1]


def _to_channel_major(x: jax.Array) -> Tuple[jax.Array, Tuple[int, ...]]:
    """(B, H, W, C) [NHWC — this framework's native layout] -> (C, 1, BHW)."""
    b, h, w, c = x.shape
    return x.transpose(3, 0, 1, 2).reshape(c, 1, -1), (b, h, w, c)


def _from_channel_major(x: jax.Array, shape: Tuple[int, ...]) -> jax.Array:
    b, h, w, c = shape
    return x.reshape(c, b, h, w).transpose(1, 2, 3, 0)


def factorized_forward(params: FactorizedParams, x: jax.Array, *,
                       training: bool = False,
                       key: Optional[jax.Array] = None
                       ) -> Tuple[jax.Array, jax.Array]:
    """Quantize (noise at training, STE-round-to-median otherwise) and
    return (x_hat, likelihoods), both NHWC like the input."""
    xc, shape = _to_channel_major(x)
    medians = factorized_medians(params).reshape(-1, 1, 1)
    if training:
        if key is None:
            raise ValueError("training=True requires a PRNG key")
        x_hat = quantize_noise(xc, key)
    else:
        x_hat = quantize_ste(xc - medians) + medians
    lik = factorized_likelihood(params, x_hat)
    lik = lower_bound(lik, LIKELIHOOD_BOUND)
    return (_from_channel_major(x_hat, shape),
            _from_channel_major(lik, shape))


def factorized_aux_loss(params: FactorizedParams,
                        tail_mass: float = 1e-9) -> jax.Array:
    """Tail-quantile auxiliary loss (parity with the reference's
    `aux_loss`, light-uniform-PTQ/models/base.py:83-108)."""
    logits = factorized_logits(params, params.quantiles)  # (C, 1, 3)
    t = math.log(tail_mass / 2 / (1 - tail_mass / 2))
    target = jnp.array([t, 0.0, -t], jnp.float32)
    return jnp.sum(jnp.abs(logits[:, 0, :] - target))


def fit_quantiles(params: FactorizedParams, tail_mass: float = 1e-9,
                  iters: int = 60, span: float = 256.0) -> FactorizedParams:
    """Solve for the (tail_mass/2, 0.5, 1 - tail_mass/2) quantiles by
    bisection on the monotone logit function — a deterministic, jittable
    replacement for the reference's auxiliary-optimizer loop."""
    t = math.log(tail_mass / 2 / (1 - tail_mass / 2))
    targets = jnp.array([t, 0.0, -t], jnp.float32)  # logit targets
    c = params.quantiles.shape[0]
    lo = jnp.full((c, 1, 3), -span, jnp.float32)
    hi = jnp.full((c, 1, 3), span, jnp.float32)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        # logits at the three candidate points per channel, (C, 1, 3)
        val = factorized_logits(params, mid)
        go_right = val < targets
        return jnp.where(go_right, mid, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return params._replace(quantiles=0.5 * (lo + hi))


# ---------------------------------------------------------------------------
# Gaussian conditional
# ---------------------------------------------------------------------------


def default_scale_table(minimum: float = SCALES_MIN,
                        maximum: float = SCALES_MAX,
                        levels: int = SCALES_LEVELS) -> jax.Array:
    """Log-spaced scale table (reference models/nic_cvt.py:13-19)."""
    return jnp.exp(jnp.linspace(math.log(minimum), math.log(maximum), levels))


def _std_normal_upper_tail(x: jax.Array) -> jax.Array:
    """P(X > x) for standard normal = 0.5 * erfc(x / sqrt(2))."""
    return 0.5 * jax.lax.erfc(x / math.sqrt(2.0))


def gaussian_likelihood(x: jax.Array, scales: jax.Array,
                        means: Optional[jax.Array] = None,
                        scale_bound: float = SCALES_MIN) -> jax.Array:
    """Likelihood of the unit-width bin around x under N(means, scales²),
    with the scale lower-bounded (gradient-aware) at ``scale_bound``."""
    scales = lower_bound(scales, scale_bound)
    values = x - means if means is not None else x
    values = jnp.abs(values)
    upper = _std_normal_upper_tail((values - 0.5) / scales)
    lower = _std_normal_upper_tail((values + 0.5) / scales)
    return lower_bound(upper - lower, LIKELIHOOD_BOUND)


def gaussian_mixture_likelihood(x: jax.Array, scales: jax.Array,
                                means: jax.Array, weights: jax.Array,
                                scale_bound: float = SCALES_MIN) -> jax.Array:
    """Likelihood of the unit bin around x under a K-component Gaussian
    mixture: sum_k w_k * (Phi((x+.5-mu_k)/s_k) - Phi((x-.5-mu_k)/s_k)).

    This is the entropy model of the Cheng2020 *paper* (the reference uses
    CompressAI's single-Gaussian `cheng2020_anchor`/`_attn` weights,
    task-oriented-PTQ/main2.py:160); provided here so GMM-conditioned
    variants can be built and quantized. ``scales``/``means``/``weights``
    carry a trailing mixture axis K relative to ``x``; weights are
    softmax-normalized over it.

    Unlike the single-Gaussian path, |x-mu| folding is not applicable per
    component (the bin is centered on x, not on each mean), so upper/lower
    tails are evaluated signed."""
    scales = lower_bound(scales, scale_bound)
    w = jax.nn.softmax(weights, axis=-1)
    v = x[..., None] - means
    upper = _std_normal_upper_tail((v - 0.5) / scales)
    lower = _std_normal_upper_tail((v + 0.5) / scales)
    lik = jnp.sum(w * (upper - lower), axis=-1)
    return lower_bound(lik, LIKELIHOOD_BOUND)


def gaussian_quantize(x: jax.Array, mode: str,
                      means: Optional[jax.Array] = None,
                      key: Optional[jax.Array] = None) -> jax.Array:
    """'noise' | 'dequantize' | 'symbols' quantization (STE on dequantize)."""
    if mode == "noise":
        if key is None:
            raise ValueError("'noise' mode requires a PRNG key")
        return quantize_noise(x, key)
    if mode == "dequantize":
        return quantize_ste(x, means)
    if mode == "symbols":
        v = x - means if means is not None else x
        return jnp.round(v).astype(jnp.int32)
    raise ValueError(f"unknown quantization mode {mode!r}")


def build_indexes(scale_table: jax.Array, scales: jax.Array,
                  scale_bound: float = SCALES_MIN) -> jax.Array:
    """Map each scale to the index of the smallest table entry >= scale."""
    scales = jnp.maximum(scales, scale_bound)
    return jnp.searchsorted(scale_table[:-1], scales, side="left"
                            ).astype(jnp.int32)


__all__ = [
    "LIKELIHOOD_BOUND", "SCALES_MIN", "SCALES_MAX", "SCALES_LEVELS",
    "lower_bound", "quantize_ste", "quantize_noise",
    "FactorizedParams", "factorized_init", "factorized_logits",
    "factorized_likelihood", "factorized_medians", "factorized_forward",
    "factorized_aux_loss", "fit_quantiles",
    "default_scale_table", "gaussian_likelihood",
    "gaussian_mixture_likelihood", "gaussian_quantize",
    "build_indexes",
]
