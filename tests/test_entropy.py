"""Tests for the JAX entropy models (factorized bottleneck + Gaussian
conditional)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from rdoptq_tpu.ops import entropy
from rdoptq_tpu.ops import entropy as E


def _params(c=4, seed=0):
    return entropy.factorized_init(jax.random.PRNGKey(seed), c)


def test_factorized_likelihood_is_a_density():
    p = _params()
    # sum of P(bin around k) over a wide integer grid must approach 1
    grid = jnp.arange(-80, 81, dtype=jnp.float32)
    x = jnp.tile(grid[None, None, :], (4, 1, 1))
    lik = entropy.factorized_likelihood(p, x)
    totals = np.asarray(jnp.sum(lik, axis=-1)).ravel()
    assert np.all(totals > 0.99) and np.all(totals <= 1.0 + 1e-5)
    assert np.all(np.asarray(lik) >= 0)


def test_factorized_logits_monotone():
    p = _params(c=2, seed=1)
    x = jnp.linspace(-30, 30, 201).reshape(1, 1, -1)
    x = jnp.tile(x, (2, 1, 1))
    logits = np.asarray(entropy.factorized_logits(p, x))
    assert np.all(np.diff(logits[:, 0, :], axis=-1) >= -1e-6)


def test_factorized_forward_shapes_and_rounding():
    p = _params()
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 4)) * 3.0
    x_hat, lik = entropy.factorized_forward(p, x, training=False)
    assert x_hat.shape == x.shape and lik.shape == x.shape
    # eval path: values are integer offsets from channel medians
    med = entropy.factorized_medians(p).reshape(1, 1, 1, -1)
    frac = np.asarray(x_hat - med)
    assert np.allclose(frac, np.round(frac), atol=1e-5)
    # noise path stays within +-0.5 of the input
    x_noisy, _ = entropy.factorized_forward(p, x, training=True,
                                            key=jax.random.PRNGKey(3))
    assert float(jnp.max(jnp.abs(x_noisy - x))) <= 0.5


def test_fit_quantiles_centers_median():
    p = _params(c=6, seed=4)
    p = entropy.fit_quantiles(p, tail_mass=1e-9)
    logits = entropy.factorized_logits(p, p.quantiles)
    med_logits = np.asarray(logits)[:, 0, 1]
    assert np.all(np.abs(med_logits) < 1e-2)
    # aux loss should be near its floor after the bisection fit
    assert float(entropy.factorized_aux_loss(p)) < 1.0


def test_gaussian_likelihood_matches_scipy():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(64,)).astype(np.float32) * 4
    scales = np.abs(rng.normal(size=(64,)).astype(np.float32)) * 2 + 0.2
    means = rng.normal(size=(64,)).astype(np.float32)
    lik = np.asarray(entropy.gaussian_likelihood(
        jnp.asarray(x), jnp.asarray(scales), jnp.asarray(means)))
    ref = (scipy.stats.norm.cdf(x + 0.5, means, scales)
           - scipy.stats.norm.cdf(x - 0.5, means, scales))
    assert np.allclose(lik, ref, atol=1e-5)


def test_gaussian_scale_lower_bound():
    x = jnp.zeros((4,))
    tiny = jnp.full((4,), 1e-4)
    lik = entropy.gaussian_likelihood(x, tiny)
    ref = entropy.gaussian_likelihood(x, jnp.full((4,), entropy.SCALES_MIN))
    assert np.allclose(lik, ref)


def test_build_indexes_matches_reference_loop():
    table = entropy.default_scale_table()
    rng = np.random.default_rng(6)
    scales = np.abs(rng.normal(size=(50,))).astype(np.float32) * 30 + 0.01
    idx = np.asarray(entropy.build_indexes(table, jnp.asarray(scales)))
    # independent port of compressai-style index build
    t = np.asarray(table)
    ref = np.full(scales.shape, len(t) - 1, np.int32)
    s_b = np.maximum(scales, entropy.SCALES_MIN)
    for s in t[:-1]:
        ref -= (s_b <= s).astype(np.int32)
    assert np.array_equal(idx, ref)
    # every scale must be <= its assigned table entry
    assert np.all(s_b <= t[idx] + 1e-6)


def test_quantize_modes():
    x = jnp.array([1.2, -0.7, 3.6])
    means = jnp.array([0.2, 0.0, 0.5])
    deq = entropy.gaussian_quantize(x, "dequantize", means)
    assert np.allclose(deq, np.round(np.asarray(x - means)) + means)
    sym = entropy.gaussian_quantize(x, "symbols", means)
    assert sym.dtype == jnp.int32
    assert np.array_equal(np.asarray(sym), np.round(np.asarray(x - means)))
    noisy = entropy.gaussian_quantize(x, "noise", key=jax.random.PRNGKey(0))
    assert float(jnp.max(jnp.abs(noisy - x))) <= 0.5


def test_quantize_ste_gradient():
    g = jax.grad(lambda v: jnp.sum(entropy.quantize_ste(v)))(jnp.ones(3))
    assert np.allclose(g, 1.0)


def test_lower_bound_gradients():
    f = lambda v: jnp.sum(entropy.lower_bound(v, 1.0))
    g = jax.grad(f)(jnp.array([0.5, 2.0]))
    # below bound: positive (loss-increasing) grads are blocked
    assert g[0] == 0.0 and g[1] == 1.0
    g2 = jax.grad(lambda v: -jnp.sum(entropy.lower_bound(v, 1.0)))(
        jnp.array([0.5]))
    # below bound but gradient pushes value up: passes through
    assert g2[0] == -1.0


def test_gmm_reduces_to_single_gaussian():
    """K=1 mixture == the single-Gaussian likelihood for any weight."""
    x = jnp.linspace(-4, 4, 33).reshape(1, 33)
    scales = jnp.full((1, 33), 0.7)
    means = jnp.full((1, 33), 0.3)
    single = E.gaussian_likelihood(x, scales, means)
    mix = E.gaussian_mixture_likelihood(
        x, scales[..., None], means[..., None], jnp.zeros((1, 33, 1)))
    assert np.allclose(np.asarray(single), np.asarray(mix), atol=1e-6)


def test_gmm_sums_to_one_over_integers():
    """Mixture bin likelihoods over all integer bins sum to ~1."""
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    K = 3
    means = jax.random.normal(k1, (K,)) * 2.0
    scales = jnp.exp(jax.random.normal(k2, (K,)) * 0.3)
    weights = jax.random.normal(k3, (K,))
    xs = jnp.arange(-60, 61).astype(jnp.float32)
    lik = E.gaussian_mixture_likelihood(
        xs, jnp.broadcast_to(scales, (121, K)),
        jnp.broadcast_to(means, (121, K)),
        jnp.broadcast_to(weights, (121, K)))
    assert abs(float(jnp.sum(lik)) - 1.0) < 1e-4


def test_gmm_gradients_finite():
    def loss(s, m, w):
        x = jnp.zeros((4,))
        lik = E.gaussian_mixture_likelihood(
            x, jnp.broadcast_to(s, (4, 2)), jnp.broadcast_to(m, (4, 2)),
            jnp.broadcast_to(w, (4, 2)))
        return -jnp.sum(jnp.log2(lik))

    g = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.array([0.5, 2.0]), jnp.array([-1.0, 1.0]), jnp.array([0.0, 0.5]))
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()
