"""Pallas quantization kernels vs jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from rdoptq_tpu.ops import pallas_quant as PQ
from rdoptq_tpu.ops import quant as Q


def test_dynamic_act_quant_kernel_matches_reference():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 24)).astype(np.float32) * 3)
    got = PQ.dynamic_act_quant_pallas(x, interpret=True)
    want = Q.dynamic_act_fake_quant(x, channel_axis=-1)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_dynamic_act_quant_kernel_nonmultiple_channels():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 5, 7, 130)).astype(np.float32))
    got = PQ.dynamic_act_quant_pallas(x, interpret=True)
    want = Q.dynamic_act_fake_quant(x, channel_axis=-1)
    assert got.shape == x.shape
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fixed_point_kernel_matches_reference():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(3, 11, 6, 5)).astype(np.float32) * 100)
    got = PQ.fixed_point_quant_pallas(x, interpret=True)
    want = Q.fixed_point_act_quant(x)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_dispatch_falls_back_on_cpu():
    x = jnp.ones((1, 4, 4, 8))
    out = PQ.dynamic_act_quant(x)  # CPU -> jnp path
    assert out.shape == x.shape


def test_gdn_pallas_matches_layers_gdn():
    """Fused GDN kernel (interpret mode) vs the stock conv formula, both
    directions, including a row count that does not divide the kernel's
    row tile (exercises the padding path)."""
    from rdoptq_tpu.models import layers as L
    from rdoptq_tpu.ops import pallas_gdn as PG
    rng = np.random.default_rng(3)
    c = 24
    p = {"gamma": jnp.asarray(
             np.abs(rng.normal(size=(1, 1, c, c))).astype(np.float32) * .1),
         "beta": jnp.asarray(
             np.abs(rng.normal(size=(c,))).astype(np.float32) + 0.5)}
    x = jnp.asarray(rng.normal(size=(1, 7, 9, c)).astype(np.float32))
    for inverse in (False, True):
        want = L.gdn(p, x, inverse=inverse, use_pallas=False)
        got = PG.gdn_pallas(x, p["gamma"].reshape(c, c), p["beta"],
                            inverse, 1e-6, True)
        assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-6), \
            f"inverse={inverse}"


def test_gdn_pallas_grads_match_reference():
    """The custom VJP must reproduce the stock formula's gradients (the
    RDO calibration differentiates through GDN in the coder suffix)."""
    from rdoptq_tpu.models import layers as L
    from rdoptq_tpu.ops import pallas_gdn as PG
    rng = np.random.default_rng(4)
    c = 8
    gamma = jnp.asarray(
        np.abs(rng.normal(size=(c, c))).astype(np.float32) * .1)
    beta = jnp.asarray(np.abs(rng.normal(size=(c,))).astype(np.float32) + .5)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, c)).astype(np.float32))

    def f_pallas(xx, gg, bb):
        return jnp.sum(PG.gdn_pallas(xx, gg, bb, False, 1e-6, True) ** 2)

    def f_ref(xx, gg, bb):
        p = {"gamma": gg.reshape(1, 1, c, c), "beta": bb}
        return jnp.sum(L.gdn(p, xx, use_pallas=False) ** 2)

    g1 = jax.grad(f_pallas, argnums=(0, 1, 2))(x, gamma, beta)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(g1, g2):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
