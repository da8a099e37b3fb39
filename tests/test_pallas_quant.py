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
