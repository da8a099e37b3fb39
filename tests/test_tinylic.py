"""Tests for the TinyLIC model (tiny config for CPU CI)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdoptq_tpu.models import tinylic as T
from rdoptq_tpu.ops import metrics as M
from rdoptq_tpu.quant import light, wrap


@pytest.fixture(scope="module")
def tiny():
    model = T.TinyLIC(N=16, M=24, slices=(8, 16), depths=(1, 1, 1, 1, 1, 1))
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_forward_shapes(tiny):
    model, params = tiny
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    out = model.forward(params, x)
    assert out["x_hat"].shape == x.shape
    assert out["y"].shape == (1, 4, 4, 24)
    assert np.isfinite(
        float(M.bpp_from_likelihoods(out["likelihoods"], 64 * 64)))


def test_lambda_conditioning_changes_output(tiny):
    model, params = tiny
    # scaling nets are zero-init (identity); give fc2 a nonzero weight so
    # λ actually modulates the transform
    p2 = params
    import rdoptq_tpu.models.base as B
    w = B.get_leaf(params, "g_a/scale0/fc2/w")
    p2 = B.set_leaf(p2, "g_a/scale0/fc2/w", jnp.ones_like(w) * 0.01)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    out_lo = model.with_lambda(0.0001).forward(p2, x)
    out_hi = model.with_lambda(0.05).forward(p2, x)
    assert not np.allclose(np.asarray(out_lo["y"]), np.asarray(out_hi["y"]))


def test_checkerboard_anchor_mask():
    m = np.asarray(T.checkerboard_anchor_mask(4, 4))[0, :, :, 0]
    assert m[0, 0] == 0 and m[1, 1] == 0  # non-anchor
    assert m[0, 1] == 1 and m[1, 0] == 1  # anchor
    assert m.sum() == 8


def test_metanext_block_residual():
    p = T.metanext_block_init(jax.random.PRNGKey(0), 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 16))
    y = T.metanext_block(p, x)
    # layer-scale init 1e-6 => near-identity at init
    assert float(jnp.max(jnp.abs(y - x))) < 1e-3


def test_inception_dw_channel_split():
    p = T.inception_dw_init(jax.random.PRNGKey(0), 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 16))
    y = T.inception_dw(p, x)
    assert y.shape == x.shape
    # identity branch (first C - 3*gc channels) is untouched
    gc = 2
    assert np.allclose(np.asarray(y[..., : 16 - 3 * gc]),
                       np.asarray(x[..., : 16 - 3 * gc]))


def test_quant_leaves_exclude_layer_scale(tiny):
    _, params = tiny
    leaves = wrap.find_quant_leaves(params)
    paths = {l.path for l in leaves}
    # layer-scale 'ls' must not be quantized; mixer/mlp/scaling nets are
    assert not any(p.endswith("/ls") for p in paths)
    assert "g_a/mns1/block0/mixer/dw_hw/w" in paths
    assert "g_a/scale0/fc1/w" in paths
    assert "sc/slice0/w" in paths and "cc/slice1/conv2/w" in paths


def test_light_int8_on_tinylic(tiny):
    """The reference's light INT8 flow end-to-end on TinyLIC."""
    model, params = tiny
    lq = light.quantize_model(params)
    pq = light.dequantized_params(lq)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    out = model.forward(pq, x)
    assert np.isfinite(np.asarray(out["x_hat"])).all()
    assert light.quantized_size_bytes(lq) < 0.6 * light.model_size_bytes(params)
