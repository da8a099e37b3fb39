"""End-to-end tests for the Minnen2018 model and metric stack (tiny dims
to keep CPU compile time down)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdoptq_tpu.models import layers as L
from rdoptq_tpu.models.minnen2018 import Minnen2018
from rdoptq_tpu.ops import metrics as M


@pytest.fixture(scope="module")
def tiny():
    model = Minnen2018(N=32, M=48)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_forward_shapes_and_rates(tiny):
    model, params = tiny
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    out = model.forward(params, x)
    assert out["x_hat"].shape == x.shape
    assert out["y"].shape == (1, 4, 4, 48)
    assert out["z"].shape == (1, 1, 1, 32)
    bpp = M.bpp_from_likelihoods(out["likelihoods"], 64 * 64)
    assert np.isfinite(float(bpp)) and float(bpp) > 0


def test_forward_jits_and_training_mode(tiny):
    model, params = tiny
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    fwd = jax.jit(lambda p, v: model.forward(p, v)["x_hat"])
    assert fwd(params, x).shape == x.shape
    out = model.forward(params, x, training=True, key=jax.random.PRNGKey(3))
    assert out["x_hat"].shape == x.shape


def test_tape_capture_and_stage_slicing(tiny):
    model, params = tiny
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3))
    tape = {}
    y = model.g_a.run(params, x, tape=tape)
    assert "g_a/conv0:in" in tape and "g_a/conv3:out" in tape
    assert np.allclose(np.asarray(tape["g_a/conv3:out"]), np.asarray(y))
    # suffix run from a captured intermediate reproduces the full output
    k = model.g_a.index("g_a/conv2")
    y2 = model.g_a.run(params, tape["g_a/conv2:in"], start=k)
    assert np.allclose(np.asarray(y2), np.asarray(y), atol=1e-6)


def test_rd_loss_and_grad(tiny):
    model, params = tiny
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3))

    def loss_fn(p):
        out = model.forward(p, x, training=True, key=jax.random.PRNGKey(6))
        return M.rd_loss(out, x, lmbda=0.013)["loss"]

    g = jax.grad(loss_fn)(params)
    gmax = max(float(jnp.max(jnp.abs(v)))
               for v in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gmax) and gmax > 0


def test_conv_transpose_upsamples_exactly():
    p = L.conv_init(jax.random.PRNGKey(0), 5, 8, 4)
    x = jnp.ones((1, 6, 6, 8))
    y = L.conv_transpose2d(p, x, stride=2)
    assert y.shape == (1, 12, 12, 4)


def test_pixel_shuffle_matches_torch_semantics():
    # torch.nn.PixelShuffle: out[b, c, h*r+i, w*r+j] = in[b, c*r*r + i*r + j, h, w]
    r, c_out = 2, 3
    x = jnp.arange(1 * 2 * 2 * c_out * r * r, dtype=jnp.float32)
    x = x.reshape(1, 2, 2, c_out * r * r)  # NHWC
    y = L.pixel_shuffle(x, r)
    assert y.shape == (1, 4, 4, c_out)
    # element check: NHWC input channel index c*r*r + i*r + j
    for i in range(r):
        for j in range(r):
            for c in range(c_out):
                assert float(y[0, i, j, c]) == float(x[0, 0, 0, c * r * r + i * r + j])
    # inverse
    assert np.allclose(np.asarray(L.pixel_unshuffle(y, r)), np.asarray(x))


def test_pad_crop_roundtrip():
    x = jnp.ones((1, 100, 130, 3))
    padded, meta = M.pad_to_multiple(x, 64)
    assert padded.shape == (1, 128, 192, 3)
    back = M.crop_to_original(padded, meta)
    assert back.shape == x.shape


def test_pad_floor_single_bucket():
    """`floor` collapses varied shapes into one compile bucket (CLIC has
    23 unique sizes) while the crop still recovers the original pixels."""
    for h, w in ((100, 130), (384, 512), (200, 700)):
        x = jnp.arange(h * w * 3, dtype=jnp.float32).reshape(1, h, w, 3)
        padded, meta = M.pad_to_multiple(x, 64, floor=(384, 700))
        assert padded.shape == (1, 384, 704, 3)
        assert np.allclose(np.asarray(M.crop_to_original(padded, meta)),
                           np.asarray(x))
    # floor smaller than the image: plain multiple-rounding wins
    x = jnp.ones((1, 500, 900, 3))
    padded, _ = M.pad_to_multiple(x, 64, floor=(384, 700))
    assert padded.shape == (1, 512, 960, 3)


def test_psnr_and_msssim_sanity():
    key = jax.random.PRNGKey(7)
    a = jax.random.uniform(key, (1, 192, 192, 3))
    assert float(M.psnr(a, a)) > 60
    assert float(M.ms_ssim(a, a)) > 0.999
    noisy = jnp.clip(a + 0.05 * jax.random.normal(key, a.shape), 0, 1)
    p = float(M.psnr(a, noisy))
    assert 20 < p < 35
    m = float(M.ms_ssim(a, noisy))
    assert 0.5 < m < 1.0


def test_gdn_normalizes():
    p = L.gdn_init(8)
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 4, 4, 8)) * 10
    y = L.gdn(p, x)
    assert float(jnp.max(jnp.abs(y))) < float(jnp.max(jnp.abs(x)))
    y_inv = L.gdn(p, L.gdn(p, x))  # not exact inverses, just finite
    assert np.isfinite(np.asarray(y_inv)).all()
