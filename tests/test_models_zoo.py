"""Tests for Cheng2020 and Lu2022 models (tiny dims for CPU CI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdoptq_tpu.models import swin
from rdoptq_tpu.models.cheng2020 import Cheng2020
from rdoptq_tpu.models.lu2022 import Lu2022
from rdoptq_tpu.ops import metrics as M
from rdoptq_tpu.quant import rdo, wrap


def test_cheng2020_forward_and_leaves():
    model = Cheng2020(N=16)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    out = model.forward(params, x)
    assert out["x_hat"].shape == x.shape
    assert out["y"].shape == (1, 4, 4, 16)
    bpp = M.bpp_from_likelihoods(out["likelihoods"], 64 * 64)
    assert np.isfinite(float(bpp))
    leaves = wrap.find_quant_leaves(params)
    paths = {l.path for l in leaves}
    assert "g_a/rbws0/gdn/gamma" in paths
    assert "g_s/subpel7/w" in paths
    # identity-skip residual blocks have no skip conv leaf
    assert "g_a/rb1/skip/w" not in paths


def test_cheng2020_block_unit_calibration():
    model = Cheng2020(N=16)
    params = model.init(jax.random.PRNGKey(2))
    cali = jax.random.uniform(jax.random.PRNGKey(3), (4, 64, 64, 3))
    state = rdo.init_ptq_state(params, wrap.WeightQuantConfig(n_bits=8))
    cfg = rdo.RDOConfig(iters=20, batch_size=2)
    info = rdo.calibrate_unit(model, params, state, model.g_a, 0, cali,
                              cfg, key=jax.random.PRNGKey(4))
    # the whole residual block's leaves were jointly optimized
    assert "g_a/rbws0/conv1/w" in state.alphas
    assert "g_a/rbws0/gdn/gamma" in state.alphas
    assert np.isfinite(info["loss_last"])


def test_cheng2020_attn_forward_and_calibration():
    """cheng2020_attn variant: attention stages in g_a/g_s, their convs
    discovered as quant leaves and jointly calibrated as one unit."""
    model = Cheng2020(N=16, attention=True)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    out = model.forward(params, x)
    assert out["x_hat"].shape == x.shape
    names = [st.name for st in model.g_a.stages]
    assert names[3] == "g_a/attn_mid" and names[-1] == "g_a/attn_out"
    assert model.g_s.stages[0].name == "g_s/attn_in"
    paths = {l.path for l in wrap.find_quant_leaves(params)}
    assert "g_a/attn_mid/trunk/u0/c1/w" in paths
    assert "g_a/attn_mid/mask_out/w" in paths

    cali = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    state = rdo.init_ptq_state(params, wrap.WeightQuantConfig(n_bits=8))
    cfg = rdo.RDOConfig(iters=10, batch_size=2)
    info = rdo.calibrate_unit(model, params, state, model.g_a, 3, cali,
                              cfg, key=jax.random.PRNGKey(3))
    assert "g_a/attn_mid/mask/u2/c3/w" in state.alphas
    assert np.isfinite(info["loss_last"])


def test_cheng2020_attn_registry():
    from rdoptq_tpu.models import registry
    m = registry.build_model("Cheng2020Attn", 3)
    assert m.N == 128 and m.attention
    m6 = registry.build_model("Cheng2020Attn", 6)
    assert m6.N == 192


def test_cheng2020_gmm_forward_train_and_calibration():
    """GMM (K=3) entropy model: mixture-conditioned likelihoods drive the
    fake-quant eval and the training gradient, and the ep head stays a
    calibratable unit (the paper's 'GMM+attention' configuration)."""
    from rdoptq_tpu.models import registry
    m = registry.build_model("Cheng2020GMM", 3)
    assert m.K == 3 and m.attention and m.N == 128

    model = Cheng2020(N=16, attention=True, K=3)
    params = model.init(jax.random.PRNGKey(0))
    assert params["ep"]["conv2"]["w"].shape[-1] == 3 * 3 * 16
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    out = model.forward(params, x)
    assert out["x_hat"].shape == x.shape
    bpp = M.bpp_from_likelihoods(out["likelihoods"], 64 * 64)
    assert np.isfinite(float(bpp)) and float(bpp) > 0
    lik = np.asarray(out["likelihoods"]["y"])
    assert lik.shape == out["y"].shape  # mixture axis summed out
    assert (lik > 0).all() and (lik <= 1.0 + 1e-6).all()

    # training forward (noise quantization) differentiates through the
    # mixture likelihood
    def loss(p):
        o = model.forward(p, x, training=True, key=jax.random.PRNGKey(2))
        return M.bpp_from_likelihoods(o["likelihoods"], 64 * 64)

    g = jax.grad(loss)(params)
    gw = np.asarray(g["ep"]["conv2"]["w"])
    assert np.isfinite(gw).all() and np.abs(gw).max() > 0

    # the GMM ep head calibrates like any other unit
    cali = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 3))
    state = rdo.init_ptq_state(params, wrap.WeightQuantConfig(n_bits=8))
    cfg = rdo.RDOConfig(iters=5, batch_size=2)
    info = rdo.calibrate_unit(model, params, state, model.ep, 2, cali,
                              cfg, key=jax.random.PRNGKey(4))
    assert "ep/conv2/w" in state.alphas
    assert np.isfinite(info["loss_last"])


@pytest.fixture(scope="module")
def tiny_lu():
    model = Lu2022(embed_dim=16, latent_dim=32, window_size=4)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_lu2022_forward(tiny_lu):
    model, params = tiny_lu
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 128, 3))
    out = model.forward(params, x)
    assert out["x_hat"].shape == x.shape
    assert out["y"].shape == (1, 8, 8, 32)
    assert out["z"].shape == (1, 2, 2, 16)
    assert np.isfinite(
        float(M.bpp_from_likelihoods(out["likelihoods"], 128 * 128)))


def test_lu2022_rstb_block_calibration(tiny_lu):
    model, params = tiny_lu
    cali = jax.random.uniform(jax.random.PRNGKey(2), (2, 128, 128, 3))
    state = rdo.init_ptq_state(params, wrap.WeightQuantConfig(n_bits=8))
    cfg = rdo.RDOConfig(iters=10, batch_size=2)
    info = rdo.calibrate_unit(model, params, state, model.g_a, 1, cali,
                              cfg, key=jax.random.PRNGKey(3))
    assert "g_a/rstb1/block0/attn/qkv/w" in state.alphas
    assert "g_a/rstb1/block1/mlp/fc2/w" in state.alphas
    assert np.isfinite(info["loss_last"])


def test_window_partition_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 12, 5))
    w = swin.window_partition(x, 4)
    assert w.shape == (2, 6, 16, 5)
    back = swin.window_reverse(w, 4, 8, 12)
    assert np.allclose(np.asarray(back), np.asarray(x))


def test_relative_position_index_properties():
    idx = swin.relative_position_index(4)
    assert idx.shape == (16, 16)
    assert idx.min() >= 0 and idx.max() < 7 * 7
    # diagonal = center of the table
    assert np.all(np.diag(idx) == (4 - 1) * (2 * 4 - 1) + (4 - 1))


def test_shift_mask_blocks_cross_region_attention():
    m = swin.shift_attn_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert set(np.unique(m)) == {-100.0, 0.0}
    # the top-left window is entirely one region: no masking
    assert np.all(m[0] == 0.0)


def test_shift_mask_device_matches_numpy():
    # the on-device (iota-built) mask must be bit-identical to the numpy
    # constant it replaced (swin.py: HTTP-413 fix for 2K eval programs)
    for h, w, ws, shift in [(8, 8, 4, 2), (16, 24, 8, 4), (24, 16, 8, 4),
                            (32, 32, 8, 4)]:
        ref = swin.shift_attn_mask(h, w, ws, shift)
        dev = np.asarray(swin.shift_attn_mask_device(h, w, ws, shift))
        assert dev.dtype == np.float32
        np.testing.assert_array_equal(ref, dev)


def test_swin_block_shift_equivariance_smoke():
    # shifted vs non-shifted blocks must both preserve shape & finiteness
    p = swin.swin_block_init(jax.random.PRNGKey(0), 16, 4, 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 16))
    y0 = swin.swin_block(p, x, 4, 4, 0)
    y1 = swin.swin_block(p, x, 4, 4, 2)
    assert y0.shape == x.shape and y1.shape == x.shape
    assert np.isfinite(np.asarray(y0)).all()
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_window_attention_matches_torch_reference():
    """Cross-check the attention math (qkv split order, scaling,
    relative-position-bias gather) against an independent torch
    implementation of standard Swin window attention."""
    torch = pytest.importorskip("torch")
    dim, heads, ws = 16, 4, 4
    n = ws * ws
    p = swin.window_attention_init(jax.random.PRNGKey(0), dim, heads, ws)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, n, dim))

    out_j = np.asarray(swin.window_attention(p, x, heads, ws, mask=None))

    # torch reference (timm/Swin semantics)
    qkv_w = torch.tensor(np.asarray(p["qkv"]["w"]).T)   # (3C, C)
    qkv_b = torch.tensor(np.asarray(p["qkv"]["b"]))
    proj_w = torch.tensor(np.asarray(p["proj"]["w"]).T)
    proj_b = torch.tensor(np.asarray(p["proj"]["b"]))
    table = torch.tensor(np.asarray(p["rpb_table"]))
    idx = torch.tensor(swin.relative_position_index(ws).reshape(-1),
                       dtype=torch.long)
    xt = torch.tensor(np.asarray(x).reshape(2, n, dim))  # windows as batch
    hd = dim // heads
    qkv = (xt @ qkv_w.T + qkv_b).reshape(2, n, 3, heads, hd)
    qkv = qkv.permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
    rpb = table[idx].reshape(n, n, heads).permute(2, 0, 1)
    attn = torch.softmax(attn + rpb.unsqueeze(0), dim=-1)
    out_t = (attn @ v).transpose(1, 2).reshape(2, n, dim)
    out_t = (out_t @ proj_w.T + proj_b).numpy()

    assert np.allclose(out_j[0], out_t, atol=2e-5)


def test_swin_block_shifted_matches_torch_reference():
    """Full shifted-window block vs an independent torch implementation
    (roll + window partition + masked attention + reverse + MLP)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as tF
    dim, heads, ws, shift = 8, 2, 4, 2
    H = W = 8
    p = swin.swin_block_init(jax.random.PRNGKey(3), dim, heads, ws)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, H, W, dim))
    out_j = np.asarray(swin.swin_block(p, x, heads, ws, shift))

    def t(a):
        return torch.tensor(np.asarray(a))

    xt = t(x)[0]  # (H, W, C)
    n1s, n1b = t(p["norm1"]["scale"]), t(p["norm1"]["bias"])
    n2s, n2b = t(p["norm2"]["scale"]), t(p["norm2"]["bias"])
    qkv_w, qkv_b = t(p["attn"]["qkv"]["w"]), t(p["attn"]["qkv"]["b"])
    proj_w, proj_b = t(p["attn"]["proj"]["w"]), t(p["attn"]["proj"]["b"])
    table = t(p["attn"]["rpb_table"])
    idx = torch.tensor(swin.relative_position_index(ws).reshape(-1),
                       dtype=torch.long)
    fc1_w, fc1_b = t(p["mlp"]["fc1"]["w"]), t(p["mlp"]["fc1"]["b"])
    fc2_w, fc2_b = t(p["mlp"]["fc2"]["w"]), t(p["mlp"]["fc2"]["b"])
    mask = torch.tensor(swin.shift_attn_mask(H, W, ws, shift))

    with torch.no_grad():
        shortcut = xt
        h = tF.layer_norm(xt, (dim,), n1s, n1b)
        h = torch.roll(h, (-shift, -shift), dims=(0, 1))
        n = ws * ws
        nw = (H // ws) * (W // ws)
        win = h.reshape(H // ws, ws, W // ws, ws, dim)
        win = win.permute(0, 2, 1, 3, 4).reshape(nw, n, dim)
        hd = dim // heads
        qkv = (win @ qkv_w + qkv_b).reshape(nw, n, 3, heads, hd)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
        rpb = table[idx].reshape(n, n, heads).permute(2, 0, 1)
        attn = attn + rpb.unsqueeze(0) + mask.unsqueeze(1)
        attn = torch.softmax(attn, dim=-1)
        o = (attn @ v).transpose(1, 2).reshape(nw, n, dim)
        o = o @ proj_w + proj_b
        o = o.reshape(H // ws, W // ws, ws, ws, dim)
        o = o.permute(0, 2, 1, 3, 4).reshape(H, W, dim)
        o = torch.roll(o, (shift, shift), dims=(0, 1))
        xt2 = shortcut + o
        m = tF.layer_norm(xt2, (dim,), n2s, n2b)
        m = tF.gelu(m @ fc1_w + fc1_b) @ fc2_w + fc2_b
        out_t = (xt2 + m).numpy()

    assert np.allclose(out_j[0], out_t, atol=3e-5), \
        np.abs(out_j[0] - out_t).max()
