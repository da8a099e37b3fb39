"""Tests for config, checkpointing, and torch checkpoint conversion
(layer-level conversions validated against torch CPU directly)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdoptq_tpu.models import layers as L
from rdoptq_tpu.utils import checkpoint, config, torch_convert


def test_config_defaults_and_cli_override():
    cfg = config.parse_args([])
    assert cfg.quality == 6 and cfg.iters_w == 20000
    cfg2 = config.parse_args(["--quality", "3", "--n_bits_w", "10",
                              "--act_quant"])
    assert cfg2.quality == 3 and cfg2.n_bits_w == 10 and cfg2.act_quant


def test_lambda_registries_span_reference_quality_range():
    """q1-8 λ grids (reference ReadMe.md:52-54 lists q1-6; config.yaml:20
    pins q8 mse λ=0.18; ckpts/image.py:47-58 spans q1-8)."""
    assert len(config.LAMBDAS_MSE) == 8
    assert len(config.LAMBDAS_MSSSIM) == 8
    assert config.LAMBDAS_MSE[5] == 0.0483      # q6, ReadMe.md:65
    assert config.LAMBDAS_MSE[7] == 0.1800      # q8, config.yaml:20
    assert config.LAMBDAS_MSSSIM[5] == 60.50    # q6, ReadMe.md:73
    assert config.lambda_for(6) == 0.0483
    assert config.lambda_for(6, "ms-ssim") == 60.50
    # clamped outside the grid
    assert config.lambda_for(0) == config.LAMBDAS_MSE[0]
    assert config.lambda_for(99) == config.LAMBDAS_MSE[-1]
    # monotone rate ladders
    assert list(config.LAMBDAS_MSE) == sorted(config.LAMBDAS_MSE)
    assert list(config.LAMBDAS_MSSSIM) == sorted(config.LAMBDAS_MSSSIM)


def test_registry_tinylic_metric_lambda():
    """TinyLIC quality->λ goes through the metric's registry."""
    from rdoptq_tpu.models import registry
    m_mse = registry.build_model("TinyLIC", 6)
    m_ssim = registry.build_model("TinyLIC", 6, metric="ms-ssim")
    assert float(m_mse.lambda_rd) == 0.0483
    assert float(m_ssim.lambda_rd) == 60.50


def test_config_yaml_plus_cli(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text("quality: 2\nlmbda: 0.0035\narch: Cheng2020\n")
    cfg = config.parse_args(["--config", str(y)])
    assert cfg.quality == 2 and cfg.arch == "Cheng2020"


def test_run_dirs(tmp_path):
    cfg = config.RunConfig(results_dir=str(tmp_path), name="run1")
    out_dir, log_dir = config.init_run_dirs(cfg)
    assert os.path.isdir(out_dir) and os.path.isdir(log_dir)
    assert os.path.exists(os.path.join(out_dir, "config.json"))


def test_checkpoint_roundtrip(tmp_path):
    from rdoptq_tpu.models.minnen2018 import Minnen2018
    model = Minnen2018(N=8, M=8)
    params = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "params.npz")
    checkpoint.save_pytree(path, params)
    back = checkpoint.load_pytree(path)
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(back)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        assert np.allclose(np.asarray(a), np.asarray(b))
    # structure: entropy params come back as the NamedTuple
    from rdoptq_tpu.ops.entropy import FactorizedParams
    assert isinstance(back["eb"], FactorizedParams)


def test_ptq_state_roundtrip(tmp_path):
    from rdoptq_tpu.models.minnen2018 import Minnen2018
    from rdoptq_tpu.quant import rdo, wrap
    model = Minnen2018(N=8, M=8)
    params = model.init(jax.random.PRNGKey(0))
    state = rdo.init_ptq_state(params, wrap.WeightQuantConfig(n_bits=8))
    state.alphas["g_a/conv0/w"] = jnp.asarray(
        np.random.default_rng(0).normal(size=(5, 5, 3, 8)).astype(np.float32))
    state.trained_leaves = ("g_a/conv0/w",)
    state.trained_stages = ("g_a/conv0",)
    path = str(tmp_path / "ptq.npz")
    checkpoint.save_ptq_state(path, state)
    back = checkpoint.load_ptq_state(path)
    assert back.trained_leaves == ("g_a/conv0/w",)
    # hard decisions preserved exactly
    want = np.asarray(state.alphas["g_a/conv0/w"]) >= 0
    got = np.asarray(back.alphas["g_a/conv0/w"]) >= 0
    assert np.array_equal(want, got)
    assert np.allclose(np.asarray(back.qstate["g_a/conv0/w"].delta),
                       np.asarray(state.qstate["g_a/conv0/w"].delta))


def test_torch_conv_conversion_matches_torch():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    m = torch.nn.Conv2d(3, 8, 5, stride=2, padding=2)
    x = torch.randn(1, 3, 16, 16)
    with torch.no_grad():
        y_t = m(x).numpy().transpose(0, 2, 3, 1)
    p = {"w": jnp.asarray(torch_convert.conv_kernel(m.weight)),
         "b": jnp.asarray(m.bias.detach().numpy())}
    y_j = L.conv2d(p, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                   stride=2)
    assert np.allclose(np.asarray(y_j), y_t, atol=1e-5)


def test_torch_tconv_conversion_matches_torch():
    torch = pytest.importorskip("torch")
    torch.manual_seed(1)
    for k in (3, 5):
        m = torch.nn.ConvTranspose2d(4, 6, k, stride=2, padding=k // 2,
                                     output_padding=1)
        x = torch.randn(1, 4, 7, 9)
        with torch.no_grad():
            y_t = m(x).numpy().transpose(0, 2, 3, 1)
        p = {"w": jnp.asarray(torch_convert.tconv_kernel(m.weight)),
             "b": jnp.asarray(m.bias.detach().numpy())}
        y_j = L.conv_transpose2d(p, jnp.asarray(
            x.numpy().transpose(0, 2, 3, 1)), stride=2)
        assert y_j.shape == y_t.shape
        assert np.allclose(np.asarray(y_j), y_t, atol=1e-5), f"k={k}"


def test_torch_linear_and_ln_conversion():
    torch = pytest.importorskip("torch")
    torch.manual_seed(2)
    lin = torch.nn.Linear(6, 10)
    x = torch.randn(3, 6)
    with torch.no_grad():
        y_t = lin(x).numpy()
    p = {"w": jnp.asarray(torch_convert.linear_weight(lin.weight)),
         "b": jnp.asarray(lin.bias.detach().numpy())}
    y_j = L.linear(p, jnp.asarray(x.numpy()))
    assert np.allclose(np.asarray(y_j), y_t, atol=1e-5)

    ln = torch.nn.LayerNorm(6)
    with torch.no_grad():
        ln.weight.mul_(1.3)
        ln.bias.add_(0.1)
        y_t = ln(x).numpy()
    pl = {"scale": jnp.asarray(ln.weight.detach().numpy()),
          "bias": jnp.asarray(ln.bias.detach().numpy())}
    y_j = L.layer_norm(pl, jnp.asarray(x.numpy()))
    assert np.allclose(np.asarray(y_j), y_t, atol=1e-5)


def test_gdn_dereparametrization_roundtrip():
    """Forward-map effective values into CompressAI's sqrt-storage and back."""
    rng = np.random.default_rng(3)
    beta_eff = np.abs(rng.normal(1.0, 0.1, 8)).astype(np.float32)
    gamma_eff = np.abs(rng.normal(0.1, 0.02, (8, 8))).astype(np.float32)
    ped = 2.0 ** -18
    beta_stored = np.sqrt(beta_eff + ped)
    gamma_stored = np.sqrt(gamma_eff + ped)
    out = torch_convert.gdn_params(beta_stored, gamma_stored)
    assert np.allclose(out["beta"], beta_eff, atol=1e-5)
    assert np.allclose(out["gamma"].transpose(3, 2, 0, 1).reshape(8, 8),
                       gamma_eff, atol=1e-5)


def test_convert_minnen_full_statedict():
    """Structural end-to-end: a synthetic mbt2018-style state dict converts
    into a pytree the Minnen2018 model can run."""
    torch = pytest.importorskip("torch")
    from rdoptq_tpu.models.minnen2018 import Minnen2018
    model = Minnen2018(N=8, M=8)
    N = M = 8
    sd = {}
    g = torch.Generator().manual_seed(0)

    def conv(name, i, o, k):
        sd[f"{name}.weight"] = torch.randn(o, i, k, k, generator=g) * 0.05
        sd[f"{name}.bias"] = torch.randn(o, generator=g) * 0.01

    def tconv(name, i, o, k):
        sd[f"{name}.weight"] = torch.randn(i, o, k, k, generator=g) * 0.05
        sd[f"{name}.bias"] = torch.randn(o, generator=g) * 0.01

    def gdn(name, c):
        sd[f"{name}.beta"] = torch.sqrt(torch.ones(c) + 2 ** -18)
        sd[f"{name}.gamma"] = torch.sqrt(0.1 * torch.eye(c) + 2 ** -18)

    conv("g_a.0", 3, N, 5); gdn("g_a.1", N)
    conv("g_a.2", N, N, 5); gdn("g_a.3", N)
    conv("g_a.4", N, N, 5); gdn("g_a.5", N)
    conv("g_a.6", N, M, 5)
    tconv("g_s.0", M, N, 5); gdn("g_s.1", N)
    tconv("g_s.2", N, N, 5); gdn("g_s.3", N)
    tconv("g_s.4", N, N, 5); gdn("g_s.5", N)
    tconv("g_s.6", N, 3, 5)
    conv("h_a.0", M, N, 3)
    conv("h_a.2", N, N, 5)
    conv("h_a.4", N, N, 5)
    tconv("h_s.0", N, M, 5)
    tconv("h_s.2", M, M * 3 // 2, 5)
    conv("h_s.4", M * 3 // 2, M * 2, 3)
    conv("context_prediction", M, 2 * M, 5)
    conv("entropy_parameters.0", M * 4, M * 10 // 3, 1)
    conv("entropy_parameters.2", M * 10 // 3, M * 8 // 3, 1)
    conv("entropy_parameters.4", M * 8 // 3, M * 2, 1)
    # entropy bottleneck params
    fdims = (1, 3, 3, 3, 3, 1)
    for i in range(5):
        sd[f"entropy_bottleneck._matrix{i}"] = torch.randn(
            N, fdims[i + 1], fdims[i], generator=g) * 0.1
        sd[f"entropy_bottleneck._bias{i}"] = torch.randn(
            N, fdims[i + 1], 1, generator=g) * 0.1
        if i < 4:
            sd[f"entropy_bottleneck._factor{i}"] = torch.zeros(
                N, fdims[i + 1], 1)
    sd["entropy_bottleneck.quantiles"] = torch.tensor(
        [[[-10.0, 0.0, 10.0]]] * N)

    # fix ep conv kernel creation (defined with default k)
    params = torch_convert.convert("Minnen2018", sd)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    out = model.forward(params, x)
    assert out["x_hat"].shape == x.shape
    assert np.isfinite(np.asarray(out["x_hat"])).all()
