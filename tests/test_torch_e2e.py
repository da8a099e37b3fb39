"""End-to-end torch↔jax parity: build a complete torch replica of the
Minnen2018 transforms (conv/GDN/tconv/masked-conv/EP — the same modules a
CompressAI mbt2018 checkpoint contains), convert its state dict, and
require matching outputs through every coder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from rdoptq_tpu.models.minnen2018 import Minnen2018
from rdoptq_tpu.utils import torch_convert

N, M = 8, 8
PED = 2.0 ** -18


class TGDN(tnn.Module):
    """Torch GDN with CompressAI's sqrt reparametrization storage."""

    def __init__(self, c, inverse=False):
        super().__init__()
        self.inverse = inverse
        self.beta = tnn.Parameter(torch.sqrt(torch.ones(c) + PED))
        g = 0.1 * torch.eye(c)
        self.gamma = tnn.Parameter(torch.sqrt(g + PED))

    def forward(self, x):
        c = x.shape[1]
        beta = torch.clamp(self.beta, min=(1e-6 + PED) ** 0.5) ** 2 - PED
        gamma = torch.clamp(self.gamma, min=PED ** 0.5) ** 2 - PED
        norm = tF.conv2d(x * x, gamma.reshape(c, c, 1, 1), beta)
        return x * torch.sqrt(norm) if self.inverse else x * torch.rsqrt(norm)


class TMaskedConv(tnn.Conv2d):
    def __init__(self, c_in, c_out, k):
        super().__init__(c_in, c_out, k, padding=k // 2)
        mask = torch.ones(k, k)
        mask[k // 2, k // 2:] = 0
        mask[k // 2 + 1:, :] = 0
        self.register_buffer("mask", mask[None, None])

    def forward(self, x):
        return self._conv_forward(x, self.weight * self.mask, self.bias)


class TorchMinnen(tnn.Module):
    def __init__(self):
        super().__init__()
        self.g_a = tnn.Sequential(
            tnn.Conv2d(3, N, 5, 2, 2), TGDN(N),
            tnn.Conv2d(N, N, 5, 2, 2), TGDN(N),
            tnn.Conv2d(N, N, 5, 2, 2), TGDN(N),
            tnn.Conv2d(N, M, 5, 2, 2))
        self.g_s = tnn.Sequential(
            tnn.ConvTranspose2d(M, N, 5, 2, 2, 1), TGDN(N, True),
            tnn.ConvTranspose2d(N, N, 5, 2, 2, 1), TGDN(N, True),
            tnn.ConvTranspose2d(N, N, 5, 2, 2, 1), TGDN(N, True),
            tnn.ConvTranspose2d(N, 3, 5, 2, 2, 1))
        self.h_a = tnn.Sequential(
            tnn.Conv2d(M, N, 3, 1, 1), tnn.LeakyReLU(),
            tnn.Conv2d(N, N, 5, 2, 2), tnn.LeakyReLU(),
            tnn.Conv2d(N, N, 5, 2, 2))
        self.h_s = tnn.Sequential(
            tnn.ConvTranspose2d(N, M, 5, 2, 2, 1), tnn.LeakyReLU(),
            tnn.ConvTranspose2d(M, M * 3 // 2, 5, 2, 2, 1),
            tnn.LeakyReLU(),
            tnn.Conv2d(M * 3 // 2, M * 2, 3, 1, 1))
        self.context_prediction = TMaskedConv(M, 2 * M, 5)
        self.entropy_parameters = tnn.Sequential(
            tnn.Conv2d(M * 4, M * 10 // 3, 1), tnn.LeakyReLU(),
            tnn.Conv2d(M * 10 // 3, M * 8 // 3, 1), tnn.LeakyReLU(),
            tnn.Conv2d(M * 8 // 3, M * 2, 1))


def _gdn_sd(m: TGDN):
    return {"beta": m.beta, "gamma": m.gamma}


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tm = TorchMinnen().eval()
    sd = {k: v for k, v in tm.state_dict().items()
          if not k.endswith(".mask")}
    # add a dummy entropy bottleneck so the converter finds everything
    fdims = (1, 3, 3, 3, 3, 1)
    g = torch.Generator().manual_seed(1)
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
    params = torch_convert.convert("Minnen2018", sd)
    return tm, params


def _nchw(x):
    return torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def test_g_a_matches(pair):
    tm, params = pair
    model = Minnen2018(N=N, M=M)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    y_j = np.asarray(model.g_a.run(params, x))
    with torch.no_grad():
        y_t = _nhwc(tm.g_a(_nchw(x)))
    assert np.allclose(y_j, y_t, atol=2e-5), np.abs(y_j - y_t).max()


def test_g_s_matches(pair):
    tm, params = pair
    model = Minnen2018(N=N, M=M)
    y = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, M))
    x_j = np.asarray(model.g_s.run(params, y))
    with torch.no_grad():
        x_t = _nhwc(tm.g_s(_nchw(y)))
    assert np.allclose(x_j, x_t, atol=2e-5), np.abs(x_j - x_t).max()


def test_hyper_and_entropy_path_matches(pair):
    tm, params = pair
    model = Minnen2018(N=N, M=M)
    y = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, M))
    z_j = np.asarray(model.h_a.run(params, y))
    with torch.no_grad():
        z_t = _nhwc(tm.h_a(_nchw(y)))
    assert np.allclose(z_j, z_t, atol=2e-5)

    z = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 2, N))
    hyper_j = np.asarray(model.h_s.run(params, z))
    with torch.no_grad():
        hyper_t = _nhwc(tm.h_s(_nchw(z)))
    assert np.allclose(hyper_j, hyper_t, atol=2e-5)

    y_hat = jnp.round(y)
    ctx_j = np.asarray(model.context.run(params, y_hat))
    with torch.no_grad():
        ctx_t = _nhwc(tm.context_prediction(_nchw(y_hat)))
    assert np.allclose(ctx_j, ctx_t, atol=2e-5)

    cat_j = jnp.concatenate([jnp.asarray(np.tile(hyper_j[:, :1, :1, :],
                                                 (1, 8, 8, 1))),
                             jnp.asarray(ctx_j)], axis=-1)
    gp_j = np.asarray(model.ep.run(params, cat_j))
    with torch.no_grad():
        gp_t = _nhwc(tm.entropy_parameters(_nchw(cat_j)))
    assert np.allclose(gp_j, gp_t, atol=2e-5)
