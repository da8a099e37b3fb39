"""Torch↔jax parity for the Cheng2020 residual blocks and TinyLIC
MetaNeXt blocks (the building blocks their checkpoint converters map)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from rdoptq_tpu.models import layers as L
from rdoptq_tpu.models import tinylic as T
from rdoptq_tpu.utils import torch_convert as tc

PED = 2.0 ** -18


class TGDN(tnn.Module):
    def __init__(self, c, inverse=False):
        super().__init__()
        self.inverse = inverse
        self.beta = tnn.Parameter(torch.sqrt(torch.rand(c) + 0.5 + PED))
        g = 0.1 * torch.eye(c) + 0.01 * torch.rand(c, c)
        self.gamma = tnn.Parameter(torch.sqrt(g + PED))

    def forward(self, x):
        c = x.shape[1]
        beta = torch.clamp(self.beta, min=(1e-6 + PED) ** 0.5) ** 2 - PED
        gamma = torch.clamp(self.gamma, min=PED ** 0.5) ** 2 - PED
        norm = tF.conv2d(x * x, gamma.reshape(c, c, 1, 1), beta)
        return x * torch.sqrt(norm) if self.inverse else x * torch.rsqrt(norm)


def test_rbws_block_matches_torch():
    """ResidualBlockWithStride (CompressAI semantics)."""
    torch.manual_seed(0)
    cin, cout = 3, 8

    conv1 = tnn.Conv2d(cin, cout, 3, 2, 1)
    conv2 = tnn.Conv2d(cout, cout, 3, 1, 1)
    gdn = TGDN(cout)
    skip = tnn.Conv2d(cin, cout, 1, 2, 0)

    def torch_fwd(x):
        out = tF.leaky_relu(conv1(x))
        out = gdn(conv2(out))
        return out + skip(x)

    p = {"conv1": {"w": jnp.asarray(tc.conv_kernel(conv1.weight)),
                   "b": jnp.asarray(tc._np(conv1.bias))},
         "conv2": {"w": jnp.asarray(tc.conv_kernel(conv2.weight)),
                   "b": jnp.asarray(tc._np(conv2.bias))},
         "gdn": tc.gdn_params(gdn.beta, gdn.gamma),
         "skip": {"w": jnp.asarray(tc.conv_kernel(skip.weight)),
                  "b": jnp.asarray(tc._np(skip.bias))}}
    p = jax.tree_util.tree_map(jnp.asarray, p)

    x = torch.rand(1, cin, 16, 16)
    with torch.no_grad():
        want = torch_fwd(x).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(L.residual_block_with_stride(
        p, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    assert np.allclose(got, want, atol=3e-5), np.abs(got - want).max()


def test_metanext_block_matches_torch():
    """MetaNeXtBlock (reference layers.py:83-120 semantics)."""
    torch.manual_seed(1)
    dim, gc = 16, 2
    dw_hw = tnn.Conv2d(gc, gc, 3, padding=1, groups=gc)
    dw_w = tnn.Conv2d(gc, gc, (1, 11), padding=(0, 5), groups=gc)
    dw_h = tnn.Conv2d(gc, gc, (11, 1), padding=(5, 0), groups=gc)
    norm = tnn.LayerNorm(dim)
    fc1 = tnn.Conv2d(dim, 2 * dim, 1)
    fc2 = tnn.Conv2d(2 * dim, dim, 1)
    ls = 1e-2 * torch.ones(dim)

    def torch_fwd(x):
        xid, xhw, xw, xh = torch.split(x, (dim - 3 * gc, gc, gc, gc), 1)
        h = torch.cat((xid, dw_hw(xhw), dw_w(xw), dw_h(xh)), 1)
        h = h.permute(0, 2, 3, 1)
        h = norm(h)
        h = h.permute(0, 3, 1, 2)
        h = fc2(tF.gelu(fc1(h)))
        return x + h * ls.reshape(1, -1, 1, 1)

    def cl(m):
        return {"w": jnp.asarray(tc.conv_kernel(m.weight)),
                "b": jnp.asarray(tc._np(m.bias))}

    p = {"mixer": {"dw_hw": cl(dw_hw), "dw_w": cl(dw_w), "dw_h": cl(dw_h)},
         "norm": {"scale": jnp.asarray(tc._np(norm.weight)),
                  "bias": jnp.asarray(tc._np(norm.bias))},
         "mlp": {"fc1": cl(fc1), "fc2": cl(fc2)},
         "ls": jnp.asarray(tc._np(ls))}

    x = torch.rand(1, dim, 12, 12)
    with torch.no_grad():
        want = torch_fwd(x).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(T.metanext_block(
        p, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    assert np.allclose(got, want, atol=3e-5), np.abs(got - want).max()
