"""TinyLIC: variable-rate MetaNeXt LIC with checkerboard + channel-slice
entropy coding.

Functional JAX re-implementation of the reference's light-uniform model
(light-uniform-PTQ/models/tinylic.py:34-366, layers.py:36-151): ConvNeXt
style stages (InceptionDWConv token mixer, 1x1-conv MLP, layer scale),
λ-conditioned FiLM-style channel scaling (`ScalingNet`,
tinylic.py:17-32), and a 5-slice channel-conditional entropy model with a
two-pass checkerboard spatial context (tinylic.py:179-233) — the
TPU-friendly coding pattern (2 passes instead of H×W autoregressive
steps).

"80M" configuration: N=96, M=128, slice widths (8, 8, 16, 32, 64)
(tinylic.py:53-58).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import entropy as E
from . import layers as L
from .base import Coder, Stage, Tape


def _gelu(x):
    """Exact (erf) GELU — torch nn.GELU default; the tanh
    approximation would break checkpoint parity."""
    import jax
    return jax.nn.gelu(x, approximate=False)

SLICES_80M = (8, 8, 16, 32, 64)


# ---------------------------------------------------------------------------
# MetaNeXt layers (NHWC)
# ---------------------------------------------------------------------------


def _dw_conv_init(key, kh: int, kw: int, ch: int) -> Dict:
    wk, bk = jax.random.split(key)
    fan_in = kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    return {"w": jax.random.uniform(wk, (kh, kw, 1, ch), jnp.float32,
                                    -bound, bound),
            "b": jax.random.uniform(bk, (ch,), jnp.float32, -bound, bound)}


def _dw_conv(p: Dict, x: jax.Array) -> jax.Array:
    kh, kw = p["w"].shape[:2]
    c = x.shape[-1]
    out = jax.lax.conv_general_dilated(
        x, L._match(x, p["w"]), (1, 1),
        ((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return out + L._match(out, p["b"])


def inception_dw_init(key, ch: int, branch_ratio: float = 0.125) -> Dict:
    gc = int(ch * branch_ratio)
    k1, k2, k3 = jax.random.split(key, 3)
    return {"dw_hw": _dw_conv_init(k1, 3, 3, gc),
            "dw_w": _dw_conv_init(k2, 1, 11, gc),
            "dw_h": _dw_conv_init(k3, 11, 1, gc),
            }


def inception_dw(p: Dict, x: jax.Array,
                 branch_ratio: float = 0.125) -> jax.Array:
    """4-branch depthwise mixer (reference InceptionDWConv2d,
    layers.py:36-53): identity / 3x3 / 1x11 / 11x1 over channel groups."""
    c = x.shape[-1]
    gc = int(c * branch_ratio)
    x_id = x[..., : c - 3 * gc]
    x_hw = x[..., c - 3 * gc: c - 2 * gc]
    x_w = x[..., c - 2 * gc: c - gc]
    x_h = x[..., c - gc:]
    return jnp.concatenate(
        [x_id, _dw_conv(p["dw_hw"], x_hw), _dw_conv(p["dw_w"], x_w),
         _dw_conv(p["dw_h"], x_h)], axis=-1)


def metanext_block_init(key, dim: int, mlp_ratio: int = 2,
                        ls_init: float = 1e-6) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    hidden = mlp_ratio * dim
    return {"mixer": inception_dw_init(k1, dim),
            "norm": L.layer_norm_init(dim),
            "mlp": {"fc1": L.conv_init(k2, 1, dim, hidden),
                    "fc2": L.conv_init(k3, 1, hidden, dim)},
            # layer-scale; deliberately NOT named 'gamma' so the quant-leaf
            # walker skips it (it is not a quantized weight in the
            # reference either)
            "ls": ls_init * jnp.ones((dim,))}


def metanext_block(p: Dict, x: jax.Array, ctx: L.QuantCtx = L.NULL_CTX,
                   name: str = "mnb") -> jax.Array:
    shortcut = x
    h = inception_dw(p["mixer"], x)
    h = L.layer_norm(p["norm"], h)
    h = L.conv2d(p["mlp"]["fc1"], h)
    h = _gelu(h)
    h = L.conv2d(p["mlp"]["fc2"], h)
    return shortcut + h * p["ls"]


def metanext_stage_init(key, dim: int, depth: int) -> Dict:
    keys = jax.random.split(key, depth)
    return {f"block{i}": metanext_block_init(keys[i], dim)
            for i in range(depth)}


def metanext_stage(p: Dict, x: jax.Array, depth: int,
                   ctx: L.QuantCtx = L.NULL_CTX,
                   name: str = "mns") -> jax.Array:
    """Stage with an outer residual (reference MetaNeXtStage,
    layers.py:123-151)."""
    h = x
    for i in range(depth):
        h = metanext_block(p[f"block{i}"], h, ctx, f"{name}/block{i}")
    return ctx.act(name, x + h)


def scaling_net_init(key, ch: int) -> Dict:
    k1, _ = jax.random.split(key)
    return {"fc1": L.linear_init(k1, 1, ch // 2),
            "fc2": {"w": jnp.zeros((ch // 2, ch)), "b": jnp.zeros((ch,))}}


def scaling_net(p: Dict, x: jax.Array, lam: jax.Array) -> jax.Array:
    """λ-conditioned channel scaling: x * exp(10·fc2(relu(fc1(λ))))
    (reference ScalingNet, tinylic.py:17-32). fc2 zero-init => identity at
    start."""
    v = jax.nn.relu(L.linear(p["fc1"], lam.reshape(1)))
    scale = jnp.exp(10.0 * L.linear(p["fc2"], v))
    return x * scale


def _mns_leaf_paths(path: str, depth: int) -> Tuple[str, ...]:
    out = []
    for i in range(depth):
        b = f"{path}/block{i}"
        out += [f"{b}/mixer/dw_hw/w", f"{b}/mixer/dw_w/w",
                f"{b}/mixer/dw_h/w", f"{b}/norm/scale",
                f"{b}/mlp/fc1/w", f"{b}/mlp/fc2/w"]
    return tuple(out)


def checkerboard_anchor_mask(h: int, w: int) -> jax.Array:
    """(1, H, W, 1) float mask; 1 at anchor positions ((i+j) odd — matches
    the reference's y_half zeroing of (even,even)/(odd,odd),
    tinylic.py:205-207)."""
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    return (((rows + cols) % 2) == 1).astype(jnp.float32)[None, :, :, None]


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TinyLIC:
    N: int = 96
    M: int = 128
    slices: Tuple[int, ...] = SLICES_80M
    lambda_rd: float = 0.0483  # λ the coders are bound to (see with_lambda)
    depths: Tuple[int, ...] = (2, 2, 6, 2, 2, 2)

    def with_lambda(self, lam: float) -> "TinyLIC":
        return dataclasses.replace(self, lambda_rd=lam)

    # -- init ---------------------------------------------------------------

    def init(self, key: jax.Array) -> Dict:
        N, M, d = self.N, self.M, self.depths
        ks = iter(jax.random.split(key, 64))
        n32 = N * 3 // 2
        params = {
            "g_a": {
                "conv0": L.conv_init(next(ks), 5, 3, N),
                "mns1": metanext_stage_init(next(ks), N, d[0]),
                "scale0": scaling_net_init(next(ks), N),
                "conv2": L.conv_init(next(ks), 3, N, n32),
                "mns3": metanext_stage_init(next(ks), n32, d[1]),
                "scale1": scaling_net_init(next(ks), n32),
                "conv4": L.conv_init(next(ks), 3, n32, 2 * N),
                "mns5": metanext_stage_init(next(ks), 2 * N, d[2]),
                "scale2": scaling_net_init(next(ks), 2 * N),
                "conv6": L.conv_init(next(ks), 3, 2 * N, M),
                "mns7": metanext_stage_init(next(ks), M, d[3]),
                "scale3": scaling_net_init(next(ks), M),
            },
            "h_a": {
                "conv0": L.conv_init(next(ks), 3, M, n32),
                "mns1": metanext_stage_init(next(ks), n32, d[4]),
                "conv2": L.conv_init(next(ks), 3, n32, n32),
                "mns3": metanext_stage_init(next(ks), n32, d[5]),
            },
            "h_s": {
                "mns0": metanext_stage_init(next(ks), n32, d[5]),
                "deconv1": L.conv_init(next(ks), 3, n32, n32),
                "mns2": metanext_stage_init(next(ks), n32, d[4]),
                "deconv3": L.conv_init(next(ks), 3, n32, 2 * M),
            },
            "g_s": {
                "scale0": scaling_net_init(next(ks), M),
                "mr0": scaling_net_init(next(ks), M),
                "mns0": metanext_stage_init(next(ks), M, d[3]),
                "deconv1": L.conv_init(next(ks), 3, M, 2 * N),
                "scale1": scaling_net_init(next(ks), 2 * N),
                "mr1": scaling_net_init(next(ks), 2 * N),
                "mns2": metanext_stage_init(next(ks), 2 * N, d[2]),
                "deconv3": L.conv_init(next(ks), 3, 2 * N, n32),
                "scale2": scaling_net_init(next(ks), n32),
                "mr2": scaling_net_init(next(ks), n32),
                "mns4": metanext_stage_init(next(ks), n32, d[1]),
                "deconv5": L.conv_init(next(ks), 3, n32, N),
                "scale3": scaling_net_init(next(ks), N),
                "mr3": scaling_net_init(next(ks), N),
                "mns6": metanext_stage_init(next(ks), N, d[0]),
                "deconv7": L.conv_init(next(ks), 5, N, 3),
            },
            "eb": E.factorized_init(next(ks), n32),
        }
        cum = 0
        cc, sc, ep = {}, {}, {}
        for i, out_ch in enumerate(self.slices):
            k1, k2, k3, k4, k5, k6 = jax.random.split(next(ks), 6)
            cc[f"slice{i}"] = {
                "conv0": L.conv_init(k1, 5, 2 * M + cum, 224),
                "conv1": L.conv_init(k2, 5, 224, 128),
                "conv2": L.conv_init(k3, 3, 128, 2 * out_ch),
            }
            sc[f"slice{i}"] = L.conv_init(k4, 5, out_ch, 2 * out_ch)
            ep[f"slice{i}"] = {
                "conv0": L.conv_init(k5, 1, 2 * M + 4 * out_ch,
                                     10 * out_ch // 3),
                "conv1": L.conv_init(k6, 1, 10 * out_ch // 3,
                                     8 * out_ch // 3),
                "conv2": L.conv_init(jax.random.split(k6)[0], 1,
                                     8 * out_ch // 3, 2 * out_ch),
            }
            cum += out_ch
        params["cc"] = cc
        params["sc"] = sc
        params["ep"] = ep
        return params

    # -- coders -------------------------------------------------------------

    def _conv_stage(self, name, path, stride=2, transpose=False, scale=None,
                    mr=None):
        lam = self.lambda_rd

        def fn(params, x, ctx):
            p = params
            for k in path.split("/"):
                p = p[k]
            if transpose:
                out = L.conv_transpose2d(p, x, stride=stride)
            else:
                out = L.conv2d(p, x, stride=stride)
            return ctx.act(name, out)

        return Stage(name, fn, (path + "/w",))

    def _mns_stage(self, name, path, depth):
        def fn(params, x, ctx):
            p = params
            for k in path.split("/"):
                p = p[k]
            return metanext_stage(p, x, depth, ctx, name)

        return Stage(name, fn, _mns_leaf_paths(path, depth))

    def _scale_stage(self, name, path):
        lam = jnp.asarray([self.lambda_rd], jnp.float32)

        def fn(params, x, ctx):
            p = params
            for k in path.split("/"):
                p = p[k]
            return scaling_net(p, x, lam)

        return Stage(name, fn, (f"{path}/fc1/w", f"{path}/fc2/w"))

    @property
    def g_a(self) -> Coder:
        d = self.depths
        return Coder("g_a", (
            self._conv_stage("g_a/conv0", "g_a/conv0"),
            self._mns_stage("g_a/mns1", "g_a/mns1", d[0]),
            self._scale_stage("g_a/scale0", "g_a/scale0"),
            self._conv_stage("g_a/conv2", "g_a/conv2"),
            self._mns_stage("g_a/mns3", "g_a/mns3", d[1]),
            self._scale_stage("g_a/scale1", "g_a/scale1"),
            self._conv_stage("g_a/conv4", "g_a/conv4"),
            self._mns_stage("g_a/mns5", "g_a/mns5", d[2]),
            self._scale_stage("g_a/scale2", "g_a/scale2"),
            self._conv_stage("g_a/conv6", "g_a/conv6"),
            self._mns_stage("g_a/mns7", "g_a/mns7", d[3]),
            self._scale_stage("g_a/scale3", "g_a/scale3"),
        ))

    @property
    def h_a(self) -> Coder:
        d = self.depths
        return Coder("h_a", (
            self._conv_stage("h_a/conv0", "h_a/conv0"),
            self._mns_stage("h_a/mns1", "h_a/mns1", d[4]),
            self._conv_stage("h_a/conv2", "h_a/conv2"),
            self._mns_stage("h_a/mns3", "h_a/mns3", d[5]),
        ))

    @property
    def h_s(self) -> Coder:
        d = self.depths
        return Coder("h_s", (
            self._mns_stage("h_s/mns0", "h_s/mns0", d[5]),
            self._conv_stage("h_s/deconv1", "h_s/deconv1", transpose=True),
            self._mns_stage("h_s/mns2", "h_s/mns2", d[4]),
            self._conv_stage("h_s/deconv3", "h_s/deconv3", transpose=True),
        ))

    @property
    def g_s(self) -> Coder:
        d = self.depths
        return Coder("g_s", (
            self._scale_stage("g_s/scale0", "g_s/scale0"),
            self._mns_stage("g_s/mns0", "g_s/mns0", d[3]),
            self._conv_stage("g_s/deconv1", "g_s/deconv1", transpose=True),
            self._scale_stage("g_s/scale1", "g_s/scale1"),
            self._mns_stage("g_s/mns2", "g_s/mns2", d[2]),
            self._conv_stage("g_s/deconv3", "g_s/deconv3", transpose=True),
            self._scale_stage("g_s/scale2", "g_s/scale2"),
            self._mns_stage("g_s/mns4", "g_s/mns4", d[1]),
            self._conv_stage("g_s/deconv5", "g_s/deconv5", transpose=True),
            self._scale_stage("g_s/scale3", "g_s/scale3"),
            self._mns_stage("g_s/mns6", "g_s/mns6", d[0]),
            self._conv_stage("g_s/deconv7", "g_s/deconv7", transpose=True),
        ))

    @property
    def coders(self):
        return {"g_a": self.g_a, "h_a": self.h_a, "h_s": self.h_s,
                "g_s": self.g_s}

    def calibration_order(self):
        return ("g_a", "h_a", "h_s", "g_s")

    # -- entropy model ------------------------------------------------------

    def slice_cc(self, params, support, i: int):
        """Channel-conditional transform for slice i (cc_transforms,
        reference tinylic.py:110-118)."""
        cp = params["cc"][f"slice{i}"]
        h1 = _gelu(L.conv2d(cp["conv0"], support))
        h1 = _gelu(L.conv2d(cp["conv1"], h1))
        return L.conv2d(cp["conv2"], h1)

    def slice_ep(self, params, hyper, sc_params, cc_params, i: int):
        """Entropy-parameter head for slice i -> (scales, means)."""
        epp = params["ep"][f"slice{i}"]
        feats = jnp.concatenate([hyper, sc_params, cc_params], axis=-1)
        e = _gelu(L.conv2d(epp["conv0"], feats))
        e = _gelu(L.conv2d(epp["conv1"], e))
        gp = L.conv2d(epp["conv2"], e)
        scales, means = jnp.split(gp, 2, axis=-1)
        return scales, means

    def slice_sc(self, params, y_half, i: int):
        """Checkerboard spatial-context transform for slice i."""
        mask = L.checkerboard_mask(5, self.slices[i], 2 * self.slices[i])
        return L.masked_conv2d(params["sc"][f"slice{i}"], y_half, mask)

    def _slice_entropy(self, params, hyper, y, ctx: L.QuantCtx,
                       return_coding: bool = False):
        """Channel-slice + checkerboard two-pass conditional entropy model
        (reference tinylic.py:190-229). Returns (y_hat, y_likelihoods)
        and, with ``return_coding``, the per-slice/per-pass Gaussian
        parameters the real codec needs."""
        _, h, w, _ = y.shape
        anchor = checkerboard_anchor_mask(h, w)
        # static Python ints: jnp.cumsum would make the split indices
        # tracers under jit and jnp.split requires concrete positions
        splits = [sum(self.slices[:i + 1])
                  for i in range(len(self.slices) - 1)]
        y_slices = jnp.split(y, splits, axis=-1)

        y_hat_slices, y_liks, coding = [], [], []
        for i, y_slice in enumerate(y_slices):
            support = jnp.concatenate([hyper] + y_hat_slices, axis=-1)
            cc_params = self.slice_cc(params, support, i)

            # pass 1: anchors (no spatial context)
            scales1, means1 = self.slice_ep(
                params, hyper, jnp.zeros_like(cc_params), cc_params, i)
            y_hat_slice = E.quantize_ste(y_slice - means1) + means1

            # pass 2: non-anchors see the anchor half through the
            # checkerboard-masked conv
            y_half = y_hat_slice * anchor
            sc_params = self.slice_sc(params, y_half, i)
            sc_params = sc_params * (1.0 - anchor)
            scales2, means2 = self.slice_ep(params, hyper, sc_params,
                                            cc_params, i)
            y_hat_anchor = (E.quantize_ste(y_slice - means1) + means1) \
                * anchor
            y_hat_nonanchor = (E.quantize_ste(y_slice - means2) + means2) \
                * (1.0 - anchor)
            y_hat_slice = y_hat_anchor + y_hat_nonanchor

            y_hat_slices.append(y_hat_slice)
            scales = scales1 * anchor + scales2 * (1.0 - anchor)
            means = means1 * anchor + means2 * (1.0 - anchor)
            y_liks.append(E.gaussian_likelihood(y_slice, scales, means))
            if return_coding:
                coding.append({"scales1": scales1, "means1": means1,
                               "scales2": scales2, "means2": means2,
                               "y_hat": y_hat_slice})

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        y_lik = jnp.concatenate(y_liks, axis=-1)
        if return_coding:
            return y_hat, y_lik, coding
        return y_hat, y_lik

    # -- forward ------------------------------------------------------------

    def forward(self, params, x, *, ctx: L.QuantCtx = L.NULL_CTX,
                training: bool = False, key: Optional[jax.Array] = None,
                tape: Optional[Tape] = None,
                tape_filter: Optional[frozenset] = None) -> Dict:
        def run(coder, v):
            return coder.run(params, v, ctx, tape=tape,
                             tape_filter=tape_filter)

        y = run(self.g_a, x)
        z = run(self.h_a, y)
        # z_hat = STE-round around the channel medians (tinylic.py:184-187)
        z_hat, z_lik = E.factorized_forward(params["eb"], z,
                                            training=False)
        hyper = run(self.h_s, z_hat)
        y_hat, y_lik = self._slice_entropy(params, hyper, y, ctx)
        x_hat = run(self.g_s, y_hat)
        return {"x_hat": x_hat,
                "likelihoods": {"y": y_lik, "z": z_lik},
                "y": y, "y_hat": y_hat, "z": z}

    def latent_downscale(self) -> int:
        return 16


def tinylic(model_size: str = "80M", lam: float = 0.0483) -> TinyLIC:
    if model_size != "80M":
        raise ValueError("only the '80M' configuration is published "
                         "(reference tinylic.py:53)")
    return TinyLIC(lambda_rd=lam)
