"""Lu2022 transformer-based image compression model (NIC / TIC).

Functional JAX re-implementation of the reference's flagship model
(task-oriented-PTQ/models/nic_cvt.py:21-571): conv↓2 + RSTB analysis
transform (g_a0..g_a7), two-stage hyper codec with half-size windows
(h_a0..h_a3, h_s0..h_s3), RSTB + tconv↑2 synthesis (g_s0..g_s7), a
factorized bottleneck over the hyper latent, a 5x5 causal masked-conv
context model and a mean-scale Gaussian conditional (nic_cvt.py:221-231).

Hyper-parameters mirror the reference config (depths
[2,4,6,2, 2,2, 2,2, 2,6,4,2], heads [4,8,8,16, 16,16, 16,16, 16,8,8,4],
window 8 for the main path / 4 for the hyper path — nic_cvt.py:42-43;
quality 1-4: (embed 128, latent 192), 5-8: (192, 320),
ckpts/image.py:47-58).

Calibration granularity = reference granularity: each conv/tconv is a
layer unit, each RSTB a block unit (quant_block.py:603-643).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import entropy as E
from . import layers as L
from . import swin
from .base import Coder, Stage, Tape
from .minnen2018 import _conv_stage

DEPTHS = (2, 4, 6, 2, 2, 2, 2, 2, 2, 6, 4, 2)
HEADS = (4, 8, 8, 16, 16, 16, 16, 16, 16, 8, 8, 4)


def _rstb_stage(name: str, path: str, depth: int, heads: int, ws: int):
    def fn(params, x, ctx):
        p = params
        for k in path.split("/"):
            p = p[k]
        return swin.rstb(p, x, depth, heads, ws, ctx, name)

    return Stage(name, fn, swin.rstb_leaf_paths(path, depth))


@dataclasses.dataclass(frozen=True)
class Lu2022:
    embed_dim: int = 192
    latent_dim: int = 320
    window_size: int = 8

    def init(self, key: jax.Array) -> Dict:
        D, M, ws = self.embed_dim, self.latent_dim, self.window_size
        ks = iter(jax.random.split(key, 32))
        d = DEPTHS
        h = HEADS
        params = {
            "g_a": {
                "conv0": L.conv_init(next(ks), 5, 3, D),
                "rstb1": swin.rstb_init(next(ks), D, d[0], h[0], ws),
                "conv2": L.conv_init(next(ks), 3, D, D),
                "rstb3": swin.rstb_init(next(ks), D, d[1], h[1], ws),
                "conv4": L.conv_init(next(ks), 3, D, D),
                "rstb5": swin.rstb_init(next(ks), D, d[2], h[2], ws),
                "conv6": L.conv_init(next(ks), 3, D, M),
                "rstb7": swin.rstb_init(next(ks), M, d[3], h[3], ws),
            },
            "h_a": {
                "conv0": L.conv_init(next(ks), 3, M, D),
                "rstb1": swin.rstb_init(next(ks), D, d[4], h[4], ws // 2),
                "conv2": L.conv_init(next(ks), 3, D, D),
                "rstb3": swin.rstb_init(next(ks), D, d[5], h[5], ws // 2),
            },
            "h_s": {
                "rstb0": swin.rstb_init(next(ks), D, d[6], h[6], ws // 2),
                "deconv1": L.conv_init(next(ks), 3, D, D),
                "rstb2": swin.rstb_init(next(ks), D, d[7], h[7], ws // 2),
                "deconv3": L.conv_init(next(ks), 3, D, 2 * M),
            },
            "g_s": {
                "rstb0": swin.rstb_init(next(ks), M, d[8], h[8], ws),
                "deconv1": L.conv_init(next(ks), 3, M, D),
                "rstb2": swin.rstb_init(next(ks), D, d[9], h[9], ws),
                "deconv3": L.conv_init(next(ks), 3, D, D),
                "rstb4": swin.rstb_init(next(ks), D, d[10], h[10], ws),
                "deconv5": L.conv_init(next(ks), 3, D, D),
                "rstb6": swin.rstb_init(next(ks), D, d[11], h[11], ws),
                "deconv7": L.conv_init(next(ks), 5, D, 3),
            },
            "context": L.conv_init(next(ks), 5, M, 2 * M),
            "ep": {
                "conv0": L.conv_init(next(ks), 1, M * 12 // 3, M * 10 // 3),
                "conv1": L.conv_init(next(ks), 1, M * 10 // 3, M * 8 // 3),
                "conv2": L.conv_init(next(ks), 1, M * 8 // 3, M * 6 // 3),
            },
            "eb": E.factorized_init(next(ks), D),
        }
        return params

    @property
    def g_a(self) -> Coder:
        D, M, ws = self.embed_dim, self.latent_dim, self.window_size
        return Coder("g_a", (
            _conv_stage("g_a/conv0", "g_a/conv0", stride=2),
            _rstb_stage("g_a/rstb1", "g_a/rstb1", DEPTHS[0], HEADS[0], ws),
            _conv_stage("g_a/conv2", "g_a/conv2", stride=2),
            _rstb_stage("g_a/rstb3", "g_a/rstb3", DEPTHS[1], HEADS[1], ws),
            _conv_stage("g_a/conv4", "g_a/conv4", stride=2),
            _rstb_stage("g_a/rstb5", "g_a/rstb5", DEPTHS[2], HEADS[2], ws),
            _conv_stage("g_a/conv6", "g_a/conv6", stride=2),
            _rstb_stage("g_a/rstb7", "g_a/rstb7", DEPTHS[3], HEADS[3], ws),
        ))

    @property
    def h_a(self) -> Coder:
        ws = self.window_size // 2
        return Coder("h_a", (
            _conv_stage("h_a/conv0", "h_a/conv0", stride=2),
            _rstb_stage("h_a/rstb1", "h_a/rstb1", DEPTHS[4], HEADS[4], ws),
            _conv_stage("h_a/conv2", "h_a/conv2", stride=2),
            _rstb_stage("h_a/rstb3", "h_a/rstb3", DEPTHS[5], HEADS[5], ws),
        ))

    @property
    def h_s(self) -> Coder:
        ws = self.window_size // 2
        return Coder("h_s", (
            _rstb_stage("h_s/rstb0", "h_s/rstb0", DEPTHS[6], HEADS[6], ws),
            _conv_stage("h_s/deconv1", "h_s/deconv1", stride=2,
                        transpose=True),
            _rstb_stage("h_s/rstb2", "h_s/rstb2", DEPTHS[7], HEADS[7], ws),
            _conv_stage("h_s/deconv3", "h_s/deconv3", stride=2,
                        transpose=True),
        ))

    @property
    def g_s(self) -> Coder:
        ws = self.window_size
        return Coder("g_s", (
            _rstb_stage("g_s/rstb0", "g_s/rstb0", DEPTHS[8], HEADS[8], ws),
            _conv_stage("g_s/deconv1", "g_s/deconv1", stride=2,
                        transpose=True),
            _rstb_stage("g_s/rstb2", "g_s/rstb2", DEPTHS[9], HEADS[9], ws),
            _conv_stage("g_s/deconv3", "g_s/deconv3", stride=2,
                        transpose=True),
            _rstb_stage("g_s/rstb4", "g_s/rstb4", DEPTHS[10], HEADS[10],
                        ws),
            _conv_stage("g_s/deconv5", "g_s/deconv5", stride=2,
                        transpose=True),
            _rstb_stage("g_s/rstb6", "g_s/rstb6", DEPTHS[11], HEADS[11],
                        ws),
            _conv_stage("g_s/deconv7", "g_s/deconv7", stride=2,
                        transpose=True),
        ))

    @property
    def context(self) -> Coder:
        M = self.latent_dim

        def fn(params, y_hat, ctx):
            mask = L.causal_mask(5, M, 2 * M)
            return ctx.act("context",
                           L.masked_conv2d(params["context"], y_hat, mask))

        return Coder("context", (Stage("context", fn, ("context/w",)),),
                     use_suffix=False)

    @property
    def ep(self) -> Coder:
        return Coder("ep", (
            _conv_stage("ep/conv0", "ep/conv0", act="leaky_relu"),
            _conv_stage("ep/conv1", "ep/conv1", act="leaky_relu"),
            _conv_stage("ep/conv2", "ep/conv2"),
        ), use_suffix=False)

    @property
    def coders(self):
        return {"g_a": self.g_a, "h_a": self.h_a, "h_s": self.h_s,
                "g_s": self.g_s, "context": self.context, "ep": self.ep}

    def calibration_order(self):
        return ("g_a", "h_a", "h_s", "g_s", "context", "ep")

    def forward(self, params, x, *, ctx: L.QuantCtx = L.NULL_CTX,
                training: bool = False, key: Optional[jax.Array] = None,
                tape: Optional[Tape] = None,
                tape_filter: Optional[frozenset] = None) -> Dict:
        if training and key is None:
            raise ValueError("training forward requires a PRNG key")
        k1 = k2 = None
        if training:
            k1, k2 = jax.random.split(key)

        def run(coder, v):
            return coder.run(params, v, ctx, tape=tape,
                             tape_filter=tape_filter)

        y = run(self.g_a, x)
        z = run(self.h_a, y)
        z_hat, z_lik = E.factorized_forward(params["eb"], z,
                                            training=training, key=k1)
        hyper = run(self.h_s, z_hat)
        y_hat = (E.quantize_noise(y, k2) if training else E.quantize_ste(y))
        ctx_p = run(self.context, y_hat)
        gp = run(self.ep, jnp.concatenate([hyper, ctx_p], axis=-1))
        scales, means = jnp.split(gp, 2, axis=-1)
        y_lik = E.gaussian_likelihood(y, scales, means)
        x_hat = run(self.g_s, y_hat)
        return {"x_hat": x_hat,
                "likelihoods": {"y": y_lik, "z": z_lik},
                "y": y, "y_hat": y_hat, "z": z}

    @property
    def latent_channels(self) -> int:
        return self.latent_dim

    def latent_downscale(self) -> int:
        return 16


def lu2022(quality: int = 6) -> Lu2022:
    """Quality registry (ckpts/image.py:47-58): 1-4 -> (128, 192),
    5-8 -> (192, 320)."""
    if not 1 <= quality <= 8:
        raise ValueError("quality must be in 1..8")
    if quality <= 4:
        return Lu2022(embed_dim=128, latent_dim=192)
    return Lu2022(embed_dim=192, latent_dim=320)
