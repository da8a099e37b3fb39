"""Minnen2018 joint autoregressive + hierarchical prior LIC model.

Functional JAX re-implementation of the smallest model in the reference zoo
(loaded as a pickled CompressAI `mbt2018` at
task-oriented-PTQ/main2.py:160-162): 4-stage conv/GDN analysis &
synthesis transforms, a hyperprior over a factorized bottleneck, a 5x5
causal masked-conv context model, and a mean-scale Gaussian conditional.

The evaluation/likelihood forward (the path all bpp/PSNR metrics use —
the reference never runs the serial rANS codec during eval, see
nic_cvt.py:293-314) is fully parallel and runs on TPU. Real
compress/decompress (serial AR) lives in ``rdoptq_tpu.quant``-independent
codec helpers and the host rANS layer.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import entropy as E
from . import layers as L
from .base import Coder, Stage, Tape


def _conv_stage(name: str, path: str, *, stride: int = 1,
                act: Optional[str] = None, transpose: bool = False,
                padding: Optional[int] = None):
    def fn(params, x, ctx):
        p = params
        for k in path.split("/"):
            p = p[k]
        if transpose:
            out = L.conv_transpose2d(p, x, stride=stride)
        else:
            out = L.conv2d(p, x, stride=stride, padding=padding)
        if act == "leaky_relu":
            out = L.leaky_relu(out)
        return ctx.act(name, out)

    return Stage(name, fn, (path + "/w",))


def _gdn_stage(name: str, path: str, inverse: bool = False):
    def fn(params, x, ctx):
        p = params
        for k in path.split("/"):
            p = p[k]
        return ctx.act(name, L.gdn(p, x, inverse=inverse))

    return Stage(name, fn, (path + "/gamma",))


@dataclasses.dataclass(frozen=True)
class Minnen2018:
    """Mean-scale hyperprior with causal context. quality 1-4: M=192,
    quality 5-8: M=320 (CompressAI registry convention)."""

    N: int = 192
    M: int = 192

    # -- parameter construction ------------------------------------------

    def init(self, key: jax.Array) -> Dict:
        ks = list(jax.random.split(key, 24))
        k = iter(ks)
        N, M = self.N, self.M
        params = {
            "g_a": {
                "conv0": L.conv_init(next(k), 5, 3, N),
                "gdn0": L.gdn_init(N),
                "conv1": L.conv_init(next(k), 5, N, N),
                "gdn1": L.gdn_init(N),
                "conv2": L.conv_init(next(k), 5, N, N),
                "gdn2": L.gdn_init(N),
                "conv3": L.conv_init(next(k), 5, N, M),
            },
            "g_s": {
                "deconv0": L.conv_init(next(k), 5, M, N),
                "igdn0": L.gdn_init(N),
                "deconv1": L.conv_init(next(k), 5, N, N),
                "igdn1": L.gdn_init(N),
                "deconv2": L.conv_init(next(k), 5, N, N),
                "igdn2": L.gdn_init(N),
                "deconv3": L.conv_init(next(k), 5, N, 3),
            },
            "h_a": {
                "conv0": L.conv_init(next(k), 3, M, N),
                "conv1": L.conv_init(next(k), 5, N, N),
                "conv2": L.conv_init(next(k), 5, N, N),
            },
            "h_s": {
                "deconv0": L.conv_init(next(k), 5, N, M),
                "deconv1": L.conv_init(next(k), 5, M, M * 3 // 2),
                "conv2": L.conv_init(next(k), 3, M * 3 // 2, M * 2),
            },
            "context": L.conv_init(next(k), 5, M, 2 * M),
            "ep": {
                "conv0": L.conv_init(next(k), 1, M * 12 // 3, M * 10 // 3),
                "conv1": L.conv_init(next(k), 1, M * 10 // 3, M * 8 // 3),
                "conv2": L.conv_init(next(k), 1, M * 8 // 3, M * 6 // 3),
            },
            "eb": E.factorized_init(next(k), N),
        }
        return params

    # -- coders ------------------------------------------------------------

    @property
    def g_a(self) -> Coder:
        return Coder("g_a", (
            _conv_stage("g_a/conv0", "g_a/conv0", stride=2),
            _gdn_stage("g_a/gdn0", "g_a/gdn0"),
            _conv_stage("g_a/conv1", "g_a/conv1", stride=2),
            _gdn_stage("g_a/gdn1", "g_a/gdn1"),
            _conv_stage("g_a/conv2", "g_a/conv2", stride=2),
            _gdn_stage("g_a/gdn2", "g_a/gdn2"),
            _conv_stage("g_a/conv3", "g_a/conv3", stride=2),
        ))

    @property
    def g_s(self) -> Coder:
        return Coder("g_s", (
            _conv_stage("g_s/deconv0", "g_s/deconv0", stride=2,
                        transpose=True),
            _gdn_stage("g_s/igdn0", "g_s/igdn0", inverse=True),
            _conv_stage("g_s/deconv1", "g_s/deconv1", stride=2,
                        transpose=True),
            _gdn_stage("g_s/igdn1", "g_s/igdn1", inverse=True),
            _conv_stage("g_s/deconv2", "g_s/deconv2", stride=2,
                        transpose=True),
            _gdn_stage("g_s/igdn2", "g_s/igdn2", inverse=True),
            _conv_stage("g_s/deconv3", "g_s/deconv3", stride=2,
                        transpose=True),
        ))

    @property
    def h_a(self) -> Coder:
        return Coder("h_a", (
            _conv_stage("h_a/conv0", "h_a/conv0", stride=1,
                        act="leaky_relu"),
            _conv_stage("h_a/conv1", "h_a/conv1", stride=2,
                        act="leaky_relu"),
            _conv_stage("h_a/conv2", "h_a/conv2", stride=2),
        ))

    @property
    def h_s(self) -> Coder:
        return Coder("h_s", (
            _conv_stage("h_s/deconv0", "h_s/deconv0", stride=2,
                        transpose=True, act="leaky_relu"),
            _conv_stage("h_s/deconv1", "h_s/deconv1", stride=2,
                        transpose=True, act="leaky_relu"),
            _conv_stage("h_s/conv2", "h_s/conv2", stride=1),
        ))

    @property
    def context(self) -> Coder:
        M = self.M

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
        """Unit schedule for sequential RDO calibration (information-flow
        order; the reference uses module-definition order, main2.py:227-253
        — equivalent for prefix-quantization semantics here)."""
        return ("g_a", "h_a", "h_s", "g_s", "context", "ep")

    # -- forward (likelihood / fake-quant path; all-parallel, on-TPU) -------

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

        y_hat = (E.quantize_noise(y, k2) if training
                 else E.quantize_ste(y))
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
        return self.M

    def latent_downscale(self) -> int:
        return 16


def minnen2018(quality: int = 6) -> Minnen2018:
    """Quality-indexed constructor mirroring the CompressAI registry the
    reference loads from (main2.py:160-162)."""
    if not 1 <= quality <= 8:
        raise ValueError("quality must be in 1..8")
    return Minnen2018(N=192, M=192 if quality <= 4 else 320)
