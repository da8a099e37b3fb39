"""Cheng2020-anchor LIC model (residual blocks + GDN, joint AR prior).

Functional JAX re-implementation of the second model in the reference zoo
(loaded as a pickled CompressAI `cheng2020_anchor` at
task-oriented-PTQ/main2.py:160; its block structure is what the reference
wraps via QuantRBWS/QuantRBU/QuantRB/QuantSC,
quantization/quant_block.py:219-328). Architecture: residual
analysis/synthesis transforms with GDN, 5-layer hyper networks, the same
5x5 causal masked-conv context model and mean-scale Gaussian conditional
as Minnen2018.

Calibration granularity follows the reference: each residual block is ONE
unit (jointly optimized alphas — `block_reconstruction`), bare convs are
single-leaf units.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import entropy as E
from . import layers as L
from .base import Coder, Stage, Tape
from .minnen2018 import _conv_stage


def _sub(params, path):
    node = params
    for k in path.split("/"):
        node = node[k]
    return node


def _rb_stage(name: str, path: str):
    def fn(params, x, ctx):
        return L.residual_block(_sub(params, path), x, ctx, name)

    return Stage(name, fn, (f"{path}/conv1/w", f"{path}/conv2/w",
                            f"{path}/skip/w"))


def _rbws_stage(name: str, path: str):
    def fn(params, x, ctx):
        return L.residual_block_with_stride(_sub(params, path), x, 2, ctx,
                                            name)

    return Stage(name, fn, (f"{path}/conv1/w", f"{path}/conv2/w",
                            f"{path}/gdn/gamma", f"{path}/skip/w"))


def _rbu_stage(name: str, path: str):
    def fn(params, x, ctx):
        return L.residual_block_upsample(_sub(params, path), x, 2, ctx, name)

    return Stage(name, fn, (f"{path}/subpel/w", f"{path}/conv/w",
                            f"{path}/gdn/gamma", f"{path}/upsample/w"))


def _subpel_stage(name: str, path: str, r: int = 2, act: bool = True):
    def fn(params, x, ctx):
        out = L.subpel_conv3x3(_sub(params, path), x, r)
        if act:
            out = L.leaky_relu(out)
        return ctx.act(name, out)

    return Stage(name, fn, (f"{path}/w",))


def _attn_stage(name: str, path: str):
    def fn(params, x, ctx):
        return L.attention_block(_sub(params, path), x, ctx, name)

    leaf_paths = tuple(
        f"{path}/{branch}/u{i}/{c}/w"
        for branch in ("trunk", "mask") for i in range(3)
        for c in ("c1", "c2", "c3")) + (f"{path}/mask_out/w",)
    return Stage(name, fn, leaf_paths)


def _rb_init(key, c_in, c_out):
    # residual blocks here always carry an explicit 1x1 skip for c_in==c_out
    # identity case the skip is omitted by residual_block_init
    return L.residual_block_init(key, c_in, c_out)


@dataclasses.dataclass(frozen=True)
class Cheng2020:
    """quality 1-3: N=128; quality 4-6: N=192 (CompressAI registry).

    ``attention=True`` builds the cheng2020_attn variant (the paper's full
    model: simplified non-local attention after the 4x-downsample stage and
    at both latent ends, CompressAI Cheng2020Attention).

    ``K>1`` conditions the latent on a K-component Gaussian MIXTURE — the
    entropy model of the Cheng2020 *paper* (discretized GMM, K=3; the
    reference quantizes CompressAI's single-Gaussian ``cheng2020_anchor``
    weights instead, main2.py:160). The entropy-parameter head then emits
    3·K·N channels (per-component scale/mean/logit). The fake-quant
    likelihood path — what every BD-rate table measures — supports GMM
    end-to-end; the rANS codec tables stay single-Gaussian (a GMM
    bitstream needs per-pixel CDF construction, which the reference never
    implements either)."""

    N: int = 192
    attention: bool = False
    K: int = 1  # mixture components (1 = mean-scale single Gaussian)

    def init(self, key: jax.Array) -> Dict:
        ks = list(jax.random.split(key, 40))
        k = iter(ks)
        N = self.N
        g_a = {
            "rbws0": L.residual_block_with_stride_init(next(k), 3, N),
            "rb1": _rb_init(next(k), N, N),
            "rbws2": L.residual_block_with_stride_init(next(k), N, N),
            "rb3": _rb_init(next(k), N, N),
            "rbws4": L.residual_block_with_stride_init(next(k), N, N),
            "rb5": _rb_init(next(k), N, N),
            "conv6": L.conv_init(next(k), 3, N, N),
        }
        g_s = {
            "rb0": _rb_init(next(k), N, N),
            "rbu1": L.residual_block_upsample_init(next(k), N, N),
            "rb2": _rb_init(next(k), N, N),
            "rbu3": L.residual_block_upsample_init(next(k), N, N),
            "rb4": _rb_init(next(k), N, N),
            "rbu5": L.residual_block_upsample_init(next(k), N, N),
            "rb6": _rb_init(next(k), N, N),
            "subpel7": L.subpel_conv3x3_init(next(k), N, 3, 2),
        }
        if self.attention:
            g_a["attn_mid"] = L.attention_block_init(next(k), N)
            g_a["attn_out"] = L.attention_block_init(next(k), N)
            g_s["attn_in"] = L.attention_block_init(next(k), N)
            g_s["attn_mid"] = L.attention_block_init(next(k), N)
        params = {
            "g_a": g_a,
            "g_s": g_s,
            "h_a": {
                "conv0": L.conv_init(next(k), 3, N, N),
                "conv1": L.conv_init(next(k), 3, N, N),
                "conv2": L.conv_init(next(k), 3, N, N),
                "conv3": L.conv_init(next(k), 3, N, N),
                "conv4": L.conv_init(next(k), 3, N, N),
            },
            "h_s": {
                "conv0": L.conv_init(next(k), 3, N, N),
                "subpel1": L.subpel_conv3x3_init(next(k), N, N, 2),
                "conv2": L.conv_init(next(k), 3, N, N * 3 // 2),
                "subpel3": L.subpel_conv3x3_init(next(k), N * 3 // 2,
                                                 N * 3 // 2, 2),
                "conv4": L.conv_init(next(k), 3, N * 3 // 2, N * 2),
            },
            "context": L.conv_init(next(k), 5, N, 2 * N),
            "ep": {
                "conv0": L.conv_init(next(k), 1, N * 12 // 3, N * 10 // 3),
                "conv1": L.conv_init(next(k), 1, N * 10 // 3, N * 8 // 3),
                "conv2": L.conv_init(next(k), 1, N * 8 // 3,
                                     3 * self.K * N if self.K > 1
                                     else N * 6 // 3),
            },
            "eb": E.factorized_init(next(k), N),
        }
        return params

    @property
    def g_a(self) -> Coder:
        stages = [
            _rbws_stage("g_a/rbws0", "g_a/rbws0"),
            _rb_stage("g_a/rb1", "g_a/rb1"),
            _rbws_stage("g_a/rbws2", "g_a/rbws2"),
            _rb_stage("g_a/rb3", "g_a/rb3"),
            _rbws_stage("g_a/rbws4", "g_a/rbws4"),
            _rb_stage("g_a/rb5", "g_a/rb5"),
            _conv_stage("g_a/conv6", "g_a/conv6", stride=2),
        ]
        if self.attention:
            # CompressAI Cheng2020Attention: attention after the 4x stage
            # and after the final stride conv
            stages.insert(3, _attn_stage("g_a/attn_mid", "g_a/attn_mid"))
            stages.append(_attn_stage("g_a/attn_out", "g_a/attn_out"))
        return Coder("g_a", tuple(stages))

    @property
    def g_s(self) -> Coder:
        stages = [
            _rb_stage("g_s/rb0", "g_s/rb0"),
            _rbu_stage("g_s/rbu1", "g_s/rbu1"),
            _rb_stage("g_s/rb2", "g_s/rb2"),
            _rbu_stage("g_s/rbu3", "g_s/rbu3"),
            _rb_stage("g_s/rb4", "g_s/rb4"),
            _rbu_stage("g_s/rbu5", "g_s/rbu5"),
            _rb_stage("g_s/rb6", "g_s/rb6"),
            _subpel_stage("g_s/subpel7", "g_s/subpel7", act=False),
        ]
        if self.attention:
            stages.insert(0, _attn_stage("g_s/attn_in", "g_s/attn_in"))
            stages.insert(5, _attn_stage("g_s/attn_mid", "g_s/attn_mid"))
        return Coder("g_s", tuple(stages))

    @property
    def h_a(self) -> Coder:
        return Coder("h_a", (
            _conv_stage("h_a/conv0", "h_a/conv0", act="leaky_relu"),
            _conv_stage("h_a/conv1", "h_a/conv1", act="leaky_relu"),
            _conv_stage("h_a/conv2", "h_a/conv2", stride=2,
                        act="leaky_relu"),
            _conv_stage("h_a/conv3", "h_a/conv3", act="leaky_relu"),
            _conv_stage("h_a/conv4", "h_a/conv4", stride=2),
        ))

    @property
    def h_s(self) -> Coder:
        return Coder("h_s", (
            _conv_stage("h_s/conv0", "h_s/conv0", act="leaky_relu"),
            _subpel_stage("h_s/subpel1", "h_s/subpel1"),
            _conv_stage("h_s/conv2", "h_s/conv2", act="leaky_relu"),
            _subpel_stage("h_s/subpel3", "h_s/subpel3"),
            _conv_stage("h_s/conv4", "h_s/conv4"),
        ))

    @property
    def context(self) -> Coder:
        N = self.N

        def fn(params, y_hat, ctx):
            mask = L.causal_mask(5, N, 2 * N)
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
        if self.K > 1:
            # 3 heads of K*N channels -> (..., N, K) mixture axes
            def mix(v):
                s = v.shape[:-1] + (self.K, self.N)
                return jnp.swapaxes(v.reshape(s), -1, -2)

            scales, means, logits = (mix(v) for v in
                                     jnp.split(gp, 3, axis=-1))
            y_lik = E.gaussian_mixture_likelihood(y, scales, means, logits)
        else:
            scales, means = jnp.split(gp, 2, axis=-1)
            y_lik = E.gaussian_likelihood(y, scales, means)
        x_hat = run(self.g_s, y_hat)
        return {"x_hat": x_hat,
                "likelihoods": {"y": y_lik, "z": z_lik},
                "y": y, "y_hat": y_hat, "z": z}

    @property
    def latent_channels(self) -> int:
        return self.N

    def latent_downscale(self) -> int:
        return 16


def cheng2020(quality: int = 6) -> Cheng2020:
    if not 1 <= quality <= 6:
        raise ValueError("quality must be in 1..6")
    return Cheng2020(N=128 if quality <= 3 else 192)


def cheng2020_attn(quality: int = 6) -> Cheng2020:
    """The paper's full cheng2020 with simplified non-local attention
    (CompressAI ``cheng2020_attn`` registry sizes)."""
    if not 1 <= quality <= 6:
        raise ValueError("quality must be in 1..6")
    return Cheng2020(N=128 if quality <= 3 else 192, attention=True)


def cheng2020_gmm(quality: int = 6, K: int = 3) -> Cheng2020:
    """The Cheng2020 paper's full configuration: attention + K-component
    discretized Gaussian-mixture entropy model (BASELINE.json's
    'Cheng2020 GMM+attention')."""
    if not 1 <= quality <= 6:
        raise ValueError("quality must be in 1..6")
    return Cheng2020(N=128 if quality <= 3 else 192, attention=True, K=K)
