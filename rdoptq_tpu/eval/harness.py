"""Dataset evaluation harness: bpp / PSNR / MS-SSIM over image sets.

Parity with the reference's `Test_kodak` (test_datasets.py:76-117) and its
Tecnick/CLIC notebook variants: pad to a stride multiple, run the
fake-quant likelihood forward (never the serial codec — same as the
reference's evaluation), crop, clamp, and accumulate metrics. TPU-native
details: one jitted evaluation function per padded-shape bucket (Kodak has
exactly two orientations, so two compiles), optionally sharded over a
device mesh on the batch axis (see ``rdoptq_tpu.parallel``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import NULL_CTX, QuantCtx
from ..ops import metrics as M


@dataclasses.dataclass
class EvalResult:
    psnr: float
    ms_ssim: float
    ms_ssim_db: float
    bpp: float
    per_image: List[Dict[str, float]]
    seconds: float

    def row(self) -> str:
        return (f"psnr {self.psnr:.2f} dB | ms-ssim {self.ms_ssim:.4f} "
                f"({self.ms_ssim_db:.2f} dB) | bpp {self.bpp:.4f} "
                f"| {self.seconds:.1f}s")


def make_eval_fn(model, ctx: QuantCtx = NULL_CTX):
    """Jitted single-image eval: returns (psnr, ms_ssim, bpp). Compiled
    once per padded input shape."""

    import functools

    @functools.partial(jax.jit, static_argnums=(2, 3))
    def run(params, x_pad, orig_hw, meta):
        out = model.forward(params, x_pad, ctx=ctx)
        h, w = orig_hw
        top, left = meta
        num_pixels = x_pad.shape[0] * h * w
        bpp = M.bpp_from_likelihoods(out["likelihoods"], num_pixels)
        x_hat = jnp.clip(out["x_hat"], 0.0, 1.0)
        x_hat = x_hat[:, top:top + h, left:left + w, :]
        x_ref = x_pad[:, top:top + h, left:left + w, :]
        return M.psnr(x_ref, x_hat), M.ms_ssim(x_ref, x_hat), bpp

    return run


def make_gated_eval_fn(model, skip_paths: frozenset = frozenset(),
                       act_kind: str = "dynamic", act_bits: int = 8):
    """Jitted eval whose activation-quant configuration is a TRACED gate
    dict — one compiled program serves FP32, W-only, and every W+A trained
    set (the CLI evaluates 4-5 quant states per run; static ctx would
    recompile the full model each time)."""
    import functools

    @functools.partial(jax.jit, static_argnums=(3, 4))
    def run(params, x_pad, gates, orig_hw, meta):
        ctx = QuantCtx(act_kind=act_kind, act_bits=act_bits,
                       skip_paths=skip_paths, gates=dict(gates))
        out = model.forward(params, x_pad, ctx=ctx)
        h, w = orig_hw
        top, left = meta
        num_pixels = x_pad.shape[0] * h * w
        bpp = M.bpp_from_likelihoods(out["likelihoods"], num_pixels)
        x_hat = jnp.clip(out["x_hat"], 0.0, 1.0)
        x_hat = x_hat[:, top:top + h, left:left + w, :]
        x_ref = x_pad[:, top:top + h, left:left + w, :]
        return M.psnr(x_ref, x_hat), M.ms_ssim(x_ref, x_hat), bpp

    return run


def stage_gates(model, enabled_stages) -> dict:
    """Boolean gate per stage name (True => act-quant that stage)."""
    gates = {}
    on = frozenset(enabled_stages)
    for coder in model.coders.values():
        for st in coder.stages:
            gates[st.name] = jnp.asarray(st.name in on)
    return gates


def evaluate(model, params, images: Sequence[np.ndarray],
             ctx: QuantCtx = NULL_CTX, pad_multiple: int = 64,
             eval_fn=None, gates: Optional[dict] = None,
             pad_to: Optional[tuple] = None) -> EvalResult:
    """Evaluate a list of (1, H, W, 3) images; returns dataset means
    (the reference averages per-image metrics, test_datasets.py:100-116).
    Pass ``eval_fn`` from :func:`make_gated_eval_fn` together with
    ``gates`` to share one compiled program across quant states.
    ``pad_to=(H, W)`` floors the padded shape to one fixed bucket so a
    varied-shape set (CLIC) costs one compile; bpp stays normalized by
    the ORIGINAL pixel count, so padding inflates absolute bpp slightly
    (the reference's padded eval does the same) — deltas vs an anchor
    evaluated with the same padding remain comparable."""
    if eval_fn is None:
        run = make_eval_fn(model, ctx)
    else:
        run = eval_fn
    per_image = []
    t0 = time.time()
    for img in images:
        x = jnp.asarray(img)
        x_pad, (h, w, top, left) = M.pad_to_multiple(x, pad_multiple,
                                                     floor=pad_to)
        if gates is not None:
            p, s, b = run(params, x_pad, gates, (h, w), (top, left))
        else:
            p, s, b = run(params, x_pad, (h, w), (top, left))
        per_image.append({"psnr": float(p), "ms_ssim": float(s),
                          "bpp": float(b)})
    secs = time.time() - t0
    mean = lambda k: float(np.mean([r[k] for r in per_image]))
    ms = mean("ms_ssim")
    return EvalResult(psnr=mean("psnr"), ms_ssim=ms,
                      ms_ssim_db=float(-10 * np.log10(max(1 - ms, 1e-12))),
                      bpp=mean("bpp"), per_image=per_image, seconds=secs)


__all__ = ["EvalResult", "make_eval_fn", "evaluate"]
