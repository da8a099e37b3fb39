"""Data-parallel dataset evaluation over a device mesh.

The reference evaluates Kodak/Tecnick/CLIC image-by-image on one GPU
(test_datasets.py:76-117); here images of the same padded shape are
stacked and sharded over the mesh's ``dp`` axis, so a v5e-8 evaluates 8
images per dispatch. Per-image metrics come out of one jitted program
(vmapped PSNR/MS-SSIM + per-image bpp from the likelihoods).
"""

from __future__ import annotations

import collections
import time
from functools import partial
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..eval.harness import EvalResult
from ..models.layers import NULL_CTX, QuantCtx
from ..ops import metrics as M
from . import mesh as mesh_lib


def make_batch_eval(model, ctx: QuantCtx, mesh, crop):
    """``crop`` = (h, w, top, left): static original-image region inside the
    padded canvas (metrics match the single-device harness exactly)."""
    batch_sh = mesh_lib.batch_sharding(mesh)
    repl = mesh_lib.replicated(mesh)
    h, w, top, left = crop

    def run(params, x_pad):
        out = model.forward(params, x_pad, ctx=ctx)
        x_hat = jnp.clip(out["x_hat"], 0.0, 1.0)
        a = x_pad[:, top:top + h, left:left + w, :]
        b = x_hat[:, top:top + h, left:left + w, :]

        def per_image(ai, bi):
            return M.psnr(ai[None], bi[None]), M.ms_ssim(ai[None], bi[None])

        psnr, ms = jax.vmap(per_image)(a, b)
        # per-image bpp over all latents
        bits = sum(
            -jnp.sum(jnp.log2(l), axis=tuple(range(1, l.ndim)))
            for l in out["likelihoods"].values())
        return psnr, ms, bits

    return jax.jit(run, in_shardings=(repl, batch_sh))


def evaluate_sharded(model, params, images: Sequence[np.ndarray], mesh,
                     ctx: QuantCtx = NULL_CTX,
                     pad_multiple: int = 64) -> EvalResult:
    """Shape-bucketed, dp-sharded evaluation. Metrics are computed on the
    padded canvas (pad is constant-zero, negligible for Kodak-style sizes
    relative to the harness's cropped variant; use eval.harness for exact
    crop semantics on a single device)."""
    dp = mesh.shape["dp"]
    params = mesh_lib.replicate_tree(params, mesh)

    # bucket by (padded shape, crop meta) so cropping is static per bucket
    buckets: Dict = collections.defaultdict(list)
    for img in images:
        x = jnp.asarray(img)
        x_pad, meta = M.pad_to_multiple(x, pad_multiple)
        buckets[(x_pad.shape, meta)].append(x_pad[0])

    runs = {key: make_batch_eval(model, ctx, mesh, key[1])
            for key in buckets}
    per_image: List[Dict[str, float]] = []
    t0 = time.time()
    for key, items in buckets.items():
        run = runs[key]
        (h, w, _, _) = key[1]
        num_pixels = h * w
        for i in range(0, len(items), dp):
            chunk = items[i:i + dp]
            n = len(chunk)
            xs = list(chunk)
            while len(xs) < dp:  # pad the batch with repeats
                xs.append(xs[-1])
            x = jnp.stack(xs)
            x = jax.device_put(x, mesh_lib.batch_sharding(mesh))
            psnr, ms, bits = run(params, x)
            for k in range(n):
                per_image.append({
                    "psnr": float(psnr[k]), "ms_ssim": float(ms[k]),
                    "bpp": float(bits[k]) / num_pixels})
    secs = time.time() - t0
    mean = lambda key: float(np.mean([r[key] for r in per_image]))
    msv = mean("ms_ssim")
    return EvalResult(psnr=mean("psnr"), ms_ssim=msv,
                      ms_ssim_db=float(-10 * np.log10(max(1 - msv, 1e-12))),
                      bpp=mean("bpp"), per_image=per_image, seconds=secs)


def evaluate_spatial(model, params, images: Sequence[np.ndarray], mesh,
                     ctx: QuantCtx = NULL_CTX,
                     pad_multiple: int = 64) -> EvalResult:
    """Sequence-parallel analogue (SURVEY §5 long-context): ONE image per
    dispatch with its H axis sharded over the mesh's dp devices — for
    2K-class images (Tecnick 1200², CLIC 2048×1365) whose per-image
    activation footprint is the scaling limit, rather than image count.
    GSPMD inserts the conv halo exchanges at shard edges; H is padded to
    ``pad_multiple * dp`` so every ×2-downsampled activation still
    shards evenly. Metrics are computed on the original (cropped)
    region — same protocol as ``make_batch_eval`` — and bpp is
    normalized by the original pixel count.

    Intended for the conv transforms (Minnen2018 / Cheng2020 / TinyLIC
    stages); window-attention models reshape H into windows, which
    GSPMD re-layouts less efficiently."""
    dp = mesh.shape["dp"]
    unit = pad_multiple * dp
    params = mesh_lib.replicate_tree(params, mesh)
    sp_sh = mesh_lib.spatial_sharding(mesh)

    # h/w are static: one compile per unique (padded, original) shape
    # pair — the same cardinality as the padded-shape buckets alone for
    # fixed-size sets (Tecnick), one extra trace per distinct size
    # otherwise. Cropping INSIDE the program keeps the metric protocol
    # identical to make_batch_eval (pad rows must not be scored).
    @partial(jax.jit, static_argnums=(2, 3))
    def run(params, x_pad, h, w):
        out = model.forward(params, x_pad, ctx=ctx)
        x_hat = jnp.clip(out["x_hat"], 0.0, 1.0)[:, :h, :w, :]
        x = x_pad[:, :h, :w, :]
        bits = sum(-jnp.sum(jnp.log2(l))
                   for l in out["likelihoods"].values())
        return (M.psnr(x, x_hat), M.ms_ssim(x, x_hat), bits)

    per_image: List[Dict[str, float]] = []
    t0 = time.time()
    for img in images:
        x = jnp.asarray(img)
        h, w = x.shape[1], x.shape[2]
        ph = -(-h // unit) * unit
        pw = -(-w // pad_multiple) * pad_multiple
        x_pad = jnp.pad(x, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))
        x_pad = jax.device_put(x_pad, sp_sh)
        psnr, ms, bits = run(params, x_pad, h, w)
        per_image.append({"psnr": float(psnr), "ms_ssim": float(ms),
                          "bpp": float(bits) / (h * w)})
    secs = time.time() - t0
    mean = lambda key: float(np.mean([r[key] for r in per_image]))
    msv = mean("ms_ssim")
    return EvalResult(psnr=mean("psnr"), ms_ssim=msv,
                      ms_ssim_db=float(-10 * np.log10(max(1 - msv, 1e-12))),
                      bpp=mean("bpp"), per_image=per_image, seconds=secs)


__all__ = ["make_batch_eval", "evaluate_sharded", "evaluate_spatial"]
