"""Image-quality metrics and the rate-distortion objective, in JAX.

Parity with the reference's metric layer (losses/losses.py:8-84,
test_datasets.py:21-33, pytorch_msssim): PSNR, MS-SSIM (5-scale, 11-tap
Gaussian window), bpp from likelihoods, and the λ-weighted RD loss. All
computations run jitted on the accelerator.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(a: jax.Array, b: jax.Array, max_val: float = 1.0) -> jax.Array:
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jax.Array:
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(coords ** 2) / (2 * sigma ** 2))
    return g / jnp.sum(g)


def _blur(x: jax.Array, win: jax.Array) -> jax.Array:
    """Separable depthwise Gaussian blur, NHWC, VALID padding.

    Full fp32 precision: on TPU the default conv precision is bf16, which
    destroys the variance cancellation (blur(x²) − µ²) that SSIM needs."""
    c = x.shape[-1]
    kh = jnp.tile(win.reshape(-1, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(win.reshape(1, -1, 1, 1), (1, 1, 1, c))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST)
    return jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST)


def _ssim_components(a, b, win, max_val):
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a, mu_b = _blur(a, win), _blur(b, win)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_aa = _blur(a * a, win) - mu_aa
    s_bb = _blur(b * b, win) - mu_bb
    s_ab = _blur(a * b, win) - mu_ab
    cs = (2 * s_ab + c2) / (s_aa + s_bb + c2)
    ssim = ((2 * mu_ab + c1) / (mu_aa + mu_bb + c1)) * cs
    return jnp.mean(ssim), jnp.mean(cs)


def ssim(a: jax.Array, b: jax.Array, max_val: float = 1.0) -> jax.Array:
    win = _gaussian_kernel()
    s, _ = _ssim_components(a, b, win, max_val)
    return s


def _downsample2(x: jax.Array) -> jax.Array:
    """2x average pooling (same as pytorch_msssim's avg_pool2d)."""
    b, h, w, c = x.shape
    x = x[:, : h // 2 * 2, : w // 2 * 2, :]
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.mean(x, axis=(2, 4))


def ms_ssim(a: jax.Array, b: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Multi-scale SSIM, 5 scales, standard weights — identical to
    pytorch_msssim for min(H, W) >= 176 (the smallest size whose 5th
    scale still covers the 11-pixel SSIM window; pytorch_msssim asserts
    a looser >160). Below that — where the coarsest scale would be
    smaller than the window and the metric silently produced NaN — the
    scale count adapts to the input with the kept weights renormalized,
    so tiny-image tests/evals stay finite."""
    n_scales = len(_MSSSIM_WEIGHTS)
    smallest = min(a.shape[1], a.shape[2])
    while n_scales > 1 and smallest // (2 ** (n_scales - 1)) < 11:
        n_scales -= 1
    win = _gaussian_kernel()
    weights = jnp.asarray(_MSSSIM_WEIGHTS[:n_scales])
    if n_scales < len(_MSSSIM_WEIGHTS):  # keep the standard path exact
        weights = weights / jnp.sum(weights)
    vals = []
    for i in range(n_scales):
        s, cs = _ssim_components(a, b, win, max_val)
        vals.append(s if i == n_scales - 1 else cs)
        if i < n_scales - 1:
            a, b = _downsample2(a), _downsample2(b)
    vals = jnp.stack(vals)
    return jnp.prod(jnp.maximum(vals, 1e-8) ** weights)


def bpp_from_likelihoods(likelihoods: Dict[str, jax.Array],
                         num_pixels: int) -> jax.Array:
    """-sum(log2 p) / pixels (reference test_datasets.py:29-33)."""
    total = sum(jnp.sum(jnp.log2(l)) for l in likelihoods.values())
    return -total / num_pixels


def rd_loss(out: Dict, target: jax.Array, lmbda: float,
            metric: str = "mse") -> Dict[str, jax.Array]:
    """Rate-distortion objective (reference losses/losses.py:8-39):
    mse mode: λ·255²·MSE + bpp; ms-ssim mode: λ·(1 − MS-SSIM) + bpp."""
    n, h, w, _ = target.shape
    num_pixels = n * h * w
    bpp = bpp_from_likelihoods(out["likelihoods"], num_pixels)
    if metric == "mse":
        mse = jnp.mean((out["x_hat"] - target) ** 2)
        loss = lmbda * (255.0 ** 2) * mse + bpp
        return {"loss": loss, "bpp": bpp, "mse": mse}
    if metric == "ms-ssim":
        ms = ms_ssim(out["x_hat"], target)
        loss = lmbda * (1.0 - ms) + bpp
        return {"loss": loss, "bpp": bpp, "ms_ssim": ms}
    raise ValueError(f"unknown metric {metric!r}")


def pad_to_multiple(x: jax.Array, multiple: int = 64, floor=None):
    """Constant-pad H/W up to the next multiple (reference
    test_datasets.py:45-60 pads to 256 for Lu2022, 64 for TinyLIC).
    Returns (padded, (h, w)) with the original size for cropping.

    ``floor=(H, W)`` sets a minimum padded size, collapsing a
    varied-shape dataset (CLIC has 23 unique sizes) into few jit shape
    buckets — each unique padded shape is one XLA compile."""
    _, h, w, _ = x.shape
    new_h = -(-h // multiple) * multiple
    new_w = -(-w // multiple) * multiple
    if floor is not None:
        new_h = max(new_h, -(-floor[0] // multiple) * multiple)
        new_w = max(new_w, -(-floor[1] // multiple) * multiple)
    pad_h, pad_w = new_h - h, new_w - w
    top, left = pad_h // 2, pad_w // 2
    out = jnp.pad(x, ((0, 0), (top, pad_h - top), (left, pad_w - left),
                      (0, 0)))
    return out, (h, w, top, left)


def crop_to_original(x: jax.Array, meta) -> jax.Array:
    h, w, top, left = meta
    return x[:, top:top + h, left:left + w, :]


__all__ = ["psnr", "ssim", "ms_ssim", "bpp_from_likelihoods", "rd_loss",
           "pad_to_multiple", "crop_to_original"]
