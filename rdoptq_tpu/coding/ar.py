"""Wavefront-parallel autoregressive codec for causal-context models
(Minnen2018 / Cheng2020 / Lu2022).

The reference decodes these models with a pixel-serial Python loop — one
masked conv + entropy-parameter network call per latent pixel
(nic_cvt.py:451-483 encode, :525-565 decode: H×W ≈ 1536 serial steps for a
768×512 image). That schedule is hostile to any accelerator.

TPU-native redesign: with the 5×5 type-'A' causal mask, pixel (i, j)
depends only on (i, j-1) in its own row and (i-1, j+2) in the rows above,
so every anti-diagonal wave ``t = 3·i + j`` is computable in parallel.
That turns H×W serial steps into ``3·(H-1) + W`` waves (~10× fewer for a
48×32 latent), each wave a batched gather → masked-kernel contraction →
pointwise entropy-parameter MLP over ≤P pixels — all jitted device code.
The host only runs the rANS coder: once at the end for encoding, and one
streaming chunk per wave for decoding.

Both encode and decode run the SAME jitted wave-step functions, so the
Gaussian parameters agree bitwise and the conditional bitstream decodes.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import causal_mask
from ..ops import entropy as E
from . import rans
from .codec import (CodecTables, _float_dtype, decompress_factorized,
                    encode_factorized_symbols, factorized_round)


@functools.lru_cache(maxsize=None)
def wavefront_schedule(h: int, w: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static schedule: for each wave t = 3i + j, the pixel list.

    Returns (pixels, counts): pixels (T, P, 2) int32 padded with zeros,
    counts (T,) the number of valid pixels per wave. Order within a wave is
    increasing i — the canonical symbol order of the bitstream.
    """
    waves: Dict[int, List[Tuple[int, int]]] = {}
    for i in range(h):
        for j in range(w):
            waves.setdefault(3 * i + j, []).append((i, j))
    T = 3 * (h - 1) + w
    P = max(len(v) for v in waves.values())
    pixels = np.zeros((T, P, 2), np.int32)
    counts = np.zeros(T, np.int32)
    for t in range(T):
        pts = sorted(waves.get(t, []))
        counts[t] = len(pts)
        for p, (i, j) in enumerate(pts):
            pixels[t, p] = (i, j)
    return pixels, counts


def _ep_pointwise(params, feats):
    """Entropy-parameter 1x1-conv chain applied to (P, C) feature rows
    (identical math to the conv form — the kernels are 1x1)."""
    h = feats
    for name in ("conv0", "conv1"):
        p = params["ep"][name]
        h = jax.nn.leaky_relu(
            h @ p["w"].reshape(p["w"].shape[2], p["w"].shape[3]) + p["b"],
            0.01)
    p = params["ep"]["conv2"]
    return h @ p["w"].reshape(p["w"].shape[2], p["w"].shape[3]) + p["b"]


@functools.lru_cache(maxsize=16)
def _wave_fns(model, h: int, w: int):
    """Jitted wave-step functions for a given latent resolution, shared by
    encode and decode."""
    M = model.latent_channels
    pixels, counts = wavefront_schedule(h, w)
    pixels_j = jnp.asarray(pixels)
    kmask = causal_mask(5, M, 2 * M)

    def wave_params(params, y_hat_pad, hyper, t):
        """For wave t: gather 5x5 neighborhoods of the padded y_hat,
        contract with the masked context kernel, run the pointwise EP
        chain -> (scales, means) for the wave's P pixel slots."""
        pts = pixels_j[t]  # (P, 2)
        kernel = params["context"]["w"] * kmask

        def one(pt):
            i, j = pt[0], pt[1]
            nb = jax.lax.dynamic_slice(y_hat_pad, (i, j, 0), (5, 5, M))
            ctx_p = jnp.einsum("hwc,hwco->o", nb, kernel) \
                + params["context"]["b"]
            hy = jax.lax.dynamic_slice(hyper, (i, j, 0),
                                       (1, 1, hyper.shape[-1]))[0, 0]
            gp = _ep_pointwise(params, jnp.concatenate([hy, ctx_p])[None])
            return gp[0]

        gp = jax.vmap(one)(pts)  # (P, 2M)
        scales, means = jnp.split(gp, 2, axis=-1)
        return scales, means

    def wave_update(y_hat_pad, t, values, valid):
        """Scatter decoded/quantized values of wave t into the padded
        buffer (slots beyond the wave's count carry valid=False)."""
        pts = pixels_j[t]

        def body(buf, args):
            pt, val, ok = args
            # pixel (i, j) lives at (i+2, j+2) in the padded buffer
            i, j = pt[0] + 2, pt[1] + 2
            cur = jax.lax.dynamic_slice(buf, (i, j, 0), (1, 1, M))
            new = jnp.where(ok, val.reshape(1, 1, M), cur)
            return jax.lax.dynamic_update_slice(buf, new, (i, j, 0)), None

        buf, _ = jax.lax.scan(body, y_hat_pad, (pts, values, valid))
        return buf

    def encode_scan(params, y, hyper):
        """Full encode pass on device: scan over waves producing symbols
        (T, P, M) and CDF indexes (T, P, M) in canonical order (wave t,
        wave position p, channel m; the host slices valid positions
        ``[t, :counts[t]]`` and flattens the channel axis). The indexes
        are built per wave with the same `build_indexes` math as
        decode_step, so both sides of the bitstream agree bitwise."""
        T = pixels.shape[0]
        P = pixels.shape[1]
        valid = jnp.asarray(
            np.arange(P)[None, :] < counts[:, None])  # (T, P)
        # wave math is pinned to f32 whatever the transform dtype: the
        # decoder's host-side `sym + means` is f32, and the context
        # einsum promotes to f32 anyway (f32 causal mask) — so with
        # bf16 params the two sides still agree bitwise
        y = y.astype(jnp.float32)
        y_hat_pad = jnp.zeros((h + 4, w + 4, M), y.dtype)

        def step(buf, t):
            scales, means = wave_params(params, buf, hyper, t)
            idx = E.build_indexes(E.default_scale_table(), scales)
            pts = pixels_j[t]
            y_vals = jax.vmap(
                lambda pt: jax.lax.dynamic_slice(y, (pt[0], pt[1], 0),
                                                 (1, 1, M))[0, 0])(pts)
            sym = jnp.round(y_vals - means).astype(jnp.int32)
            y_hat_vals = sym.astype(y.dtype) + means
            buf = wave_update(buf, t, y_hat_vals, valid[t])
            return buf, (sym, idx)

        buf, (syms, idxs) = jax.lax.scan(step, y_hat_pad,
                                         jnp.arange(T))
        return buf[2:-2, 2:-2, :], syms, idxs

    def decode_step(params, y_hat_pad, hyper, t, prev_vals, prev_valid):
        """Fused decode step: scatter wave t-1's decoded values, then
        compute wave t's CDF indexes + means — ONE device dispatch per
        wave (host<->device round trips dominate decode latency)."""
        y_hat_pad = wave_update(y_hat_pad, t - 1, prev_vals, prev_valid)
        scales, means = wave_params(params, y_hat_pad, hyper, t)
        idx = E.build_indexes(E.default_scale_table(), scales)
        return y_hat_pad, idx, means

    return {"pixels": pixels, "counts": counts,
            "wave_params": jax.jit(wave_params),
            "wave_update": jax.jit(wave_update),
            "decode_step": jax.jit(decode_step),
            "encode_scan": jax.jit(encode_scan)}


@functools.lru_cache(maxsize=16)
def _wave_fns_b(model, h: int, w: int):
    """vmapped wave functions: a BATCH of same-size images (the tiles of
    one large image, coding/tiled.py) runs each wave as one dispatch —
    the whole grid decodes in the same 3(h-1)+w host round trips as a
    single image."""
    fns = _wave_fns(model, h, w)
    return {
        "pixels": fns["pixels"], "counts": fns["counts"],
        "encode_scan": jax.jit(jax.vmap(fns["encode_scan"],
                                        in_axes=(None, 0, 0))),
        "decode_step": jax.jit(jax.vmap(fns["decode_step"],
                                        in_axes=(None, 0, 0, None, 0, 0))),
        "wave_update": jax.jit(jax.vmap(fns["wave_update"],
                                        in_axes=(0, None, 0, 0))),
    }


def ar_compress_batched(model, params, x, tables: CodecTables) -> Dict:
    """Batch variant of :func:`ar_compress`: x (B, H, W, 3) -> ONE
    y-stream + ONE z-stream for the whole batch. Canonical symbol order:
    wave-major, then image, then valid slots channel-major — the order
    the batched decoder can produce parameters in (each wave's params
    for ALL images come from one vmapped dispatch)."""
    y, z = _analysis_fn(model)(params, jnp.asarray(x))
    med = jnp.asarray(tables.medians, jnp.float32).reshape(1, 1, 1, -1)
    z_sym, z_hat = factorized_round(z, med)
    hyper = _hyper_fn(model)(params, z_hat)

    B, h, w = int(y.shape[0]), int(y.shape[1]), int(y.shape[2])
    fns = _wave_fns_b(model, h, w)
    y_hat, syms, idxs = fns["encode_scan"](params, y, hyper)  # (B,T,P,M)
    z_sym, syms_np, idx_all = jax.device_get((z_sym, syms, idxs))
    z_string = encode_factorized_symbols(tables, z_sym)
    counts = fns["counts"]
    sym_list, idx_list = [], []
    for t in range(syms_np.shape[1]):
        n = counts[t]
        if n == 0:
            continue
        for b in range(B):
            sym_list.append(syms_np[b, t, :n].reshape(-1))
            idx_list.append(idx_all[b, t, :n].reshape(-1))
    g = tables.gaussian
    y_string = rans.encode_with_indexes(
        np.concatenate(sym_list), np.concatenate(idx_list), g.cdf,
        g.cdf_lengths, g.offsets)
    return {"strings": [y_string, z_string],
            "shape": (int(z.shape[1]), int(z.shape[2])),
            "y_shape": (h, w), "y_hat": y_hat}


def ar_decompress_batched(model, params, strings: List[bytes],
                          shape: Tuple[int, int],
                          y_shape: Tuple[int, int],
                          tables: CodecTables, batch: int,
                          out: str = "f32") -> np.ndarray:
    """Batch variant of :func:`ar_decompress`: one vmapped dispatch per
    wave decodes every image's wave-t symbols together."""
    y_string, z_string = strings
    z_hat = jnp.asarray(decompress_factorized(tables, z_string, shape,
                                              batch))
    hyper = _hyper_fn(model)(params, z_hat)
    h, w = y_shape
    M = model.latent_channels
    fns = _wave_fns_b(model, h, w)
    pixels, counts = fns["pixels"], fns["counts"]
    dec = rans.RansDecoderStream(y_string)
    g = tables.gaussian

    B = batch
    y_hat_pad = jnp.zeros((B, h + 4, w + 4, M), jnp.float32)
    P, T = pixels.shape[1], pixels.shape[0]
    prev_vals = jnp.zeros((B, P, M), jnp.float32)
    prev_valid = jnp.zeros((B, P), bool)
    for t in range(T):
        n = int(counts[t])
        y_hat_pad, idx_j, means_j = fns["decode_step"](
            params, y_hat_pad, hyper, jnp.int32(t), prev_vals, prev_valid)
        if n == 0:
            prev_valid = jnp.zeros((B, P), bool)
            continue
        idx, means = jax.device_get((idx_j, means_j))  # one transfer
        # wave t's symbols are contiguous and image-major in the stream
        # (encode packs `for b: syms[b, t, :n]`): ONE rANS call decodes
        # the whole wave for every image
        sym = dec.decode(idx[:, :n].reshape(-1), g.cdf, g.cdf_lengths,
                         g.offsets)
        vals = np.zeros((B, P, M), np.float32)
        vals[:, :n] = sym.reshape(B, n, M) + means[:, :n]
        prev_vals = jnp.asarray(vals)
        prev_valid = jnp.asarray(
            np.broadcast_to(np.arange(P) < n, (B, P)))
    y_hat_pad = fns["wave_update"](y_hat_pad, jnp.int32(T - 1), prev_vals,
                                   prev_valid)
    dec.close()
    y_hat = y_hat_pad[:, 2:-2, 2:-2, :]
    return _finish(model, params, y_hat, out)


def ar_compress(model, params, x, tables: CodecTables) -> Dict:
    """Compress with the causal-context codec. All transform, context and
    index math on device (asynchronously dispatched); ONE host
    synchronization for the symbol/index fetch, then one host rANS
    encode."""
    y, z = _analysis_fn(model)(params, jnp.asarray(x))
    med = jnp.asarray(tables.medians, jnp.float32).reshape(1, 1, 1, -1)
    z_sym, z_hat = factorized_round(z, med)
    hyper = _hyper_fn(model)(params, z_hat)

    h, w = int(y.shape[1]), int(y.shape[2])
    fns = _wave_fns(model, h, w)
    _, syms, idxs = fns["encode_scan"](params, y[0], hyper[0])
    # the single host synchronization for the whole image
    z_sym, syms_np, idx_all = jax.device_get((z_sym, syms, idxs))
    z_string = encode_factorized_symbols(tables, z_sym)
    # canonical flatten: wave order, valid slots, channel-major per pixel
    counts = fns["counts"]
    sym_list, idx_list = [], []
    for t in range(syms_np.shape[0]):
        n = counts[t]
        if n == 0:
            continue
        sym_list.append(syms_np[t, :n].reshape(-1))
        idx_list.append(idx_all[t, :n].reshape(-1))
    g = tables.gaussian
    y_string = rans.encode_with_indexes(
        np.concatenate(sym_list), np.concatenate(idx_list), g.cdf,
        g.cdf_lengths, g.offsets)
    return {"strings": [y_string, z_string],
            "shape": (int(z.shape[1]), int(z.shape[2])),
            "y_shape": (h, w)}


@functools.lru_cache(maxsize=16)
def _analysis_fn(model):
    """Cached jit (a per-call closure would re-trace on every image —
    per-tile overhead in coding/tiled.py). Transform compute follows the
    params dtype (bf16 when tree-cast, see codec._float_dtype)."""
    def analysis(params, x):
        y = model.g_a.run(params, x.astype(_float_dtype(params)))
        z = model.h_a.run(params, y)
        return y, z
    return jax.jit(analysis)


@functools.lru_cache(maxsize=16)
def _hyper_fn(model):
    return jax.jit(lambda p, z: model.h_s.run(
        p, z.astype(_float_dtype(p))))


@functools.lru_cache(maxsize=16)
def _synthesis_fn(model):
    return jax.jit(lambda p, y: model.g_s.run(
        p, y.astype(_float_dtype(p))).astype(jnp.float32))


@functools.lru_cache(maxsize=16)
def _synthesis_u8_fn(model):
    """Synthesis fused with 8-bit output quantization (4x smaller
    decode fetch; see codec.g_s_u8)."""
    def f(p, y):
        x = model.g_s.run(p, y.astype(_float_dtype(p)))
        return jnp.clip(jnp.round(x.astype(jnp.float32) * 255.0),
                        0.0, 255.0).astype(jnp.uint8)
    return jax.jit(f)


def _finish(model, params, y_hat, out: str):
    if out == "u8":
        return np.asarray(_synthesis_u8_fn(model)(params, y_hat))
    return np.clip(np.asarray(_synthesis_fn(model)(params, y_hat)),
                   0.0, 1.0)


def ar_decompress(model, params, strings: List[bytes],
                  shape: Tuple[int, int], y_shape: Tuple[int, int],
                  tables: CodecTables, out: str = "f32") -> np.ndarray:
    """Wavefront decode: per wave, the device computes (scales, means),
    the host rANS-decodes that wave's symbols, and the device scatters the
    reconstruction — 3(h-1)+w host↔device round trips instead of h·w."""
    y_string, z_string = strings
    z_hat = jnp.asarray(decompress_factorized(tables, z_string, shape))
    hyper = _hyper_fn(model)(params, z_hat)
    h, w = y_shape
    M = model.latent_channels
    fns = _wave_fns(model, h, w)
    pixels, counts = fns["pixels"], fns["counts"]
    dec = rans.RansDecoderStream(y_string)
    g = tables.gaussian
    table_j = jnp.asarray(tables.scale_table)

    hyper0 = hyper[0]
    y_hat_pad = jnp.zeros((h + 4, w + 4, M), jnp.float32)
    P = pixels.shape[1]
    T = pixels.shape[0]
    # fused decode loop: one device dispatch per wave (scatter of the
    # previous wave's values + this wave's Gaussian params together)
    prev_vals = jnp.zeros((P, M), jnp.float32)
    prev_valid = jnp.zeros((P,), bool)
    for t in range(T):
        n = int(counts[t])
        y_hat_pad, idx_j, means_j = fns["decode_step"](
            params, y_hat_pad, hyper0, jnp.int32(t), prev_vals, prev_valid)
        if n == 0:
            prev_valid = jnp.zeros((P,), bool)
            continue
        idx, means = jax.device_get((idx_j, means_j))  # one transfer
        sym = dec.decode(idx[:n].reshape(-1), g.cdf, g.cdf_lengths,
                         g.offsets)
        vals = np.zeros((P, M), np.float32)
        vals[:n] = sym.reshape(n, M) + means[:n]
        prev_vals = jnp.asarray(vals)
        prev_valid = jnp.asarray(np.arange(P) < n)
    # scatter the final wave
    y_hat_pad = fns["wave_update"](y_hat_pad, jnp.int32(T - 1), prev_vals,
                                   prev_valid)
    dec.close()
    y_hat = y_hat_pad[2:-2, 2:-2, :][None]
    return _finish(model, params, y_hat, out)


__all__ = ["wavefront_schedule", "ar_compress", "ar_decompress",
           "ar_compress_batched", "ar_decompress_batched"]
