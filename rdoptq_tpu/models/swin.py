"""Swin-transformer layers for the Lu2022 NIC model, functional NHWC JAX.

Re-design of the reference's Swin stack (task-oriented-PTQ/models/
layers.py: Mlp :35, window_partition/reverse :54-83, WindowAttention
:86-182, SwinTransformerBlock :185-318, BasicLayer :321-377, RSTB
:380-433). TPU-first choices:

* activations stay (B, H, W, C); window partition is a reshape/transpose
  (maps to cheap relayouts, no gather);
* attention is batched einsum over (batch, windows, heads, tokens, dim) —
  big MXU matmuls instead of per-window loops;
* shifted windows use `jnp.roll` + a STATIC additive mask precomputed in
  numpy per (H, W, window, shift) and cached — no data-dependent control
  flow inside jit;
* relative-position bias is a static gather from the learned table.

Quantizable leaves: qkv / proj / fc1 / fc2 linear weights and the two
LayerNorm scales per block (exactly the set the reference wraps,
quant_block.py:330-643). Activation-quant hooks fire at the block output
and, inside attention, post-softmax and post-(attn·v) — the reference's
QuantWindowAttention hook points (quant_block.py:350-425) — using the
``stage#site`` path convention handled by QuantCtx.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L


def _gelu(x):
    """Exact (erf) GELU — torch nn.GELU default; the tanh
    approximation would break checkpoint parity."""
    import jax
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# Static geometry helpers (numpy, cached per resolution)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def relative_position_index(ws: int) -> np.ndarray:
    """(N, N) indices into the (2ws-1)² relative-position-bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))  # (2, ws, ws)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


@functools.lru_cache(maxsize=None)
def shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Additive attention mask (nW, N, N) for shifted windows: -100 between
    tokens from different pre-shift regions (reference layers.py:237-283).

    WARNING — test oracle only. NEVER call this from traced code: a numpy
    constant becomes an HLO literal, and at 2K resolutions the mask is
    hundreds of MB, which overflows the remote-compile request (HTTP 413
    — see ROUND_NOTES round-3). Traced callers must use
    `shift_attn_mask_device`, which builds the same values from iota. A
    size guard below rejects eval-resolution masks outright."""
    n_elems = (h // ws) * (w // ws) * (ws * ws) ** 2
    if n_elems > (1 << 24):  # 64 MB of f32 — far beyond any test oracle
        raise ValueError(
            f"shift_attn_mask({h},{w},ws={ws}): {n_elems:,} elements "
            "would become an HLO literal if traced; use "
            "shift_attn_mask_device for real resolutions")
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, vs] = cnt
            cnt += 1
    win = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)  # (nW, N)
    diff = win[:, None, :] != win[:, :, None]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


@functools.lru_cache(maxsize=64)
def _shift_attn_mask_eager(h: int, w: int, ws: int, shift: int) -> jax.Array:
    """Concrete device mask for EAGER callers (one dispatch per shape,
    then reused — eager per-block rebuilds would pay tunnel RTT each)."""
    return _shift_attn_mask_iota(h, w, ws, shift)


def shift_attn_mask_device(h: int, w: int, ws: int, shift: int) -> jax.Array:
    """`shift_attn_mask` computed ON DEVICE from iota, bit-identical values.

    The numpy variant becomes an HLO constant literal when traced; at 2K
    eval resolutions the (nW, N, N) mask is hundreds of MB and overflows
    the remote-compile request (HTTP 413 over this environment's tunnel).
    Building it from `jnp.arange` keeps the program free of large
    literals and lets XLA fuse the mask construction into the attention
    add. Region bands follow reference layers.py:247-255: rows/cols
    split at [0, n-ws), [n-ws, n-shift), [n-shift, n).

    Under a trace the iota subgraph is staged per call (XLA CSEs the
    duplicates); eager callers get an lru-cached concrete array instead —
    caching a traced result would leak the tracer, so the cache is gated
    on a clean trace state. ``trace_state_clean`` is a private JAX API
    with no stability guarantee: if a JAX upgrade drops it, fall back to
    the always-correct (just uncached) iota path rather than breaking
    every Swin import."""
    try:
        from jax._src.core import trace_state_clean
    except ImportError:
        return _shift_attn_mask_iota(h, w, ws, shift)
    if trace_state_clean():
        return _shift_attn_mask_eager(h, w, ws, shift)
    return _shift_attn_mask_iota(h, w, ws, shift)


def _shift_attn_mask_iota(h: int, w: int, ws: int, shift: int) -> jax.Array:
    def band(n: int) -> jax.Array:
        i = jnp.arange(n)
        return (i >= n - ws).astype(jnp.int32) + (i >= n - shift)

    img = band(h)[:, None] * 3 + band(w)[None, :]  # (h, w) region ids
    win = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)  # (nW, N)
    diff = win[:, None, :] != win[:, :, None]
    return jnp.where(diff, jnp.float32(-100.0), jnp.float32(0.0))


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) -> (B, nW, N, C) with N = ws²."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // ws) * (w // ws), ws * ws, c)


def window_reverse(x: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    b = x.shape[0]
    c = x.shape[-1]
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------


def window_attention_init(key, dim: int, num_heads: int, ws: int,
                          qkv_bias: bool = True) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    table = 0.02 * jax.random.truncated_normal(
        k3, -2.0, 2.0, ((2 * ws - 1) ** 2, num_heads), jnp.float32)
    return {"qkv": L.linear_init(k1, dim, 3 * dim, bias=qkv_bias),
            "proj": L.linear_init(k2, dim, dim),
            "rpb_table": table}


def swin_block_init(key, dim: int, num_heads: int, ws: int,
                    mlp_ratio: float = 4.0) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    hidden = int(dim * mlp_ratio)
    return {"norm1": L.layer_norm_init(dim),
            "attn": window_attention_init(k1, dim, num_heads, ws),
            "norm2": L.layer_norm_init(dim),
            "mlp": {"fc1": L.linear_init(k2, dim, hidden),
                    "fc2": L.linear_init(k3, hidden, dim)}}


def rstb_init(key, dim: int, depth: int, num_heads: int, ws: int,
              mlp_ratio: float = 4.0) -> Dict:
    keys = jax.random.split(key, depth)
    return {f"block{i}": swin_block_init(keys[i], dim, num_heads, ws,
                                         mlp_ratio)
            for i in range(depth)}


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def window_attention(p: Dict, x: jax.Array, num_heads: int, ws: int,
                     mask: Optional[np.ndarray],
                     ctx: L.QuantCtx = L.NULL_CTX,
                     name: str = "attn") -> jax.Array:
    """x: (B, nW, N, C) -> same. Batched multi-head attention per window."""
    b, nw, n, c = x.shape
    hd = c // num_heads
    qkv = L.linear(p["qkv"], x)  # (B, nW, N, 3C)
    qkv = qkv.reshape(b, nw, n, 3, num_heads, hd)
    q, k, v = (qkv[..., i, :, :] for i in range(3))  # (B,nW,N,h,hd)
    q = q * (hd ** -0.5)
    attn = jnp.einsum("bwnhd,bwmhd->bwhnm", q, k)
    idx = jnp.asarray(relative_position_index(ws).reshape(-1))
    rpb = jnp.take(p["rpb_table"], idx, axis=0)  # (N*N, heads)
    rpb = rpb.reshape(n, n, num_heads).transpose(2, 0, 1)
    attn = attn + rpb[None, None]
    if mask is not None:
        m = jnp.asarray(mask)  # (nW, N, N)
        attn = attn + m[None, :, None, :, :]
    attn = jax.nn.softmax(attn, axis=-1)
    attn = ctx.act(f"{name}#softmax", attn)
    out = jnp.einsum("bwhnm,bwmhd->bwnhd", attn, v).reshape(b, nw, n, c)
    out = ctx.act(f"{name}#attnv", out)
    return L.linear(p["proj"], out)


def swin_block(p: Dict, x: jax.Array, num_heads: int, ws: int, shift: int,
               ctx: L.QuantCtx = L.NULL_CTX,
               name: str = "blk") -> jax.Array:
    """One (shifted-)window transformer block on (B, H, W, C)."""
    b, h, w, c = x.shape
    ws_eff, shift_eff = ws, shift
    if min(h, w) <= ws:
        # window larger than the feature map: no partitioning benefit,
        # no shift (reference layers.py:203-208 adjusts the same way)
        ws_eff, shift_eff = min(h, w), 0
    shortcut = x
    x = L.layer_norm(p["norm1"], x)
    if shift_eff > 0:
        x = jnp.roll(x, (-shift_eff, -shift_eff), axis=(1, 2))
        mask = shift_attn_mask_device(h, w, ws_eff, shift_eff)
    else:
        mask = None
    xw = window_partition(x, ws_eff)
    xw = window_attention(p["attn"], xw, num_heads, ws_eff, mask, ctx,
                          f"{name}")
    x = window_reverse(xw, ws_eff, h, w)
    if shift_eff > 0:
        x = jnp.roll(x, (shift_eff, shift_eff), axis=(1, 2))
    x = shortcut + x
    # MLP
    y = L.layer_norm(p["norm2"], x)
    y = L.linear(p["mlp"]["fc2"], _gelu(L.linear(p["mlp"]["fc1"], y)))
    return x + y


def rstb(p: Dict, x: jax.Array, depth: int, num_heads: int, ws: int,
         ctx: L.QuantCtx = L.NULL_CTX, name: str = "rstb") -> jax.Array:
    """Residual Swin Transformer Block group: depth blocks (alternating
    shift 0 / ws//2) with an outer residual (reference layers.py:380-433)."""
    res = x
    for i in range(depth):
        shift = 0 if i % 2 == 0 else ws // 2
        res = swin_block(p[f"block{i}"], res, num_heads, ws, shift, ctx,
                         f"{name}/block{i}")
    out = x + res
    return ctx.act(name, out)


def rstb_leaf_paths(path: str, depth: int) -> Tuple[str, ...]:
    out = []
    for i in range(depth):
        b = f"{path}/block{i}"
        out += [f"{b}/norm1/scale", f"{b}/attn/qkv/w", f"{b}/attn/proj/w",
                f"{b}/norm2/scale", f"{b}/mlp/fc1/w", f"{b}/mlp/fc2/w"]
    return tuple(out)


__all__ = ["relative_position_index", "shift_attn_mask",
           "shift_attn_mask_device", "window_partition",
           "window_reverse", "window_attention_init", "swin_block_init",
           "rstb_init", "window_attention", "swin_block", "rstb",
           "rstb_leaf_paths"]
