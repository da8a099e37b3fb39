"""Tiled coding: arbitrary-size images at constant memory and one compile.

Neither the reference nor any of its notebooks can code an image larger
than device memory allows in one shot, and every new input size pays a
fresh XLA compile (on the remote-compile TPU tunnel, minutes). Tiling
fixes both TPU-natively:

* the image is split into fixed ``tile x tile`` patches, so EVERY image
  — any resolution — runs the SAME compiled programs (one compile, ever);
* the patches ride the BATCH axis: for TinyLIC's checkerboard codec the
  whole grid encodes with one host synchronization and decodes with the
  same 2-device-passes-per-slice as a single image (the batch dimension
  is free MXU parallelism, not a host loop);
* peak activation memory is bounded by ``batch_tiles`` regardless of
  image size (8K+ inputs stream through in tile groups).

Autoregressive (wavefront) models batch the same way (`coding/ar.py`
`ar_compress_batched`/`ar_decompress_batched`): a whole tile group
decodes in the 3(h-1)+w host round trips of a SINGLE tile — the
per-wave device dispatch is vmapped over the group. Rate overhead vs
whole-image coding comes from lost cross-tile context (~seams); the
eval harness quantifies it per model.

Bitstream layout: one z + one y stream per tile GROUP (a group = up to
``batch_tiles`` tiles coded as one batch), tile-row-major.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from . import ar, codec


def tile_grid(h: int, w: int, tile: int) -> Tuple[int, int]:
    return -(-h // tile), -(-w // tile)


def tile_image(img: np.ndarray, tile: int) -> np.ndarray:
    """(1, h, w, 3) -> (th*tw, tile, tile, 3), corner-anchored zero pad,
    row-major tile order."""
    _, h, w, c = img.shape
    th, tw = tile_grid(h, w, tile)
    pad = np.zeros((1, th * tile, tw * tile, c), img.dtype)
    pad[:, :h, :w, :] = img
    t = pad.reshape(1, th, tile, tw, tile, c)
    return t.transpose(0, 1, 3, 2, 4, 5).reshape(th * tw, tile, tile, c)


def untile_image(tiles: np.ndarray, th: int, tw: int, h: int,
                 w: int) -> np.ndarray:
    """(th*tw, tile, tile, 3) -> (1, h, w, 3) cropped."""
    b, tile, _, c = tiles.shape
    assert b == th * tw, (b, th, tw)
    t = tiles.reshape(1, th, tw, tile, tile, c)
    full = t.transpose(0, 1, 3, 2, 4, 5).reshape(1, th * tile, tw * tile, c)
    return full[:, :h, :w, :]


def _n_groups(n: int, batch_tiles: int) -> int:
    return len(_group_sizes(n, batch_tiles))


def _group_sizes(n: int, batch_tiles: int) -> List[int]:
    """Coded-batch size per tile group. Full groups run at
    ``batch_tiles``; the remainder runs at the smallest of (at most) 3
    pre-sized buckets — batch_tiles, ceil(bt/2), ceil(bt/4) — that fits
    it, so the dummy-tile overhead (zero tiles are fully entropy-coded,
    then dropped by the decoder) is bounded by the bucket rounding
    instead of up to batch_tiles-1 whole coded latents, while the
    compile-bucket count stays <= 3 per (tile, batch_tiles) config
    (fresh tile counts would otherwise each pay a multi-minute remote
    compile)."""
    buckets = sorted({batch_tiles, -(-batch_tiles // 2),
                      -(-batch_tiles // 4)})
    full, rem = divmod(n, batch_tiles)
    sizes = [batch_tiles] * full
    if rem:
        sizes.append(next(b for b in buckets if b >= rem))
    return sizes


def _pad_tiles(tiles: np.ndarray, batch_tiles: int) -> np.ndarray:
    """Pad the tile count with zero tiles to the summed group-bucket
    sizes (see :func:`_group_sizes`); the decoder drops the dummies."""
    n = tiles.shape[0]
    total = sum(_group_sizes(n, batch_tiles))
    if total == n:
        return tiles
    pad = np.zeros((total - n,) + tiles.shape[1:], tiles.dtype)
    return np.concatenate([tiles, pad])


def tiled_compress(model, params, img: np.ndarray,
                   tables: codec.CodecTables, arch: str, tile: int = 512,
                   batch_tiles: int = 16, wide_tables=None) -> Dict:
    """Compress an arbitrary-size image as a grid of fixed-size tiles.

    Returns {"strings", "tile", "grid", "zy_shape"}; ``strings`` holds
    2 streams per tile group for TinyLIC (y, z) and per AR tile
    (y, z). ``tile`` must be a multiple of the arch's pad unit (64).

    ``wide_tables`` (a wide_codec.WideCodecTables) switches the
    per-group coder to the device-decode wide codec: ONE blob per tile
    group, and the whole group later decodes in a single dispatch +
    fetch (coding/wide_codec.py for TinyLIC, coding/wide_ar.py for the
    wavefront AR models)."""
    if tile % 64:
        raise ValueError(f"tile={tile} must be a multiple of 64")
    _, h, w, _ = img.shape
    th, tw = tile_grid(h, w, tile)
    tiles = tile_image(np.asarray(img), tile)
    strings: List[bytes] = []
    zy_shape = None
    tiles_p = _pad_tiles(tiles, batch_tiles)
    lo = 0
    for size in _group_sizes(th * tw, batch_tiles):
        grp = jnp.asarray(tiles_p[lo:lo + size])
        lo += size
        if wide_tables is not None:
            if arch == "TinyLIC":
                from . import wide_codec
                out = wide_codec.wide_compress(model, params, grp,
                                               wide_tables)
                zy_shape = out["shape"]
            else:
                from . import wide_ar
                out = wide_ar.wide_ar_compress(model, params, grp,
                                               wide_tables)
                zy_shape = out["shape"] + out["y_shape"]
        elif arch == "TinyLIC":
            out = codec.tinylic_compress(model, params, grp, tables)
            zy_shape = out["shape"]
        else:
            # batched wavefront: the whole group encodes with one host
            # synchronization (and decodes in 3(h-1)+w round trips total)
            out = ar.ar_compress_batched(model, params, grp, tables)
            zy_shape = out["shape"] + out["y_shape"]
        strings += out["strings"]
    return {"strings": strings, "tile": tile, "grid": (th, tw),
            "zy_shape": zy_shape}


def tiled_decompress(model, params, strings: Sequence[bytes],
                     tile: int, grid: Tuple[int, int],
                     zy_shape: Sequence[int], size: Tuple[int, int],
                     tables: codec.CodecTables, arch: str,
                     batch_tiles: int = 16,
                     wide_tables=None) -> np.ndarray:
    """Inverse of :func:`tiled_compress` -> (1, h, w, 3) in [0, 1]."""
    th, tw = grid
    h, w = size
    n = th * tw
    tiles = np.zeros((n, tile, tile, 3), np.float32)
    sizes = _group_sizes(n, batch_tiles)
    per_group = 1 if wide_tables is not None else 2
    assert len(strings) == per_group * len(sizes), (len(strings),
                                                    len(sizes))
    lo = 0
    for g, gsize in enumerate(sizes):
        grp_strings = list(strings[per_group * g:per_group * (g + 1)])
        # every group decodes at its encode-time bucket size (dummy pad
        # tiles included) — same program bucket as encode
        if wide_tables is not None:
            if arch == "TinyLIC":
                from . import wide_codec
                x_hat = wide_codec.wide_decompress(
                    model, params, grp_strings, tuple(zy_shape[:2]),
                    wide_tables, batch=gsize)
            else:
                from . import wide_ar
                x_hat = wide_ar.wide_ar_decompress(
                    model, params, grp_strings, tuple(zy_shape[:2]),
                    tuple(zy_shape[2:]), wide_tables, batch=gsize)
        elif arch == "TinyLIC":
            x_hat = codec.tinylic_decompress(
                model, params, grp_strings, tuple(zy_shape[:2]), tables,
                batch=gsize)
        else:
            x_hat = ar.ar_decompress_batched(
                model, params, grp_strings, tuple(zy_shape[:2]),
                tuple(zy_shape[2:]), tables, batch=gsize)
        hi = min(lo + gsize, n)
        tiles[lo:hi] = np.asarray(x_hat)[:hi - lo]
        lo += gsize
    return untile_image(np.clip(tiles, 0.0, 1.0), th, tw, h, w)


__all__ = ["tile_grid", "tile_image", "untile_image", "tiled_compress",
           "tiled_decompress"]
