"""Wide (lane-interleaved) rANS: entropy DECODE on the TPU itself.

The checkerboard codec's decode wall-clock is dominated by host<->device
round trips: every slice pass fetches entropy parameters, rANS-decodes
on the host, and pushes reconstructions back (coding/codec.py
tinylic_decompress — 4 fetches x 5 slices plus per-pass dispatches;
artifacts/codec_breakdown.json quantifies it). This module removes the
host from the loop: symbols decode as a `lax.scan` of pure vector ops,
so the ENTIRE decompress — z decode, hyper, 5x2 conditional passes,
synthesis — can compile into ONE jitted program with one dispatch and
one fetch.

Format (decoder-centric, Giesen-style interleaved rANS):

* L lanes (default 512), each a 32-bit rANS state, lower bound 2^16,
  16-bit renormalization halfwords, probability precision P = 12 bits.
* ONE uint16 stream consumed strictly forward: the encoder walks the
  symbols in REVERSE global order (lane = position % L) and writes its
  renorm emissions in reverse, which lands each halfword exactly where
  the decoder consumes it (encode/decode renorms are mirror images —
  at most one halfword per symbol with P <= 16).
* The final encoder states (L x uint32) ship in the header; the decoder
  starts from them and, per step, all L lanes decode one symbol:
      slot   = x & (2^P - 1)
      sym    = lut_sym[idx, slot]            (one gather)
      f, st  = unpack(lut_fs[idx, slot])     (one gather)
      x      = f * (x >> P) + slot - st
      renorm = x < 2^16 -> consume one u16 (vector prefix-sum compaction:
               lanes that renorm read consecutive stream positions)
* Out-of-range values (beyond a row's coded bins — tail mass ~1e-9)
  are coded as the row's extreme bin plus an exception-list entry
  (position, true value) carried beside the stream and scattered in by
  the same jitted program; symbol streams stay fixed-consumption.

Role parity: replaces `compressai.ans.RansDecoder` (reference
tinylic.py:330-362) for the device-decode path; the host codec
(coding/rans.py, C++) remains the default and the interop format.
The per-row CDF tables reuse coding/cdf.py builders at precision=12.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .cdf import CdfTable

P = 12                 # probability precision (bits)
LANES = 512            # default decode vector width
_LOW = 1 << 16         # state lower bound
_MASK = (1 << P) - 1


def wide_lanes() -> int:
    """Encoder-side lane count: ``RDOPTQ_WIDE_LANES`` (default 512).

    More lanes = proportionally fewer serial scan steps on decode (the
    2K bottleneck) at a rate cost of 4 B of shipped final state per
    lane (+ ~lanes/2 pad symbols per section, near-zero rate). The
    DECODER always follows the blob header's lane count, so this knob
    only affects newly encoded streams."""
    import os
    v = int(os.environ.get("RDOPTQ_WIDE_LANES", str(LANES)))
    if v < 1 or v > 65535:  # header field is u16
        raise ValueError(f"RDOPTQ_WIDE_LANES={v} out of range [1, 65535]")
    return v


def wide_unroll() -> int:
    """Scan unroll factor for the device decoder: ``RDOPTQ_WIDE_UNROLL``
    (default 8 — the measured knee at 2K, artifacts/
    wide_decode_profile.json). Callers that jit-cache programs must read
    this ONCE at dispatch time and pass it explicitly so it participates
    in their cache key (wide_codec._wide_program does)."""
    import os
    v = int(os.environ.get("RDOPTQ_WIDE_UNROLL", "8"))
    if v < 1:
        raise ValueError(f"RDOPTQ_WIDE_UNROLL={v} must be >= 1")
    return v


@dataclasses.dataclass
class WideTables:
    """Dense decode LUTs for one CdfTable quantized at precision P.

    ``lut_sym[row, slot]`` -> symbol; ``lut_fs[row, slot]`` -> packed
    ``freq << 12 | start`` (both < 2^12). ``cdf/lengths/offsets`` keep
    the row CDFs for the encoder side.
    """

    lut_sym: np.ndarray   # (rows, 2^P) int32
    lut_fs: np.ndarray    # (rows, 2^P) int32
    cdf: np.ndarray       # (rows, max_len) int32, precision P
    cdf_lengths: np.ndarray
    offsets: np.ndarray


def build_wide_tables(table: CdfTable) -> WideTables:
    """Expand a (precision-12) CdfTable into dense per-slot LUTs."""
    rows, _ = table.cdf.shape
    lut_sym = np.zeros((rows, 1 << P), np.int32)
    lut_fs = np.zeros((rows, 1 << P), np.int32)
    for r in range(rows):
        n = int(table.cdf_lengths[r])  # bins = n - 1 (incl tail)
        cdf = table.cdf[r, :n]
        assert cdf[-1] == (1 << P), (r, cdf[-1])
        for s in range(n - 1):
            lo, hi = int(cdf[s]), int(cdf[s + 1])
            lut_sym[r, lo:hi] = s
            lut_fs[r, lo:hi] = ((hi - lo) << P) | lo
    return WideTables(lut_sym=lut_sym, lut_fs=lut_fs,
                      cdf=np.asarray(table.cdf, np.int64),
                      cdf_lengths=np.asarray(table.cdf_lengths),
                      offsets=np.asarray(table.offsets))


def _pad_len(n: int, lanes: int = LANES) -> int:
    return -(-max(n, 1) // lanes) * lanes


def _pad_symbol(wt: WideTables) -> int:
    """Most probable bin of row 0 — what lane-alignment padding encodes
    (near-zero rate; the decoder pads its idx rows with 0 identically
    and discards the decoded values)."""
    n = int(wt.cdf_lengths[0])
    return int(np.argmax(np.diff(wt.cdf[0, :n - 1])))


def _to_symbols(values, indexes, wt: WideTables):
    """values -> row-relative symbols with out-of-range exceptions
    mapped to the row's tail bin."""
    sym = values - wt.offsets[indexes]
    nbins = wt.cdf_lengths[indexes] - 2  # in-range symbols: [0, nbins-1]
    exc = (sym < 0) | (sym > nbins - 1)
    exc_pos = np.nonzero(exc)[0].astype(np.int64)
    exc_val = values[exc_pos].astype(np.int64)
    return np.where(exc, nbins, sym), exc_pos, exc_val


def encode_wide(values: np.ndarray, indexes: np.ndarray, wt: WideTables,
                lanes: int = LANES):
    """Encode integer ``values`` (row-absolute, i.e. symbol = value -
    offsets[idx]) against per-symbol CDF rows ``indexes``.

    Returns ``(stream_u16, final_states_u32, exc_pos, exc_val, n)``.
    ``values``/``indexes`` are FORWARD order; padding to a lane multiple
    (most-probable symbol of row 0) is internal. Out-of-range symbols
    code the row's extreme coded bin and land in the exception arrays.
    """
    n = np.asarray(values).size
    stream, states, excs = encode_wide_sections(
        [(values, indexes, wt)], lanes)
    return stream, states, excs[0][0], excs[0][1], n


def encode_wide_sections(sections, lanes: int = LANES):
    """Encode consecutive sections — ``[(values, indexes, WideTables),
    ...]`` — into ONE stream the device decodes with chained
    :func:`decode_wide` calls (states/ptr threaded through).

    Each section pads to a lane multiple independently (the decoder
    pads its idx the same way), so section boundaries stay
    lane-aligned no matter the section sizes; sections may use
    different tables (e.g. factorized z then Gaussian y).

    Returns ``(stream_u16, states_u32, [(exc_pos, exc_val)] per
    section)``.
    """
    syms, idxs, freq_parts, start_parts, excs = [], [], [], [], []
    for values, indexes, wt in sections:
        values = np.asarray(values, np.int64).ravel()
        indexes = np.asarray(indexes, np.int64).ravel()
        n = values.size
        total = _pad_len(n, lanes)
        sym, exc_pos, exc_val = _to_symbols(values, indexes, wt)
        excs.append((exc_pos, exc_val))
        if total != n:
            sym = np.concatenate(
                [sym, np.full(total - n, _pad_symbol(wt), np.int64)])
            indexes = np.concatenate(
                [indexes, np.zeros(total - n, np.int64)])
        starts = wt.cdf[indexes, sym].astype(np.uint64)
        freq_parts.append(
            wt.cdf[indexes, sym + 1].astype(np.uint64) - starts)
        start_parts.append(starts)
    freqs = np.concatenate(freq_parts)
    starts = np.concatenate(start_parts)

    # lane-vectorized reverse walk: one step encodes all lanes' symbols
    # at that step; the decoder consumes same-step renorm halfwords in
    # ASCENDING lane order, so the (reversed-at-the-end) encoder emits
    # them in DESCENDING lane order. One 16-bit emission max per symbol
    # (see module doc).
    states = np.full(lanes, _LOW, np.uint64)
    chunks: List[np.ndarray] = []
    f2 = freqs.reshape(-1, lanes)
    s2 = starts.reshape(-1, lanes)
    for t in range(f2.shape[0] - 1, -1, -1):
        f, st = f2[t], s2[t]
        emit = states >= (f << 20)
        if emit.any():
            chunks.append((states[emit] & 0xFFFF)[::-1].astype(np.uint16))
            states = np.where(emit, states >> 16, states)
        states = ((states // f) << P) | ((states % f) + st)
    stream = (np.concatenate(chunks)[::-1] if chunks
              else np.zeros(0, np.uint16))
    return stream, states.astype(np.uint32), excs


def decode_wide_np(stream: np.ndarray, states: np.ndarray,
                   indexes: np.ndarray, wt: WideTables,
                   lanes: int = LANES) -> np.ndarray:
    """NumPy reference decoder (kept for tests / format documentation).
    Returns row-absolute values, FORWARD order, unpadded. Exceptions are
    NOT applied here (callers scatter them)."""
    indexes = np.asarray(indexes, np.int64).ravel()
    n = indexes.size
    total = _pad_len(n, lanes)
    idx = np.concatenate([indexes, np.zeros(total - n, np.int64)])
    x = states.astype(np.uint64).copy()
    ptr = 0
    out = np.zeros(total, np.int64)
    for t in range(total // lanes):
        rows = idx[t * lanes:(t + 1) * lanes]
        slot = x & np.uint64(_MASK)
        sym = wt.lut_sym[rows, slot]
        fs = wt.lut_fs[rows, slot]
        # stay in uint64 throughout: mixing uint64 with int64 silently
        # promotes to float64 in numpy
        f = (fs >> P).astype(np.uint64)
        st = (fs & _MASK).astype(np.uint64)
        x = f * (x >> np.uint64(P)) + slot - st
        renorm = x < _LOW
        k = int(renorm.sum())
        if k:
            feed = stream[ptr:ptr + k].astype(np.uint64)
            x[renorm] = (x[renorm] << np.uint64(16)) | feed
            ptr += k
        out[t * lanes:(t + 1) * lanes] = sym + wt.offsets[rows]
    return out[:n]


# ---------------------------------------------------------------------------
# Device decoder (pure jnp; runs inside any jitted program)
# ---------------------------------------------------------------------------


def device_arrays(wt: WideTables):
    """The device-resident constants: flattened LUTs + per-row offsets."""
    return {
        "lut_sym": jnp.asarray(wt.lut_sym.reshape(-1), jnp.int32),
        "lut_fs": jnp.asarray(wt.lut_fs.reshape(-1), jnp.int32),
        "offsets": jnp.asarray(wt.offsets, jnp.int32),
    }


def decode_wide(stream: jax.Array, ptr0, states: jax.Array,
                indexes: jax.Array, dev: dict,
                lanes: int = LANES, unroll: Optional[int] = None):
    """Decode ``indexes.size`` symbols (padded internally to a lane
    multiple) starting from rANS ``states`` and stream halfword offset
    ``ptr0``. Everything is traced jnp: call inside jit.

    ``stream``: (S,) uint16 (pad >= lanes beyond the live data);
    ``states``: (lanes,) uint32; ``indexes``: any shape, int32.
    Returns ``(values int32 of indexes.shape, new_states, new_ptr)`` —
    thread states/ptr through consecutive decode sections (slices,
    passes) exactly as the encoder chained them.

    ``unroll`` replicates the scan body per loop iteration: at 2K a
    TinyLIC decode is ~6700 serial 512-lane steps whose wall-clock is
    fixed per-iteration overhead, not vector math — unrolling amortizes
    it without touching the stream format (lane count and rate are
    unchanged, unlike raising LANES, which ships 4 B of final state per
    lane). Default from ``RDOPTQ_WIDE_UNROLL`` (8) for A/B timing."""
    if unroll is None:
        unroll = wide_unroll()
    shape = indexes.shape
    idx = indexes.reshape(-1).astype(jnp.int32)
    n = idx.size
    total = _pad_len(n, lanes)
    if total != n:
        idx = jnp.concatenate([idx, jnp.zeros(total - n, jnp.int32)])
    idx_rows = idx.reshape(total // lanes, lanes)

    def step(carry, rows):
        x, ptr = carry
        slot = (x & _MASK).astype(jnp.int32)
        # only f/st feed the serial state update: the symbol lookup
        # (lut_sym) does NOT enter the carry, so the scan emits raw
        # slots and the sym gather runs ONCE post-scan over all
        # symbols — 1/3 fewer in-loop gathers on the critical path
        fs = jnp.take(dev["lut_fs"], rows * (1 << P) + slot)
        f = (fs >> P).astype(jnp.uint32)
        st = (fs & _MASK).astype(jnp.uint32)
        x = f * (x >> P) + slot.astype(jnp.uint32) - st
        renorm = x < _LOW
        # lanes that renorm consume consecutive halfwords from ptr
        offs = jnp.cumsum(renorm.astype(jnp.int32)) - 1
        feed = jax.lax.dynamic_slice(stream, (ptr,), (lanes,))
        fed = jnp.take(feed, jnp.maximum(offs, 0)).astype(jnp.uint32)
        x = jnp.where(renorm, (x << 16) | fed, x)
        ptr = ptr + offs[-1] + 1
        return (x, ptr), slot

    (states, ptr), slots = jax.lax.scan(step, (states, ptr0), idx_rows,
                                        unroll=unroll)
    # one batched gather for every symbol at once (fully parallel)
    flat = idx * (1 << P) + slots.reshape(-1)
    out = jnp.take(dev["lut_sym"], flat) + jnp.take(dev["offsets"], idx)
    return out[:n].reshape(shape), states, ptr


def apply_exceptions(values: jax.Array, exc_pos: jax.Array,
                     exc_val: jax.Array, exc_n) -> jax.Array:
    """Scatter the (padded, fixed-size) exception list into the decoded
    flat values: entries beyond ``exc_n`` are inert."""
    flat = values.reshape(-1)
    k = exc_pos.shape[0]
    live = jnp.arange(k) < exc_n
    # dead entries scatter out of bounds and are dropped (aliasing them
    # to position 0 would clobber a real exception there)
    pos = jnp.where(live, exc_pos, flat.size)
    return flat.at[pos].set(exc_val, mode="drop").reshape(values.shape)


__all__ = ["WideTables", "build_wide_tables", "encode_wide",
           "encode_wide_sections", "decode_wide_np", "decode_wide",
           "apply_exceptions", "device_arrays", "P", "LANES",
           "wide_lanes", "wide_unroll"]
