"""Single-dispatch TinyLIC codec: entropy decode runs ON DEVICE.

`codec.tinylic_decompress` pays 4 host fetches per slice plus per-pass
dispatch latency — the measured decode wall-clock floor over a remote
device link (artifacts/codec_breakdown.json). Here the WHOLE decompress
— z decode, hyper synthesis, 5x2 checkerboard passes with in-program
wide-rANS (coding/wide_rans.py), and g_s — compiles into one jitted
program: one dispatch, one fetch.

Bit-agreement by construction: the reference keeps conditional
bitstreams decodable by running the SAME compiled pass programs on both
sides (coding/codec._codec_fns). This module strengthens that to a
single DUAL-MODE executable: a traced ``is_encode`` flag switches each
section between "symbols = round(y_true - means)" (encode) and
"symbols = wide-rANS decode" (decode); every entropy-parameter op is
the same code in the same executable, so scales/means/indexes match
bitwise between the two sides no matter how XLA fuses them. The stream
buffer is padded to a shape-derived bucket (one halfword per symbol is
the format's hard maximum) so both modes share one compilation.

Blob layout (little endian), parsed by :func:`unpack_blob`:
    u32 stream_len (u16 units) | u16 lanes | u16 exc capacity K
    lanes x u32 final rANS states
    per section (1 + 2*slices): u16 count + count x (u32 pos, i32 val)
    stream_len x u16 stream

Role parity: single-image/tile-batch compress/decompress of the
reference's TinyLIC (tinylic.py:236-366) with the host entropy loop
eliminated; the host codec (coding/codec.py) remains the default path
and the cross-implementation interop format.
"""

from __future__ import annotations

import dataclasses
import functools
import struct
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.tinylic import checkerboard_anchor_mask
from ..ops import entropy as E
from . import cdf as cdf_mod
from . import codec as host_codec
from . import wide_rans as W

EXC_K = 64  # minimum per-section exception capacity


def exc_capacity(total_syms: int) -> int:
    """Shape-derived per-section exception capacity: scales with the
    coded symbol count (so large/batched inputs don't overflow the
    fixed list) while staying a pure function of the (shape, batch)
    bucket — encode and decode therefore still share ONE executable,
    which is what guarantees bitwise-matching entropy parameters.

    total/16 is generous (trained models see ~1e-9 exception rates;
    even random-init latents stay under it) yet costs only
    n_sections*k*8 bytes of inert scatter input. Clamped to the blob
    format's u16 per-section count."""
    return int(min(65535, max(EXC_K, -(-total_syms // 16 // 64) * 64)))


@dataclasses.dataclass
class WideCodecTables:
    """Precision-12 decode tables for one model (device-decode analogue
    of codec.CodecTables)."""

    factorized: W.WideTables
    gaussian: W.WideTables
    medians: np.ndarray
    _dev: Optional[Dict[str, jax.Array]] = dataclasses.field(
        default=None, repr=False, compare=False)

    def device(self) -> Dict[str, jax.Array]:
        """Device-resident LUTs, built ONCE per table set: the dense
        precision-12 LUTs are ~8 MB — re-uploading them per codec call
        would cost a quarter second of tunnel transfer on every
        encode/decode (it used to: the round-4 decode wall's largest
        non-compute slice)."""
        if self._dev is None:
            f = W.device_arrays(self.factorized)
            g = W.device_arrays(self.gaussian)
            self._dev = {"f_sym": f["lut_sym"], "f_fs": f["lut_fs"],
                         "f_off": f["offsets"], "g_sym": g["lut_sym"],
                         "g_fs": g["lut_fs"], "g_off": g["offsets"],
                         "medians": jnp.asarray(self.medians,
                                                jnp.float32)}
        return self._dev


def build_wide_codec_tables(eb_params: E.FactorizedParams,
                            fit_quantiles: bool = False) -> WideCodecTables:
    if fit_quantiles:
        eb_params = E.fit_quantiles(eb_params)
    table = np.asarray(E.default_scale_table())
    return WideCodecTables(
        factorized=W.build_wide_tables(
            cdf_mod.build_factorized_tables(eb_params, precision=W.P)),
        gaussian=W.build_wide_tables(
            cdf_mod.build_gaussian_tables(table, precision=W.P)),
        medians=np.asarray(E.factorized_medians(eb_params)))


# ---------------------------------------------------------------------------
# Checkerboard gather/scatter with STATIC strided slices (boolean-mask
# indexing would be a dynamic shape under jit). Anchors are (i+j) odd
# (models/tinylic.checkerboard_anchor_mask): even rows keep odd columns,
# odd rows keep even columns — row-major order matches the host codec's
# ``arr[anchor_mask]`` flattening exactly.
# ---------------------------------------------------------------------------


def gather_cb(y: jax.Array, anchor: bool) -> jax.Array:
    """(B, H, W, C) -> (B, H, W/2, C) checkerboard positions, row-major."""
    b, h, w, c = y.shape
    if anchor:
        ev, od = y[:, 0::2, 1::2], y[:, 1::2, 0::2]
    else:
        ev, od = y[:, 0::2, 0::2], y[:, 1::2, 1::2]
    return jnp.stack([ev, od], axis=2).reshape(b, h, w // 2, c)


def scatter_cb(vals: jax.Array, base: jax.Array, anchor: bool) -> jax.Array:
    """Inverse of :func:`gather_cb` into ``base`` (other positions kept)."""
    b, h, w, c = base.shape
    v = vals.reshape(b, h // 2, 2, w // 2, c)
    if anchor:
        base = base.at[:, 0::2, 1::2].set(v[:, :, 0])
        base = base.at[:, 1::2, 0::2].set(v[:, :, 1])
    else:
        base = base.at[:, 0::2, 0::2].set(v[:, :, 0])
        base = base.at[:, 1::2, 1::2].set(v[:, :, 1])
    return base


# ---------------------------------------------------------------------------
# The dual-mode program
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _wide_program(model, zh: int, zw: int, batch: int,
                  lanes: int = W.LANES, unroll: int = 8):
    """One jitted executable serving BOTH encode (derive symbols from
    true latents) and decode (wide-rANS the stream). All shared math —
    h_s, slice_cc/sc/ep, build_indexes, means adds — executes
    identically in either mode. ``unroll`` (the decode scan's unroll
    factor) is an explicit cache-key parameter: callers read the
    RDOPTQ_WIDE_UNROLL env once per dispatch (W.wide_unroll), so a
    changed env var reaches a NEW program instead of being silently
    ignored by the lru cache."""
    table = E.default_scale_table()
    h, w = zh * 4, zw * 4
    n_z = batch * zh * zw  # per-channel spatial positions

    def section(dev, kind, stream, states, ptr, idx, enc_vals, exc, e,
                is_encode):
        """One coded section: -> (values i32, states, ptr). ``idx`` and
        ``enc_vals`` share the section's layout."""
        sym_t, fs_t, off_t = (dev[f"{kind}_sym"], dev[f"{kind}_fs"],
                              dev[f"{kind}_off"])

        def dec(_):
            vals, st, p = W.decode_wide(
                stream, ptr, states, idx,
                {"lut_sym": sym_t, "lut_fs": fs_t, "offsets": off_t},
                lanes=lanes, unroll=unroll)
            vals = W.apply_exceptions(vals, exc[0][e], exc[1][e],
                                      exc[2][e])
            return vals, st, p

        def enc(_):
            return enc_vals, states, ptr

        return jax.lax.cond(is_encode, enc, dec, None)

    clip = host_codec._SYM_CLIP

    def run(params, dev, stream, states0, exc_pos, exc_val, exc_n,
            z_sym_in, y_true, is_encode):
        pd = host_codec._float_dtype(params)
        exc = (exc_pos, exc_val, exc_n)
        c_z = dev["medians"].shape[0]
        z_idx = jnp.broadcast_to(jnp.arange(c_z, dtype=jnp.int32),
                                 (n_z, c_z)).reshape(-1)
        states, ptr = states0, jnp.int32(0)

        z_vals, states, ptr = section(
            dev, "f", stream, states, ptr, z_idx,
            z_sym_in.reshape(-1), exc, 0, is_encode)
        z_hat = (z_vals.reshape(batch, zh, zw, c_z).astype(jnp.float32)
                 + dev["medians"].reshape(1, 1, 1, c_z))
        hyper = model.h_s.run(params, z_hat.astype(pd))

        splits = [sum(model.slices[:i + 1])
                  for i in range(len(model.slices) - 1)]
        y_slices = jnp.split(y_true, splits, axis=-1)
        anchor = checkerboard_anchor_mask(h, w)

        syms: List[jax.Array] = []
        idxs: List[jax.Array] = []
        y_hat_slices = []
        for i, out_ch in enumerate(model.slices):
            support = jnp.concatenate([hyper] + y_hat_slices, axis=-1)
            cc_params = model.slice_cc(params, support.astype(pd), i)
            scales1, means1 = model.slice_ep(
                params, hyper, jnp.zeros_like(cc_params), cc_params, i)
            means1 = means1.astype(jnp.float32)
            idx1 = E.build_indexes(table, scales1).astype(jnp.int32)
            idx1_g = gather_cb(idx1, True)
            m1_g = gather_cb(means1, True)
            # symbols are clipped to the int16 transport range on BOTH
            # the coded values and the reconstruction (mirrors the host
            # codec's _SYM_CLIP), keeping enc/dec y_hat bit-identical
            # even for pathological latents (decode recovers the same
            # clipped value via the exception list)
            true1 = jnp.clip(
                jnp.round(gather_cb(y_slices[i], True).astype(jnp.float32)
                          - m1_g), -clip, clip).astype(jnp.int32)
            v1, states, ptr = section(dev, "g", stream, states, ptr,
                                      idx1_g, true1, exc, 1 + 2 * i,
                                      is_encode)
            y_anchor = scatter_cb(v1.astype(jnp.float32) + m1_g,
                                  jnp.zeros((batch, h, w, out_ch)), True)

            sc_params = model.slice_sc(
                params, (y_anchor * anchor).astype(pd), i)
            sc_params = sc_params * (1.0 - anchor).astype(pd)
            scales2, means2 = model.slice_ep(params, hyper, sc_params,
                                             cc_params, i)
            means2 = means2.astype(jnp.float32)
            idx2 = E.build_indexes(table, scales2).astype(jnp.int32)
            idx2_g = gather_cb(idx2, False)
            m2_g = gather_cb(means2, False)
            true2 = jnp.clip(
                jnp.round(gather_cb(y_slices[i], False).astype(jnp.float32)
                          - m2_g), -clip, clip).astype(jnp.int32)
            v2, states, ptr = section(dev, "g", stream, states, ptr,
                                      idx2_g, true2, exc, 2 + 2 * i,
                                      is_encode)
            y_full = scatter_cb(v2.astype(jnp.float32) + m2_g,
                                y_anchor, False)
            y_hat_slices.append(y_full)
            # int16 symbols / uint8 CDF indexes on the fetch path: the
            # encode-side fetch drops from ~28 MB int32 to ~10 MB at 2K
            syms += [v1.astype(jnp.int16), v2.astype(jnp.int16)]
            idxs += [idx1_g.astype(jnp.uint8), idx2_g.astype(jnp.uint8)]

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        # synthesis is dead weight on the encode side: skip it there
        x_hat = jax.lax.cond(
            is_encode, lambda _: jnp.zeros((batch, h * 16, w * 16, 3)),
            lambda _: model.g_s.run(params, y_hat.astype(pd)
                                    ).astype(jnp.float32), None)
        x_u8 = jnp.clip(jnp.round(x_hat * 255.0), 0.0, 255.0
                        ).astype(jnp.uint8)
        return {"x_hat": x_hat, "x_u8": x_u8, "syms": syms, "idxs": idxs,
                "z_vals": z_vals.astype(jnp.int16)}

    return jax.jit(run)


def _total_symbols(model, c_z: int, zh: int, zw: int, batch: int,
                   lanes: int = W.LANES) -> int:
    """Fixed stream-buffer bucket (u16 units) for one (shape, batch,
    lanes): the format emits at most one halfword per coded symbol
    (incl. lane padding), so the padded symbol count bounds the stream
    — encode and decode share one compiled program per bucket."""
    n = W._pad_len(batch * zh * zw * c_z, lanes)
    half = batch * (zh * 4) * (zw * 4) // 2
    for ch in model.slices:
        n += 2 * W._pad_len(half * ch, lanes)
    return n


def pack_blob(stream: np.ndarray, states: np.ndarray,
              excs: List[Tuple[np.ndarray, np.ndarray]],
              exc_k: int = EXC_K) -> bytes:
    out = [struct.pack("<IHH", stream.size, states.size, exc_k)]
    out.append(states.astype("<u4").tobytes())
    for pos, val in excs:
        if pos.size > exc_k:
            raise ValueError(
                f"section carries {pos.size} out-of-range symbols "
                f"(capacity {exc_k}) — use the host codec for this input")
        out.append(struct.pack("<H", pos.size))
        out.append(np.stack([pos.astype("<u4"),
                             val.astype("<u4")], 1).tobytes()
                   if pos.size else b"")
    out.append(stream.astype("<u2").tobytes())
    return b"".join(out)


def unpack_blob(blob: bytes, n_sections: int):
    if len(blob) < 8:
        raise ValueError(f"wide blob truncated: {len(blob)} < 8 header "
                         "bytes")
    stream_len, lanes, k = struct.unpack("<IHH", blob[:8])
    # a corrupt header is cheap to reject here and expensive downstream:
    # lanes=0 divides by zero in _pad_len, and an oversized lane count
    # allocates buffers and pays a multi-minute remote compile before
    # any decode error surfaces
    if lanes < 1:
        raise ValueError("wide blob header carries lanes=0 — truncated "
                         "or corrupt stream")
    if len(blob) < 8 + 4 * lanes:
        raise ValueError(
            f"wide blob truncated: header promises {lanes} lane states "
            f"({4 * lanes} bytes) but only {len(blob) - 8} bytes follow")
    off = 8
    states = np.frombuffer(blob[off:off + 4 * lanes], "<u4")
    off += 4 * lanes
    exc_pos = np.zeros((n_sections, k), np.int32)
    exc_val = np.zeros((n_sections, k), np.int32)
    exc_n = np.zeros(n_sections, np.int32)
    for s in range(n_sections):
        (cnt,) = struct.unpack("<H", blob[off:off + 2])
        off += 2
        if cnt:
            pv = np.frombuffer(blob[off:off + 8 * cnt],
                               "<u4").reshape(cnt, 2)
            exc_pos[s, :cnt] = pv[:, 0]
            exc_val[s, :cnt] = pv[:, 1].astype(np.int32)
            off += 8 * cnt
        exc_n[s] = cnt
    if len(blob) < off + 2 * stream_len:
        raise ValueError(
            f"wide blob truncated: header promises {stream_len} stream "
            f"halfwords but only {(len(blob) - off) // 2} present")
    stream = np.frombuffer(blob[off:off + 2 * stream_len], "<u2")
    return stream, states, exc_pos, exc_val, exc_n


def _padded_stream(stream: np.ndarray, bucket: int,
                   lanes: int = W.LANES) -> np.ndarray:
    out = np.zeros(bucket + lanes, np.uint16)
    out[:stream.size] = stream
    return out


def _ceil_mult(n: int, m: int) -> int:
    return -(-max(n, 1) // m) * m


@functools.lru_cache(maxsize=64)
def _inflate_program(bucket: int, lanes: int, small: int,
                     n_sections: int, exc_k: int, exc_small: int):
    """Zero-pad compact host uploads to the dual-mode program's static
    input shapes ON DEVICE. The stream bucket is worst-case (one
    halfword per coded symbol: ~9.5 MB at 2K) but the live stream is
    bpp-sized (~0.2 MB), and the exception arrays are worst-case-K but
    almost always empty — uploading the zeros through the tunnel cost
    more than the decode itself. This program is pure integer data
    movement (no float math), so it cannot perturb entropy-parameter
    bit-agreement; the dual-mode executable stays byte-identical."""

    @jax.jit
    def inflate(s_small, pos_small, val_small):
        stream = jnp.zeros(bucket + lanes, jnp.uint16)
        stream = jax.lax.dynamic_update_slice(stream, s_small, (0,))
        pos = jnp.zeros((n_sections, exc_k), jnp.int32)
        pos = jax.lax.dynamic_update_slice(pos, pos_small, (0, 0))
        val = jnp.zeros((n_sections, exc_k), jnp.int32)
        val = jax.lax.dynamic_update_slice(val, val_small, (0, 0))
        return stream, pos, val

    return inflate


# live-stream uploads quantize to 64K-halfword steps: few compiled
# inflate variants, ≤128 KB of upload slack
_STREAM_STEP = 1 << 16


def _inflate_inputs(stream: np.ndarray, exc_pos: np.ndarray,
                    exc_val: np.ndarray, exc_n: np.ndarray, bucket: int,
                    lanes: int, n_sections: int, exc_k: int):
    """Device-resident (stream, exc_pos, exc_val) padded to the main
    program's shapes from compact uploads."""
    small = min(bucket + lanes, _ceil_mult(stream.size, _STREAM_STEP))
    exc_small = min(exc_k, _ceil_mult(int(exc_n.max(initial=0)), 64))
    s_small = np.zeros(small, np.uint16)
    s_small[:stream.size] = stream[:small]
    inflate = _inflate_program(bucket, lanes, small, n_sections, exc_k,
                               exc_small)
    return inflate(jnp.asarray(s_small),
                   jnp.asarray(exc_pos[:, :exc_small]),
                   jnp.asarray(exc_val[:, :exc_small]))


def wide_compress(model, params, x, wct: WideCodecTables,
                  lanes: int = 0, unroll: int = 0) -> Dict:
    """Compress with the dual-mode program: 2 dispatches (analysis +
    program), ONE fetch, one host wide-rANS encode. ``lanes``/``unroll``
    override the RDOPTQ_WIDE_LANES / RDOPTQ_WIDE_UNROLL env knobs
    (0 = read the env); both are read HERE, once, and passed into the
    program cache key."""
    fns = host_codec._codec_fns(model)
    y, z = fns["analysis"](params, jnp.asarray(x))
    med = jnp.asarray(wct.medians, jnp.float32).reshape(1, 1, 1, -1)
    z_sym, _ = fns["z_round"](z, med)
    z_sym = jnp.clip(z_sym, -host_codec._SYM_CLIP, host_codec._SYM_CLIP
                     ).astype(jnp.int32)  # int16 transport safety

    batch = int(x.shape[0])
    zh, zw = int(z.shape[1]), int(z.shape[2])
    c_z = wct.medians.shape[0]
    lanes = lanes or W.wide_lanes()
    unroll = unroll or W.wide_unroll()
    run = _wide_program(model, zh, zw, batch, lanes, unroll)
    bucket = _total_symbols(model, c_z, zh, zw, batch, lanes)
    exc_k = exc_capacity(bucket)
    n_sections = 1 + 2 * len(model.slices)

    out = run(params, wct.device(),
              jnp.zeros(bucket + lanes, jnp.uint16),
              jnp.full((lanes,), 1 << 16, jnp.uint32),
              jnp.zeros((n_sections, exc_k), jnp.int32),
              jnp.zeros((n_sections, exc_k), jnp.int32),
              jnp.zeros(n_sections, jnp.int32),
              z_sym, y, jnp.bool_(True))
    z_vals, syms, idxs = jax.device_get(
        (out["z_vals"], out["syms"], out["idxs"]))

    sections = [(z_vals.astype(np.int32),
                 np.tile(np.arange(c_z, dtype=np.int64),
                         batch * zh * zw), wct.factorized)]
    for v, ix in zip(syms, idxs):
        sections.append((v.astype(np.int32), ix.astype(np.int32),
                         wct.gaussian))
    stream, states, excs = W.encode_wide_sections(sections, lanes)
    return {"strings": [pack_blob(stream, states, excs, exc_k=exc_k)],
            "shape": (zh, zw)}


def _fit_exc(arr: np.ndarray, k: int) -> np.ndarray:
    """Resize a (n_sections, header_k) exception array to the program's
    shape-derived capacity k (live counts are guarded by the caller)."""
    if arr.shape[1] == k:
        return arr
    out = np.zeros((arr.shape[0], k), np.int32)
    m = min(k, arr.shape[1])
    out[:, :m] = arr[:, :m]
    return out


def _decode_dispatch(model, params, strings, shape: Tuple[int, int],
                     wct: WideCodecTables, batch: int, unroll: int):
    """Unpack one blob and DISPATCH its decode program; returns the
    result dict of device arrays WITHOUT fetching (async dispatch —
    device compute and the result transfer can overlap the caller's
    other work, which is what :func:`wide_decompress_many` pipelines)."""
    zh, zw = shape
    c_z = wct.medians.shape[0]
    n_sections = 1 + 2 * len(model.slices)
    stream, states, exc_pos, exc_val, exc_n = unpack_blob(
        strings[0], n_sections)
    lanes = states.size  # the blob header decides, not the env knob
    bucket = _total_symbols(model, c_z, zh, zw, batch, lanes)
    exc_k = exc_capacity(bucket)
    if int(exc_n.max(initial=0)) > exc_k:
        raise ValueError(
            f"blob carries {int(exc_n.max())} exceptions in one section; "
            f"program capacity for this shape bucket is {exc_k}")
    exc_pos = _fit_exc(exc_pos, exc_k)
    exc_val = _fit_exc(exc_val, exc_k)
    run = _wide_program(model, zh, zw, batch, lanes,
                        unroll or W.wide_unroll())
    h, w = zh * 4, zw * 4
    c_y = sum(model.slices)
    # upload only the live stream/exceptions; zero-pad to the program's
    # static buckets on device (_inflate_program)
    stream_d, pos_d, val_d = _inflate_inputs(
        stream, exc_pos, exc_val, exc_n, bucket, lanes, n_sections, exc_k)
    # the zero y_true placeholder must carry the params' compute dtype so
    # decode hits the SAME compiled program as encode (bit-agreement)
    return run(params, wct.device(),
               stream_d,
               jnp.asarray(states.astype(np.uint32)),
               pos_d, val_d,
               jnp.asarray(exc_n),
               jnp.zeros((batch, zh, zw, c_z), jnp.int32),
               jnp.zeros((batch, h, w, c_y),
                         host_codec._float_dtype(params)),
               jnp.bool_(False))


def _fetch_image(res, out: str) -> np.ndarray:
    if out == "u8":
        return np.asarray(res["x_u8"])
    return np.clip(np.asarray(res["x_hat"]), 0.0, 1.0)


def wide_decompress(model, params, strings, shape: Tuple[int, int],
                    wct: WideCodecTables, batch: int = 1,
                    out: str = "f32", unroll: int = 0) -> np.ndarray:
    """ONE dispatch + one fetch: the whole decode graph (wide-rANS
    included) is a single jitted program. ``out="u8"`` fetches the
    device-quantized 8-bit image (4x less transfer than f32).
    ``unroll`` overrides RDOPTQ_WIDE_UNROLL (0 = read the env once
    here; it is part of the program cache key)."""
    return _fetch_image(
        _decode_dispatch(model, params, strings, shape, wct, batch,
                         unroll), out)


def wide_decompress_many(model, params, blob_list, shape: Tuple[int, int],
                         wct: WideCodecTables, out: str = "u8",
                         unroll: int = 0, depth: int = 2) -> List[np.ndarray]:
    """Pipelined decode of many same-bucket images: keep up to ``depth``
    decodes in flight and fetch the oldest, so the serial per-image wall
    (host unpack -> stream upload -> device decode -> image fetch)
    overlaps across images. Over a remote-device link the transfers cost
    as much as the decode itself (artifacts/wide_decode_profile.json:
    0.28 s device vs 0.80 s wall at 2K) — the pipeline hides whichever
    side is cheaper. All blobs must share one (shape, lanes) bucket:
    one compiled program, reused.

    Serving-throughput analogue of the reference's per-image decompress
    loop (light-uniform-PTQ/dataset_test.ipynb cell 6), which has no
    batched/pipelined variant."""
    queue: List = []
    results: List[np.ndarray] = []
    for blob in blob_list:
        queue.append(_decode_dispatch(model, params, [blob], shape, wct,
                                      1, unroll))
        if len(queue) >= depth:
            results.append(_fetch_image(queue.pop(0), out))
    while queue:
        results.append(_fetch_image(queue.pop(0), out))
    return results


__all__ = ["WideCodecTables", "build_wide_codec_tables", "wide_compress",
           "wide_decompress", "wide_decompress_many", "gather_cb",
           "scatter_cb"]
