"""Single-dispatch wavefront codec: AR entropy decode runs ON DEVICE.

`ar.ar_decompress` already collapses the reference's pixel-serial decode
loop (nic_cvt.py:525-565, H*W steps) to 3(h-1)+w wavefront round trips —
but over a remote device link those ~200-500 round trips are still the
decode wall-clock floor (artifacts/codec_breakdown.json). This module
removes the host entirely: the WHOLE decompress — z decode, hyper
synthesis, every wave's masked-context params + in-program wide-rANS
decode (coding/wide_rans.py) + scatter, and g_s — compiles into ONE
jitted program: one dispatch, one fetch, for Minnen2018 / Cheng2020 /
Lu2022 alike.

Dual-mode executable (same trick as coding/wide_codec.py): a traced
``is_encode`` flag switches each wave between "symbols =
round(y_true - means)" (encode) and "symbols = wide-rANS decode"
(decode). All entropy-parameter math — causal-mask contraction, EP
chain, build_indexes — is the same code in the same executable, so the
conditional bitstream decodes bitwise no matter how XLA fuses.

Stream layout: section 0 = z (factorized tables), then ONE section per
wave, each padded to the SAME size S = pad(B*P*M) so the scan body is
uniform. Slots beyond a wave's pixel count (and lane padding) are forced
to CDF row 0 / its most-probable bin on BOTH sides — near-zero rate —
which keeps every section's consumption static. Out-of-range symbols ride
the per-section exception lists (applied in-scan: later waves' params
depend on the restored values).

Role parity: replaces the reference's serial RansDecoder loop
(task-oriented-PTQ models; see coding/ar.py header) for the
device-decode path; `coding/ar.py` remains the interop/default path.
"""

from __future__ import annotations

import functools
import struct
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import entropy as E
from . import wide_rans as W
from .ar import _analysis_fn, _wave_fns, wavefront_schedule
from . import codec as host_codec
from .codec import factorized_round
from .wide_codec import (WideCodecTables, build_wide_codec_tables,
                         _fit_exc, pack_blob, unpack_blob)


def _wave_section_size(model, h: int, w: int, batch: int) -> int:
    pixels, _ = wavefront_schedule(h, w)
    return W._pad_len(batch * pixels.shape[1] * model.latent_channels)


def _z_section_size(c_z: int, zh: int, zw: int, batch: int) -> int:
    return W._pad_len(batch * zh * zw * c_z)


def _exc_k(model, c_z, h, w, zh, zw, batch) -> int:
    """Per-section exception capacity = the section size itself (every
    symbol could in principle except); sections are small (one wave), so
    the inert scatter inputs stay cheap. Clamped to the blob format's
    u16 per-section count."""
    s = max(_wave_section_size(model, h, w, batch),
            _z_section_size(c_z, zh, zw, batch))
    return int(min(65535, s))


@functools.lru_cache(maxsize=8)
def _wide_ar_program(model, h: int, w: int, zh: int, zw: int, batch: int,
                     mp0_abs: int, unroll: int = 8):
    """One jitted executable serving BOTH encode and decode of the
    wavefront AR codec. ``mp0_abs`` is the row-0 most-probable absolute
    value (static) coded at invalid/padding slots. ``unroll`` is the
    decode scan's unroll factor — an explicit cache-key parameter so a
    changed RDOPTQ_WIDE_UNROLL reaches a new program (callers read the
    env once via W.wide_unroll)."""
    M = model.latent_channels
    pixels, counts = wavefront_schedule(h, w)
    T, P = pixels.shape[0], pixels.shape[1]
    S = W._pad_len(batch * P * M)
    pixels_j = jnp.asarray(pixels)
    # (T, P) static slot-validity — identical on both sides by shape
    slot_valid = jnp.asarray(np.arange(P)[None, :] < counts[:, None])
    table = E.default_scale_table()
    fns = _wave_fns(model, h, w)
    wave_params_b = jax.vmap(fns["wave_params"],
                             in_axes=(None, 0, 0, None))
    wave_update_b = jax.vmap(fns["wave_update"], in_axes=(0, None, 0, 0))

    def run(params, dev, stream, states0, exc_pos, exc_val, exc_n,
            z_sym_in, y_true, is_encode):
        c_z = dev["medians"].shape[0]
        n_z = batch * zh * zw
        s_z = W._pad_len(n_z * c_z)
        z_idx = jnp.broadcast_to(jnp.arange(c_z, dtype=jnp.int32),
                                 (n_z, c_z)).reshape(-1)

        def z_dec(_):
            vals, st, p = W.decode_wide(
                stream, jnp.int32(0), states0, z_idx,
                {"lut_sym": dev["f_sym"], "lut_fs": dev["f_fs"],
                 "offsets": dev["f_off"]}, unroll=unroll)
            vals = W.apply_exceptions(vals, exc_pos[0], exc_val[0],
                                      exc_n[0])
            return vals, st, p

        def z_enc(_):
            # encode never reads the stream: states/ptr are inert
            return z_sym_in.reshape(-1), states0, jnp.int32(0)

        z_vals, states, ptr = jax.lax.cond(is_encode, z_enc, z_dec, None)
        z_hat = (z_vals.reshape(batch, zh, zw, c_z).astype(jnp.float32)
                 + dev["medians"].reshape(1, 1, 1, c_z))
        pd = host_codec._float_dtype(params)
        hyper = model.h_s.run(params, z_hat.astype(pd))

        gdev = {"lut_sym": dev["g_sym"], "lut_fs": dev["g_fs"],
                "offsets": dev["g_off"]}
        buf0 = jnp.zeros((batch, h + 4, w + 4, M), jnp.float32)

        def step(carry, t):
            buf, states, ptr = carry
            scales, means = wave_params_b(params, buf, hyper, t)
            idx = E.build_indexes(table, scales).astype(jnp.int32)
            valid = slot_valid[t]  # (P,)
            # invalid slots -> row 0 on BOTH sides: their coded symbol is
            # the static most-probable bin (near-zero rate), their decoded
            # value is discarded by the scatter mask below
            idx = jnp.where(valid[None, :, None], idx, 0)
            idx_flat = jnp.concatenate(
                [idx.reshape(-1),
                 jnp.zeros(S - batch * P * M, jnp.int32)])

            def dec(_):
                vals, st, p = W.decode_wide(stream, ptr, states,
                                            idx_flat, gdev,
                                            unroll=unroll)
                vals = W.apply_exceptions(
                    vals, exc_pos[t + 1], exc_val[t + 1], exc_n[t + 1])
                return vals, st, p

            def enc(_):
                pts = pixels_j[t]
                y_vals = jax.vmap(lambda yb: jax.vmap(
                    lambda pt: jax.lax.dynamic_slice(
                        yb, (pt[0], pt[1], 0), (1, 1, M))[0, 0])(pts)
                )(y_true)  # (B, P, M)
                sym = jnp.clip(
                    jnp.round(y_vals.astype(jnp.float32) - means),
                    -host_codec._SYM_CLIP, host_codec._SYM_CLIP
                ).astype(jnp.int32)  # int16 transport range
                sym = jnp.where(valid[None, :, None], sym,
                                jnp.int32(mp0_abs))
                flat = jnp.concatenate(
                    [sym.reshape(-1),
                     jnp.full(S - batch * P * M, mp0_abs, jnp.int32)])
                return flat, states, ptr

            vals, states, ptr = jax.lax.cond(is_encode, enc, dec, None)
            v = vals[:batch * P * M].reshape(batch, P, M)
            y_hat_vals = v.astype(jnp.float32) + means
            buf = wave_update_b(buf, t, y_hat_vals,
                                jnp.broadcast_to(valid, (batch, P)))
            # int16 symbols / uint8 CDF indexes on the fetch path
            return ((buf, states, ptr),
                    (vals.astype(jnp.int16), idx_flat.astype(jnp.uint8)))

        (buf, states, ptr), (syms, idxs) = jax.lax.scan(
            step, (buf0, states, ptr), jnp.arange(T))
        y_hat = buf[:, 2:-2, 2:-2, :]
        # synthesis is dead weight on the encode side: skip it there
        x_hat = jax.lax.cond(
            is_encode,
            lambda _: jnp.zeros((batch, h * 16, w * 16, 3)),
            lambda _: model.g_s.run(params, y_hat.astype(pd)
                                    ).astype(jnp.float32), None)
        x_u8 = jnp.clip(jnp.round(x_hat * 255.0), 0.0, 255.0
                        ).astype(jnp.uint8)
        return {"x_hat": x_hat, "x_u8": x_u8, "syms": syms, "idxs": idxs,
                "z_vals": z_vals.astype(jnp.int16)}

    return jax.jit(run)


def _mp0_abs(wct: WideCodecTables) -> int:
    """Row-0 most-probable ABSOLUTE value of the gaussian tables — the
    static filler symbol for invalid/padding slots."""
    wt = wct.gaussian
    return int(wt.offsets[0]) + W._pad_symbol(wt)


def _bucket(model, c_z, h, w, zh, zw, batch) -> int:
    pixels, _ = wavefront_schedule(h, w)
    T = pixels.shape[0]
    return (_z_section_size(c_z, zh, zw, batch)
            + T * _wave_section_size(model, h, w, batch))


def wide_ar_compress(model, params, x, wct: WideCodecTables) -> Dict:
    """Compress with the dual-mode wavefront program: 2 dispatches
    (analysis + program), ONE fetch, one host wide-rANS encode."""
    y, z = _analysis_fn(model)(params, jnp.asarray(x))
    med = jnp.asarray(wct.medians, jnp.float32).reshape(1, 1, 1, -1)
    z_sym, _ = factorized_round(z, med)
    z_sym = jnp.clip(z_sym, -host_codec._SYM_CLIP, host_codec._SYM_CLIP
                     ).astype(jnp.int32)  # int16 transport safety

    batch = int(x.shape[0])
    h, w = int(y.shape[1]), int(y.shape[2])
    zh, zw = int(z.shape[1]), int(z.shape[2])
    c_z = wct.medians.shape[0]
    mp0 = _mp0_abs(wct)
    run = _wide_ar_program(model, h, w, zh, zw, batch, mp0,
                           W.wide_unroll())
    pixels, _ = wavefront_schedule(h, w)
    T = pixels.shape[0]
    n_sections = 1 + T
    k = _exc_k(model, c_z, h, w, zh, zw, batch)
    bucket = _bucket(model, c_z, h, w, zh, zw, batch)

    out = run(params, wct.device(),
              jnp.zeros(bucket + W.LANES, jnp.uint16),
              jnp.full((W.LANES,), 1 << 16, jnp.uint32),
              jnp.zeros((n_sections, k), jnp.int32),
              jnp.zeros((n_sections, k), jnp.int32),
              jnp.zeros(n_sections, jnp.int32),
              z_sym, y, jnp.bool_(True))
    z_vals, syms, idxs = jax.device_get(
        (out["z_vals"], out["syms"], out["idxs"]))

    sections = [(z_vals.astype(np.int32),
                 np.tile(np.arange(c_z, dtype=np.int64),
                         batch * zh * zw), wct.factorized)]
    for t in range(T):
        sections.append((syms[t].astype(np.int32),
                         idxs[t].astype(np.int32), wct.gaussian))
    stream, states, excs = W.encode_wide_sections(sections)
    return {"strings": [pack_blob(stream, states, excs, exc_k=k)],
            "shape": (zh, zw), "y_shape": (h, w)}


def wide_ar_decompress(model, params, strings, shape: Tuple[int, int],
                       y_shape: Tuple[int, int], wct: WideCodecTables,
                       batch: int = 1, out: str = "f32") -> np.ndarray:
    """ONE dispatch + one fetch: the whole wavefront decode (entropy
    decode included) is a single jitted program. ``out="u8"`` fetches
    the device-quantized 8-bit image (4x less transfer)."""
    zh, zw = shape
    h, w = y_shape
    c_z = wct.medians.shape[0]
    pixels, _ = wavefront_schedule(h, w)
    T = pixels.shape[0]
    n_sections = 1 + T
    stream, states, exc_pos, exc_val, exc_n = unpack_blob(
        strings[0], n_sections)
    k = _exc_k(model, c_z, h, w, zh, zw, batch)
    if int(exc_n.max(initial=0)) > k:
        raise ValueError(
            f"blob carries {int(exc_n.max())} exceptions in one section; "
            f"program capacity for this shape bucket is {k}")
    exc_pos = _fit_exc(exc_pos, k)
    exc_val = _fit_exc(exc_val, k)
    bucket = _bucket(model, c_z, h, w, zh, zw, batch)
    mp0 = _mp0_abs(wct)
    run = _wide_ar_program(model, h, w, zh, zw, batch, mp0,
                           W.wide_unroll())
    from .wide_codec import _inflate_inputs
    stream_d, pos_d, val_d = _inflate_inputs(
        stream, exc_pos, exc_val, exc_n, bucket, W.LANES, n_sections, k)
    res = run(params, wct.device(),
              stream_d,
              jnp.asarray(states.astype(np.uint32)),
              pos_d, val_d,
              jnp.asarray(exc_n),
              jnp.zeros((batch, zh, zw, c_z), jnp.int32),
              jnp.zeros((batch, h, w, model.latent_channels),
                        host_codec._float_dtype(params)),
              jnp.bool_(False))
    if out == "u8":
        return np.asarray(res["x_u8"])
    return np.clip(np.asarray(res["x_hat"]), 0.0, 1.0)


__all__ = ["wide_ar_compress", "wide_ar_decompress",
           "build_wide_codec_tables", "WideCodecTables"]
