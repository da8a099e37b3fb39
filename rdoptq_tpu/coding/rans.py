"""ctypes bindings to the C++ rANS codec (see csrc/rans.cpp).

API parity with the reference's entropy-coding layer
(`compressai.ans.BufferedRansEncoder.encode_with_indexes` /
`RansDecoder.decode_with_indexes`, consumed at
task-oriented-PTQ/models/nic_cvt.py:485,524 and
light-uniform-PTQ/models/tinylic.py:296,330): the device produces
``symbols``/``indexes`` arrays, a CDF matrix selects the per-symbol
distribution, and the host turns them into a compact bitstream.

The shared library is compiled on demand with g++ -O3 and cached next to
the source; no pybind11 is required.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "rans.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "csrc", "_librans.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
           _SRC, "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.rdoptq_rans_encode.restype = ctypes.c_long
        lib.rdoptq_rans_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_long]
        lib.rdoptq_rans_decode.restype = ctypes.c_int
        lib.rdoptq_rans_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p]
        lib.rdoptq_pmf_to_quantized_cdf.restype = ctypes.c_int
        lib.rdoptq_pmf_to_quantized_cdf.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
        lib.rdoptq_rans_dec_new.restype = ctypes.c_void_p
        lib.rdoptq_rans_dec_new.argtypes = [ctypes.c_void_p, ctypes.c_long]
        lib.rdoptq_rans_dec_chunk.restype = ctypes.c_int
        lib.rdoptq_rans_dec_chunk.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.rdoptq_rans_dec_free.restype = None
        lib.rdoptq_rans_dec_free.argtypes = [ctypes.c_void_p]
        lib.rdoptq_cdf_lut_new.restype = ctypes.c_void_p
        lib.rdoptq_cdf_lut_new.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int]
        lib.rdoptq_cdf_lut_free.restype = None
        lib.rdoptq_cdf_lut_free.argtypes = [ctypes.c_void_p]
        lib.rdoptq_rans_decode_lut.restype = ctypes.c_int
        lib.rdoptq_rans_decode_lut.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.rdoptq_rans_dec_chunk_lut.restype = ctypes.c_int
        lib.rdoptq_rans_dec_chunk_lut.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p]
        _lib = lib
        return lib


class _CdfLutCache:
    """Bucket-LUT handles for CDF tables (decode fast path). Keyed by the
    converted table's (data pointer, shape); entries hold a strong
    reference to the array so the pointer stays valid and unique. Tables
    are built once per model (coding/cdf.py) and prewarmed there via
    :func:`prewarm_cdf_lut`, so every decode hits — the LUT build
    (16 MB memset + scan) is paid at table-construction time. Eviction
    is LRU one-at-a-time, never a full clear."""

    def __init__(self, capacity: int = 16):
        import collections
        self._cap = capacity
        # key -> (cdf_array, lengths_array, handle), LRU order
        self._entries = collections.OrderedDict()

    def get(self, cdf: np.ndarray, lengths: np.ndarray) -> int:
        key = (cdf.ctypes.data, cdf.shape, lengths.ctypes.data)
        ent = self._entries.get(key)
        if ent is not None and ent[0] is cdf and ent[1] is lengths:
            self._entries.move_to_end(key)
            return ent[2]
        lib = _load()
        if ent is not None:  # stale entry at a reused address: free it
            lib.rdoptq_cdf_lut_free(ent[2])
            del self._entries[key]
        while len(self._entries) >= self._cap:
            _, (_, _, h) = self._entries.popitem(last=False)
            lib.rdoptq_cdf_lut_free(h)
        handle = lib.rdoptq_cdf_lut_new(
            cdf.ctypes.data, cdf.shape[1], lengths.ctypes.data,
            cdf.shape[0])
        self._entries[key] = (cdf, lengths, handle)
        return handle


_lut_cache = _CdfLutCache()


def prewarm_cdf_lut(cdf, cdf_lengths) -> None:
    """Build (and cache) the decode LUT for a CDF table now, at table
    construction, instead of lazily inside the first decode. Pass the
    SAME canonical int32-contiguous arrays the decode calls will use —
    the cache is keyed by array identity."""
    cdf = _as_i32(cdf)
    lengths = _as_i32(cdf_lengths).ravel()
    _lut_cache.get(cdf, lengths)


def _as_i32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a), dtype=np.int32)


def pmf_to_quantized_cdf(pmf: Sequence[float], precision: int = 16
                         ) -> np.ndarray:
    """Quantize a PMF (tail mass appended as its last entry) to an integer
    CDF of length len(pmf)+1 summing to 2**precision, every bin nonzero.

    Equivalent role to `compressai._CXX.pmf_to_quantized_cdf`
    (reference models/base.py:61-81 callers)."""
    lib = _load()
    p = np.ascontiguousarray(np.asarray(pmf, dtype=np.float64))
    out = np.empty(p.size + 1, dtype=np.uint32)
    rc = lib.rdoptq_pmf_to_quantized_cdf(
        p.ctypes.data, p.size, precision, out.ctypes.data)
    if rc != 0:
        raise ValueError(f"pmf_to_quantized_cdf failed (rc={rc})")
    return out.astype(np.int32)


def encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets) -> bytes:
    """Encode integer ``symbols`` where symbol i uses CDF row
    ``indexes[i]``. ``cdfs`` is a (rows, stride) int32 matrix, row r valid
    for ``cdf_lengths[r]`` entries, symbol values offset by ``offsets[r]``."""
    lib = _load()
    sym = _as_i32(symbols).ravel()
    idx = _as_i32(indexes).ravel()
    if sym.size != idx.size:
        raise ValueError("symbols and indexes must have the same length")
    cdf = _as_i32(cdfs)
    if cdf.ndim != 2:
        raise ValueError("cdfs must be 2D (rows, stride)")
    lengths = _as_i32(cdf_lengths).ravel()
    offs = _as_i32(offsets).ravel()
    # worst case: every symbol escapes with a ~64-bit varint
    capacity = 8 + 16 * max(sym.size, 1) + 64
    out = np.empty(capacity, dtype=np.uint8)
    n = lib.rdoptq_rans_encode(
        sym.ctypes.data, idx.ctypes.data, sym.size, cdf.ctypes.data,
        cdf.shape[1], lengths.ctypes.data, offs.ctypes.data,
        out.ctypes.data, capacity)
    if n < 0:
        raise RuntimeError("rANS encode: output capacity exceeded")
    return out[:n].tobytes()


def decode_with_indexes(stream: bytes, indexes, cdfs, cdf_lengths,
                        offsets, use_lut: bool = True) -> np.ndarray:
    """Inverse of :func:`encode_with_indexes`; returns int32 symbols.
    ``use_lut`` routes symbol resolution through the cached bucket LUT
    (one load + short scan) instead of the per-symbol binary search."""
    lib = _load()
    idx = _as_i32(indexes).ravel()
    cdf = _as_i32(cdfs)
    lengths = _as_i32(cdf_lengths).ravel()
    offs = _as_i32(offsets).ravel()
    buf = np.frombuffer(stream, dtype=np.uint8)
    out = np.empty(idx.size, dtype=np.int32)
    if use_lut:
        rc = lib.rdoptq_rans_decode_lut(
            buf.ctypes.data, buf.size, idx.ctypes.data, idx.size,
            cdf.ctypes.data, cdf.shape[1], lengths.ctypes.data,
            offs.ctypes.data, _lut_cache.get(cdf, lengths),
            out.ctypes.data)
    else:
        rc = lib.rdoptq_rans_decode(
            buf.ctypes.data, buf.size, idx.ctypes.data, idx.size,
            cdf.ctypes.data, cdf.shape[1], lengths.ctypes.data,
            offs.ctypes.data, out.ctypes.data)
    if rc != 0:
        raise RuntimeError(f"rANS decode failed (rc={rc})")
    return out


class RansDecoderStream:
    """Stateful streaming decoder for conditional entropy models: decode
    chunk-by-chunk where each chunk's CDF indexes depend on previously
    decoded data (the role of `compressai.ans.RansDecoder.decode_stream`,
    used at e.g. reference nic_cvt.py:524-565, tinylic.py:330-362)."""

    def __init__(self, stream: bytes):
        self._lib = _load()
        self._buf = np.frombuffer(stream, dtype=np.uint8)
        self._handle = self._lib.rdoptq_rans_dec_new(
            self._buf.ctypes.data, self._buf.size)
        if not self._handle:
            raise ValueError("invalid rANS stream")

    def decode(self, indexes, cdfs, cdf_lengths, offsets,
               use_lut: bool = True) -> np.ndarray:
        idx = _as_i32(indexes).ravel()
        cdf = _as_i32(cdfs)
        lengths = _as_i32(cdf_lengths).ravel()
        offs = _as_i32(offsets).ravel()
        out = np.empty(idx.size, dtype=np.int32)
        if use_lut:
            rc = self._lib.rdoptq_rans_dec_chunk_lut(
                self._handle, idx.ctypes.data, idx.size, cdf.ctypes.data,
                cdf.shape[1], lengths.ctypes.data, offs.ctypes.data,
                _lut_cache.get(cdf, lengths), out.ctypes.data)
        else:
            rc = self._lib.rdoptq_rans_dec_chunk(
                self._handle, idx.ctypes.data, idx.size, cdf.ctypes.data,
                cdf.shape[1], lengths.ctypes.data, offs.ctypes.data,
                out.ctypes.data)
        if rc != 0:
            raise RuntimeError(f"rANS chunk decode failed (rc={rc})")
        return out

    def close(self):
        if self._handle:
            self._lib.rdoptq_rans_dec_free(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


__all__ = ["pmf_to_quantized_cdf", "encode_with_indexes",
           "decode_with_indexes", "prewarm_cdf_lut", "RansDecoderStream"]
