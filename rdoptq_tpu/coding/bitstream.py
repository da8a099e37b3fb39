"""Bitstream file framing: headers + encode/decode to files.

Parity with the reference's bitstream I/O helpers (T21:
`utils.py:253-409` — header pack/parse, uint/uchar/bytes framing,
`_encode`/`_decode` wrappers around model.compress with timing).

File layout (little endian):
    magic  4s   b"RDOQ"
    version u8
    arch    u8      (index into ARCH_IDS)
    quality u8
    metric  u8      (0 = mse, 1 = ms-ssim)
    height  u32, width u32      (original image size)
    n_streams u16   (tiled AR codings carry 2 streams per tile)
    per stream: length u32 + payload bytes
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

MAGIC = b"RDOQ"
VERSION = 2  # v2: n_streams u8 -> u16 (tiled AR: 2 streams per tile)
ARCH_IDS = ("Minnen2018", "Cheng2020", "Lu2022", "TinyLIC",
            "Cheng2020Attn", "Cheng2020GMM")  # append-only: indices are
                                              # baked into written files
METRICS = ("mse", "ms-ssim")


def pack_header(arch: str, quality: int, metric: str,
                size: Tuple[int, int], n_streams: int) -> bytes:
    return struct.pack("<4sBBBBIIH", MAGIC, VERSION,
                       ARCH_IDS.index(arch), quality,
                       METRICS.index(metric), size[0], size[1], n_streams)


def parse_header(buf: bytes) -> Dict:
    magic, ver = struct.unpack("<4sB", buf[:5])
    if magic != MAGIC:
        raise ValueError("not an RDOQ bitstream")
    if ver == 1:  # v1 layout: n_streams was u8 (header_len 17)
        _, _, arch, quality, metric, h, w, n = struct.unpack(
            "<4sBBBBIIB", buf[:17])
        header_len = 17
    elif ver == VERSION:
        _, _, arch, quality, metric, h, w, n = struct.unpack(
            "<4sBBBBIIH", buf[:18])
        header_len = 18
    else:
        raise ValueError(f"unsupported bitstream version {ver}")
    return {"arch": ARCH_IDS[arch], "quality": quality,
            "metric": METRICS[metric], "size": (h, w), "n_streams": n,
            "header_len": header_len}


def write_bitstream(path: str, arch: str, quality: int, metric: str,
                    size: Tuple[int, int], strings: List[bytes]) -> int:
    """Returns total bytes written."""
    with open(path, "wb") as f:
        f.write(pack_header(arch, quality, metric, size, len(strings)))
        for s in strings:
            f.write(struct.pack("<I", len(s)))
            f.write(s)
        return f.tell()


def read_bitstream(path: str) -> Dict:
    with open(path, "rb") as f:
        buf = f.read()
    head = parse_header(buf)
    off = head["header_len"]
    strings = []
    for _ in range(head["n_streams"]):
        (n,) = struct.unpack("<I", buf[off:off + 4])
        off += 4
        strings.append(buf[off:off + n])
        off += n
    head["strings"] = strings
    return head


__all__ = ["pack_header", "parse_header", "write_bitstream",
           "read_bitstream", "ARCH_IDS"]
