"""Host-side entropy coding: C++ rANS codec + quantized-CDF construction.

The device (TPU) computes transforms, quantization, and entropy *parameters*;
this package is the host boundary that turns (symbols, indexes, CDF tables)
into actual bitstreams and back — the only off-device step in the pipeline.
"""

from .cdf import CdfTable, build_factorized_tables, build_gaussian_tables
from .rans import decode_with_indexes, encode_with_indexes, pmf_to_quantized_cdf

__all__ = [
    "CdfTable", "build_factorized_tables", "build_gaussian_tables",
    "decode_with_indexes", "encode_with_indexes", "pmf_to_quantized_cdf",
]
