"""Host-side quantized-CDF table construction for the rANS codec.

Builds the per-channel (factorized bottleneck) and per-scale (Gaussian
conditional) CDF tables consumed by :mod:`rdoptq_tpu.coding.rans`. This is
the equivalent of the reference's `EntropyBottleneck.update()` /
`GaussianConditional.update()` CDF maintenance
(light-uniform-PTQ/models/base.py:61-81, task-oriented-PTQ/models/
nic_cvt.py:383-424): it runs on the host, once per model load, with the
density evaluations jitted on the accelerator and the integer CDF
quantization in C++.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.special

from ..ops import entropy as E
from . import rans


class CdfTable(NamedTuple):
    """Codec-side distribution table.

    ``cdf``: (rows, max_len) int32, row r valid for ``cdf_lengths[r]``
    entries; ``offsets``: added back to decoded values (symbol = value +
    offset is the stored integer's origin shift).
    """

    cdf: np.ndarray
    cdf_lengths: np.ndarray
    offsets: np.ndarray


def _quantize_rows(pmfs: np.ndarray, pmf_lengths: np.ndarray,
                   tail_masses: np.ndarray, precision: int = 16):
    """Pack variable-length PMF rows (+ per-row tail mass bin) into a dense
    quantized CDF matrix."""
    rows = pmfs.shape[0]
    cdf_lengths = pmf_lengths + 2  # + tail bin + leading zero
    max_len = int(cdf_lengths.max())
    cdf = np.zeros((rows, max_len), dtype=np.int32)
    for r in range(rows):
        n = int(pmf_lengths[r])
        pmf = np.concatenate([pmfs[r, :n], [max(tail_masses[r], 1e-12)]])
        cdf[r, :n + 2] = rans.pmf_to_quantized_cdf(pmf, precision)
    return cdf, cdf_lengths.astype(np.int32)


def build_factorized_tables(params: E.FactorizedParams,
                            precision: int = 16) -> CdfTable:
    """CDF table per latent channel from the learned factorized density."""
    quantiles = np.asarray(params.quantiles)[:, 0, :]
    medians = quantiles[:, 1]
    minima = np.clip(np.ceil(medians - quantiles[:, 0]).astype(np.int32),
                     0, None)
    maxima = np.clip(np.ceil(quantiles[:, 2] - medians).astype(np.int32),
                     0, None)
    pmf_lengths = maxima + minima + 1
    offsets = -minima
    max_len = int(pmf_lengths.max())
    c = medians.shape[0]

    # sample the density at median - minima + {0..max_len-1} per channel
    samples = (medians[:, None] - minima[:, None]
               + np.arange(max_len)[None, :]).astype(np.float32)
    x = jnp.asarray(samples)[:, None, :]  # (C, 1, N)
    lik = np.asarray(E.factorized_likelihood(params, x))[:, 0, :]
    lower = np.asarray(jax.nn.sigmoid(
        E.factorized_logits(params, x - 0.5)))[:, 0, :]
    upper = np.asarray(jax.nn.sigmoid(
        E.factorized_logits(params, x + 0.5)))[:, 0, :]

    pmfs = np.zeros((c, max_len), dtype=np.float64)
    tails = np.zeros(c, dtype=np.float64)
    for r in range(c):
        n = int(pmf_lengths[r])
        pmfs[r, :n] = lik[r, :n]
        tails[r] = lower[r, 0] + (1.0 - upper[r, n - 1])
    cdf, cdf_lengths = _quantize_rows(pmfs, pmf_lengths, tails, precision)
    rans.prewarm_cdf_lut(cdf, cdf_lengths)
    return CdfTable(cdf, cdf_lengths, offsets.astype(np.int32))


def build_gaussian_tables(scale_table: np.ndarray, tail_mass: float = 1e-9,
                          precision: int = 16) -> CdfTable:
    """CDF table per scale-table entry for a zero-mean unit-bin Gaussian."""
    st = np.asarray(scale_table, dtype=np.float64)
    multiplier = -scipy.special.ndtri(tail_mass / 2.0)
    centers = np.ceil(st * multiplier).astype(np.int32)
    pmf_lengths = 2 * centers + 1
    offsets = -centers
    max_len = int(pmf_lengths.max())
    rows = st.shape[0]

    def phi(x):
        return 0.5 * scipy.special.erfc(-x / math.sqrt(2.0))

    pmfs = np.zeros((rows, max_len), dtype=np.float64)
    tails = np.zeros(rows, dtype=np.float64)
    for r in range(rows):
        n = int(pmf_lengths[r])
        v = np.abs(np.arange(n) - centers[r]).astype(np.float64)
        up = phi((0.5 - v) / st[r])
        low = phi((-0.5 - v) / st[r])
        pmfs[r, :n] = up - low
        tails[r] = 2.0 * low[0]
    cdf, cdf_lengths = _quantize_rows(pmfs, pmf_lengths, tails, precision)
    rans.prewarm_cdf_lut(cdf, cdf_lengths)
    return CdfTable(cdf, cdf_lengths, offsets.astype(np.int32))


__all__ = ["CdfTable", "build_factorized_tables", "build_gaussian_tables"]
