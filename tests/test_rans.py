"""Round-trip tests for the C++ rANS codec and CDF quantization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdoptq_tpu.coding import cdf as cdf_mod
from rdoptq_tpu.coding import rans
from rdoptq_tpu.ops import entropy


def test_pmf_to_quantized_cdf_properties():
    pmf = [0.1, 0.4, 0.3, 0.15, 0.05, 1e-9]  # last entry = tail mass
    cdf = rans.pmf_to_quantized_cdf(pmf, precision=16)
    assert cdf[0] == 0 and cdf[-1] == 1 << 16
    freqs = np.diff(cdf)
    assert np.all(freqs >= 1)
    # frequencies approximately proportional to the pmf
    assert abs(freqs[1] / 65536 - 0.4) < 0.01


def test_pmf_with_zeros_gets_nonzero_bins():
    pmf = [0.5, 0.0, 0.5, 0.0]
    cdf = rans.pmf_to_quantized_cdf(pmf, precision=12)
    assert np.all(np.diff(cdf) >= 1)
    assert cdf[-1] == 1 << 12


def _simple_table(n_bins=16, rows=3, seed=0):
    rng = np.random.default_rng(seed)
    max_len = n_bins + 2
    cdf = np.zeros((rows, max_len), dtype=np.int32)
    lengths = np.full(rows, max_len, dtype=np.int32)
    offsets = np.array([-(n_bins // 2)] * rows, dtype=np.int32)
    for r in range(rows):
        pmf = rng.random(n_bins) + 0.01
        pmf = pmf / pmf.sum()
        cdf[r] = rans.pmf_to_quantized_cdf(
            np.concatenate([pmf, [1e-9]]), 16)
    return cdf, lengths, offsets


def test_rans_roundtrip_in_range():
    rng = np.random.default_rng(1)
    cdf, lengths, offsets = _simple_table()
    n = 5000
    indexes = rng.integers(0, 3, n).astype(np.int32)
    # in-range values: [offset, offset + max_value - 1]
    symbols = (rng.integers(0, 15, n).astype(np.int32) + offsets[indexes])
    stream = rans.encode_with_indexes(symbols, indexes, cdf, lengths, offsets)
    assert len(stream) > 8
    decoded = rans.decode_with_indexes(stream, indexes, cdf, lengths, offsets)
    assert np.array_equal(decoded, symbols)


def test_rans_roundtrip_with_escapes():
    rng = np.random.default_rng(2)
    cdf, lengths, offsets = _simple_table()
    n = 2000
    indexes = rng.integers(0, 3, n).astype(np.int32)
    symbols = rng.integers(-500, 500, n).astype(np.int32)  # mostly escapes
    stream = rans.encode_with_indexes(symbols, indexes, cdf, lengths, offsets)
    decoded = rans.decode_with_indexes(stream, indexes, cdf, lengths, offsets)
    assert np.array_equal(decoded, symbols)


def test_rans_extreme_escape_values():
    cdf, lengths, offsets = _simple_table()
    symbols = np.array([0, 10**6, -10**6, 7, -8, 2**30, -(2**30)],
                       dtype=np.int32)
    indexes = np.zeros_like(symbols)
    stream = rans.encode_with_indexes(symbols, indexes, cdf, lengths, offsets)
    decoded = rans.decode_with_indexes(stream, indexes, cdf, lengths, offsets)
    assert np.array_equal(decoded, symbols)


def test_rans_empty():
    cdf, lengths, offsets = _simple_table()
    stream = rans.encode_with_indexes([], [], cdf, lengths, offsets)
    out = rans.decode_with_indexes(stream, [], cdf, lengths, offsets)
    assert out.size == 0


def test_rans_compression_ratio_near_entropy():
    # skewed distribution should compress close to its entropy
    rng = np.random.default_rng(3)
    p = np.array([0.85, 0.05, 0.04, 0.03, 0.02, 0.01])
    n = 20000
    values = rng.choice(len(p), size=n, p=p).astype(np.int32)
    cdf = rans.pmf_to_quantized_cdf(np.concatenate([p, [1e-9]]), 16)
    cdf = cdf[None, :]
    lengths = np.array([cdf.shape[1]], np.int32)
    offsets = np.array([0], np.int32)
    stream = rans.encode_with_indexes(values, np.zeros(n, np.int32), cdf,
                                      lengths, offsets)
    entropy_bits = -np.sum(p * np.log2(p)) * n
    actual_bits = len(stream) * 8
    assert actual_bits < entropy_bits * 1.05 + 128


def test_gaussian_table_roundtrip():
    """Symbols drawn from Gaussians coded with the real scale-table CDFs."""
    table = np.asarray(entropy.default_scale_table())
    ct = cdf_mod.build_gaussian_tables(table)
    rng = np.random.default_rng(4)
    scales = np.exp(rng.uniform(np.log(0.2), np.log(30), 4000)).astype(
        np.float32)
    indexes = np.asarray(entropy.build_indexes(jnp.asarray(table),
                                               jnp.asarray(scales)))
    values = rng.normal(0, scales).astype(np.float32)
    symbols = np.round(values).astype(np.int32)
    stream = rans.encode_with_indexes(symbols, indexes, ct.cdf,
                                      ct.cdf_lengths, ct.offsets)
    decoded = rans.decode_with_indexes(stream, indexes, ct.cdf,
                                       ct.cdf_lengths, ct.offsets)
    assert np.array_equal(decoded, symbols)
    # rate sanity: within 15% of the Gaussian entropy estimate
    lik = np.asarray(entropy.gaussian_likelihood(
        jnp.asarray(symbols.astype(np.float32)), jnp.asarray(scales)))
    est_bits = -np.sum(np.log2(lik))
    assert len(stream) * 8 < est_bits * 1.15 + 256


def test_factorized_table_roundtrip():
    key = jax.random.PRNGKey(0)
    params = entropy.factorized_init(key, channels=8)
    params = entropy.fit_quantiles(params)
    ct = cdf_mod.build_factorized_tables(params)
    assert ct.cdf.shape[0] == 8
    rng = np.random.default_rng(5)
    medians = np.asarray(entropy.factorized_medians(params))
    # synthetic latent: channel-major samples around the medians
    n = 500
    chan = rng.integers(0, 8, n).astype(np.int32)
    symbols = np.round(rng.normal(0, 3, n)).astype(np.int32)
    stream = rans.encode_with_indexes(symbols, chan, ct.cdf,
                                      ct.cdf_lengths, ct.offsets)
    decoded = rans.decode_with_indexes(stream, chan, ct.cdf,
                                       ct.cdf_lengths, ct.offsets)
    assert np.array_equal(decoded, symbols)


def test_lut_decode_matches_binary_search():
    """The bucket-LUT fast path must resolve the identical symbols as the
    binary search on a workload that exercises escapes (values beyond the
    CDF support) and every table row."""
    rng = np.random.default_rng(11)
    n_rows, support = 7, 13
    pmfs = rng.random((n_rows, support)) + 0.01
    rows = []
    for r in range(n_rows):
        pmf = pmfs[r] / pmfs[r].sum() * 0.99
        rows.append(rans.pmf_to_quantized_cdf(list(pmf) + [0.01]))
    stride = max(len(c) for c in rows)
    cdfs = np.zeros((n_rows, stride), np.int32)
    for r, c in enumerate(rows):
        cdfs[r, :len(c)] = c
    lengths = np.asarray([len(c) for c in rows], np.int32)
    offsets = np.asarray([-3] * n_rows, np.int32)

    sym = rng.integers(-9, support + 6, size=5000).astype(np.int32)
    idx = rng.integers(0, n_rows, size=5000).astype(np.int32)
    stream = rans.encode_with_indexes(sym, idx, cdfs, lengths, offsets)
    d_lut = rans.decode_with_indexes(stream, idx, cdfs, lengths, offsets,
                                     use_lut=True)
    d_bin = rans.decode_with_indexes(stream, idx, cdfs, lengths, offsets,
                                     use_lut=False)
    assert np.array_equal(d_lut, sym)
    assert np.array_equal(d_bin, sym)

    dec = rans.RansDecoderStream(stream)
    half = 2500
    a = dec.decode(idx[:half], cdfs, lengths, offsets, use_lut=True)
    b = dec.decode(idx[half:], cdfs, lengths, offsets, use_lut=False)
    dec.close()
    assert np.array_equal(np.concatenate([a, b]), sym)
