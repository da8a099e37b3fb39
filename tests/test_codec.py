"""End-to-end real-codec tests: factorized coding and the TinyLIC
checkerboard compress→decompress round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdoptq_tpu.coding import codec
from rdoptq_tpu.models import tinylic as T
from rdoptq_tpu.ops import entropy as E


@pytest.fixture(scope="module")
def eb_tables():
    params = E.factorized_init(jax.random.PRNGKey(0), 8)
    params = E.fit_quantiles(params)
    return params, codec.build_codec_tables(params)


def test_factorized_roundtrip(eb_tables):
    params, tables = eb_tables
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 6, 8)) * 3.0
    stream = codec.compress_factorized(tables, np.asarray(z))
    z_hat = codec.decompress_factorized(tables, stream, (4, 6))
    med = tables.medians.reshape(1, 1, 1, -1)
    expect = np.round(np.asarray(z) - med) + med
    assert np.allclose(z_hat, expect, atol=1e-5)


def test_factorized_rate_reasonable(eb_tables):
    params, tables = eb_tables
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 8)) * 2.0
    stream = codec.compress_factorized(tables, np.asarray(z))
    # likelihood-model estimate vs actual bits: within 20% + header slack
    z_hat, lik = E.factorized_forward(params, z, training=False)
    est_bits = float(-jnp.sum(jnp.log2(lik)))
    assert len(stream) * 8 < est_bits * 1.2 + 256


@pytest.fixture(scope="module")
def tiny_codec():
    model = T.TinyLIC(N=16, M=24, slices=(8, 16),
                      depths=(1, 1, 1, 1, 1, 1))
    params = model.init(jax.random.PRNGKey(0))
    params = params.copy()
    params["eb"] = E.fit_quantiles(params["eb"])
    tables = codec.build_codec_tables(params["eb"])
    return model, params, tables


def test_tinylic_codec_roundtrip(tiny_codec):
    """compress -> decompress must reproduce exactly the y_hat / x_hat of
    the (two-pass) likelihood forward."""
    model, params, tables = tiny_codec
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    out = codec.tinylic_compress(model, params, x, tables)
    assert len(out["strings"]) == 2 and out["shape"] == (1, 1)
    x_hat = codec.tinylic_decompress(model, params, out["strings"],
                                     out["shape"], tables)
    assert x_hat.shape == (1, 64, 64, 3)
    # the fake-quant forward is the decoder's reference output
    fwd = model.forward(params, x)
    x_ref = np.clip(np.asarray(fwd["x_hat"]), 0, 1)
    assert np.max(np.abs(x_hat - x_ref)) < 1e-4


def test_tinylic_codec_rate_matches_likelihoods(tiny_codec):
    model, params, tables = tiny_codec
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3))
    out = codec.tinylic_compress(model, params, x, tables)
    actual_bits = sum(len(s) for s in out["strings"]) * 8
    fwd = model.forward(params, x)
    est_bits = float(sum(-jnp.sum(jnp.log2(l))
                         for l in fwd["likelihoods"].values()))
    assert actual_bits < est_bits * 1.25 + 512


def test_factorized_round_bitwise_matches_host(eb_tables):
    """The encoder's device-side factorized quantization must reproduce
    the decoder's host arithmetic BIT-exactly: tinylic_compress/
    ar_compress feed `factorized_round`'s z_hat into h_s while the
    decoder feeds `decompress_factorized`'s output — one ulp of drift
    would desynchronize every conditional entropy parameter."""
    params, tables = eb_tables
    z = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 8)) * 3.0
    med = jnp.asarray(tables.medians, jnp.float32).reshape(1, 1, 1, -1)
    z_sym, z_hat_dev = codec.factorized_round(z, med)
    stream = codec.encode_factorized_symbols(tables, np.asarray(z_sym))
    z_hat_host = codec.decompress_factorized(tables, stream, (8, 8))
    assert np.array_equal(np.asarray(z_hat_dev), z_hat_host)
    # and the legacy host-side compressor emits the identical stream
    assert stream == codec.compress_factorized(tables, np.asarray(z))
