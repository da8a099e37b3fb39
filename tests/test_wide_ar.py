"""Single-dispatch wavefront (AR) codec: wide_ar must reproduce the host
wavefront codec's reconstructions bit-exactly — same conditional
bitstream discipline, entropy decode moved on-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdoptq_tpu.coding import ar, codec, wide_ar
from rdoptq_tpu.models.minnen2018 import Minnen2018
from rdoptq_tpu.ops import entropy as E


@pytest.fixture(scope="module")
def minnen():
    model = Minnen2018(N=8, M=8)
    params = dict(model.init(jax.random.PRNGKey(0)))
    params["eb"] = E.fit_quantiles(params["eb"])
    return (model, params, codec.build_codec_tables(params["eb"]),
            wide_ar.build_wide_codec_tables(params["eb"]))


def test_wide_ar_matches_host(minnen):
    model, params, tables, wct = minnen
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    enc = wide_ar.wide_ar_compress(model, params, x, wct)
    rec = wide_ar.wide_ar_decompress(model, params, enc["strings"],
                                     enc["shape"], enc["y_shape"], wct)
    enc_h = ar.ar_compress(model, params, x, tables)
    rec_h = ar.ar_decompress(model, params, enc_h["strings"],
                             enc_h["shape"], enc_h["y_shape"], tables)
    np.testing.assert_array_equal(rec, rec_h)


def test_wide_ar_bf16_matches_host_bf16(minnen):
    """Half-precision serving: with params tree-cast to bfloat16 the
    wide and host wavefront codecs must still agree bit-exactly (wave
    math is pinned to f32; transforms follow the params dtype)."""
    from rdoptq_tpu.quant import light
    model, params, tables, wct = minnen
    p16 = dict(light.cast_params(params))
    x = jax.random.uniform(jax.random.PRNGKey(11), (1, 64, 64, 3))
    enc = wide_ar.wide_ar_compress(model, p16, x, wct)
    rec = wide_ar.wide_ar_decompress(model, p16, enc["strings"],
                                     enc["shape"], enc["y_shape"], wct)
    enc_h = ar.ar_compress(model, p16, x, tables)
    rec_h = ar.ar_decompress(model, p16, enc_h["strings"],
                             enc_h["shape"], enc_h["y_shape"], tables)
    np.testing.assert_array_equal(rec, rec_h)
    # u8 output path: device-quantized 8-bit fetch equals the f32 path
    rec_u = wide_ar.wide_ar_decompress(model, p16, enc["strings"],
                                       enc["shape"], enc["y_shape"], wct,
                                       out="u8")
    np.testing.assert_array_equal(
        rec_u, np.clip(np.round(rec * 255.0), 0, 255).astype(np.uint8))
    rec_hu = ar.ar_decompress(model, p16, enc_h["strings"], enc_h["shape"],
                              enc_h["y_shape"], tables, out="u8")
    np.testing.assert_array_equal(
        rec_hu, np.clip(np.round(rec_h * 255.0), 0, 255).astype(np.uint8))


def test_wide_ar_batched(minnen):
    """A tile batch decodes in the same single program; per-sample
    outputs equal the host batched-wavefront codec's."""
    model, params, tables, wct = minnen
    x = jax.random.uniform(jax.random.PRNGKey(5), (3, 64, 64, 3))
    enc = wide_ar.wide_ar_compress(model, params, x, wct)
    rec = wide_ar.wide_ar_decompress(model, params, enc["strings"],
                                     enc["shape"], enc["y_shape"], wct,
                                     batch=3)
    enc_h = ar.ar_compress_batched(model, params, x, tables)
    rec_h = ar.ar_decompress_batched(model, params, enc_h["strings"],
                                     enc_h["shape"], enc_h["y_shape"],
                                     tables, batch=3)
    np.testing.assert_array_equal(rec, rec_h)


def test_tiled_wide_ar_matches_tiled_host(minnen):
    """Wide wavefront tile groups reconstruct identically to the host
    batched-wavefront tiled codec."""
    from rdoptq_tpu.coding import tiled
    model, params, tables, wct = minnen
    rng = np.random.default_rng(11)
    img = rng.uniform(size=(1, 150, 200, 3)).astype(np.float32)
    out_w = tiled.tiled_compress(model, params, img, tables,
                                 "Minnen2018", tile=64, batch_tiles=4,
                                 wide_tables=wct)
    rec_w = tiled.tiled_decompress(
        model, params, out_w["strings"], 64, out_w["grid"],
        out_w["zy_shape"], (150, 200), tables, "Minnen2018",
        batch_tiles=4, wide_tables=wct)
    out_h = tiled.tiled_compress(model, params, img, tables,
                                 "Minnen2018", tile=64, batch_tiles=4)
    rec_h = tiled.tiled_decompress(
        model, params, out_h["strings"], 64, out_h["grid"],
        out_h["zy_shape"], (150, 200), tables, "Minnen2018",
        batch_tiles=4)
    np.testing.assert_array_equal(rec_w, rec_h)


def test_wide_ar_rate_overhead_bounded(minnen):
    """Per-wave sections pay lane padding + invalid-slot filler at
    near-zero rate; the stream must stay within a modest factor of the
    host stream once fixed costs (states, exception entries) are
    measured and excluded."""
    model, params, tables, wct = minnen
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 128, 128, 3))
    enc = wide_ar.wide_ar_compress(model, params, x, wct)
    blob = enc["strings"][0]
    host_bytes = sum(len(s) for s in ar.ar_compress(
        model, params, x, tables)["strings"])
    from rdoptq_tpu.coding.ar import wavefront_schedule
    h, w = enc["y_shape"]
    n_sections = 1 + wavefront_schedule(h, w)[0].shape[0]
    _, states, _, _, exc_n = wide_ar.unpack_blob(blob, n_sections)
    fixed = (8 + states.size * 4 + 2 * n_sections
             + 8 * int(exc_n.sum()) + 2 * n_sections * 64)
    assert len(blob) < host_bytes * 1.25 + fixed
