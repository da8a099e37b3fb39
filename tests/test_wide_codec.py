"""Single-dispatch (device-decode) TinyLIC codec: wide_codec must
reproduce the host codec's reconstructions bit-exactly — both decode to
the same y_hat/x_hat as the two-pass likelihood forward — while packing
the whole decode into one jitted program."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdoptq_tpu.coding import codec, wide_codec
from rdoptq_tpu.models import tinylic as T
from rdoptq_tpu.ops import entropy as E


@pytest.fixture(scope="module")
def tiny():
    model = T.TinyLIC(N=16, M=24, slices=(8, 16),
                      depths=(1, 1, 1, 1, 1, 1))
    params = dict(model.init(jax.random.PRNGKey(0)))
    params["eb"] = E.fit_quantiles(params["eb"])
    return (model, params, codec.build_codec_tables(params["eb"]),
            wide_codec.build_wide_codec_tables(params["eb"]))


def test_gather_scatter_cb_roundtrip():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(2, 8, 12, 5)).astype(np.float32))
    from rdoptq_tpu.models.tinylic import checkerboard_anchor_mask
    anchor = np.asarray(checkerboard_anchor_mask(8, 12))[0, :, :, 0] > 0
    for is_anchor, mask in ((True, anchor), (False, ~anchor)):
        g = wide_codec.gather_cb(y, is_anchor)
        # row-major equality with boolean-mask flattening (the host
        # codec's symbol order)
        for b in range(2):
            np.testing.assert_array_equal(
                np.asarray(g[b]).reshape(-1, 5),
                np.asarray(y[b])[mask])
        back = wide_codec.scatter_cb(g, jnp.zeros_like(y), is_anchor)
        np.testing.assert_array_equal(
            np.asarray(back), np.asarray(y * mask[None, :, :, None]))


def test_wide_matches_host_codec(tiny):
    model, params, tables, wct = tiny
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    enc = wide_codec.wide_compress(model, params, x, wct)
    rec = wide_codec.wide_decompress(model, params, enc["strings"],
                                     enc["shape"], wct)
    enc_h = codec.tinylic_compress(model, params, x, tables)
    rec_h = codec.tinylic_decompress(model, params, enc_h["strings"],
                                     enc_h["shape"], tables)
    np.testing.assert_array_equal(rec, rec_h)


def test_wide_codec_batched(tiny):
    """A tile batch decodes in the same single program (batch staticly
    compiled); per-sample outputs equal the host codec's."""
    model, params, tables, wct = tiny
    x = jax.random.uniform(jax.random.PRNGKey(5), (3, 64, 64, 3))
    enc = wide_codec.wide_compress(model, params, x, wct)
    rec = wide_codec.wide_decompress(model, params, enc["strings"],
                                     enc["shape"], wct, batch=3)
    enc_h = codec.tinylic_compress(model, params, x, tables)
    rec_h = codec.tinylic_decompress(model, params, enc_h["strings"],
                                     enc_h["shape"], tables, batch=3)
    np.testing.assert_array_equal(rec, rec_h)


def test_tiled_wide_matches_tiled_host(tiny):
    """Wide tile groups (one blob per group, device decode) reconstruct
    identically to the host tiled codec — same y_hat by bit-agreement."""
    from rdoptq_tpu.coding import tiled
    model, params, tables, wct = tiny
    rng = np.random.default_rng(11)
    img = rng.uniform(size=(1, 150, 200, 3)).astype(np.float32)
    out_w = tiled.tiled_compress(model, params, img, tables, "TinyLIC",
                                 tile=64, batch_tiles=4, wide_tables=wct)
    assert len(out_w["strings"]) == len(
        tiled._group_sizes(np.prod(out_w["grid"]), 4))
    rec_w = tiled.tiled_decompress(
        model, params, out_w["strings"], 64, out_w["grid"],
        out_w["zy_shape"], (150, 200), tables, "TinyLIC",
        batch_tiles=4, wide_tables=wct)
    out_h = tiled.tiled_compress(model, params, img, tables, "TinyLIC",
                                 tile=64, batch_tiles=4)
    rec_h = tiled.tiled_decompress(
        model, params, out_h["strings"], 64, out_h["grid"],
        out_h["zy_shape"], (150, 200), tables, "TinyLIC", batch_tiles=4)
    np.testing.assert_array_equal(rec_w, rec_h)


def test_wide_bf16_matches_host_bf16(tiny):
    """Half-precision serving codec: with params tree-cast to bfloat16
    (quant/light.cast_params) the wide and host codecs must still agree
    bit-exactly with each other (shared-program bit-agreement is dtype-
    independent), and the recon must stay close to the f32 codec's."""
    from rdoptq_tpu.quant import light
    model, params, tables, wct = tiny
    p16 = light.cast_params(params)
    x = jax.random.uniform(jax.random.PRNGKey(9), (1, 64, 64, 3))

    enc = wide_codec.wide_compress(model, p16, x, wct)
    rec = wide_codec.wide_decompress(model, p16, enc["strings"],
                                     enc["shape"], wct)
    enc_h = codec.tinylic_compress(model, p16, x, tables)
    rec_h = codec.tinylic_decompress(model, p16, enc_h["strings"],
                                     enc_h["shape"], tables)
    np.testing.assert_array_equal(rec, rec_h)

    rec32 = wide_codec.wide_decompress(
        model, params,
        wide_codec.wide_compress(model, params, x, wct)["strings"],
        enc["shape"], wct)
    assert float(np.abs(rec - rec32).mean()) < 0.02


def test_wide_u8_output_matches_f32(tiny):
    """out='u8' must equal the device-side 8-bit quantization of the f32
    decode (same program, fused round/clip/cast)."""
    model, params, tables, wct = tiny
    x = jax.random.uniform(jax.random.PRNGKey(10), (1, 64, 64, 3))
    enc = wide_codec.wide_compress(model, params, x, wct)
    rec_f = wide_codec.wide_decompress(model, params, enc["strings"],
                                       enc["shape"], wct)
    rec_u = wide_codec.wide_decompress(model, params, enc["strings"],
                                       enc["shape"], wct, out="u8")
    assert rec_u.dtype == np.uint8
    np.testing.assert_array_equal(
        rec_u, np.clip(np.round(rec_f * 255.0), 0, 255).astype(np.uint8))
    # host codec u8 path agrees with its own f32 path the same way
    rec_hf = codec.tinylic_decompress(model, params, enc_strings(model,
                                      params, x, tables), (1, 1), tables)
    rec_hu = codec.tinylic_decompress(model, params, enc_strings(model,
                                      params, x, tables), (1, 1), tables,
                                      out="u8")
    np.testing.assert_array_equal(
        rec_hu, np.clip(np.round(rec_hf * 255.0), 0, 255).astype(np.uint8))


def enc_strings(model, params, x, tables):
    return codec.tinylic_compress(model, params, x, tables)["strings"]


def test_wide_lanes_knob(tiny, monkeypatch):
    """RDOPTQ_WIDE_LANES reshapes the encoder's stream (fewer serial
    decode steps per symbol at 4 B/lane header cost); the decoder reads
    the lane count from the blob header, so streams decode identically
    with NO env set — and still match the host codec bit-exactly."""
    model, params, tables, wct = tiny
    x = jax.random.uniform(jax.random.PRNGKey(12), (1, 64, 64, 3))
    rec_h = codec.tinylic_decompress(
        model, params, enc_strings(model, params, x, tables), (1, 1),
        tables)
    for lanes in (128, 1024):
        monkeypatch.setenv("RDOPTQ_WIDE_LANES", str(lanes))
        enc = wide_codec.wide_compress(model, params, x, wct)
        n_sections = 1 + 2 * len(model.slices)
        _, states, _, _, _ = wide_codec.unpack_blob(
            enc["strings"][0], n_sections)
        assert states.size == lanes
        monkeypatch.delenv("RDOPTQ_WIDE_LANES")
        rec = wide_codec.wide_decompress(model, params, enc["strings"],
                                         enc["shape"], wct)
        np.testing.assert_array_equal(rec, rec_h)


def test_wide_decompress_many_pipelined(tiny):
    """The pipelined multi-blob decoder must return exactly the per-blob
    wide_decompress results, in order, for any pipeline depth (the
    overlap is a latency optimization, never a value change)."""
    model, params, tables, wct = tiny
    blobs, want = [], []
    for seed in (20, 21, 22):
        x = jax.random.uniform(jax.random.PRNGKey(seed), (1, 64, 64, 3))
        enc = wide_codec.wide_compress(model, params, x, wct)
        blobs.append(enc["strings"][0])
        want.append(wide_codec.wide_decompress(
            model, params, enc["strings"], enc["shape"], wct, out="u8"))
        shape = enc["shape"]
    for depth in (1, 2, 8):
        got = wide_codec.wide_decompress_many(model, params, blobs, shape,
                                              wct, out="u8", depth=depth)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)


def test_unpack_blob_rejects_corrupt_header(tiny):
    """Truncated/corrupt blobs must fail with a clear ValueError before
    any buffer allocation or (multi-minute, over this tunnel) compile."""
    model, params, tables, wct = tiny
    x = jax.random.uniform(jax.random.PRNGKey(13), (1, 64, 64, 3))
    blob = wide_codec.wide_compress(model, params, x, wct)["strings"][0]
    n_sections = 1 + 2 * len(model.slices)
    import struct
    with pytest.raises(ValueError, match="truncated"):
        wide_codec.unpack_blob(blob[:4], n_sections)
    zero_lanes = struct.pack("<IHH", 10, 0, 64) + blob[8:]
    with pytest.raises(ValueError, match="lanes=0"):
        wide_codec.unpack_blob(zero_lanes, n_sections)
    big_lanes = struct.pack("<IHH", 10, 65535, 64) + blob[8:64]
    with pytest.raises(ValueError, match="lane states"):
        wide_codec.unpack_blob(big_lanes, n_sections)
    short_stream = blob[:len(blob) - 2]
    with pytest.raises(ValueError, match="stream"):
        wide_codec.unpack_blob(short_stream, n_sections)


def test_wide_rate_overhead_bounded(tiny):
    """The wide blob pays lane states (4 B/lane) + per-section lane
    padding + 8 B/exception + precision-12 rate; the STREAM portion must
    stay within a modest factor of the host stream (the wide path trades
    fixed overhead for single-dispatch latency — callers choose).
    Random-init latents exaggerate the exception count (~20% vs ~1e-9 on
    trained models), so exception bytes are measured and excluded from
    the rate comparison rather than guessed."""
    model, params, tables, wct = tiny
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 128, 128, 3))
    blob = wide_codec.wide_compress(model, params, x, wct)["strings"][0]
    host_bytes = sum(len(s) for s in codec.tinylic_compress(
        model, params, x, tables)["strings"])
    n_sections = 1 + 2 * len(model.slices)
    _, states, _, _, exc_n = wide_codec.unpack_blob(blob, n_sections)
    fixed = (8 + states.size * 4            # header + lane states
             + 2 * n_sections + 8 * int(exc_n.sum())   # exception lists
             + 2 * n_sections * 64)         # lane-padding slack
    assert len(blob) < host_bytes * 1.15 + fixed
