"""Tiled / batched codec tests (coding/tiled.py + batched checkerboard).

Invariants: batch-B checkerboard coding is bit-compatible with B
independent single-image codings (same reconstructions); tile/untile is
an exact inverse; the tiled end-to-end path reconstructs each tile
exactly as the untiled codec would; the CLI framing round-trips.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdoptq_tpu.coding import codec, tiled
from rdoptq_tpu.models import tinylic as T
from rdoptq_tpu.ops import entropy as E


@pytest.fixture(scope="module")
def tiny_codec():
    model = T.TinyLIC(N=16, M=24, slices=(8, 16),
                      depths=(1, 1, 1, 1, 1, 1))
    params = model.init(jax.random.PRNGKey(0))
    params = params.copy()
    params["eb"] = E.fit_quantiles(params["eb"])
    tables = codec.build_codec_tables(params["eb"])
    return model, params, tables


def test_tile_untile_inverse():
    rng = np.random.default_rng(0)
    img = rng.random((1, 100, 150, 3)).astype(np.float32)
    tiles = tiled.tile_image(img, 64)
    th, tw = tiled.tile_grid(100, 150, 64)
    assert tiles.shape == (th * tw, 64, 64, 3)
    back = tiled.untile_image(tiles, th, tw, 100, 150)
    np.testing.assert_array_equal(back, img)


def test_batched_checkerboard_matches_single(tiny_codec):
    """A batch-3 bitstream decodes to (a) the fake-quant forward's
    reconstruction (self-consistency — encode and decode share the same
    batch-3 compiled programs, so this is the bit-agreement invariant)
    and (b) the single-image codings up to knife-edge rounding (programs
    compiled at different batch shapes may reassociate floats)."""
    model, params, tables = tiny_codec
    x = jax.random.uniform(jax.random.PRNGKey(7), (3, 64, 64, 3))

    out_b = codec.tinylic_compress(model, params, x, tables)
    rec_b = codec.tinylic_decompress(model, params, out_b["strings"],
                                     out_b["shape"], tables, batch=3)
    assert rec_b.shape == (3, 64, 64, 3)
    fwd = np.clip(np.asarray(model.forward(params, x)["x_hat"]), 0, 1)
    assert np.max(np.abs(rec_b - fwd)) < 1e-4

    singles = []
    for b in range(3):
        out1 = codec.tinylic_compress(model, params, x[b:b + 1], tables)
        singles.append(codec.tinylic_decompress(
            model, params, out1["strings"], out1["shape"], tables))
    assert np.max(np.abs(rec_b - np.concatenate(singles))) < 1e-3


def test_tiled_roundtrip_matches_forward(tiny_codec):
    """End-to-end tiled coding of a non-multiple-size image: the output
    must equal the fake-quant forward of the tile batch (the decoder's
    reference output), stitched and cropped."""
    model, params, tables = tiny_codec
    rng = np.random.default_rng(3)
    img = rng.random((1, 100, 150, 3)).astype(np.float32)

    out = tiled.tiled_compress(model, params, img, tables, "TinyLIC",
                               tile=64, batch_tiles=4)
    th, tw = out["grid"]
    assert (th, tw) == (2, 3)
    rec = tiled.tiled_decompress(model, params, out["strings"], 64,
                                 (th, tw), out["zy_shape"], (100, 150),
                                 tables, "TinyLIC", batch_tiles=4)
    assert rec.shape == (1, 100, 150, 3)

    # groups code at fixed bucket sizes (full batch_tiles, remainder at
    # the smallest of <=3 pre-sized buckets that fits — tiled._group_sizes);
    # the codec's reference output is the per-tile fake-quant forward
    tiles = tiled._pad_tiles(tiled.tile_image(img, 64), 4)
    fwd = [np.asarray(model.forward(params, jnp.asarray(tiles[lo:lo + 4])
                                    )["x_hat"])
           for lo in (0, 4)]
    want = tiled.untile_image(np.clip(np.concatenate(fwd)[:6], 0, 1),
                              th, tw, 100, 150)
    assert np.max(np.abs(rec - want)) < 1e-4


def _tiny_ar_setup():
    from rdoptq_tpu.models.minnen2018 import Minnen2018

    model = Minnen2018(N=8, M=8)
    params = dict(model.init(jax.random.PRNGKey(0)))
    params["eb"] = E.fit_quantiles(params["eb"])
    tables = codec.build_codec_tables(params["eb"])
    return model, params, tables


def test_batched_ar_roundtrip():
    """Batched wavefront coding: decode must reproduce exactly the
    synthesis of the encoder's own y_hat (the vmapped encode-scan and
    the vmapped per-wave decode must agree bitwise on every symbol)."""
    from rdoptq_tpu.coding import ar

    model, params, tables = _tiny_ar_setup()
    x = jax.random.uniform(jax.random.PRNGKey(9), (3, 64, 64, 3))
    enc = ar.ar_compress_batched(model, params, x, tables)
    rec = ar.ar_decompress_batched(model, params, enc["strings"],
                                   enc["shape"], enc["y_shape"], tables,
                                   batch=3)
    want = np.clip(np.asarray(
        ar._synthesis_fn(model)(params, enc["y_hat"])), 0, 1)
    np.testing.assert_array_equal(rec, want)

    # cross-check against the known-good SERIAL codec: the vmapped
    # encode must produce (up to knife-edge rounding under a different
    # compiled program) the same quantized latents per image
    y, z = ar._analysis_fn(model)(params, x)
    med = jnp.asarray(tables.medians, jnp.float32).reshape(1, 1, 1, -1)
    from rdoptq_tpu.coding.codec import factorized_round
    _, z_hat = factorized_round(z, med)
    hyper = ar._hyper_fn(model)(params, z_hat)
    fns = ar._wave_fns(model, 4, 4)
    y_hat_serial, _, _ = fns["encode_scan"](params, y[1], hyper[1])
    agree = np.mean(np.asarray(enc["y_hat"][1]) ==
                    np.asarray(y_hat_serial))
    assert agree > 0.99, agree


def test_tiled_ar_roundtrip():
    """AR (wavefront) tiled path: the whole grid codes as one batched
    group; decode must equal the synthesis of the encoder's y_hat."""
    from rdoptq_tpu.coding import ar

    model, params, tables = _tiny_ar_setup()
    rng = np.random.default_rng(4)
    img = rng.random((1, 70, 120, 3)).astype(np.float32)

    out = tiled.tiled_compress(model, params, img, tables, "Minnen2018",
                               tile=64, batch_tiles=4)
    th, tw = out["grid"]
    assert (th, tw) == (2, 2)
    rec = tiled.tiled_decompress(model, params, out["strings"], 64,
                                 (th, tw), out["zy_shape"], (70, 120),
                                 tables, "Minnen2018", batch_tiles=4)
    assert rec.shape == (1, 70, 120, 3)

    tiles = tiled._pad_tiles(tiled.tile_image(img, 64), 4)
    enc = ar.ar_compress_batched(model, params, jnp.asarray(tiles),
                                 tables)
    xs = np.clip(np.asarray(
        ar._synthesis_fn(model)(params, enc["y_hat"])), 0, 1)
    want = tiled.untile_image(xs, th, tw, 70, 120)
    np.testing.assert_array_equal(rec, want)


def test_cli_tiled_roundtrip(tmp_path, monkeypatch):
    from PIL import Image
    from rdoptq_tpu.cli import codec as ccli
    from rdoptq_tpu.eval import datasets
    from rdoptq_tpu.models import registry

    monkeypatch.setattr(
        registry, "build_model",
        lambda arch, q, lam=None: T.TinyLIC(N=16, M=24, slices=(8, 16),
                                            depths=(1, 1, 1, 1, 1, 1)))
    src = sorted(os.listdir(datasets.DEFAULT_KODAK))[0]
    img = Image.open(os.path.join(datasets.DEFAULT_KODAK, src)).crop(
        (0, 0, 150, 100))
    src_path = str(tmp_path / "in.png")
    img.save(src_path)

    bs_path = str(tmp_path / "out.rdoq")
    rec_path = str(tmp_path / "rec.png")
    enc = ccli.encode(src_path, bs_path, arch="TinyLIC", tile=64,
                      batch_tiles=4)
    assert enc["bytes"] > 17 and np.isfinite(enc["bpp"])
    dec = ccli.decode(bs_path, rec_path)  # tiled framing auto-detected
    assert dec["size"] == (100, 150)
    rec = np.asarray(Image.open(rec_path))
    assert rec.shape == (100, 150, 3)


def test_target_bpp_rate_control(tmp_path, monkeypatch):
    """--target_bpp picks the highest quality whose estimated rate fits
    (a generous target -> top of the λ grid; an impossible target -> q1 +
    encode still proceeds), and the chosen quality rides the header so
    decode rebuilds the same lambda."""
    from rdoptq_tpu.utils.config import LAMBDAS_MSE
    q_top = len(LAMBDAS_MSE)
    import os

    from PIL import Image
    from rdoptq_tpu.cli import codec as ccli
    from rdoptq_tpu.eval import datasets
    from rdoptq_tpu.models import registry

    monkeypatch.setattr(
        registry, "build_model",
        lambda arch, q, lam=None: T.TinyLIC(N=16, M=24, slices=(8, 16),
                                            depths=(1, 1, 1, 1, 1, 1)))
    src = sorted(os.listdir(datasets.DEFAULT_KODAK))[0]
    img = Image.open(os.path.join(datasets.DEFAULT_KODAK, src)).crop(
        (0, 0, 64, 64))
    src_path = str(tmp_path / "in.png")
    img.save(src_path)

    assert ccli.pick_quality_for_bpp(1e9, src_path) == q_top
    assert ccli.pick_quality_for_bpp(1e-9, src_path) == 1

    bs = str(tmp_path / "o.rdoq")
    enc = ccli.encode(src_path, bs, arch="TinyLIC", target_bpp=1e9)
    assert enc["quality"] == q_top
    dec = ccli.decode(bs, str(tmp_path / "r.png"))
    assert dec["size"] == (64, 64)

    with pytest.raises(ValueError):
        ccli.encode(src_path, bs, arch="Minnen2018", target_bpp=1.0)
