"""Wavefront autoregressive codec tests (Minnen2018 family)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdoptq_tpu.coding import ar, codec
from rdoptq_tpu.models import layers as L
from rdoptq_tpu.models.minnen2018 import Minnen2018
from rdoptq_tpu.ops import entropy as E


def test_wavefront_schedule_covers_all_pixels_respecting_deps():
    h, w = 6, 9
    pixels, counts = ar.wavefront_schedule(h, w)
    seen = set()
    order = {}
    step = 0
    for t in range(pixels.shape[0]):
        for p in range(int(counts[t])):
            i, j = map(int, pixels[t, p])
            seen.add((i, j))
            order[(i, j)] = t
            step += 1
    assert len(seen) == h * w
    # causal dependencies: (i, j-1) and (i-1, j+2) must come earlier
    for (i, j), t in order.items():
        if j > 0:
            assert order[(i, j - 1)] < t
        if i > 0 and j + 2 < w:
            assert order[(i - 1, j + 2)] < t


@pytest.fixture(scope="module")
def tiny_ar():
    model = Minnen2018(N=8, M=8)
    params = model.init(jax.random.PRNGKey(0))
    params["eb"] = E.fit_quantiles(params["eb"])
    tables = codec.build_codec_tables(params["eb"])
    return model, params, tables


def test_wave_params_match_full_context_conv(tiny_ar):
    """The per-wave gathered context must equal the full masked conv + EP
    network evaluated at the wave's pixels."""
    model, params, _ = tiny_ar
    h, w, M = 6, 6, model.M
    fns = ar._wave_fns(model, h, w)
    key = jax.random.PRNGKey(1)
    y_hat = jax.random.normal(key, (h, w, M))
    hyper = jax.random.normal(jax.random.PRNGKey(2), (h, w, 2 * M))

    # full parallel path
    mask = L.causal_mask(5, M, 2 * M)
    ctx_p = L.masked_conv2d(params["context"], y_hat[None], mask)[0]
    feats = jnp.concatenate([hyper, ctx_p], axis=-1)
    gp_full = model.ep.run(params, feats[None])[0]
    scales_full, means_full = jnp.split(gp_full, 2, axis=-1)

    y_hat_pad = jnp.pad(y_hat, ((2, 2), (2, 2), (0, 0)))
    pixels, counts = fns["pixels"], fns["counts"]
    for t in [0, 3, pixels.shape[0] - 1]:
        n = int(counts[t])
        if n == 0:
            continue
        scales, means = fns["wave_params"](params, y_hat_pad, hyper,
                                           jnp.int32(t))
        for p in range(n):
            i, j = map(int, pixels[t, p])
            assert np.allclose(np.asarray(scales)[p],
                               np.asarray(scales_full)[i, j], atol=2e-5)
            assert np.allclose(np.asarray(means)[p],
                               np.asarray(means_full)[i, j], atol=2e-5)


def test_ar_roundtrip(tiny_ar):
    model, params, tables = tiny_ar
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    out = ar.ar_compress(model, params, x, tables)
    assert len(out["strings"]) == 2
    x_hat = ar.ar_decompress(model, params, out["strings"], out["shape"],
                             out["y_shape"], tables)
    assert x_hat.shape == (1, 64, 64, 3)
    # decode must reproduce the encoder's reconstruction path bit-exactly;
    # cross-check against the fake-quant forward (y_hat = round(y) there vs
    # round(y - mu) + mu here, so compare via the synthesis of the encoder
    # buffer instead)
    y = jax.jit(model.g_a.run)(params, jnp.asarray(x))
    h, w = int(y.shape[1]), int(y.shape[2])
    z = jax.jit(model.h_a.run)(params, y)
    z_string = out["strings"][1]
    z_hat = jnp.asarray(codec.decompress_factorized(
        tables, z_string, out["shape"]))
    hyper = ar._hyper_fn(model)(params, z_hat)
    fns = ar._wave_fns(model, h, w)
    buf, syms, scales = fns["encode_scan"](params, y[0], hyper[0])
    x_ref = np.clip(np.asarray(
        ar._synthesis_fn(model)(params, buf[None])), 0, 1)
    assert np.allclose(x_hat, x_ref, atol=1e-5)


def test_ar_roundtrip_lu2022_tiny():
    """The wavefront codec is model-generic: Lu2022's transformer coders
    drive the same context/EP machinery."""
    from rdoptq_tpu.models.lu2022 import Lu2022
    model = Lu2022(embed_dim=16, latent_dim=16, window_size=4)
    params = model.init(jax.random.PRNGKey(5))
    params["eb"] = E.fit_quantiles(params["eb"])
    tables = codec.build_codec_tables(params["eb"])
    x = jax.random.uniform(jax.random.PRNGKey(6), (1, 128, 128, 3))
    out = ar.ar_compress(model, params, x, tables)
    x_hat = ar.ar_decompress(model, params, out["strings"], out["shape"],
                             out["y_shape"], tables)
    assert x_hat.shape == (1, 128, 128, 3)
    assert np.isfinite(x_hat).all()
    # decode must reproduce the encoder's reconstruction bit-exactly on
    # the transformer context/EP chain too (reference nic_cvt.py:426-570
    # is the serial path this wavefront codec replaces)
    y = jax.jit(model.g_a.run)(params, jnp.asarray(x))
    h, w = int(y.shape[1]), int(y.shape[2])
    z_hat = jnp.asarray(codec.decompress_factorized(
        tables, out["strings"][1], out["shape"]))
    hyper = ar._hyper_fn(model)(params, z_hat)
    fns = ar._wave_fns(model, h, w)
    buf, syms, scales = fns["encode_scan"](params, y[0], hyper[0])
    x_ref = np.clip(np.asarray(
        ar._synthesis_fn(model)(params, buf[None])), 0, 1)
    assert np.allclose(x_hat, x_ref, atol=1e-5)


def test_ar_roundtrip_cheng_attn_tiny():
    """Attention-variant transforms ride the same causal-context codec
    (reference quantizes Cheng2020 with attention, cheng2020_attn.py)."""
    from rdoptq_tpu.models.cheng2020 import Cheng2020
    model = Cheng2020(N=16, attention=True)
    params = model.init(jax.random.PRNGKey(7))
    params["eb"] = E.fit_quantiles(params["eb"])
    tables = codec.build_codec_tables(params["eb"])
    x = jax.random.uniform(jax.random.PRNGKey(8), (1, 64, 64, 3))
    out = ar.ar_compress(model, params, x, tables)
    x_hat = ar.ar_decompress(model, params, out["strings"], out["shape"],
                             out["y_shape"], tables)
    # decode must reproduce the ENCODER-side reconstruction bit-exactly
    # (the codec's mean-centered rounding differs from the eval forward's
    # round(y) by design, as in the reference)
    y = jax.jit(model.g_a.run)(params, jnp.asarray(x))
    h, w = int(y.shape[1]), int(y.shape[2])
    z_hat = jnp.asarray(codec.decompress_factorized(
        tables, out["strings"][1], out["shape"]))
    hyper = ar._hyper_fn(model)(params, z_hat)
    fns = ar._wave_fns(model, h, w)
    buf, _, _ = fns["encode_scan"](params, y[0], hyper[0])
    x_ref = np.clip(np.asarray(
        ar._synthesis_fn(model)(params, buf[None])), 0, 1)
    assert np.max(np.abs(x_hat - x_ref)) < 1e-5
