"""Tests for FLOPs accounting, coding-only light quantization, W10 bit
widths, AR codec on Cheng2020, and bitstream framing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdoptq_tpu.coding import ar, bitstream, codec
from rdoptq_tpu.models.cheng2020 import Cheng2020
from rdoptq_tpu.models.minnen2018 import Minnen2018
from rdoptq_tpu.ops import entropy as E
from rdoptq_tpu.ops import quant as Q
from rdoptq_tpu.quant import light, wrap
from rdoptq_tpu.utils import flops


def test_model_flops_reasonable():
    model = Minnen2018(N=16, M=16)
    params = model.init(jax.random.PRNGKey(0))
    out = flops.model_flops(model, params, (1, 64, 64, 3))
    assert out["flops"] > 1e6
    # g_a alone is a subset of the total
    ga = flops.coder_flops(model, params, "g_a", (1, 64, 64, 3))
    assert 0 < ga < out["flops"]


def test_light_coding_only_variant():
    """QuantCodingModel parity: g_a/g_s stay FP32."""
    model = Minnen2018(N=16, M=24)
    params = model.init(jax.random.PRNGKey(1))
    lq = light.quantize_model(
        params, light.LightConfig(skip_subtrees=("g_a", "g_s")))
    assert not any(p.startswith(("g_a/", "g_s/")) for p in lq.int_weights)
    assert any(p.startswith("h_a/") for p in lq.int_weights)
    pq = light.dequantized_params(lq)
    from rdoptq_tpu.models.base import get_leaf
    assert np.allclose(np.asarray(get_leaf(pq, "g_a/conv0/w")),
                       np.asarray(get_leaf(params, "g_a/conv0/w")))


def test_w10_bitwidth_supported():
    """W10A10 (paper table README.md:40) — the quantizer must support
    bit widths beyond 8 (the reference's quantizer asserts <= 8 and
    cannot reproduce its own W10 numbers without modification)."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    qp = Q.init_scale_max(w, n_bits=10)
    wq = Q.fake_quant(w, qp, n_bits=10)
    ints = Q.quantize(w, qp, n_bits=10)
    assert int(ints.max()) <= 1023
    # W10 error strictly below W8 error
    qp8 = Q.init_scale_max(w, n_bits=8)
    err10 = float(jnp.mean((wq - w) ** 2))
    err8 = float(jnp.mean((Q.fake_quant(w, qp8, 8) - w) ** 2))
    assert err10 < err8


def test_ar_codec_on_cheng2020():
    model = Cheng2020(N=8)
    params = model.init(jax.random.PRNGKey(2))
    params["eb"] = E.fit_quantiles(params["eb"])
    tables = codec.build_codec_tables(params["eb"])
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    out = ar.ar_compress(model, params, x, tables)
    x_hat = ar.ar_decompress(model, params, out["strings"], out["shape"],
                             out["y_shape"], tables)
    assert x_hat.shape == (1, 64, 64, 3)
    assert np.isfinite(x_hat).all()


def test_bitstream_file_roundtrip(tmp_path):
    path = str(tmp_path / "img.rdoq")
    strings = [b"hello-rans-stream", b"z" * 33]
    n = bitstream.write_bitstream(path, "TinyLIC", 6, "mse", (512, 768),
                                  strings)
    assert n == 18 + sum(4 + len(s) for s in strings)
    back = bitstream.read_bitstream(path)
    assert back["arch"] == "TinyLIC" and back["size"] == (512, 768)
    assert back["strings"] == strings


def test_bitstream_v1_header_still_parses():
    """Backward compat: v1 files (n_streams u8, header_len 17) written
    before the v2 bump must stay decodable (ADVICE.md round 2)."""
    import struct
    v1 = struct.pack("<4sBBBBIIB", b"RDOQ", 1,
                     bitstream.ARCH_IDS.index("Lu2022"), 5, 0,
                     256, 384, 2)
    head = bitstream.parse_header(v1)
    assert head["arch"] == "Lu2022" and head["quality"] == 5
    assert head["size"] == (256, 384)
    assert head["n_streams"] == 2 and head["header_len"] == 17


def test_tiled_group_sizes_buckets():
    """Remainder groups code at the smallest of <=3 pre-sized buckets
    (ADVICE.md round 2: a 1-real + 15-dummy group coded 15 whole
    latents); compile-bucket count stays bounded."""
    from rdoptq_tpu.coding import tiled
    assert tiled._group_sizes(32, 16) == [16, 16]
    assert tiled._group_sizes(33, 16) == [16, 16, 4]   # rem 1 -> bucket 4
    assert tiled._group_sizes(38, 16) == [16, 16, 8]   # rem 6 -> bucket 8
    assert tiled._group_sizes(45, 16) == [16, 16, 16]  # rem 13 -> full
    assert tiled._group_sizes(3, 16) == [4]
    # distinct bucket sizes ever used for one batch_tiles config: <= 3
    used = {s for n in range(1, 200) for s in tiled._group_sizes(n, 16)}
    assert used <= {4, 8, 16}
    # padding matches the summed group sizes
    import numpy as np2
    t = np2.zeros((33, 8, 8, 3), np2.float32)
    assert tiled._pad_tiles(t, 16).shape[0] == 36


def test_int8_serving_path_numerics():
    from rdoptq_tpu.models import layers as L
    from rdoptq_tpu.quant import serve_int8
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.normal(size=(5, 5, 8, 16)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.01)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 8)).astype(np.float32))
    # manual symmetric quantization
    s_w = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    w_i = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    s_x = jnp.max(jnp.abs(x)) / 127.0
    x_i = jnp.clip(jnp.round(x / s_x), -127, 127).astype(jnp.int8)
    out_int = L.conv2d({"w_int8": w_i, "s_w": s_w, "b": b}, x, stride=2)
    # reference: conv of the dequantized tensors (int accumulation exact)
    out_ref = L.conv2d({"w": w_i.astype(jnp.float32) * s_w, "b": b},
                       x_i.astype(jnp.float32) * s_x, stride=2)
    assert np.allclose(np.asarray(out_int), np.asarray(out_ref),
                       atol=1e-4, rtol=1e-4)


def test_int8_serving_full_model():
    from rdoptq_tpu.models.minnen2018 import Minnen2018
    from rdoptq_tpu.quant import serve_int8
    model = Minnen2018(N=16, M=24)
    params = model.init(jax.random.PRNGKey(11))
    p8 = serve_int8.int8_serving_params(params)
    from rdoptq_tpu.models.base import get_leaf
    assert get_leaf(p8, "g_a/conv0/w_int8").dtype == jnp.int8
    # masked context conv stays float
    assert "w" in p8["context"] and "w_int8" not in p8["context"]
    x = jax.random.uniform(jax.random.PRNGKey(12), (1, 64, 64, 3))
    out8 = model.forward(p8, x)
    out32 = model.forward(params, x)
    assert np.isfinite(np.asarray(out8["x_hat"])).all()
    # W8A8-class error: outputs stay close to FP32 on a random model
    d = float(jnp.mean(jnp.abs(out8["x_hat"] - out32["x_hat"])))
    assert d < 0.1


def test_int8_serving_static_act_scales():
    """Calibrated static act scales (s_x baked into the node) must match
    the dynamic abs-max path when calibration saw the same tensor, and
    the full model must run with them (no dynamic reduction at serve)."""
    from rdoptq_tpu.models.base import get_leaf
    from rdoptq_tpu.models.minnen2018 import Minnen2018
    from rdoptq_tpu.quant import serve_int8
    model = Minnen2018(N=16, M=24)
    params = model.init(jax.random.PRNGKey(11))
    x = jax.random.uniform(jax.random.PRNGKey(12), (1, 64, 64, 3))
    scales = serve_int8.calibrate_act_scales(model, params, [x])
    assert "g_a/conv0" in scales and scales["g_a/conv0"] > 0
    # first conv's input is the image itself -> abs-max is x's
    assert abs(scales["g_a/conv0"] - float(jnp.abs(x).max())) < 1e-6
    # per-node calibration coverage is recorded (ADVICE.md round 2)
    cov = scales["__coverage__"]
    assert 0.99 <= cov["g_a/conv0"] <= 1.0
    # percentile clipping yields a strictly smaller scale, full headroom
    # multiplies it back up
    s99 = serve_int8.calibrate_act_scales(model, params, [x],
                                          percentile=99.0)
    assert s99["g_a/conv0"] < scales["g_a/conv0"]
    assert s99["__coverage__"]["g_a/conv0"] < 1.0
    s_hr = serve_int8.calibrate_act_scales(model, params, [x],
                                           percentile=99.0, headroom=1.5)
    assert abs(s_hr["g_a/conv0"] - 1.5 * s99["g_a/conv0"]) < 1e-6
    p8s = serve_int8.int8_serving_params(params, act_scales=scales)
    assert float(get_leaf(p8s, "g_a/conv0/s_x")) > 0
    out_s = model.forward(p8s, x)
    assert np.isfinite(np.asarray(out_s["x_hat"])).all()
    # on the calibration image itself, static and dynamic quantization
    # see identical ranges at the first layer and stay close overall
    p8d = serve_int8.int8_serving_params(params)
    out_d = model.forward(p8d, x)
    d = float(jnp.mean(jnp.abs(out_s["x_hat"] - out_d["x_hat"])))
    assert d < 0.05


def test_fold_bn_matches_torch():
    """Conv+BN folding equals torch's conv->batchnorm eval composition."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    from rdoptq_tpu.models import layers as L
    from rdoptq_tpu.quant import fold_bn
    from rdoptq_tpu.utils import torch_convert as tc

    torch.manual_seed(3)
    conv = tnn.Conv2d(4, 6, 3, padding=1)
    bn = tnn.BatchNorm2d(6).eval()
    with torch.no_grad():
        bn.running_mean.normal_(0, 0.5)
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.uniform_(0.5, 1.5)
        bn.bias.normal_(0, 0.2)
    x = torch.randn(1, 4, 8, 8)
    with torch.no_grad():
        want = bn(conv(x)).numpy().transpose(0, 2, 3, 1)

    node = {"w": jnp.asarray(tc.conv_kernel(conv.weight)),
            "b": jnp.asarray(tc._np(conv.bias)),
            "bn": {"mean": jnp.asarray(tc._np(bn.running_mean)),
                   "var": jnp.asarray(tc._np(bn.running_var)),
                   "scale": jnp.asarray(tc._np(bn.weight)),
                   "bias": jnp.asarray(tc._np(bn.bias)),
                   "eps": bn.eps}}
    tree = {"layer": node}
    fused = fold_bn.search_fold_and_remove_bn(tree)
    assert "bn" not in fused["layer"]
    got = np.asarray(L.conv2d(fused["layer"],
                              jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()


def test_flops_coder_vs_total_consistency():
    from rdoptq_tpu.models.minnen2018 import Minnen2018
    from rdoptq_tpu.utils import flops
    model = Minnen2018(N=8, M=8)
    params = model.init(jax.random.PRNGKey(0))
    total = flops.model_flops(model, params, (1, 64, 64, 3))["flops"]
    parts = sum(flops.coder_flops(model, params, c, s)
                for c, s in [("g_a", (1, 64, 64, 3))])
    assert parts < total


def test_bf16_serving_forward():
    """Tree-casting float params to bfloat16 must run end-to-end (layers
    harmonize parameter dtypes with the activation dtype — entropy-model
    internals emit f32 into otherwise-bf16 flows) and stay close to the
    f32 forward."""
    model = Minnen2018(N=8, M=12)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    ref = model.forward(params, x)["x_hat"]
    p16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)
    out = jax.jit(lambda p, v: model.forward(p, v)["x_hat"])(
        p16, x.astype(jnp.bfloat16))
    assert np.asarray(jnp.abs(out.astype(jnp.float32) - ref)).max() < 0.1


def test_tinylic_forward_jittable():
    """Regression: split indices must be static (jnp.cumsum made them
    tracers and TinyLIC.forward failed under jit)."""
    from rdoptq_tpu.models import tinylic as T
    model = T.TinyLIC(N=8, M=12, slices=(4, 8), depths=(1,) * 6)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    out = jax.jit(lambda p, v: model.forward(p, v)["x_hat"])(params, x)
    assert out.shape == x.shape
