"""Serving benchmark on the real TPU: true-INT8 MXU path vs FP32/BF16.

The reference's INT8 TinyLIC is *slower* than its FP32 model (encode
0.375 s vs 0.323 s on a 2K image, light-uniform-PTQ/single_test.ipynb
cells 6/15) because it stores uint8 weights but dequantizes on the fly
and convolves in float. Here int8 kernels execute on the MXU
(quant/serve_int8.py), so the INT8 path should be the *fastest*.

Measures, steady-state (post-compile), on a Kodak-size 768x512 input:
  1. full eval forward wall-clock: fp32 / bf16-cast / int8-serving
  2. TinyLIC real-codec encode+decode wall-clock: fp32 vs int8-serving

Writes artifacts/serving_bench.json and prints a summary table.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rdoptq_tpu.coding import codec
from rdoptq_tpu.eval import datasets
from rdoptq_tpu.models import registry
from rdoptq_tpu.ops import entropy as E
from rdoptq_tpu.quant import light, serve_int8

REPS = 20


def make_scan_fwd(model, k: int):
    """One jitted program that runs the forward k times and returns a
    scalar. Per-call wall-clock over the remote-compile tunnel
    under-reports badly (async dispatch, ~10-50 ms RTT — see CLAUDE.md),
    so the k-fold loop runs ON DEVICE and we fetch one f32. The input is
    perturbed by the carry so XLA cannot hoist the loop-invariant forward
    out of the scan."""

    @jax.jit
    def f(p, v):
        def body(c, _):
            # the perturbation must stay in v.dtype: bf16 + f32-carry
            # would promote the input to f32 and silently time the FP32
            # path for the "bf16" rows
            out = model.forward(p, v + (c * 1e-20).astype(v.dtype))["x_hat"]
            return jnp.mean(out.astype(jnp.float32)), None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return s

    return f


def timed(fn, *args):
    """Seconds per forward: warm-up (compile), then one timed k-fold
    device program + scalar fetch."""
    float(fn(*args))
    t0 = time.time()
    float(fn(*args))
    return (time.time() - t0) / REPS


def forward_bench(arch: str, quality: int, x) -> dict:
    model = registry.build_model(arch, quality)
    params = jax.device_put(model.init(jax.random.PRNGKey(0)))
    fwd = make_scan_fwd(model, REPS)
    res = {"fp32_s": timed(fwd, params, x)}

    try:
        p_bf16 = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, params)
        res["bf16_s"] = timed(fwd, p_bf16, x.astype(jnp.bfloat16))
    except TypeError as e:  # mixed-dtype model (e.g. TinyLIC ScalingNet)
        res["bf16_s"] = None
        res["bf16_note"] = str(e).splitlines()[0]

    p_int8 = serve_int8.int8_serving_params(params)
    res["int8_s"] = timed(fwd, p_int8, x)
    res["int8_speedup_vs_fp32"] = res["fp32_s"] / res["int8_s"]

    # static calibrated act scales baked into the int8 nodes: no dynamic
    # abs-max HBM pass per conv (the reason dynamic int8 ran 0.84x f32)
    scales = serve_int8.calibrate_act_scales(model, params, [x])
    p_int8s = serve_int8.int8_serving_params(params, act_scales=scales)
    res["int8_static_s"] = timed(fwd, p_int8s, x)
    res["int8_static_speedup_vs_fp32"] = (res["fp32_s"]
                                          / res["int8_static_s"])

    # + polyphase-GEMM routing for the stride-2 int8 convs
    from rdoptq_tpu.ops import phase_conv
    phase_conv.PHASE_CONV_DEFAULT = True
    try:
        fwd_ph = make_scan_fwd(model, REPS)
        res["int8_static_phase_s"] = timed(fwd_ph, p_int8s, x)
        res["int8_static_phase_speedup_vs_fp32"] = (
            res["fp32_s"] / res["int8_static_phase_s"])
    finally:
        phase_conv.PHASE_CONV_DEFAULT = False

    # fused Pallas GDN (single HBM pass: square + channel dot + rsqrt in
    # one VMEM residency) — only meaningful for the GDN models
    if arch in ("Minnen2018", "Cheng2020"):
        from rdoptq_tpu.ops import pallas_gdn
        pallas_gdn.PALLAS_GDN_DEFAULT = True
        try:
            fwd_pg = make_scan_fwd(model, REPS)
            res["pallas_gdn_s"] = timed(fwd_pg, params, x)
            res["pallas_gdn_speedup_vs_fp32"] = (res["fp32_s"]
                                                 / res["pallas_gdn_s"])
        finally:
            pallas_gdn.PALLAS_GDN_DEFAULT = False

    # W8 storage -> bf16 compute: int8 artifact dequantized ONCE at load
    # (not per forward), tree-cast to bf16 — 4x smaller artifact at bf16
    # speed (quant/light.dequantized_params + cast_params)
    try:
        from rdoptq_tpu.quant import light
        lq = light.quantize_model(params, light.LightConfig(
            n_bits=8, channel_wise=True, scale_method="max"))
        p_w8bf16 = light.cast_params(light.dequantized_params(lq),
                                     jnp.bfloat16)
        res["w8_bf16_s"] = timed(fwd, p_w8bf16, x.astype(jnp.bfloat16))
    except TypeError as e:
        res["w8_bf16_s"] = None
        res["w8_bf16_note"] = str(e).splitlines()[0]
    return res


def conv_microbench() -> dict:
    """Single 5x5 C=192 conv at 384x256 in f32/bf16/int8 — isolates how
    XLA lowers each dtype to the v5e MXU (scanned on device, REPS times)."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 384, 256, 192), jnp.float32)
    w = jax.random.normal(key, (5, 5, 192, 192), jnp.float32) * 0.05

    def scan_conv(xv, wv, pet):
        h = xv.shape[1]

        @jax.jit
        def f(xx, ww):
            # pad along H and slice at a per-iteration offset so the conv
            # is NOT loop-invariant (XLA would hoist it out of the scan)
            xpad = jnp.concatenate([xx, xx[:, :REPS]], axis=1)

            def body(c, t):
                xs = jax.lax.dynamic_slice_in_dim(xpad, t, h, axis=1)
                out = jax.lax.conv_general_dilated(
                    xs, ww, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=pet)
                return c + out.astype(jnp.float32).mean(), None
            s, _ = jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(REPS))
            return s
        return timed(f, xv, wv)

    res = {"f32_s": scan_conv(x, w, jnp.float32),
           "bf16_s": scan_conv(x.astype(jnp.bfloat16),
                               w.astype(jnp.bfloat16), jnp.bfloat16)}
    xi = jnp.clip(jnp.round(x * 4), -127, 127).astype(jnp.int8)
    wi = jnp.clip(jnp.round(w * 127), -127, 127).astype(jnp.int8)
    res["int8_s"] = scan_conv(xi, wi, jnp.int32)

    # polyphase-GEMM int8 path (ops/phase_conv.py): 25 MXU matmuls
    # instead of XLA's strided-window conv lowering (~1% peak)
    from rdoptq_tpu.ops import phase_conv

    def scan_phase(xv, wv):
        h = xv.shape[1]

        @jax.jit
        def f(xx, ww):
            xpad = jnp.concatenate([xx, xx[:, :REPS]], axis=1)

            def body(c, t):
                xs = jax.lax.dynamic_slice_in_dim(xpad, t, h, axis=1)
                out = phase_conv.phase_conv2d(ww, xs,
                                              acc_dtype=jnp.int32)
                return c + out.astype(jnp.float32).mean(), None
            s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REPS))
            return s
        return timed(f, xv, wv)

    res["int8_phase_s"] = scan_phase(xi, wi)
    res["int8_phase_speedup_vs_int8"] = (res["int8_s"]
                                         / res["int8_phase_s"])

    # fused Pallas kernel: DMA'd halo slabs + 25 MXU dots + dequant in
    # one VMEM residency (ops/pallas_phase_conv.py)
    from rdoptq_tpu.ops import pallas_phase_conv

    def scan_pallas(xv, wv):
        h = xv.shape[1]
        node = {"w_int8": wv,
                "s_w": jnp.ones((wv.shape[-1],), jnp.float32)}

        @jax.jit
        def f(xx, ww):
            node_j = dict(node, w_int8=ww)
            xpad = jnp.concatenate([xx, xx[:, :REPS]], axis=1)

            def body(c, t):
                xs = jax.lax.dynamic_slice_in_dim(xpad, t, h, axis=1)
                out = pallas_phase_conv.pallas_phase_conv2d_int8(
                    node_j, xs, jnp.float32(1.0))
                return c + out.mean(), None
            s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REPS))
            return s
        return timed(f, xv, wv)

    try:
        res["int8_pallas_s"] = scan_pallas(xi, wi)
        res["int8_pallas_speedup_vs_int8"] = (res["int8_s"]
                                              / res["int8_pallas_s"])
    except Exception as e:  # keep the bench alive if Mosaic rejects it
        res["int8_pallas_s"] = None
        res["int8_pallas_note"] = str(e).splitlines()[0][:200]

    # transposed conv (decoder half): input-dilated int8 lowering vs 4
    # dense stride-1 phase convs (same MAC count, no structural zeros)
    xt = xi[:, :192, :128, :]

    def scan_tconv(fn):
        h = xt.shape[1]

        @jax.jit
        def f(xx, ww):
            xpad = jnp.concatenate([xx, xx[:, :REPS]], axis=1)

            def body(c, t):
                xs = jax.lax.dynamic_slice_in_dim(xpad, t, h, axis=1)
                return c + fn(xs, ww).astype(jnp.float32).mean(), None
            s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REPS))
            return s
        return timed(f, xt, wi)

    def dilated(xs, ww):
        return jax.lax.conv_general_dilated(
            xs, ww, (1, 1), ((2, 3), (2, 3)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    from rdoptq_tpu.ops import phase_conv as pc
    res["tconv_int8_s"] = scan_tconv(dilated)
    res["tconv_int8_phase_s"] = scan_tconv(
        lambda xs, ww: pc.phase_tconv2d(ww, xs, acc_dtype=jnp.int32))
    res["tconv_phase_speedup"] = (res["tconv_int8_s"]
                                  / res["tconv_int8_phase_s"])
    return res


def codec_bench(image_path: str, tags: tuple = ("fp32", "bf16", "int8"),
                ) -> dict:
    """TinyLIC real-codec enc/dec wall-clock, fp32 vs int8-serving
    (mirrors the reference's single_test.py timing protocol: wall-clock
    around compress()/decompress() including the host rANS). ``tags``
    selects the param sets — each dtype is a distinct set of 2K XLA
    programs (minutes per cold remote compile), so big-image calls trim
    to the serving path."""
    model, params, tables = _tinylic_codec_setup()

    img = datasets.load_image(image_path)
    h, w = img.shape[1], img.shape[2]
    ph, pw = -(-h // 64) * 64 - h, -(-w // 64) * 64 - w
    x = jnp.pad(jnp.asarray(img), ((0, 0), (0, ph), (0, pw), (0, 0)))

    _mk = {"fp32": lambda: params,
           "bf16": lambda: dict(light.cast_params(params)),
           "int8": lambda: dict(serve_int8.int8_serving_params(params))}
    out = {}
    for tag, p in ((t, _mk[t]()) for t in tags):
        enc = codec.tinylic_compress(model, p, x, tables)  # compile warm-up
        t0 = time.time()
        for _ in range(3):
            enc = codec.tinylic_compress(model, p, x, tables)
        enc_s = (time.time() - t0) / 3
        rec = codec.tinylic_decompress(model, p, enc["strings"],
                                       enc["shape"], tables)
        t0 = time.time()
        for _ in range(3):
            rec = codec.tinylic_decompress(model, p, enc["strings"],
                                           enc["shape"], tables)
        dec_s = (time.time() - t0) / 3
        # 8-bit-output decode: device-side quantize, 4x smaller fetch
        codec.tinylic_decompress(model, p, enc["strings"], enc["shape"],
                                 tables, out="u8")
        t0 = time.time()
        for _ in range(3):
            rec_u8 = codec.tinylic_decompress(model, p, enc["strings"],
                                              enc["shape"], tables,
                                              out="u8")
        dec_u8_s = (time.time() - t0) / 3
        bits = sum(len(s) for s in enc["strings"]) * 8
        # only report timings for a DECODABLE stream: if enc/dec entropy
        # parameters ever diverged, the bitstream would decode to garbage
        # while the stopwatch stayed healthy. The decoded image must match
        # the same params' fake-quant forward reconstruction (the codec's
        # reference output), regardless of how well the model compresses.
        x_fwd = np.clip(np.asarray(
            jax.jit(lambda pp, v: model.forward(pp, v)["x_hat"])(p, x)),
            0.0, 1.0)
        mse = float(np.mean((np.clip(rec, 0, 1) - x_fwd) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr > 30.0, (
            f"{tag}: decoded stream diverges from the forward-path "
            f"reconstruction (psnr {psnr:.2f} dB) — enc/dec "
            f"entropy-parameter mismatch?")
        # RD point vs the SOURCE image (the guard psnr above is codec-vs-
        # forward agreement, not quality): unpadded crop, 8-bit output
        mse_src = float(np.mean(
            (rec_u8[:, :h, :w].astype(np.float32) / 255.0
             - np.asarray(img)[:, :h, :w]) ** 2))
        out[tag] = {"enc_s": round(enc_s, 4), "dec_s": round(dec_s, 4),
                    "dec_u8_s": round(dec_u8_s, 4),
                    "bpp": round(bits / (h * w), 4),
                    "psnr_db": round(psnr, 2),
                    "psnr_vs_src_db": round(
                        10 * np.log10(1.0 / max(mse_src, 1e-12)), 2)}
    return out


import functools


TINYLIC_CKPT = os.environ.get("TINYLIC_CKPT", "ckpts/tinylic_vr.npz")
CODEC_PARAMS_SOURCE = "random-init"


@functools.lru_cache(maxsize=1)
def _tinylic_codec_setup():
    """Shared (cached) model/params/tables for the codec benches — the
    param init + quantile fit + CDF build is host work worth paying
    once (keep the single host core free while TPU passes run).

    Loads the trained variable-rate anchor when present (VERDICT r2
    Weak #4: random-init codec rows are round-trip checks, not RD
    points comparable to BASELINE.md)."""
    global CODEC_PARAMS_SOURCE
    model = registry.build_model("TinyLIC", 6)
    if os.path.exists(TINYLIC_CKPT):
        params = dict(jax.device_put(
            registry.load_params(model, "TinyLIC", TINYLIC_CKPT)))
        CODEC_PARAMS_SOURCE = TINYLIC_CKPT
    else:
        params = dict(jax.device_put(model.init(jax.random.PRNGKey(0))))
        print(f"NOTE: {TINYLIC_CKPT} missing; codec rows use random "
              "params (round-trip timing only, bpp/psnr not RD points)")
    params["eb"] = E.fit_quantiles(params["eb"])
    tables = codec.build_codec_tables(params["eb"])
    return model, params, tables


def tiled_codec_bench(image_path: str, tile: int = 512,
                      batch_tiles: int = 12) -> dict:
    """Tiled (coding/tiled.py) TinyLIC enc/dec on the same 2K image: the
    tile grid rides the batch axis, so compile cost amortizes across ALL
    input resolutions (one bucket ever) while wall-clock should stay in
    the same class as the single whole-image program."""
    from rdoptq_tpu.coding import tiled

    model, params, tables = _tinylic_codec_setup()

    img = np.asarray(datasets.load_image(image_path))
    h, w = img.shape[1], img.shape[2]

    enc = tiled.tiled_compress(model, params, img, tables, "TinyLIC",
                               tile, batch_tiles)  # compile warm-up
    t0 = time.time()
    for _ in range(3):
        enc = tiled.tiled_compress(model, params, img, tables, "TinyLIC",
                                   tile, batch_tiles)
    enc_s = (time.time() - t0) / 3
    rec = tiled.tiled_decompress(model, params, enc["strings"], tile,
                                 enc["grid"], enc["zy_shape"], (h, w),
                                 tables, "TinyLIC", batch_tiles)
    t0 = time.time()
    for _ in range(3):
        rec = tiled.tiled_decompress(model, params, enc["strings"], tile,
                                     enc["grid"], enc["zy_shape"], (h, w),
                                     tables, "TinyLIC", batch_tiles)
    dec_s = (time.time() - t0) / 3
    bits = sum(len(s) for s in enc["strings"]) * 8
    # decodability guard: tiled decode must match the fake-quant forward
    # of the tile batch (knife-edge-free tolerance)
    tiles = tiled.tile_image(img, tile)
    fwd = np.clip(np.asarray(jax.jit(
        lambda pp, v: model.forward(pp, v)["x_hat"])(
            params, jnp.asarray(tiles))), 0, 1)
    want = tiled.untile_image(fwd, *enc["grid"], h, w)
    mse = float(np.mean((np.asarray(rec) - want) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 30.0, f"tiled decode diverges ({psnr:.2f} dB)"
    return {"tile": tile, "grid": list(enc["grid"]),
            "enc_s": round(enc_s, 4), "dec_s": round(dec_s, 4),
            "bpp": round(bits / (h * w), 4), "psnr_db": round(psnr, 2)}


def main():
    x = jnp.asarray(np.random.default_rng(0).random((1, 768, 512, 3),
                                                    np.float32))
    x = jax.device_put(x)
    results = {
        "input": "768x512", "reps": REPS, "forward": {},
        # reconciled with codec_breakdown.json / wide_decode_profile.json:
        # codec rows are warm per-call WALLS over the remote-device
        # tunnel (host rANS + per-pass dispatches + fetches included) —
        # the host-codec path pays 10 fetches per decode, so its dec
        # wall sits far above the wide codec's single-dispatch wall and
        # the device-only compute floor; see those artifacts for splits
        "timing_protocol": "warm wall-clock incl. tunnel transfers; "
                           "forward rows are k-fold on-device scans",
    }
    print("== conv microbench (5x5 C=192 @ 384x256)")
    results["conv_microbench"] = conv_microbench()
    print(json.dumps(results["conv_microbench"], indent=2))
    for arch, q in (("Minnen2018", 6), ("TinyLIC", 6)):
        print(f"== forward bench {arch} q{q}")
        results["forward"][arch] = forward_bench(arch, q, x)
        print(json.dumps(results["forward"][arch], indent=2))

    kodim = os.path.join(datasets.DEFAULT_KODAK, "kodim01.png")
    if os.path.exists(kodim):
        print("== codec bench TinyLIC (kodim01)")
        results["codec_tinylic"] = codec_bench(kodim)
        print(json.dumps(results["codec_tinylic"], indent=2))
    results["codec_params_source"] = CODEC_PARAMS_SOURCE

    # 2K image: the size class of the reference's headline codec timings
    # (single_test.ipynb cells 6/15: 0.323 s enc / 0.294 s dec FP32 on a
    # CUDA GPU)
    clic2k = ("/root/reference/task-oriented-PTQ/datasets/clic41/002.png")
    if os.path.exists(clic2k):
        # bf16 only at 2K: fp32/int8 2K walls live in codec_breakdown.json
        # (same protocol), and each extra dtype is another family of
        # multi-minute cold 2K remote compiles (the round-5 refresh hit
        # its 50-min clamp compiling all three)
        print("== codec bench TinyLIC (CLIC 2048x1339)")
        results["codec_tinylic_2k"] = codec_bench(clic2k, tags=("bf16",))
        print(json.dumps(results["codec_tinylic_2k"], indent=2))
        print("== tiled codec bench TinyLIC (CLIC 2K, 512px tiles)")
        try:
            results["codec_tinylic_2k_tiled"] = tiled_codec_bench(
                clic2k, tile=512, batch_tiles=12)
            print(json.dumps(results["codec_tinylic_2k_tiled"], indent=2))
        except Exception as e:  # keep the rest of the bench alive
            results["codec_tinylic_2k_tiled"] = {"error": str(e)}
            print("tiled bench failed:", e)

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/serving_bench.json.tmp", "w") as f:
        json.dump(results, f, indent=2)
    os.replace("artifacts/serving_bench.json.tmp",
               "artifacts/serving_bench.json")
    print("wrote artifacts/serving_bench.json")


if __name__ == "__main__":
    main()
