"""Three-way breakdown of TinyLIC real-codec wall-clock on the TPU:
device compute vs tunnel round trips vs host rANS (VERDICT r2 Next #2).

The reference times 0.323 s enc / 0.294 s dec on a 2K image on a local
CUDA GPU (light-uniform-PTQ/single_test.ipynb cells 6/15). Our chip sits
behind a remote tunnel with ~10-50 ms per dispatch/fetch, so raw
wall-clock conflates three very different costs. This script attributes
them without touching the codec:

* ``host_rans_s``   — time inside rans.encode_with_indexes /
                      RansDecoderStream.decode (pure host C++).
* ``fetch_wall_s``  — time blocked in jax.device_get. Because the codec
                      dispatches its device chain asynchronously, a fetch
                      blocks for (queued device compute + transfer + RTT).
* ``rtt_s``         — measured separately: device_get of a tiny committed
                      array, so fetch_wall - n_fetches*rtt estimates the
                      true on-device compute + payload transfer.

Writes artifacts/codec_breakdown.json. Uses the trained variable-rate
anchor when ckpts/tinylic_vr.npz exists (same protocol as
scripts/bench_serving.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from rdoptq_tpu.coding import codec, rans
from rdoptq_tpu.eval import datasets

import scripts.bench_serving as bs


class _Meter:
    """Accumulates wall time + call count around a patched callable."""

    def __init__(self):
        self.t = 0.0
        self.n = 0

    def wrap(self, fn):
        def inner(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            self.t += time.perf_counter() - t0
            self.n += 1
            return out
        return inner


def measure_rtt(reps: int = 20) -> float:
    """Per-fetch tunnel round-trip: device_get of a 4-byte committed
    array (no queued compute, negligible payload)."""
    x = jnp.float32(1.0) + jnp.float32(0.0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.device_get(x)
    return (time.perf_counter() - t0) / reps


def run_once(model, params, x, tables, out: str = "f32"):
    """One timed enc + dec with meters attached. Returns breakdown rows."""
    fetch, enc_rans, dec_rans = _Meter(), _Meter(), _Meter()

    orig_get = jax.device_get
    orig_enc = rans.encode_with_indexes
    orig_dec = rans.RansDecoderStream.decode
    orig_dwi = rans.decode_with_indexes
    jax.device_get = fetch.wrap(orig_get)
    rans.encode_with_indexes = enc_rans.wrap(orig_enc)
    rans.RansDecoderStream.decode = dec_rans.wrap(orig_dec)
    rans.decode_with_indexes = dec_rans.wrap(orig_dwi)
    try:
        t0 = time.perf_counter()
        enc = codec.tinylic_compress(model, params, x, tables)
        enc_wall = time.perf_counter() - t0
        enc_row = {"wall_s": enc_wall, "host_rans_s": enc_rans.t,
                   "fetch_wall_s": fetch.t, "n_fetches": fetch.n}

        fetch.t, fetch.n = 0.0, 0
        t0 = time.perf_counter()
        codec.tinylic_decompress(model, params, enc["strings"],
                                 enc["shape"], tables, out=out)
        dec_wall = time.perf_counter() - t0
        dec_row = {"wall_s": dec_wall, "host_rans_s": dec_rans.t,
                   "fetch_wall_s": fetch.t, "n_fetches": fetch.n}
    finally:
        jax.device_get = orig_get
        rans.encode_with_indexes = orig_enc
        rans.RansDecoderStream.decode = orig_dec
        rans.decode_with_indexes = orig_dwi
    bits = sum(len(s) for s in enc["strings"]) * 8
    return enc_row, dec_row, bits


def main():
    image = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/task-oriented-PTQ/datasets/clic41/002.png")
    model, params, tables = bs._tinylic_codec_setup()

    img = datasets.load_image(image)
    h, w = img.shape[1], img.shape[2]
    ph, pw = -(-h // 64) * 64 - h, -(-w // 64) * 64 - w
    x = jnp.pad(jnp.asarray(img), ((0, 0), (0, ph), (0, pw), (0, 0)))

    rtt = measure_rtt()
    print(f"tunnel RTT per tiny fetch: {rtt * 1e3:.1f} ms")

    run_once(model, params, x, tables)  # compile warm-up
    rows = {"enc": [], "dec": []}
    for _ in range(3):
        e, d, bits = run_once(model, params, x, tables)
        rows["enc"].append(e)
        rows["dec"].append(d)

    # wide (device-decode) codec: same image, ONE dispatch + fetch per
    # side — the direct head-to-head against the host codec's
    # fetch-bound walls above (coding/wide_codec.py). Decode fetches the
    # device-quantized uint8 image (out="u8": 4x less transfer; the
    # honest 8-bit codec output). A separate f32-fetch timing is kept
    # for continuity with the r2-era rows.
    from rdoptq_tpu.coding import wide_codec

    def wide_rows_for(p):
        wct = wide_codec.build_wide_codec_tables(params["eb"])
        enc_w = wide_codec.wide_compress(model, p, x, wct)  # warm-up
        wide_codec.wide_decompress(model, p, enc_w["strings"],
                                   enc_w["shape"], wct, out="u8")
        rows = {"enc": [], "dec_u8": [], "dec_f32": []}
        rec = None
        for _ in range(3):
            t0 = time.perf_counter()
            enc_w = wide_codec.wide_compress(model, p, x, wct)
            rows["enc"].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            rec = wide_codec.wide_decompress(model, p, enc_w["strings"],
                                             enc_w["shape"], wct,
                                             out="u8")
            rows["dec_u8"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        wide_codec.wide_decompress(model, p, enc_w["strings"],
                                   enc_w["shape"], wct)
        rows["dec_f32"].append(time.perf_counter() - t0)
        bits = len(enc_w["strings"][0]) * 8
        mse = float(np.mean(
            (rec[:, :h, :w].astype(np.float32) / 255.0
             - np.asarray(img)[:, :h, :w]) ** 2))
        return {
            "enc_wall_s": round(float(np.median(rows["enc"])), 4),
            "dec_u8_wall_s": round(float(np.median(rows["dec_u8"])), 4),
            "dec_f32_wall_s": round(rows["dec_f32"][0], 4),
            "bpp": round(bits / (h * w), 4),
            "psnr_src_db": round(
                10 * np.log10(1.0 / max(mse, 1e-12)), 2),
        }

    wide_f32 = wide_rows_for(params)

    # bf16 serving dtype (the reference's FP16 row is the comparable
    # config, single_test.py): params tree-cast, same codec programs
    from rdoptq_tpu.quant import light
    p16 = dict(light.cast_params(params))
    run_once(model, p16, x, tables, out="u8")  # warm-up
    bf16_rows = {"enc": [], "dec": []}
    for _ in range(3):
        e, d, _ = run_once(model, p16, x, tables, out="u8")
        bf16_rows["enc"].append(e)
        bf16_rows["dec"].append(d)
    wide_bf16 = wide_rows_for(p16)

    def summarize(rs):
        med = lambda k: float(np.median([r[k] for r in rs]))
        n = rs[0]["n_fetches"]
        fetch = med("fetch_wall_s")
        out = {
            "wall_s": round(med("wall_s"), 4),
            "host_rans_s": round(med("host_rans_s"), 4),
            "fetch_wall_s": round(fetch, 4),
            "n_fetches": n,
            "rtt_floor_s": round(n * rtt, 4),
            "device_compute_plus_transfer_s": round(
                max(fetch - n * rtt, 0.0), 4),
            "host_other_s": round(
                max(med("wall_s") - med("host_rans_s") - fetch, 0.0), 4),
        }
        return out

    result = {
        "image": image, "size": [h, w],
        "params_source": bs.CODEC_PARAMS_SOURCE,
        "platform": jax.devices()[0].platform,
        "rtt_s": round(rtt, 5),
        "bpp": round(bits / (h * w), 4),
        "enc": summarize(rows["enc"]),
        "dec": summarize(rows["dec"]),
        "wide": wide_f32,
        "bf16": {"enc": summarize(bf16_rows["enc"]),
                 "dec_u8": summarize(bf16_rows["dec"]),
                 "wide": wide_bf16},
        "reference_gpu_2k": {"enc_s": 0.323, "dec_s": 0.294,
                             "source": "single_test.ipynb cells 6/15"},
    }
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/codec_breakdown.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    print("wrote artifacts/codec_breakdown.json")


if __name__ == "__main__":
    main()
