"""Profile the wide (device-decode) TinyLIC codec vs scan unroll.

The wide decode's wall-clock at 2K is dominated by the lane-interleaved
rANS `lax.scan` (~6700 serial 512-lane steps across 11 sections);
`coding/wide_rans.decode_wide` takes an ``unroll`` factor to amortize
the per-iteration overhead. Encode and decode share ONE dual-mode
executable (bit-agreement by construction), so every unroll setting
re-encodes with its own program and round-trips before timing.

Also separates decode wall into (device compute) vs (u8 image fetch)
by timing a tiny-fetch variant of the same program.

    python scripts/wide_decode_profile.py [settings] [image]
    # settings = comma list of "unroll" or "unroll:lanes"
    # default "1,8,16,8:2048,16:2048,16:4096"

Writes artifacts/wide_decode_profile.json.
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

from rdoptq_tpu.coding import wide_codec
from rdoptq_tpu.eval import datasets

import scripts.bench_serving as bs


def time_setting(model, params, x, wct, unroll: int, img, h, w,
                 lanes: int = 512) -> dict:
    # lanes/unroll pass as explicit arguments (they are part of
    # _wide_program's lru key), so profiled settings never leak into the
    # process env or stale-hit the program cache
    t0 = time.perf_counter()
    enc = wide_codec.wide_compress(model, params, x, wct, lanes=lanes,
                                   unroll=unroll)  # warm-up+compile
    compile_s = time.perf_counter() - t0
    rec = wide_codec.wide_decompress(model, params, enc["strings"],
                                     enc["shape"], wct, out="u8",
                                     unroll=unroll)
    mse = float(np.mean((rec[:, :h, :w].astype(np.float32) / 255.0
                         - np.asarray(img)[:, :h, :w]) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))

    rows = {"enc": [], "dec_u8": []}
    for _ in range(3):
        t0 = time.perf_counter()
        enc = wide_codec.wide_compress(model, params, x, wct,
                                       lanes=lanes, unroll=unroll)
        rows["enc"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        wide_codec.wide_decompress(model, params, enc["strings"],
                                   enc["shape"], wct, out="u8",
                                   unroll=unroll)
        rows["dec_u8"].append(time.perf_counter() - t0)

    # device-only decode: same program, but fetch ONE pixel instead of
    # the 8 MB u8 image (the tunnel fetch is an environment cost, not
    # TPU time; block_until_ready does not block over this tunnel)
    zh, zw = enc["shape"]
    batch = int(x.shape[0])
    c_z = wct.medians.shape[0]
    n_sections = 1 + 2 * len(model.slices)
    stream, states, exc_pos, exc_val, exc_n = wide_codec.unpack_blob(
        enc["strings"][0], n_sections)
    assert states.size == lanes, (states.size, lanes)
    bucket = wide_codec._total_symbols(model, c_z, zh, zw, batch, lanes)
    exc_k = wide_codec.exc_capacity(bucket)
    run = wide_codec._wide_program(model, zh, zw, batch, lanes, unroll)
    c_y = sum(model.slices)
    # the y_true placeholder's dtype must match the compiled program
    # (same rule as wide_decompress)
    from rdoptq_tpu.coding import codec as host_codec
    args = (params, wct.device(),
            jnp.asarray(wide_codec._padded_stream(stream, bucket, lanes)),
            jnp.asarray(states.astype(np.uint32)),
            jnp.asarray(wide_codec._fit_exc(exc_pos, exc_k)),
            jnp.asarray(wide_codec._fit_exc(exc_val, exc_k)),
            jnp.asarray(exc_n),
            jnp.zeros((batch, zh, zw, c_z), jnp.int32),
            jnp.zeros((batch, zh * 4, zw * 4, c_y),
                      host_codec._float_dtype(params)),
            jnp.bool_(False))
    dev_only = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = run(*args)
        np.asarray(res["x_u8"][0, 0, 0, 0])  # tiny fetch = device barrier
        dev_only.append(time.perf_counter() - t0)

    bits = len(enc["strings"][0]) * 8
    return {"unroll": unroll, "lanes": lanes,
            "compile_plus_first_enc_s": round(compile_s, 2),
            "enc_wall_s": round(float(np.median(rows["enc"])), 4),
            "dec_u8_wall_s": round(float(np.median(rows["dec_u8"])), 4),
            "dec_device_only_s": round(float(np.median(dev_only)), 4),
            "bpp": round(bits / (h * w), 4),
            "psnr_roundtrip_db": round(psnr, 2)}


def main():
    # settings: comma list of "unroll" or "unroll:lanes" (lanes default
    # 512 — the shipped-state rate cost is 4 B/lane, see wide_rans)
    raw = (sys.argv[1] if len(sys.argv) > 1 else
           "1,8,16,8:2048,16:2048,16:4096").split(",")
    settings = [(int(s.split(":")[0]),
                 int(s.split(":")[1]) if ":" in s else 512) for s in raw]
    image = sys.argv[2] if len(sys.argv) > 2 else (
        "/root/reference/task-oriented-PTQ/datasets/clic41/002.png")
    model, params, _ = bs._tinylic_codec_setup()
    from rdoptq_tpu.quant import light
    params = dict(light.cast_params(params))  # bf16 serving dtype

    img = datasets.load_image(image)
    h, w = img.shape[1], img.shape[2]
    ph, pw = -(-h // 64) * 64 - h, -(-w // 64) * 64 - w
    x = jnp.pad(jnp.asarray(img), ((0, 0), (0, ph), (0, pw), (0, 0)))
    wct = wide_codec.build_wide_codec_tables(
        jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if hasattr(a, "dtype") and a.dtype == jnp.bfloat16 else a,
            params["eb"]))

    # resume: settings already measured into the partial survive a
    # timeout/retry (each 2K setting costs minutes of remote compile)
    partial = "artifacts/wide_decode_profile.json.partial"
    final = "artifacts/wide_decode_profile.json"
    out = {"image": image, "size": [h, w], "params": "bf16 serving",
           "platform": jax.devices()[0].platform, "rows": []}
    if os.path.exists(partial):
        prev = json.load(open(partial))
        if prev.get("image") == image:
            out = prev
    done = {(r["unroll"], r["lanes"]) for r in out["rows"]}

    os.makedirs("artifacts", exist_ok=True)
    for u, lanes in settings:
        if (u, lanes) in done:
            continue
        row = time_setting(model, params, x, wct, u, img, h, w,
                           lanes=lanes)
        out["rows"].append(row)
        print(row, flush=True)
        tmp = partial + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f, indent=2)
        os.replace(tmp, partial)

    with open(final, "w") as f:
        json.dump(out, f, indent=2)
    if os.path.exists(partial):
        os.remove(partial)
    print("wrote", final)


if __name__ == "__main__":
    main()
