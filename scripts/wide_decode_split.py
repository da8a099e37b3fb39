"""Split the 2K wide-decode DEVICE time into its three components.

The round-4 profile (artifacts/wide_decode_profile.json) established
that the wide decode's device compute (0.27-0.28 s at 2K) is at parity
with the reference GPU's 0.294 s decode wall and that scan unroll/lane
knobs move it <4%. This script answers the round-5 question "is there a
fusion target left?" by splitting device time with programs that already
exist (no production-code change):

  convs   — the dual-mode program in ENCODE mode: identical h_s +
            slice_cc/sc/ep entropy-parameter convs, no rANS scans, no
            synthesis (wide_codec._wide_program gates g_s off on the
            encode side).
  g_s     — the synthesis transform alone (codec._codec_fns["g_s"]) on a
            y-shaped latent.
  scans   — full decode minus the other two (the 11 serial wide-rANS
            section scans are the only remaining component).

All timings use the 1-px-fetch barrier protocol (block_until_ready does
not block over the axon tunnel); medians of N reps. Appends a
"device_split" block to artifacts/wide_decode_profile.json.

    python scripts/wide_decode_split.py [image] [reps]
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

from rdoptq_tpu.coding import codec as host_codec
from rdoptq_tpu.coding import wide_codec
from rdoptq_tpu.eval import datasets
from rdoptq_tpu.ops import metrics as M
from rdoptq_tpu.quant import light

import scripts.bench_serving as bs

IMG = "/root/reference/task-oriented-PTQ/datasets/clic41/002.png"


def _barrier(arr) -> None:
    np.asarray(arr.reshape(-1)[0])


def _median_time(fn, reps: int) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _barrier(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    img = sys.argv[1] if len(sys.argv) > 1 else IMG
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    model, params, _ = bs._tinylic_codec_setup()
    params = dict(light.cast_params(params))  # bf16 serving dtype
    wct = wide_codec.build_wide_codec_tables(
        jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if hasattr(a, "dtype") and a.dtype == jnp.bfloat16 else a,
            params["eb"]))

    x = jnp.asarray(datasets.load_image(img))
    x, _ = M.pad_to_multiple(x, 64)
    h, w = int(x.shape[1]), int(x.shape[2])
    print(f"image {img} padded to {h}x{w}")

    enc = wide_codec.wide_compress(model, params, x, wct)  # compiles both
    blob, shape = enc["strings"][0], enc["shape"]
    zh, zw = shape
    c_y = sum(model.slices)

    # full decode, device only (1-px barrier)
    dec = lambda: wide_codec._decode_dispatch(
        model, params, [blob], shape, wct, 1, 0)["x_u8"]
    _barrier(dec())  # warm any inflate-program compiles
    t_dec = _median_time(dec, reps)

    # encode-mode program on the same latents: identical entropy convs,
    # no scans, no g_s. Reuses the compiled dual-mode executable.
    fns = host_codec._codec_fns(model)
    y, z = fns["analysis"](params, x)
    med = jnp.asarray(wct.medians, jnp.float32).reshape(1, 1, 1, -1)
    z_sym, _ = fns["z_round"](z, med)
    z_sym = jnp.clip(z_sym, -host_codec._SYM_CLIP,
                     host_codec._SYM_CLIP).astype(jnp.int32)
    lanes = wide_codec.W.wide_lanes()
    unroll = wide_codec.W.wide_unroll()
    run = wide_codec._wide_program(model, zh, zw, 1, lanes, unroll)
    bucket = wide_codec._total_symbols(model, wct.medians.shape[0], zh,
                                       zw, 1, lanes)
    exc_k = wide_codec.exc_capacity(bucket)
    n_sections = 1 + 2 * len(model.slices)
    args = (params, wct.device(),
            jnp.zeros(bucket + lanes, jnp.uint16),
            jnp.full((lanes,), 1 << 16, jnp.uint32),
            jnp.zeros((n_sections, exc_k), jnp.int32),
            jnp.zeros((n_sections, exc_k), jnp.int32),
            jnp.zeros(n_sections, jnp.int32),
            z_sym, y, jnp.bool_(True))
    t_convs = _median_time(lambda: run(*args)["syms"][-1], reps)

    # synthesis alone on a y-shaped latent
    y_hat = jnp.zeros((1, zh * 4, zw * 4, c_y),
                      host_codec._float_dtype(params))
    g_s = fns["g_s"]
    _barrier(g_s(params, y_hat))
    t_gs = _median_time(lambda: g_s(params, y_hat), reps)

    split = {
        "image": img,
        "padded": [h, w],
        "reps": reps,
        "platform": jax.devices()[0].platform,
        "protocol": "1-px fetch barrier, median of reps; convs = the "
                    "dual-mode program in encode mode (same entropy-"
                    "parameter convs, no scans/synthesis), g_s = "
                    "synthesis alone, scans = full - convs - g_s",
        "dec_device_s": round(t_dec, 4),
        "convs_device_s": round(t_convs, 4),
        "g_s_device_s": round(t_gs, 4),
        "scans_residual_s": round(t_dec - t_convs - t_gs, 4),
    }
    print(json.dumps(split, indent=2))

    path = "artifacts/wide_decode_profile.json"
    try:
        doc = json.load(open(path))
    except (OSError, ValueError):
        doc = {}
    doc["device_split"] = split
    with open(path + ".tmp", "w") as f:
        json.dump(doc, f, indent=2)
    os.replace(path + ".tmp", path)
    print(f"wrote device_split into {path}")


if __name__ == "__main__":
    main()
