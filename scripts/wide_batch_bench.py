"""Batched/pipelined wide decode throughput at 2K: amortize the tunnel.

The round-4 profile (artifacts/wide_decode_profile.json) showed 2K wide
decode = ~0.28 s device compute + ~0.5 s transfers/dispatch per image —
device compute at parity with the reference GPU's 0.294 s decode wall
(single_test.ipynb cell 6) but the wall conditional on the link. This
bench decodes N same-bucket CLIC images through one compiled program
and reports s/image under three protocols:

  serial     — wide_decompress per image (the round-4 wall, now with
               cached LUTs + compact uploads)
  pipelined  — wide_decompress_many: dispatch image i+1 before fetching
               image i (device decode overlaps tunnel transfers)
  device     — dispatch + 1-px fetch barrier (TPU time alone)

    python scripts/wide_batch_bench.py [n_images]

Writes artifacts/wide_batch_bench.json.
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

CLIC = "/root/reference/task-oriented-PTQ/datasets/clic41"


def same_bucket_images(n: int):
    """The largest group of CLIC images sharing one 64-padded bucket
    (one compiled program for the whole set)."""
    from PIL import Image
    groups = {}
    for f in sorted(os.listdir(CLIC)):
        w, h = Image.open(os.path.join(CLIC, f)).size
        groups.setdefault((-(-h // 64) * 64, -(-w // 64) * 64),
                          []).append(f)
    bucket, files = max(groups.items(), key=lambda kv: len(kv[1]))
    return bucket, files[:n]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    (bh, bw), files = same_bucket_images(n)
    print(f"{len(files)} CLIC images in the {bh}x{bw} bucket: {files}")

    model, params, _ = bs._tinylic_codec_setup()
    from rdoptq_tpu.quant import light
    params = dict(light.cast_params(params))  # bf16 serving dtype
    wct = wide_codec.build_wide_codec_tables(
        jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if hasattr(a, "dtype") and a.dtype == jnp.bfloat16 else a,
            params["eb"]))

    blobs, shape, enc_t, px = [], None, [], []
    srcs = []
    for i, f in enumerate(files):
        img = datasets.load_image(os.path.join(CLIC, f))
        h, w = img.shape[1], img.shape[2]
        x = jnp.pad(jnp.asarray(img),
                    ((0, 0), (0, bh - h), (0, bw - w), (0, 0)))
        for _ in range(2 if i == 0 else 1):  # first pays compile
            t0 = time.perf_counter()
            enc = wide_codec.wide_compress(model, params, x, wct)
            enc_t.append(time.perf_counter() - t0)
        blobs.append(enc["strings"][0])
        shape = enc["shape"]
        px.append((h, w))
        srcs.append(np.asarray(img))

    # serial decode (per-image dispatch+fetch, warm)
    rec0 = wide_codec.wide_decompress(model, params, [blobs[0]], shape,
                                      wct, out="u8")  # warm any residue
    t0 = time.perf_counter()
    recs_serial = [wide_codec.wide_decompress(model, params, [b], shape,
                                              wct, out="u8")
                   for b in blobs]
    serial_s = (time.perf_counter() - t0) / len(blobs)

    # pipelined decode at a few depths
    pipe = {}
    for depth in (2, 3):
        t0 = time.perf_counter()
        recs = wide_codec.wide_decompress_many(model, params, blobs,
                                               shape, wct, out="u8",
                                               depth=depth)
        pipe[depth] = (time.perf_counter() - t0) / len(blobs)
        for g, want in zip(recs, recs_serial):  # pipeline = serial values
            np.testing.assert_array_equal(g, want)

    # device-only floor (dispatch + 1-px barrier), median of 3
    dev = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = wide_codec._decode_dispatch(model, params, [blobs[0]],
                                          shape, wct, 1, 0)
        np.asarray(res["x_u8"][0, 0, 0, 0])
        dev.append(time.perf_counter() - t0)

    # round-trip quality guard: decoded images must be real
    psnrs = []
    for rec, src, (h, w) in zip(recs_serial, srcs, px):
        mse = float(np.mean((rec[:, :h, :w].astype(np.float32) / 255.0
                             - src[:, :h, :w]) ** 2))
        psnrs.append(10 * np.log10(1.0 / max(mse, 1e-12)))
    assert min(psnrs) > 25.0, psnrs

    bpps = [len(b) * 8.0 / (h * w) for b, (h, w) in zip(blobs, px)]
    out = {
        "set": f"CLIC {len(files)} images, shared {bh}x{bw} bucket",
        "files": files,
        "params": "bf16 serving (" + bs.CODEC_PARAMS_SOURCE + ")",
        "platform": jax.devices()[0].platform,
        "timing_protocol": "warm walls; serial = per-image "
                           "wide_decompress, pipelined = "
                           "wide_decompress_many (dispatch i+1 before "
                           "fetching i), device = 1-px fetch barrier",
        "enc_s_per_img": round(float(np.mean(enc_t[1:])), 4),
        "dec_serial_s_per_img": round(serial_s, 4),
        "dec_pipelined_s_per_img": {
            str(d): round(v, 4) for d, v in pipe.items()},
        "dec_device_only_s": round(float(np.median(dev)), 4),
        "bpp_avg": round(float(np.mean(bpps)), 4),
        "psnr_min_db": round(min(psnrs), 2),
        "reference_gpu_2k": {"enc_s": 0.323, "dec_s": 0.294,
                             "source": "single_test.ipynb cells 6/15"},
    }
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/wide_batch_bench.json.tmp", "w") as f:
        json.dump(out, f, indent=2)
    os.replace("artifacts/wide_batch_bench.json.tmp",
               "artifacts/wide_batch_bench.json")
    print(json.dumps(out, indent=2))
    print("wrote artifacts/wide_batch_bench.json")


if __name__ == "__main__":
    main()
