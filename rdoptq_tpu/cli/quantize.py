"""Light uniform one-shot quantization driver (INT8 / BF16).

The TPU-native equivalent of the reference's `quantize.py` flow
(load FP32 -> validate via real compress/decompress -> wrap + single
calibration forward -> INT8 validate -> save; quantize.py:116-206) and
`single_test.py` (timed enc/dec + model-size reporting). Run:

    python -m rdoptq_tpu.cli.quantize --arch TinyLIC --type INT8
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..coding import codec
from ..eval import datasets
from ..models import registry
from ..ops import metrics as M
from ..quant import light
from ..utils import checkpoint
from ..utils.logging_utils import Timer, setup_logger

log = logging.getLogger("quantize")


def validate_real_codec(model, params, img: np.ndarray, tables,
                        kind: str = "checkerboard") -> dict:
    """Real compress->decompress on one image with enc/dec timing
    (reference validate_model, quantize.py:60-92; timings as in
    single_test.py:144-156). ``kind``: 'checkerboard' (TinyLIC) or 'ar'
    (wavefront causal-context codec for Minnen/Cheng/Lu)."""
    x, meta = M.pad_to_multiple(jnp.asarray(img), 64)
    t0 = time.time()
    if kind == "checkerboard":
        out = codec.tinylic_compress(model, params, x, tables)
    else:
        from ..coding import ar
        out = ar.ar_compress(model, params, x, tables)
    jax.block_until_ready(x)
    enc_t = time.time() - t0
    t0 = time.time()
    if kind == "checkerboard":
        x_hat = codec.tinylic_decompress(model, params, out["strings"],
                                         out["shape"], tables)
    else:
        from ..coding import ar
        x_hat = ar.ar_decompress(model, params, out["strings"],
                                 out["shape"], out["y_shape"], tables)
    dec_t = time.time() - t0
    x_hat = M.crop_to_original(jnp.asarray(x_hat), meta)
    x_ref = M.crop_to_original(x, meta)
    num_pixels = img.shape[1] * img.shape[2]
    bpp = sum(len(s) for s in out["strings"]) * 8.0 / num_pixels
    return {"psnr": float(M.psnr(x_ref, x_hat)),
            "ms_ssim": float(M.ms_ssim(x_ref, x_hat)),
            "bpp": bpp, "enc_s": enc_t, "dec_s": dec_t}


def run(arch: str = "TinyLIC", mode: str = "INT8", quality: int = 6,
        lam: float = 0.0483, checkpoint_path: str = "",
        image_path: str = "", out_dir: str = "./results/quantize",
        seed: int = 1005) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    setup_logger(out_dir)
    model = registry.build_model(arch, quality, lam=lam)
    params = registry.load_params(model, arch, checkpoint_path, seed=seed)
    img = (datasets.load_image(image_path) if image_path
           else datasets.kodak(limit=1)[0])

    results = {"fp32_size_mb": light.model_size_bytes(params) / 1e6}
    supports_codec = True
    codec_kind = "checkerboard" if arch == "TinyLIC" else "ar"
    from ..ops import entropy as E
    params = dict(params)
    params["eb"] = E.fit_quantiles(params["eb"])
    tables = codec.build_codec_tables(params["eb"])
    results["fp32"] = validate_real_codec(model, params, img, tables,
                                          codec_kind)
    log.info("FP32: %s", results["fp32"])

    if mode == "INT8":
        with Timer() as t:
            lq = light.quantize_model(params)
        results["quantize_seconds"] = t.seconds
        results["int8_size_mb"] = light.quantized_size_bytes(lq) / 1e6
        params_q = light.dequantized_params(lq)
        if supports_codec:
            results["int8"] = validate_real_codec(model, params_q, img,
                                                  tables, codec_kind)
            log.info("INT8: %s", results["int8"])
        path = os.path.join(out_dir, f"{arch}_INT8.npz")
        checkpoint.save_pytree(path, {
            "int_weights": dict(lq.int_weights),
            "qparams": dict(lq.qparams),
            "int_biases": dict(lq.int_biases)})
        results["artifact"] = path
        log.info("one-shot INT8 in %.2fs: %.2f MB -> %.2f MB", t.seconds,
                 results["fp32_size_mb"], results["int8_size_mb"])
    elif mode == "FP16":
        params_h = light.cast_params(params)  # bfloat16 on TPU
        results["fp16_size_mb"] = light.model_size_bytes(params_h) / 1e6
        if supports_codec:
            results["fp16"] = validate_real_codec(model, params_h, img,
                                                  tables, codec_kind)
        log.info("bf16 model: %.2f MB", results["fp16_size_mb"])
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arch", default="TinyLIC")
    p.add_argument("--type", dest="mode", default="INT8",
                   choices=["INT8", "FP16"])
    p.add_argument("--quality", type=int, default=6)
    p.add_argument("--lmbda", type=float, default=0.0483)
    p.add_argument("--checkpoint", default="")
    p.add_argument("--image", default="")
    p.add_argument("--out_dir", default="./results/quantize")
    a = p.parse_args(argv)
    run(a.arch, a.mode, a.quality, a.lmbda, a.checkpoint, a.image,
        a.out_dir)


if __name__ == "__main__":
    main()
