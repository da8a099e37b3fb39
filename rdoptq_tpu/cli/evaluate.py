"""Dataset evaluation driver with optional reconstruction dumps.

The TPU-native equivalent of the reference's `single_test.py` /
`dataset_test.py` (FP32/quantized eval over an image folder, periodic
reconstruction dumps via --freq, model-size report). Run:

    python -m rdoptq_tpu.cli.evaluate --arch Minnen2018 --quality 6 \
        --dataset /path/to/images --artifact results/.../W8A8.npz \
        --act_quant --dump_dir recon --freq 8
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..eval import datasets, harness
from ..models import registry
from ..models.layers import NULL_CTX, QuantCtx
from ..ops import metrics as M
from ..quant import light, policy
from ..utils.logging_utils import setup_logger
from .calibrate import pad_multiple_for

log = logging.getLogger("evaluate")


def dump_reconstructions(model, params, images, ctx, pad, dump_dir,
                         freq: int):
    from PIL import Image
    os.makedirs(dump_dir, exist_ok=True)
    fwd = jax.jit(lambda p, v: model.forward(p, v, ctx=ctx)["x_hat"])
    for i, img in enumerate(images):
        if freq <= 0 or i % freq != 0:
            continue
        x, meta = M.pad_to_multiple(jnp.asarray(img), pad)
        x_hat = jnp.clip(fwd(params, x), 0, 1)
        x_hat = M.crop_to_original(x_hat, meta)
        arr = np.asarray(x_hat[0] * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(dump_dir, f"rec_{i:03d}.png"))


def run(arch: str, quality: int = 6, dataset: str = "",
        checkpoint_path: str = "", artifact: str = "",
        act_quant: bool = False, n_bits_a: int = 8, dump_dir: str = "",
        freq: int = 0, seed: int = 1005,
        int8_serving: bool = False) -> dict:
    setup_logger(None)
    model = registry.build_model(arch, quality)
    params = registry.load_params(model, arch, checkpoint_path, seed=seed)
    pad = pad_multiple_for(arch)
    images = datasets.load_dir(dataset) if dataset else datasets.kodak()

    ctx = NULL_CTX
    if artifact:
        from ..utils.checkpoint import load_ptq_state
        state = load_ptq_state(artifact)
        params = state.quantized_params(params, untrained="nearest")
        if act_quant:
            ctx = QuantCtx(act_paths=frozenset(state.trained_stages),
                           act_kind="dynamic", act_bits=n_bits_a,
                           skip_paths=policy.output_act_skips(model))
    if int8_serving:
        # true-INT8 compute path: int8 kernels on the MXU (applied after
        # any calibration artifact so the hard-rounded weights are served)
        from ..quant import serve_int8
        params = serve_int8.int8_serving_params(params)
    res = harness.evaluate(model, params, images, ctx=ctx, pad_multiple=pad)
    size_mb = light.model_size_bytes(params) / 1e6
    log.info("%s q%d | %s | model %.2f MB", arch, quality, res.row(),
             size_mb)
    if dump_dir:
        dump_reconstructions(model, params, images, ctx, pad, dump_dir,
                             freq or len(images))
    return {"psnr": res.psnr, "ms_ssim": res.ms_ssim, "bpp": res.bpp,
            "seconds": res.seconds, "model_size_mb": size_mb,
            "per_image": res.per_image}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arch", default="Minnen2018")
    p.add_argument("--quality", type=int, default=6)
    p.add_argument("--dataset", default="")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--artifact", default="")
    p.add_argument("--act_quant", action="store_true")
    p.add_argument("--n_bits_a", type=int, default=8)
    p.add_argument("--dump_dir", default="")
    p.add_argument("--freq", type=int, default=0)
    p.add_argument("--int8_serving", action="store_true",
                   help="run the true-INT8 MXU compute path")
    a = p.parse_args(argv)
    out = run(a.arch, a.quality, a.dataset, a.checkpoint, a.artifact,
              a.act_quant, a.n_bits_a, a.dump_dir, a.freq,
              int8_serving=a.int8_serving)
    print(json.dumps({k: v for k, v in out.items() if k != "per_image"},
                     indent=2))


if __name__ == "__main__":
    main()
