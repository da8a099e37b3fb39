"""RD training driver (beyond-reference: the reference ships pretrained
checkpoints, ckpts/image.py:60-115; this trains them in-framework).

    python -m rdoptq_tpu.cli.train --arch Minnen2018 --quality 6 \
        --lmbda 0.0483 --steps 2000 --out ckpts/minnen_q6.npz

The saved .npz loads directly into every other CLI via --checkpoint.
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import numpy as np

from .. import train as T
from ..eval import datasets
from ..models import registry
from ..utils import checkpoint
from ..utils.logging_utils import setup_logger

log = logging.getLogger("train")


def main(argv=None):
    p = argparse.ArgumentParser(description="RD training for LIC models")
    p.add_argument("--arch", default="Minnen2018")
    p.add_argument("--quality", type=int, default=6)
    p.add_argument("--lmbda", type=float, default=None,
                   help="RD λ; default: the --metric λ registry's value "
                        "for --quality (utils/config.py)")
    p.add_argument("--lambdas", default="",
                   help="comma list for variable-rate training of "
                        "λ-conditioned models (TinyLIC): one parameter "
                        "set trained under every λ")
    p.add_argument("--metric", default="mse", choices=["mse", "ms-ssim"])
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--patch_size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--chunk", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_dir", default=datasets.DEFAULT_KODAK)
    p.add_argument("--init_from", default="",
                   help="warm-start checkpoint (.npz)")
    p.add_argument("--out", required=True, help="output checkpoint (.npz)")
    args = p.parse_args(argv)
    if args.lmbda is None:
        from ..utils.config import lambda_for
        args.lmbda = lambda_for(args.quality, args.metric)

    # Lu2022's 16x-downsampled latent must tile into 8x8 attention
    # windows: patch sizes like 192 (latent 12) fail deep inside the
    # first traced step with a reshape error — fail fast instead
    unit = 128 if args.arch == "Lu2022" else 64
    if args.patch_size % unit:
        p.error(f"--patch_size must be a multiple of {unit} for "
                f"{args.arch} (got {args.patch_size})")

    setup_logger(os.path.dirname(args.out) or ".")
    model = registry.build_model(args.arch, args.quality, lam=args.lmbda)
    params = registry.load_params(model, args.arch, args.init_from,
                                  seed=args.seed)
    images = datasets.load_dir(args.data_dir)
    log.info("training %s q%d on %d images: %s", args.arch, args.quality,
             len(images), args)

    cfg = T.TrainConfig(steps=args.steps, batch_size=args.batch_size,
                        patch_size=args.patch_size, lr=args.lr,
                        lmbda=args.lmbda, metric=args.metric,
                        chunk=args.chunk, seed=args.seed)
    if args.lambdas:
        lams = [float(v) for v in args.lambdas.split(",")]
        res = T.train_variable_rate(model, params, images, cfg, lams)
    else:
        res = T.train(model, params, images, cfg)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    checkpoint.save_pytree(args.out, res["params"])
    hist = res["history"]
    log.info("saved %s  (final loss %.4f bpp %.4f dist %.4e)",
             args.out, hist[-1, 0], hist[-1, 1], hist[-1, 2])


if __name__ == "__main__":
    main()
