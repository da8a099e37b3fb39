"""Export a (quantized) model to a portable StableHLO serving bundle.

Usage:
    python -m rdoptq_tpu.cli.export --arch Minnen2018 --quality 6 \
        --ckpt ckpts/minnen2018_q6.npz --shapes 1x768x512x3,1x512x768x3 \
        --int8 --out minnen_q6.rdx

The resulting ``.rdx`` file carries TPU+CPU lowerings of the serving
forward for every listed static NHWC shape plus the parameter pytree;
``rdoptq_tpu.deploy.load_bundle`` executes it with no model code.

Replaces the reference's deploy story (re-running the full torch stack
from a pickle at serving time, main2.py:160-162 / single_test.ipynb).
"""

from __future__ import annotations

import argparse
import logging

from .. import deploy

log = logging.getLogger(__name__)


def parse_shapes(s: str):
    shapes = []
    for part in s.split(","):
        dims = tuple(int(d) for d in part.strip().split("x"))
        if len(dims) != 4:
            raise argparse.ArgumentTypeError(
                f"shape {part!r} must be NxHxWxC")
        shapes.append(dims)
    return shapes


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--arch", required=True)
    ap.add_argument("--quality", type=int, default=6)
    ap.add_argument("--lam", type=float, default=None,
                    help="TinyLIC rate-condition lambda")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--artifact", default=None,
                    help="calibrated PTQState (.npz) to apply before "
                         "export (hard-rounded AdaRound weights)")
    ap.add_argument("--shapes", type=parse_shapes, required=True,
                    help="comma-separated NxHxWxC static input shapes")
    ap.add_argument("--int8", action="store_true",
                    help="export the true-int8 serving pytree")
    ap.add_argument("--platforms", default="tpu,cpu")
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    bundle = deploy.export_model_bundle(
        args.out, args.arch, args.quality, args.shapes,
        ckpt=args.ckpt, artifact=args.artifact, int8=args.int8,
        platforms=tuple(p.strip() for p in args.platforms.split(",")),
        lam=args.lam, seed=args.seed)
    log.info("wrote %s: %d entries %s (int8=%s)", args.out,
             len(bundle.shapes), bundle.shapes, args.int8)
    return bundle


if __name__ == "__main__":
    main()
