"""BD-rate sweep driver: evaluate FP32 vs quantized across qualities and
compute the Bjøntegaard deltas.

The TPU-native equivalent of the reference's notebook sweep
(test_datasets.ipynb cells 12-26 feeding BD-rate.py). Run:

    python -m rdoptq_tpu.cli.sweep --arch Cheng2020 --n_bits_w 8 \
        --qualities 1,2,3,4,5,6
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import jax

from ..eval import bdrate, datasets, harness
from ..models import registry
from ..models.layers import NULL_CTX, QuantCtx
from ..quant import policy, rdo, wrap
from ..utils.logging_utils import setup_logger
from .calibrate import pad_multiple_for

log = logging.getLogger("sweep")


def run(arch: str = "Cheng2020", qualities=(1, 2, 3, 4, 5, 6),
        n_bits_w: int = 8, n_bits_a: int = 8, act_quant: bool = True,
        iters_w: int = 0, test_dir: str = "", ckpt_pattern: str = "",
        out_path: str = "./results/sweep.json", seed: int = 1005,
        compute_dtype: str = "float32", remat: bool = False,
        batch_size: int = 4) -> dict:
    """iters_w=0 -> nearest-rounding weights (no RDO calibration); >0 runs
    the full per-unit calibration at each quality."""
    setup_logger(os.path.dirname(out_path) or ".")
    images = datasets.kodak(test_dir or datasets.DEFAULT_KODAK)
    pad = pad_multiple_for(arch)

    anchor = {"bpp": [], "psnr": [], "msssim_db": []}
    test = {"bpp": [], "psnr": [], "msssim_db": []}
    per_quality = {}
    # per-quality resume file: TPU tunnel faults kill multi-quality runs;
    # a rerun skips completed qualities (losing at most one calibration)
    partial_path = out_path + ".partial"
    if os.path.exists(partial_path):
        with open(partial_path) as f:
            per_quality = {int(k): v for k, v in json.load(f).items()}
        log.info("resuming: qualities %s already done",
                 sorted(per_quality))
    for q in qualities:
        if q in per_quality:
            row = per_quality[q]
            for dst, src in ((anchor, row["fp32"]), (test, row["quant"])):
                dst["bpp"].append(src["bpp"])
                dst["psnr"].append(src["psnr"])
                dst["msssim_db"].append(src["ms_ssim_db"])
            continue
        model = registry.build_model(arch, q)
        ckpt = ckpt_pattern.format(quality=q) if ckpt_pattern else ""
        params = registry.load_params(model, arch, ckpt, seed=seed + q)
        # one gated program per model config serves FP32 and quantized evals
        skips_q = policy.output_act_skips(model)
        eval_fn = harness.make_gated_eval_fn(model, skips_q, "dynamic",
                                             n_bits_a)
        gates_off = harness.stage_gates(model, ())

        res_fp = harness.evaluate(model, params, images, pad_multiple=pad,
                                  eval_fn=eval_fn, gates=gates_off)
        anchor["bpp"].append(res_fp.bpp)
        anchor["psnr"].append(res_fp.psnr)
        anchor["msssim_db"].append(res_fp.ms_ssim_db)

        leaves = wrap.find_quant_leaves(params)
        wcfg = wrap.WeightQuantConfig(
            n_bits=n_bits_w, channel_wise=True,
            bit_overrides=policy.first_last_8bit(leaves))
        skips = policy.output_act_skips(model)
        # per-unit resume snapshot (same mechanism as cli/calibrate's
        # ptq_state_partial): a device fault mid-calibration loses at
        # most one unit's optimization on retry
        snap = f"{out_path}.q{q}.ptq.npz"
        if iters_w > 0 and os.path.exists(snap):
            from ..utils import checkpoint
            state = checkpoint.load_ptq_state(snap)
            log.info("q%d: resumed %d trained units from %s", q,
                     len(state.trained_stages), snap)
        else:
            state = rdo.init_ptq_state(params, wcfg)
        calib_s = 0.0
        if iters_w > 0:
            import time

            from ..utils import checkpoint
            t0 = time.time()
            cali = datasets.random_crops(images, 12, 256, seed)
            rcfg = rdo.RDOConfig(iters=iters_w, act_quant=act_quant,
                                 act_bits=n_bits_a, batch_size=batch_size,
                                 compute_dtype=compute_dtype, remat=remat)
            key = jax.random.PRNGKey(seed)
            cache = rdo.CoderCache(model, params, cali, rcfg, skips)
            for cname in model.calibration_order():
                coder = model.coders[cname]
                for k in range(len(coder.stages)):
                    key, sub = jax.random.split(key)
                    if coder.stages[k].name in state.trained_stages:
                        continue  # resumed
                    rdo.calibrate_unit(model, params, state, coder, k,
                                       cali, rcfg, skips, sub, cache)
                    checkpoint.save_ptq_state(snap, state)
            calib_s = time.time() - t0
            log.info("q%d calibration wall-clock: %.1fs", q, calib_s)
        params_q = state.quantized_params(params, untrained="nearest")
        stages_on = [st.name for c in model.coders.values()
                     for st in c.stages] if act_quant else []
        gates_q = harness.stage_gates(model, stages_on)
        res_q = harness.evaluate(model, params_q, images, pad_multiple=pad,
                                 eval_fn=eval_fn, gates=gates_q)
        test["bpp"].append(res_q.bpp)
        test["psnr"].append(res_q.psnr)
        test["msssim_db"].append(res_q.ms_ssim_db)
        per_quality[q] = {"fp32": dataclass_row(res_fp),
                          "quant": dataclass_row(res_q),
                          "calibration_seconds": round(calib_s, 1)}
        os.makedirs(os.path.dirname(partial_path) or ".", exist_ok=True)
        with open(partial_path, "w") as f:
            json.dump(per_quality, f)
        if os.path.exists(snap):
            os.remove(snap)
        log.info("q%d fp32 %s | quant %s", q, res_fp.row(), res_q.row())

    out = {"arch": arch, "n_bits_w": n_bits_w, "n_bits_a": n_bits_a,
           "per_quality": per_quality}
    if len(qualities) >= 4:
        out["bd_rate_pct"] = bdrate.bd_rate(anchor["bpp"], anchor["psnr"],
                                            test["bpp"], test["psnr"])
        out["bd_psnr_db"] = bdrate.bd_psnr(anchor["bpp"], anchor["psnr"],
                                           test["bpp"], test["psnr"])
        # MS-SSIM BD-rate over -10·log10(1-msssim) curves (the standard
        # dB mapping the reference's MS-SSIM RD plots use)
        out["bd_rate_msssim_pct"] = bdrate.bd_rate(
            anchor["bpp"], anchor["msssim_db"], test["bpp"],
            test["msssim_db"])
        log.info("BD-rate: %.2f%%  BD-PSNR: %.3f dB  BD-rate(MS-SSIM): "
                 "%.2f%%", out["bd_rate_pct"], out["bd_psnr_db"],
                 out["bd_rate_msssim_pct"])
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    if os.path.exists(partial_path):
        os.remove(partial_path)
    return out


def dataclass_row(res) -> dict:
    return {"psnr": res.psnr, "ms_ssim": res.ms_ssim,
            "ms_ssim_db": res.ms_ssim_db, "bpp": res.bpp}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arch", default="Cheng2020")
    p.add_argument("--qualities", default="1,2,3,4,5,6")
    p.add_argument("--n_bits_w", type=int, default=8)
    p.add_argument("--n_bits_a", type=int, default=8)
    p.add_argument("--act_quant", action="store_true")
    p.add_argument("--iters_w", type=int, default=0)
    p.add_argument("--test_dir", default="")
    p.add_argument("--ckpt_pattern", default="",
                   help="e.g. ckpts/minnen_{quality}.npz")
    p.add_argument("--out", default="./results/sweep.json")
    p.add_argument("--compute_dtype", default="float32",
                   help="calibration forward/suffix dtype (bfloat16 for "
                        "MXU-native deep suffixes, e.g. Lu2022)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the suffix in the backward pass")
    p.add_argument("--batch_size", type=int, default=4,
                   help="calibration step batch (reference default 4; "
                        "smaller shrinks the suffix working set)")
    a = p.parse_args(argv)
    run(a.arch, tuple(int(x) for x in a.qualities.split(",")), a.n_bits_w,
        a.n_bits_a, a.act_quant, a.iters_w, a.test_dir, a.ckpt_pattern,
        a.out, compute_dtype=a.compute_dtype, remat=a.remat,
        batch_size=a.batch_size)


if __name__ == "__main__":
    main()
