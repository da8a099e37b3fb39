"""Task-oriented PTQ calibration driver.

The TPU-native equivalent of the reference's `main2.py` pipeline
(parse args -> run dirs -> logger -> model load -> FP32 anchor eval ->
quant wrap + first/last-8bit policy -> scale init -> W-quant eval ->
per-unit RDO reconstruction -> W-opt eval -> W+A eval -> save artifact;
main2.py:143-318). Run:

    python -m rdoptq_tpu.cli.calibrate --arch Minnen2018 --quality 6 \
        --iters_w 20000 --act_quant --save
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np

from ..eval import datasets, harness
from ..models import registry
from ..models.layers import NULL_CTX, QuantCtx
from ..quant import policy, rdo, wrap
from ..utils import checkpoint, config
from ..utils.logging_utils import MetricsLogger, Timer, setup_logger

log = logging.getLogger("calibrate")


def pad_multiple_for(arch: str) -> int:
    # Lu2022 needs H/64 divisible by the hyper window (reference pads to
    # 256, test_datasets.py:90-92); everything else to 64.
    return 256 if arch == "Lu2022" else 64


def evaluate_state(model, params, state, images, act_quant: bool,
                   act_bits: int, skips: frozenset, pad: int,
                   eval_fn=None):
    """Evaluate the current quantized model (trained leaves hard-rounded,
    untrained nearest-rounded — the reference's eval quant state). With a
    gated ``eval_fn``, every quant state reuses one compiled program."""
    params_q = state.quantized_params(params, untrained="nearest")
    stages = state.trained_stages if act_quant else ()
    if eval_fn is not None:
        gates = harness.stage_gates(model, stages)
        return harness.evaluate(model, params_q, images, pad_multiple=pad,
                                eval_fn=eval_fn, gates=gates)
    ctx = NULL_CTX
    if act_quant:
        ctx = QuantCtx(act_paths=frozenset(stages), act_kind="dynamic",
                       act_bits=act_bits, skip_paths=skips)
    return harness.evaluate(model, params_q, images, ctx=ctx,
                            pad_multiple=pad)


def run(cfg: config.RunConfig, checkpoint_path: str = "") -> dict:
    out_dir, log_dir = config.init_run_dirs(cfg)
    setup_logger(log_dir)
    metrics = MetricsLogger(log_dir)
    log.info("config: %s", cfg)

    model = registry.build_model(cfg.arch, cfg.quality, lam=cfg.lmbda)
    params = registry.load_params(model, cfg.arch,
                                  checkpoint_path or cfg.checkpoint,
                                  seed=cfg.seed)
    pad = pad_multiple_for(cfg.arch)

    test_dir = cfg.test_dir or datasets.DEFAULT_KODAK
    images = datasets.kodak(test_dir)
    calib_src = datasets.load_dir(cfg.calib_dir) if cfg.calib_dir else images
    cali = datasets.random_crops(calib_src, cfg.num_samples,
                                 cfg.patch_size, cfg.seed)

    leaves = wrap.find_quant_leaves(params)
    overrides = () if cfg.disable_8bit_head_stem \
        else policy.first_last_8bit(leaves)
    wcfg = wrap.WeightQuantConfig(
        n_bits=cfg.n_bits_w, channel_wise=cfg.channel_wise,
        scale_method=cfg.init, sym=cfg.sym, bit_overrides=overrides)
    skips = policy.output_act_skips(model)
    # built before the (slow) anchor evals so bad flags fail fast
    rcfg = rdo.RDOConfig(
        iters=cfg.iters_w, batch_size=cfg.batch_size, weight=cfg.weight,
        b_start=cfg.b_start, b_end=cfg.b_end, warmup=cfg.warmup,
        input_prob=cfg.input_prob, lr=cfg.lr, task_p=cfg.task_loss,
        act_quant=cfg.act_quant, act_bits=cfg.n_bits_a,
        remat=cfg.remat, compute_dtype=cfg.compute_dtype)
    # one gated eval program shared by every quant-state evaluation
    eval_fn = harness.make_gated_eval_fn(model, skips, "dynamic",
                                         cfg.n_bits_a)
    off_gates = harness.stage_gates(model, ())

    results = {}
    if cfg.test_before_calibration:
        with Timer() as t:
            res = harness.evaluate(model, params, images, pad_multiple=pad,
                                   eval_fn=eval_fn, gates=off_gates)
        log.info("FP32 anchor:      %s", res.row())
        results["fp32"] = res

    if cfg.resume and os.path.exists(cfg.resume):
        # mid-calibration resume (the reference restarts the whole layer
        # on interruption, SURVEY §5; here finished units are skipped)
        state = checkpoint.load_ptq_state(cfg.resume)
        log.info("resumed %d trained units from %s",
                 len(state.trained_stages), cfg.resume)
    else:
        state = rdo.init_ptq_state(params, wcfg)
    if cfg.test_before_calibration:
        # W-quant (nearest, unoptimized) — reference main2.py:211
        params_near = state.quantized_params(
            params, extra={}, untrained="nearest")
        res = harness.evaluate(model, params_near, images,
                               pad_multiple=pad, eval_fn=eval_fn,
                               gates=off_gates)
        log.info("W%d nearest:       %s", cfg.n_bits_w, res.row())
        results["w_nearest"] = res

    snapshot = os.path.join(out_dir, "ptq_state_partial.npz")
    with Timer() as t:
        key = jax.random.PRNGKey(cfg.seed)
        cache = rdo.CoderCache(model, params, cali, rcfg, skips)
        for coder_name in model.calibration_order():
            coder = model.coders[coder_name]
            for k in range(len(coder.stages)):
                key, sub = jax.random.split(key)
                if coder.stages[k].name in state.trained_stages:
                    continue  # resumed
                info = rdo.calibrate_unit(model, params, state, coder, k,
                                          cali, rcfg, skips, sub, cache)
                for name, v in info.items():
                    if isinstance(v, float):
                        metrics.update(f"calib/{name}", v)
            checkpoint.save_ptq_state(snapshot, state)
    log.info("calibration wall-clock: %.1fs", t.seconds)
    results["calibration_seconds"] = t.seconds

    res = evaluate_state(model, params, state, images, False,
                         cfg.n_bits_a, skips, pad, eval_fn)
    log.info("W%d optimized:     %s", cfg.n_bits_w, res.row())
    results["w_opt"] = res

    if cfg.act_quant:
        res = evaluate_state(model, params, state, images, True,
                             cfg.n_bits_a, skips, pad, eval_fn)
        log.info("W%dA%d optimized:  %s", cfg.n_bits_w, cfg.n_bits_a,
                 res.row())
        results["wa_opt"] = res

    if cfg.save:
        tag = "CW" if cfg.channel_wise else "LW"
        name = (f"{cfg.arch}_Q{cfg.quality}_W{cfg.n_bits_w}A{cfg.n_bits_a}"
                f"_prob{cfg.input_prob}_task{cfg.task_loss}_{cfg.init}-init"
                f"_{tag}.npz")
        path = os.path.join(out_dir, name)
        checkpoint.save_ptq_state(path, state)
        log.info("saved quantized artifact: %s", path)
        results["artifact"] = path

    metrics.close()
    return results


def main(argv=None):
    cfg = config.parse_args(argv)
    run(cfg)


if __name__ == "__main__":
    main()
