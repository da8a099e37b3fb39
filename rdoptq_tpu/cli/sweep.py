"""BD-rate sweep driver: evaluate FP32 vs quantized across qualities and
compute the Bjøntegaard deltas.

The TPU-native equivalent of the reference's notebook sweep
(test_datasets.ipynb cells 12-26 feeding BD-rate.py). Calibration crops
come from a SEPARATE directory (reference: `c_data: clic41`,
task-oriented-PTQ/config.yaml:58-61) so the evaluation sets stay held
out. Run:

    python -m rdoptq_tpu.cli.sweep --arch Cheng2020 --n_bits_w 8 \
        --qualities 1,2,3,4,5,6 \
        --extra_eval tecnick=/data/tecnick,clic=/data/clic@1792x2048
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

# the reference calibrates on CLIC41 crops (config.yaml:60 `c_data:
# clic41`, datasets/dataset.py:8-55); the checkout ships the assets
DEFAULT_CALIB_DIR = "/root/reference/task-oriented-PTQ/datasets/clic41"


def _atomic_json(path: str, obj) -> None:
    """SIGKILL-safe write (the repro script's retry loop kills attempts;
    a truncated partial must not poison every later resume)."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def _load_partial(path: str, config: dict):
    """Load a resume file, validating that it was produced by the same
    sweep configuration (a stale partial from a differently-parameterized
    run must not be merged into this run's artifact)."""
    try:
        with open(path) as f:
            obj = json.load(f)
    except (OSError, ValueError) as e:
        log.warning("ignoring unreadable partial %s: %s", path, e)
        return {}, {}
    # batch_size is an OPERATIONAL knob, not a result key: device faults
    # on big units force mid-sweep batch drops (4 -> 2, see ROUND_NOTES),
    # and discarding completed qualities over it would cost hours. It is
    # excluded from the match and recorded per quality row instead.
    pc = dict(obj.get("config", {})) if isinstance(obj, dict) else None
    partial_bs = pc.pop("batch_size", None) if pc is not None else None
    cc = {k: v for k, v in config.items() if k != "batch_size"}
    if pc != cc:
        log.warning("ignoring partial %s: config mismatch (%s != %s)",
                    path, pc, cc)
        return {}, {}
    per_quality = {int(k): v for k, v in obj.get("per_quality", {}).items()}
    for row in per_quality.values():
        row.setdefault("batch_size", partial_bs)
    anchors = {int(k): v for k, v in obj.get("anchors", {}).items()}
    return per_quality, anchors


def _bd_block(anchor_rows, test_rows, piecewise: bool = False) -> dict:
    """BD metrics from lists of {psnr, ms_ssim_db, bpp} rows.

    ``piecewise=True`` uses the pchip interpolant (linear at 2 points)
    instead of the cubic polynomial fit, which needs >=4 RD points —
    short sweeps (e.g. the two-quality ms-ssim block) still get a BD
    block, flagged by ``bd_fit``."""
    ab = [r["bpp"] for r in anchor_rows]
    ap = [r["psnr"] for r in anchor_rows]
    tb = [r["bpp"] for r in test_rows]
    tp = [r["psnr"] for r in test_rows]
    return {
        "bd_rate_pct": bdrate.bd_rate(ab, ap, tb, tp, piecewise),
        "bd_psnr_db": bdrate.bd_psnr(ab, ap, tb, tp, piecewise),
        # MS-SSIM BD-rate over -10·log10(1-msssim) curves (the standard
        # dB mapping the reference's MS-SSIM RD plots use)
        "bd_rate_msssim_pct": bdrate.bd_rate(
            ab, [r["ms_ssim_db"] for r in anchor_rows],
            tb, [r["ms_ssim_db"] for r in test_rows], piecewise),
        "bd_fit": "pchip" if piecewise else "cubic",
    }


def run(arch: str = "Cheng2020", qualities=(1, 2, 3, 4, 5, 6),
        n_bits_w: int = 8, n_bits_a: int = 8, act_quant: bool = True,
        iters_w: int = 0, test_dir: str = "", ckpt_pattern: str = "",
        out_path: str = "./results/sweep.json", seed: int = 1005,
        compute_dtype: str = "float32", remat: bool = False,
        batch_size: int = 4, calib_dir: str = DEFAULT_CALIB_DIR,
        extra_eval=(), eval_pad_to=None,
        bias_correct: bool = False,
        mixed_avg_bits: float = 0.0) -> dict:
    """iters_w=0 -> nearest-rounding weights (no RDO calibration); >0 runs
    the full per-unit calibration at each quality. ``extra_eval`` is a
    sequence of (name, directory) evaluation sets beyond the main one
    (reference: Kodak + Tecnick100 + CLIC, test_datasets.ipynb cells
    13-14, 21-22). ``eval_pad_to=(H, W)`` floors every eval image's
    padded shape to one bucket — required for varied-shape sets (CLIC:
    23 unique sizes would otherwise each pay a full XLA compile)."""
    setup_logger(os.path.dirname(out_path) or ".")
    images = datasets.kodak(test_dir or datasets.DEFAULT_KODAK)
    # (name, dir) or (name, dir, pad_to) — per-set pad floor
    extra_eval = tuple((e[0], e[1], e[2] if len(e) > 2 else None)
                       for e in extra_eval)
    extra_images = {name: datasets.load_dir(d)
                    for name, d, _ in extra_eval}
    extra_pad = {name: pt for name, _, pt in extra_eval}
    calib_images = (datasets.load_dir(calib_dir)
                    if iters_w > 0 or bias_correct or mixed_avg_bits
                    else [])
    pad = pad_multiple_for(arch)

    config = {"arch": arch, "n_bits_w": n_bits_w, "n_bits_a": n_bits_a,
              "iters_w": iters_w, "act_quant": act_quant,
              "batch_size": batch_size, "compute_dtype": compute_dtype,
              # provenance keys: a partial produced against different
              # checkpoints, eval sets or calibration data must not be
              # merged (its rows would crash the extra-eval BD blocks or
              # silently mix provenance)
              "ckpt_pattern": ckpt_pattern, "test_dir": test_dir,
              "seed": seed,
              "extra_eval": sorted([name, d, list(pt) if pt else None]
                                   for name, d, pt in extra_eval)}
    if iters_w > 0 or bias_correct or mixed_avg_bits:
        config["calib_dir"] = calib_dir  # calibration data shapes results
    if eval_pad_to is not None:  # changes eval numbers -> resume key
        config["eval_pad_to"] = list(eval_pad_to)
    if bias_correct:
        config["bias_correct"] = True
    if mixed_avg_bits:
        config["mixed_avg_bits"] = mixed_avg_bits
    # per-quality resume file: TPU tunnel faults kill multi-quality runs;
    # a rerun skips completed qualities (losing at most one calibration).
    # `anchors` persists the FP32 eval per quality so a mid-calibration
    # retry skips straight to calibration.
    partial_path = out_path + ".partial"
    per_quality, anchors = {}, {}
    if os.path.exists(partial_path):
        per_quality, anchors = _load_partial(partial_path, config)
        dropped = sorted(q for q in per_quality if q not in qualities)
        if dropped:
            log.info("partial has qualities %s outside requested %s: "
                     "dropped from this artifact", dropped, list(qualities))
            per_quality = {q: v for q, v in per_quality.items()
                           if q in qualities}
        if per_quality:
            log.info("resuming: qualities %s already done",
                     sorted(per_quality))

    def save_partial():
        _atomic_json(partial_path, {
            "config": config,
            "per_quality": per_quality,
            "anchors": anchors,
        })

    for q in qualities:
        if q in per_quality:
            continue
        model = registry.build_model(arch, q)
        ckpt = ckpt_pattern.format(quality=q) if ckpt_pattern else ""
        params = registry.load_params(model, arch, ckpt, seed=seed + q)
        # one gated program per model config serves FP32 and quantized evals
        skips_q = policy.output_act_skips(model)
        eval_fn = harness.make_gated_eval_fn(model, skips_q, "dynamic",
                                             n_bits_a)
        gates_off = harness.stage_gates(model, ())

        def eval_all(params_x, gates, label):
            rows = {}
            res = harness.evaluate(model, params_x, images,
                                   pad_multiple=pad, eval_fn=eval_fn,
                                   gates=gates, pad_to=eval_pad_to)
            rows["main"] = dataclass_row(res)
            for name, imgs in extra_images.items():
                r = harness.evaluate(model, params_x, imgs,
                                     pad_multiple=pad, eval_fn=eval_fn,
                                     gates=gates,
                                     pad_to=extra_pad[name] or eval_pad_to)
                rows[name] = dataclass_row(r)
                log.info("q%d %s [%s] %s", q, label, name, r.row())
            log.info("q%d %s [main] %s", q, label, res.row())
            return rows

        if q in anchors:
            fp_rows = anchors[q]
            log.info("q%d: resumed fp32 anchor eval", q)
        else:
            fp_rows = eval_all(params, gates_off, "fp32")
            anchors[q] = fp_rows
            save_partial()

        leaves = wrap.find_quant_leaves(params)
        skips = policy.output_act_skips(model)
        # per-unit resume snapshot (same mechanism as cli/calibrate's
        # ptq_state_partial): a device fault mid-calibration loses at
        # most one unit's optimization on retry
        snap = f"{out_path}.q{q}.ptq.npz"
        state = None
        if iters_w > 0 and os.path.exists(snap):
            from ..utils import checkpoint
            try:
                state = checkpoint.load_ptq_state(snap)
                log.info("q%d: resumed %d trained units from %s", q,
                         len(state.trained_stages), snap)
            except Exception as e:  # truncated by a SIGKILL mid-write
                log.warning("q%d: snapshot %s unreadable (%s): starting "
                            "fresh", q, snap, e)
        if state is None:
            # the mixed-precision probe runs ONLY on a fresh state (a
            # resumed snapshot already embeds its bit assignment; the
            # probe is minutes of full-model forwards)
            overrides = dict(policy.first_last_8bit(leaves))
            if mixed_avg_bits:
                from ..quant import sensitivity
                from ..utils.config import LAMBDAS_MSE
                bits_list = tuple(sorted({max(2, n_bits_w - 4),
                                          max(2, n_bits_w - 2),
                                          n_bits_w, n_bits_w + 2}))
                probe = datasets.random_crops(calib_images, 4, 256,
                                              seed + 3)
                # score with THIS quality's rate-distortion tradeoff
                lam = LAMBDAS_MSE[min(q, len(LAMBDAS_MSE)) - 1]
                sens = sensitivity.unit_sensitivity(
                    model, params, probe, bits_list=bits_list, lmbda=lam)
                alloc = dict(sensitivity.allocate_bits(
                    model, sens, mixed_avg_bits, bits_list=bits_list))
                # mixed allocation first; first/last-8-bit policy wins
                overrides = {**alloc, **overrides}
            wcfg = wrap.WeightQuantConfig(
                n_bits=n_bits_w, channel_wise=True,
                bit_overrides=tuple(sorted(overrides.items())))
            state = rdo.init_ptq_state(params, wcfg)
        calib_s = 0.0
        if iters_w > 0:
            import time

            from ..utils import checkpoint
            t0 = time.time()
            cali = datasets.random_crops(calib_images, 12, 256, seed)
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
        if bias_correct:
            from ..quant import bias_correct as bc
            crops = datasets.random_crops(calib_images, 8, 256, seed + 7)
            # measure under the SAME act-quant configuration the eval
            # runs, so the keep/drop guard sees the deployed model
            bc_ctx = (QuantCtx(act_paths=frozenset(
                          st.name for c in model.coders.values()
                          for st in c.stages),
                          act_bits=n_bits_a, skip_paths=skips)
                      if act_quant else NULL_CTX)
            params_q = bc.bias_correct(model, params, params_q,
                                       jax.numpy.asarray(crops),
                                       ctx=bc_ctx)
        stages_on = [st.name for c in model.coders.values()
                     for st in c.stages] if act_quant else []
        gates_q = harness.stage_gates(model, stages_on)
        q_rows = eval_all(params_q, gates_q, "quant")
        per_quality[q] = {"fp32": fp_rows["main"], "quant": q_rows["main"],
                          "extra": {name: {"fp32": fp_rows[name],
                                           "quant": q_rows[name]}
                                    for name in extra_images},
                          "calibration_seconds": round(calib_s, 1),
                          "batch_size": batch_size}
        if mixed_avg_bits:
            # --mixed_avg_bits budgets PER UNIT; record the realized
            # per-WEIGHT average (policy overrides included) so the
            # artifact states the actual model-size tradeoff
            from ..models.base import get_leaf
            tot_p = tot_b = 0
            for leaf in leaves:
                n = int(get_leaf(params, leaf.path).size)
                tot_p += n
                tot_b += n * state.cfg.bits_for(leaf.path)
            per_quality[q]["mixed_bits_per_weight"] = round(
                tot_b / max(tot_p, 1), 3)
        os.makedirs(os.path.dirname(partial_path) or ".", exist_ok=True)
        save_partial()
        if os.path.exists(snap):
            os.remove(snap)

    out = {"arch": arch, "n_bits_w": n_bits_w, "n_bits_a": n_bits_a,
           "per_quality": per_quality,
           "provenance": {"ckpt_pattern": ckpt_pattern,
                          "calib_dir": calib_dir if iters_w > 0 else "",
                          "eval_dir": test_dir or datasets.DEFAULT_KODAK,
                          "extra_eval": {n: (d if pt is None else
                                             f"{d}@{pt[0]}x{pt[1]}")
                                         for n, d, pt in extra_eval},
                          **config}}
    qs = sorted(per_quality)
    if len(qs) >= 2:
        pw = len(qs) < 4  # cubic fit needs 4 RD points; pchip otherwise
        out.update(_bd_block([per_quality[q]["fp32"] for q in qs],
                             [per_quality[q]["quant"] for q in qs], pw))
        log.info("BD-rate: %.2f%%  BD-PSNR: %.3f dB  BD-rate(MS-SSIM): "
                 "%.2f%%", out["bd_rate_pct"], out["bd_psnr_db"],
                 out["bd_rate_msssim_pct"])
        for name in extra_images:
            out[f"bd_{name}"] = _bd_block(
                [per_quality[q]["extra"][name]["fp32"] for q in qs],
                [per_quality[q]["extra"][name]["quant"] for q in qs], pw)
            log.info("BD-rate[%s]: %.2f%%", name,
                     out[f"bd_{name}"]["bd_rate_pct"])
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    if os.path.exists(partial_path):
        os.remove(partial_path)
    return out


def dataclass_row(res) -> dict:
    return {"psnr": res.psnr, "ms_ssim": res.ms_ssim,
            "ms_ssim_db": res.ms_ssim_db, "bpp": res.bpp}


def parse_extra_eval(spec: str):
    """``name=dir[@HxW],…`` -> ((name, dir, pad_to|None), ...). The
    optional ``@HxW`` suffix floors that set's padded shape (one jit
    bucket for varied-shape sets: ``clic=/d/clic41@1792x2048``)."""
    if not spec:
        return ()
    out = []
    for part in spec.split(","):
        name, _, d = part.partition("=")
        if not d:
            raise ValueError(f"--extra_eval needs name=dir, got {part!r}")
        d, _, bucket = d.partition("@")
        pad_to = None
        if bucket:
            h, _, w = bucket.lower().partition("x")
            pad_to = (int(h), int(w))
        out.append((name, d, pad_to))
    return tuple(out)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arch", default="Cheng2020")
    p.add_argument("--qualities", default="1,2,3,4,5,6")
    p.add_argument("--n_bits_w", type=int, default=8)
    p.add_argument("--n_bits_a", type=int, default=8)
    p.add_argument("--act_quant", action="store_true")
    p.add_argument("--iters_w", type=int, default=0)
    p.add_argument("--test_dir", default="")
    p.add_argument("--calib_dir", default=DEFAULT_CALIB_DIR,
                   help="calibration-crop source (reference: clic41)")
    p.add_argument("--extra_eval", default="",
                   help="extra eval sets, e.g. tecnick=/d/tecnick,clic=/d/clic")
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
    p.add_argument("--eval_pad_to", default="",
                   help="HxW floor for every eval image's padded shape "
                        "(one compile bucket for varied-shape sets like "
                        "CLIC), e.g. 1536x2048")
    p.add_argument("--bias_correct", action="store_true",
                   help="fold the measured per-stage quantization output "
                        "shift into biases (zero-iteration correction on "
                        "calib_dir crops; quant/bias_correct.py)")
    p.add_argument("--mixed_avg_bits", type=float, default=0.0,
                   help="mixed-precision weights: measure per-unit RD "
                        "sensitivity on calib_dir crops and allocate bit "
                        "widths under this average-bits-per-UNIT budget "
                        "(quant/sensitivity.py); the realized per-weight "
                        "average is recorded in the artifact; 0 = "
                        "uniform n_bits_w")
    a = p.parse_args(argv)
    pad_to = None
    if a.eval_pad_to:
        h, _, w = a.eval_pad_to.lower().partition("x")
        pad_to = (int(h), int(w))
    run(a.arch, tuple(int(x) for x in a.qualities.split(",")), a.n_bits_w,
        a.n_bits_a, a.act_quant, a.iters_w, a.test_dir, a.ckpt_pattern,
        a.out, compute_dtype=a.compute_dtype, remat=a.remat,
        batch_size=a.batch_size, calib_dir=a.calib_dir,
        extra_eval=parse_extra_eval(a.extra_eval), eval_pad_to=pad_to,
        bias_correct=a.bias_correct, mixed_avg_bits=a.mixed_avg_bits)


if __name__ == "__main__":
    main()
