"""Minimal repro for the deterministic q4/q5 device fault (VERDICT r2
Weak #7 / Next #8): Cheng2020 N=192 g_s upsample-unit calibration faulted
the TPU at batch 4 (batch 2 passes) during round-1/2 sweeps.

Isolates the exact unit (g_s/rbu1, the first N=192 residual-block-
upsample stage) on a random-init model and bisects the variables:

  stage A  batch 2, fp32      (known-good control)
  stage B  batch 4, fp32      (the faulting config)
  stage C  batch 4, bf16 compute (ruled out in round 2, re-checked)
  stage D  batch 4, iters/4   (fault early vs late -> memory creep?)

Each stage runs in a SUBPROCESS with a KILL timeout (device faults over
the tunnel hang the client instead of raising, CLAUDE.md) and records
device memory stats before/after when the backend exposes them. Output:
artifacts/fault_repro.json with a pass/fail/hang verdict per stage —
enough to attribute the fault to tunnel vs XLA vs memory.

Run on an idle chip:  python scripts/fault_repro.py
One stage in-process:  python scripts/fault_repro.py --stage B
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STAGES = {
    "A": {"batch": 2, "dtype": "float32", "iters": 2000},
    "B": {"batch": 4, "dtype": "float32", "iters": 2000},
    "C": {"batch": 4, "dtype": "bfloat16", "iters": 2000},
    "D": {"batch": 4, "dtype": "float32", "iters": 500},
    # E: the faithful config — the round-1/2 fault hit TRAINED anchors,
    # whose latent/weight amplitudes are ~1e3x the random-init stages
    # above (rec losses there round to 0.0 at 6 digits). Uses the
    # committed q5 anchor so the repro is regenerable.
    "E": {"batch": 4, "dtype": "float32", "iters": 2000,
          "ckpt": "ckpts/cheng2020_q5.npz"},
}


def run_stage(name: str) -> dict:
    """Run one config in-process. Returns diagnostics (raises on fault)."""
    import jax
    import jax.numpy as jnp

    from rdoptq_tpu.eval import datasets
    from rdoptq_tpu.models import registry
    from rdoptq_tpu.quant import rdo, wrap

    cfg_s = dict(STAGES[name])
    if os.environ.get("FAULT_REPRO_ITERS"):  # smoke-test override
        cfg_s["iters"] = int(os.environ["FAULT_REPRO_ITERS"])
    dev = jax.devices()[0]
    mem0 = getattr(dev, "memory_stats", lambda: None)()

    model = registry.build_model("Cheng2020", 5)  # N=192 dims (q4-6 class)
    if cfg_s.get("ckpt"):
        from rdoptq_tpu.utils import checkpoint
        params = checkpoint.load_pytree(cfg_s["ckpt"])
    else:
        params = model.init(jax.random.PRNGKey(0))
    calib_dir = "/root/reference/task-oriented-PTQ/datasets/clic41"
    cali = jnp.asarray(datasets.random_crops(
        datasets.load_dir(calib_dir), 12, 256, 1005))

    wcfg = wrap.WeightQuantConfig(n_bits=8, channel_wise=True)
    cfg = rdo.RDOConfig(iters=cfg_s["iters"], batch_size=cfg_s["batch"],
                        compute_dtype=cfg_s["dtype"])
    state = rdo.init_ptq_state(params, wcfg)
    coder = model.coders["g_s"]
    # unit 1 = g_s/rbu1, the first N=192 upsample stage (the faulter)
    t0 = time.time()
    diag = rdo.calibrate_unit(model, params, state, coder, 1, cali, cfg,
                              key=jax.random.PRNGKey(7))
    wall = time.time() - t0
    mem1 = getattr(dev, "memory_stats", lambda: None)()
    out = {"ok": True, "wall_s": round(wall, 1),
           "loss": {k: (round(v, 6) if isinstance(v, float) else v)
                    for k, v in diag.items()},
           "mem_before": mem0, "mem_after": mem1,
           "platform": dev.platform}
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="")
    p.add_argument("--timeout", type=int, default=1500)
    p.add_argument("--out", default="artifacts/fault_repro.json")
    args = p.parse_args()

    if args.stage:  # child mode: run one stage, print JSON
        print("FAULT_REPRO_RESULT " + json.dumps(run_stage(args.stage)))
        return

    results = {}
    for name, cfg in STAGES.items():
        print(f"== stage {name}: {cfg}")
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--stage", name],
                capture_output=True, text=True, timeout=args.timeout)
            wall = time.time() - t0
            line = next((ln for ln in proc.stdout.splitlines()
                         if ln.startswith("FAULT_REPRO_RESULT ")), None)
            if proc.returncode == 0 and line:
                results[name] = {"config": cfg, "verdict": "pass",
                                 **json.loads(line.split(" ", 1)[1])}
            else:
                tail = (proc.stderr or proc.stdout).splitlines()[-15:]
                results[name] = {"config": cfg, "verdict": "error",
                                 "returncode": proc.returncode,
                                 "wall_s": round(wall, 1),
                                 "tail": tail}
        except subprocess.TimeoutExpired:
            results[name] = {"config": cfg, "verdict": "hang",
                             "timeout_s": args.timeout}
        print(json.dumps({k: v.get("verdict") for k, v in results.items()}))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
