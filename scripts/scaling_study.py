"""Mesh-scaling smoke study on the virtual CPU mesh (1/2/4/8 devices).

Real multi-chip hardware is unavailable in this environment (one v5e
behind a tunnel), so this measures the SPMD path itself: dp-sharded RDO
calibration (`quant.rdo.calibrate_unit(mesh=...)`) and dp-sharded
dataset evaluation (`parallel.eval.evaluate_sharded`) at mesh sizes
1/2/4/8, fixed seed, identical global work.

What the numbers mean on this host: all virtual devices share ONE
physical core, so wall-clock cannot drop with mesh size here — the
useful outputs are (a) the sharding overhead (collectives + program
launch) vs the single-device program at the same global batch, which is
the cost the v5e-8 pays before its 8x compute kicks in, and (b) the
per-device work fraction (=1/dp), which is what scales on real chips.
Numerical parity across mesh sizes is asserted (same final loss).

Run:  RDOPTQ_PLATFORM=cpu python scripts/scaling_study.py
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("RDOPTQ_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from rdoptq_tpu.models.minnen2018 import Minnen2018
from rdoptq_tpu.parallel import eval as peval
from rdoptq_tpu.parallel import mesh as mesh_lib
from rdoptq_tpu.quant import rdo, wrap

ITERS = 200
GLOBAL_BATCH = 8


def calibrate_at(dp: int, model, params, cali) -> dict:
    mesh = mesh_lib.make_mesh(dp=dp, tp=1, devices=jax.devices()[:dp])
    state = rdo.init_ptq_state(params, wrap.WeightQuantConfig(n_bits=8))
    cfg = rdo.RDOConfig(iters=ITERS, batch_size=GLOBAL_BATCH)
    t0 = time.time()
    info = rdo.calibrate_unit(model, params, state, model.g_a, 0, cali,
                              cfg, key=jax.random.PRNGKey(7),
                              mesh=mesh if dp > 1 else None)
    wall = time.time() - t0
    return {"dp": dp, "wall_s": round(wall, 2),
            "it_per_s": round(info["steps_per_s"], 1),
            "opt_s": round(info["opt_s"], 2),
            "loss_last": float(info["loss_last"]),
            "per_device_batch": GLOBAL_BATCH // dp}


def eval_at(dp: int, model, params, images) -> dict:
    mesh = mesh_lib.make_mesh(dp=dp, tp=1, devices=jax.devices()[:dp])
    r = peval.evaluate_sharded(model, params, images, mesh)  # compile
    t0 = time.time()
    r = peval.evaluate_sharded(model, params, images, mesh)
    wall = time.time() - t0
    return {"dp": dp, "wall_s": round(wall, 2),
            "img_per_s": round(len(images) / wall, 2),
            "psnr": round(r.psnr, 4), "bpp": round(r.bpp, 5)}


def main():
    assert jax.device_count() >= 8, jax.devices()
    model = Minnen2018(N=64, M=96)
    params = model.init(jax.random.PRNGKey(0))
    cali = jax.random.uniform(jax.random.PRNGKey(1),
                              (GLOBAL_BATCH, 128, 128, 3))
    images = [np.asarray(jax.random.uniform(jax.random.PRNGKey(10 + i),
                                            (1, 256, 256, 3)))
              for i in range(8)]

    out = {"host_cores": os.cpu_count(), "iters": ITERS,
           "global_batch": GLOBAL_BATCH, "calibrate": [], "eval": []}
    for dp in (1, 2, 4, 8):
        row = calibrate_at(dp, model, params, cali)
        print("calibrate", row)
        out["calibrate"].append(row)
    # numerical parity: the sharded program computes the same optimization
    losses = [r["loss_last"] for r in out["calibrate"]]
    assert all(abs(l - losses[0]) / (abs(losses[0]) + 1e-9) < 5e-2
               for l in losses), losses

    for dp in (1, 2, 4, 8):
        row = eval_at(dp, model, params, images)
        print("eval", row)
        out["eval"].append(row)
    psnrs = [r["psnr"] for r in out["eval"]]
    assert max(psnrs) - min(psnrs) < 1e-2, psnrs

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/scaling_study.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts/scaling_study.json")


if __name__ == "__main__":
    main()
