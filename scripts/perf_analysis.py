"""Speed-of-light analysis of the hot forwards on one v5e chip.

VERDICT.md Weak #4 asks either for more fused Pallas kernels with a
measured win, or a profile-backed justification that stock XLA fusion
already runs near the hardware ceiling. This script produces that
justification (or identifies the op to hand-fuse next): for each zoo
model's full likelihood forward it reads XLA's own cost analysis
(flops / bytes accessed — `utils/flops.cost_analysis`), measures
steady-state wall-clock with an on-device scan (per-dispatch tunnel
RTT would otherwise dominate, CLAUDE.md), and locates the op mix on the
v5e roofline:

  peak MXU        197 TFLOP/s  (bf16; fp32 convs are lowered to bf16
                                MXU passes at default precision)
  peak HBM        819 GB/s
  ridge intensity 197e12/819e9 ≈ 240 FLOP/byte

A forward whose achieved bandwidth sits near peak HBM while its
arithmetic intensity is below the ridge is bandwidth-bound: XLA fusion
quality (not kernel arithmetic) is the ceiling, and a hand-written
Pallas kernel can only win by *removing HBM traffic* (more fusion), not
by better MXU scheduling. The table this prints is recorded in
artifacts/perf_analysis.json and summarized in RESULTS.md.

Run on the real TPU (idle chip):  python scripts/perf_analysis.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from rdoptq_tpu.models import registry
from rdoptq_tpu.utils import flops as F

PEAK_MXU_TFLOPS = 197.0   # v5e bf16
PEAK_HBM_GBS = 819.0      # v5e HBM bandwidth
K = 20                    # on-device scan reps per timing
SHAPE = (1, 512, 768, 3)  # Kodak-size NHWC

MODELS = (
    ("Minnen2018", 6, {}),
    ("Cheng2020", 6, {}),
    ("Lu2022", 6, {}),
    ("TinyLIC", 6, {"lam": 0.0483}),
)


def scan_forward(model, k: int):
    @jax.jit
    def f(p, v):
        def body(c, _):
            out = model.forward(p, v + (c * 1e-20).astype(v.dtype))
            return jnp.mean(out["x_hat"].astype(jnp.float32)), None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return s

    return f


def measure(model, params, x) -> float:
    # fetch the scalar (not block_until_ready): over the remote-compile
    # tunnel block_until_ready returns before remote execution finishes,
    # under-reporting walls by ~1000x (CLAUDE.md: sub-ms timings lie);
    # materializing the value forces the full round trip, same protocol
    # as scripts/bench_serving.timed
    f = scan_forward(model, K)
    float(f(params, x))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(f(params, x))
        best = min(best, (time.time() - t0) / K)
    return best


def main():
    rows = []
    for arch, q, kw in MODELS:
        model = registry.build_model(arch, q, **kw)
        params = registry.load_params(model, arch, "")
        params = jax.device_put(params)
        x = jnp.zeros(SHAPE, jnp.float32)

        def fwd(p, v):
            out = model.forward(p, v)
            return out["x_hat"], out["likelihoods"]

        costs = F.cost_analysis(fwd, params, x)
        fl = costs.get("flops", float("nan"))
        by = costs.get("bytes accessed", float("nan"))

        wall = measure(model, params, x)
        tflops = fl / wall / 1e12
        gbs = by / wall / 1e9
        row = {
            "model": f"{arch}-q{q}",
            "flops_g": round(fl / 1e9, 2),
            "hbm_gb": round(by / 1e9, 3),
            "intensity_flop_per_byte": round(fl / by, 1),
            "wall_ms": round(wall * 1e3, 3),
            "achieved_tflops": round(tflops, 2),
            "pct_peak_mxu": round(100 * tflops / PEAK_MXU_TFLOPS, 1),
            "achieved_hbm_gbs": round(gbs, 1),
            "pct_peak_hbm": round(100 * gbs / PEAK_HBM_GBS, 1),
            "bound": ("compute" if fl / by >= PEAK_MXU_TFLOPS * 1e12 /
                      (PEAK_HBM_GBS * 1e9) else "bandwidth"),
        }
        rows.append(row)
        print(row, flush=True)

    out = {"shape": list(SHAPE), "scan_reps": K,
           "peak_mxu_tflops": PEAK_MXU_TFLOPS,
           "peak_hbm_gbs": PEAK_HBM_GBS, "rows": rows,
           "platform": jax.devices()[0].platform}
    os.makedirs("artifacts", exist_ok=True)
    # atomic: a KILL mid-dump must not leave a truncated artifact that
    # reads as a completed (non-INVALID) measurement
    tmp = "artifacts/perf_analysis.json.tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=2)
    os.replace(tmp, "artifacts/perf_analysis.json")
    print("wrote artifacts/perf_analysis.json")


if __name__ == "__main__":
    main()
