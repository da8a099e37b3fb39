"""FLOPs / memory accounting via XLA's own cost analysis.

The reference hand-writes per-layer FLOP formulas (`NIC.flops()`
nic_cvt.py:316-353, models/layers.py:171-182,306-318,373-377). The
TPU-native replacement asks the compiler: lower the jitted forward and
read XLA's cost analysis — exact for whatever graph actually runs, and
free for every model in the zoo.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def cost_analysis(fn, *args) -> Dict[str, float]:
    """Compile ``fn(*args)`` and return XLA's cost analysis dict
    (flops, bytes accessed, ...)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, (list, tuple)):
        costs = costs[0]
    return dict(costs) if costs else {}


def model_flops(model, params, input_shape: Tuple[int, int, int, int]
                ) -> Dict[str, float]:
    """FLOPs + HBM bytes of the full likelihood forward at the given NHWC
    input shape."""
    x = jnp.zeros(input_shape, jnp.float32)

    def f(params, x):
        out = model.forward(params, x)
        return out["x_hat"], out["likelihoods"]

    costs = cost_analysis(f, params, x)
    n_pix = input_shape[0] * input_shape[1] * input_shape[2]
    out = {"flops": costs.get("flops", float("nan")),
           "bytes_accessed": costs.get("bytes accessed", float("nan"))}
    out["flops_per_pixel"] = out["flops"] / n_pix
    return out


def coder_flops(model, params, coder_name: str,
                input_shape: Tuple[int, int, int, int]) -> float:
    """FLOPs of a single coder (g_a / h_a / h_s / g_s) — the reference
    reports per-transform numbers."""
    coder = model.coders[coder_name]
    x = jnp.zeros(input_shape, jnp.float32)
    costs = cost_analysis(lambda p, v: coder.run(p, v), params, x)
    return costs.get("flops", float("nan"))


__all__ = ["cost_analysis", "model_flops", "coder_flops"]
