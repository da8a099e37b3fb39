"""Per-unit quantization sensitivity analysis + mixed-precision bit
allocation.

Beyond-reference capability (the reference supports only a global bit
width plus the first/last-8-bit exception): measure how much each
calibration unit hurts the task objective when quantized at each candidate
bit width (nearest rounding, everything else FP32), then greedily allocate
per-leaf bit widths under an average-bits budget. The result plugs
directly into ``WeightQuantConfig.bit_overrides`` and the RDO engine.

One jitted scoring program (params as an argument) serves every
(unit, bits) probe — the sweep is units × bits device dispatches, no
recompiles.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models.layers import NULL_CTX
from ..ops import metrics as M
from . import wrap

log = logging.getLogger(__name__)


def _score_fn(model, lmbda: float):
    @jax.jit
    def run(params, x, x_hat_ref):
        out = model.forward(params, x)
        n, h, w, _ = x.shape
        bpp = M.bpp_from_likelihoods(out["likelihoods"], n * h * w)
        mse = jnp.mean((out["x_hat"] - x_hat_ref) ** 2)
        return lmbda * (255.0 ** 2) * mse + bpp

    return run


def unit_sensitivity(model, params, cali_data,
                     bits_list: Sequence[int] = (2, 3, 4, 6, 8),
                     lmbda: float = 0.0483,
                     scale_method: str = "max") -> Dict[str, Dict[int, float]]:
    """RD-loss (vs the FP32 reconstruction) when quantizing ONLY one unit's
    leaves at each bit width. Returns {unit_name: {bits: loss}}."""
    leaves = wrap.find_quant_leaves(params)
    score = _score_fn(model, lmbda)
    x = jnp.asarray(cali_data)
    # jitted: an eager full-model forward pays per-op dispatch latency
    # over the remote device link
    x_hat_ref = jax.jit(
        lambda p, v: model.forward(p, v)["x_hat"])(params, x)
    base = float(score(params, x, x_hat_ref))

    sens: Dict[str, Dict[int, float]] = {}
    for coder_name in model.calibration_order():
        coder = model.coders[coder_name]
        for st in coder.stages:
            paths = [p for p in st.leaf_paths
                     if any(l.path == p for l in leaves)]
            if not paths:
                continue
            sens[st.name] = {}
            for bits in bits_list:
                cfg = wrap.WeightQuantConfig(n_bits=bits,
                                             channel_wise=True,
                                             scale_method=scale_method)
                qstate = wrap.init_weight_qstate(
                    params, [l for l in leaves if l.path in paths], cfg)
                pq = wrap.quantize_leaves(
                    params, qstate, {p: "nearest" for p in paths}, cfg)
                sens[st.name][bits] = float(score(pq, x, x_hat_ref)) - base
    return sens


def allocate_bits(model, sens: Dict[str, Dict[int, float]],
                  avg_bits: float,
                  bits_list: Sequence[int] = (2, 3, 4, 6, 8)
                  ) -> Tuple[Tuple[str, int], ...]:
    """Greedy mixed-precision allocation: start every unit at the lowest
    candidate width, repeatedly upgrade the unit with the best
    loss-reduction-per-extra-bit until the average hits ``avg_bits``.
    Returns per-leaf ``bit_overrides`` for WeightQuantConfig.

    ``avg_bits`` budgets the average over calibration UNITS (stages),
    not parameters — units differ in weight count, so the realized
    bits-per-weight can deviate; callers that report model size should
    compute it from the final overrides (cli/sweep records
    ``mixed_bits_per_weight`` per quality). Units whose sensitivity
    shows no gain are never upgraded, so the budget may be underspent
    (smaller model than asked, never larger)."""
    bits_list = sorted(bits_list)
    stage_leaves = {}
    for coder_name in model.calibration_order():
        for st in model.coders[coder_name].stages:
            if st.name in sens:
                stage_leaves[st.name] = st.leaf_paths
    assign = {name: bits_list[0] for name in sens}
    n = len(assign)
    budget = avg_bits * n

    def total_bits():
        return sum(assign.values())

    while total_bits() < budget:
        best, best_gain = None, 0.0
        for name, cur in assign.items():
            idx = bits_list.index(cur)
            if idx + 1 >= len(bits_list):
                continue
            nxt = bits_list[idx + 1]
            if total_bits() - cur + nxt > budget:
                continue
            gain = (sens[name][cur] - sens[name][nxt]) / (nxt - cur)
            if gain > best_gain:
                best, best_gain = name, gain
        if best is None:
            break
        assign[best] = bits_list[bits_list.index(assign[best]) + 1]

    overrides: List[Tuple[str, int]] = []
    for name, bits in assign.items():
        for leaf in stage_leaves[name]:
            overrides.append((leaf, bits))
    log.info("mixed-precision allocation (avg %.2f bits): %s", avg_bits,
             assign)
    return tuple(overrides)


__all__ = ["unit_sensitivity", "allocate_bits"]
