"""Effectiveness test: RDO/AdaRound calibration must beat nearest
rounding on the task objective it optimizes (low-bit regime, where
rounding decisions matter)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdoptq_tpu.models.minnen2018 import Minnen2018
from rdoptq_tpu.ops.entropy import quantize_ste
from rdoptq_tpu.quant import rdo, wrap


@pytest.mark.slow
def test_adaround_beats_nearest_at_low_bits():
    model = Minnen2018(N=12, M=12)
    params = model.init(jax.random.PRNGKey(0))
    cali = jax.random.uniform(jax.random.PRNGKey(1), (8, 64, 64, 3))

    wcfg = wrap.WeightQuantConfig(n_bits=3, channel_wise=True,
                                  scale_method="max")
    state = rdo.init_ptq_state(params, wcfg)
    # generous optimization for a deterministic test: no QDrop noise,
    # late regularization so alphas binarize at the end
    cfg = rdo.RDOConfig(iters=600, batch_size=4, input_prob=1.0,
                        warmup=0.5, weight=0.002, lr=3e-3)
    coder, k = model.g_a, 0
    rdo.calibrate_unit(model, params, state, coder, k, cali, cfg,
                       key=jax.random.PRNGKey(2))

    # task objective: latent after the rest of g_a, with STE rounding
    def task_out(p):
        y = coder.run(p, cali)
        return quantize_ste(y)

    tgt = task_out(params)
    p_near = wrap.quantize_leaves(
        params, state.qstate, {"g_a/conv0/w": "nearest"}, wcfg)
    p_hard = state.quantized_params(params)
    mse_near = float(jnp.mean((task_out(p_near) - tgt) ** 2))
    mse_hard = float(jnp.mean((task_out(p_hard) - tgt) ** 2))
    # layer-local reconstruction as a secondary check
    tape = {}
    model.forward(params, cali, tape=tape,
                  tape_filter=frozenset({"g_a/conv0:out"}))
    fp_out = tape["g_a/conv0:out"]
    out_near = coder.stages[0].fn(p_near, cali, rdo.NULL_CTX)
    out_hard = coder.stages[0].fn(p_hard, cali, rdo.NULL_CTX)
    rec_near = float(jnp.mean((out_near - fp_out) ** 2))
    rec_hard = float(jnp.mean((out_hard - fp_out) ** 2))

    print(f"task mse nearest={mse_near:.6g} adaround={mse_hard:.6g} | "
          f"rec nearest={rec_near:.6g} adaround={rec_hard:.6g}")
    # AdaRound must improve the combined objective it optimizes
    assert rec_hard + mse_hard < rec_near + mse_near
