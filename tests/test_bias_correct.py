"""Bias-correction tests (quant/bias_correct.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from rdoptq_tpu.models.base import get_leaf
from rdoptq_tpu.models.minnen2018 import Minnen2018
from rdoptq_tpu.quant import bias_correct as bc
from rdoptq_tpu.quant import wrap


def _setup():
    model = Minnen2018(N=8, M=8)
    params = model.init(jax.random.PRNGKey(0))
    leaves = wrap.find_quant_leaves(params)
    wcfg = wrap.WeightQuantConfig(n_bits=4, channel_wise=True)
    qstate = wrap.init_weight_qstate(params, leaves, wcfg)
    modes = {l.path: "nearest" for l in leaves}
    params_q = wrap.quantize_leaves(params, qstate, modes, wcfg)
    x = jnp.asarray(np.random.RandomState(3).rand(2, 64, 64, 3)
                    .astype("float32"))
    return model, params, params_q, x


def test_bias_correction_reduces_stage_shift():
    """Corrected stages must have (near-)zero channel-mean error where
    the output is affine in the bias; kept corrections must strictly
    reduce the measured shift; the model output error must not grow."""
    model, params, params_q, x = _setup()
    params_c, rep = bc.bias_correct(model, params, params_q, x,
                                    report=True)
    assert rep["kept"], "aggressive 4-bit quantization must shift means"
    for name, e1, e2 in rep["kept"]:
        assert e2 < e1, (name, e1, e2)

    # end-to-end: the corrected model is no worse in reconstruction MSE
    fp = model.forward(params, x)["x_hat"]
    before = float(jnp.mean((model.forward(params_q, x)["x_hat"] - fp) ** 2))
    after = float(jnp.mean((model.forward(params_c, x)["x_hat"] - fp) ** 2))
    assert after < before * 1.05, (before, after)


def test_bias_correction_changes_only_biases():
    model, params, params_q, x = _setup()
    params_c = bc.bias_correct(model, params, params_q, x)
    flat_q = wrap.find_quant_leaves(params_q)
    for leaf in flat_q:  # every quantizable (non-bias) leaf untouched
        np.testing.assert_array_equal(get_leaf(params_q, leaf.path),
                                      get_leaf(params_c, leaf.path))


def test_bias_correction_noop_on_identical_params():
    """fp == quantized -> zero error everywhere; corrections are all
    dropped or exactly zero (params unchanged)."""
    model, params, _, x = _setup()
    params_c = bc.bias_correct(model, params, params, x)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(params_c)
    for u, v in zip(a, b):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   atol=1e-7)
