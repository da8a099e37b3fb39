"""Unit tests for core quantization math (rdoptq_tpu.ops.quant / adaround).

Validated against independent NumPy reimplementations of the reference
semantics (task-oriented-PTQ/quantization/quantizer.py) and hand-computed
values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdoptq_tpu.ops import adaround, quant


def test_round_ste_value_and_grad():
    x = jnp.array([0.2, 0.5, 1.7, -0.6])
    assert np.allclose(quant.round_ste(x), np.round(np.array(x)))
    g = jax.grad(lambda v: jnp.sum(quant.round_ste(v)))(x)
    assert np.allclose(g, 1.0)


def test_fake_quant_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    qp = quant.init_scale_max(x, n_bits=8)
    xq = quant.fake_quant(x, qp, n_bits=8)
    # inside the covered range, error is at most half a step
    assert float(jnp.max(jnp.abs(xq - x))) <= float(qp.delta) / 2 + 1e-6


def test_fake_quant_matches_int_path():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
    qp = quant.init_scale_max(x, n_bits=8)
    xq = quant.fake_quant(x, qp, n_bits=8)
    ints = quant.quantize(x, qp, n_bits=8)
    assert ints.min() >= 0 and ints.max() <= 255
    assert np.allclose(quant.dequantize(ints, qp), xq, atol=1e-6)


def test_init_scale_max_formula():
    x = jnp.array([-1.0, 0.0, 3.0])
    qp = quant.init_scale_max(x, n_bits=8)
    delta = 4.0 / 255.0
    assert np.isclose(float(qp.delta), delta)
    assert np.isclose(float(qp.zero_point), np.round(1.0 / delta))


def test_init_scale_max_nonnegative_input():
    # x_min is clamped to 0 (reference quantizer.py:282)
    x = jnp.array([0.5, 1.0, 2.0])
    qp = quant.init_scale_max(x, n_bits=4)
    assert np.isclose(float(qp.delta), 2.0 / 15.0)
    assert float(qp.zero_point) == 0.0


def test_init_scale_sym():
    x = jnp.array([-2.0, 1.0])
    qp = quant.init_scale_max(x, n_bits=8, sym=True)
    # symmetric: range becomes [-2, 2]
    assert np.isclose(float(qp.delta), 4.0 / 255.0)


def test_init_scale_gaussian_uses_variance():
    # parity quirk: reference uses mu ± 6·Var (not std)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1000,)).astype(np.float32) * 0.1)
    qp = quant.init_scale_gaussian(x, n_bits=8)
    mu = float(jnp.mean(x))
    var = float(jnp.var(x, ddof=1))
    x_min = min(mu - 6 * var, 0.0)
    x_max = max(mu + 6 * var, 0.0)
    assert np.isclose(float(qp.delta), max((x_max - x_min) / 255.0, quant.EPS),
                      rtol=1e-5)


def _grid_reference(x, n_bits, p):
    """Independent NumPy port of the reference grid search
    (quantizer.py:300-316)."""
    x = np.asarray(x, dtype=np.float64)
    x_max, x_min = x.max(), x.min()
    best_score, best = np.inf, None
    n_levels = 2 ** n_bits
    for i in range(10):
        new_max = x_max * (1.0 - i * 0.05)
        new_min = x_min * (1.0 - i * 0.05)
        delta = max((new_max - new_min) / (n_levels - 1), quant.EPS)
        zp = np.round(-new_min / delta)
        xq = (np.clip(np.round(x / delta) + zp, 0, n_levels - 1) - zp) * delta
        score = np.mean(np.abs(x - xq) ** p)
        if score < best_score:
            best_score, best = score, (delta, zp)
    return best


@pytest.mark.parametrize("method,p", [("mse", 3.5), ("l1", 1.0), ("l2", 2.0)])
def test_init_scale_grid_matches_reference_loop(method, p):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(256,)).astype(np.float32) * 2.0
    qp = quant.init_scale(jnp.asarray(x), n_bits=8, method=method)
    delta_ref, zp_ref = _grid_reference(x, 8, p)
    assert np.isclose(float(qp.delta), delta_ref, rtol=1e-4)
    assert float(qp.zero_point) == zp_ref


def test_channelwise_matches_per_channel_loop():
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32))
    qp = quant.init_scale_channelwise(w, n_bits=8, method="mse",
                                      channel_axis=-1)
    assert qp.delta.shape == (1, 1, 1, 16)
    for c in [0, 7, 15]:
        qp_c = quant.init_scale(w[..., c].ravel(), n_bits=8, method="mse")
        assert np.isclose(float(qp.delta[0, 0, 0, c]), float(qp_c.delta),
                          rtol=1e-5)
        assert float(qp.zero_point[0, 0, 0, c]) == float(qp_c.zero_point)


def _handle_parameter_reference(param, b_w=8):
    """Independent NumPy port of reference Handle_Parameter
    (quantizer.py:81-96)."""
    bit_range = 2 ** b_w - 1
    zero_point = param.min()
    pn = param - zero_point
    rng = max(np.abs(pn).max(), 1e-6)
    p01 = np.clip(pn / rng, -1, 1)
    return np.round(p01 * bit_range) / bit_range * rng + zero_point


def test_dynamic_act_quant_matches_reference():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 4, 4, 6)).astype(np.float32)
    out = np.asarray(quant.dynamic_act_fake_quant(jnp.asarray(x),
                                                  channel_axis=-1))
    for c in range(6):
        ref = _handle_parameter_reference(x[..., c])
        assert np.allclose(out[..., c], ref, atol=1e-6)


def test_fixed_point_act_quant():
    x = jnp.array([1.004, -300.0, 300.0, 0.1234])
    out = quant.fixed_point_act_quant(x)  # Q8.8
    assert np.isclose(float(out[0]), np.round(1.004 * 256) / 256)
    assert float(out[1]) == -128.0
    assert float(out[2]) == 128.0


def test_adaround_alpha_init_recovers_rest():
    rng = np.random.default_rng(6)
    w = jnp.asarray(rng.normal(size=(40,)).astype(np.float32))
    qp = quant.init_scale_max(w, n_bits=8)
    alpha = adaround.init_alpha(w, qp)
    rest = w / qp.delta - jnp.floor(w / qp.delta)
    assert np.allclose(adaround.rectified_sigmoid(alpha), rest, atol=1e-4)
    # at init, soft quantization reproduces the FP32 weight (h(alpha)=rest,
    # the reference's "Init alpha to be FP32") for non-clamped elements
    soft = adaround.adaround_fake_quant(w, qp, alpha, 8, soft=True)
    lvl = np.asarray(jnp.floor(w / qp.delta) + qp.zero_point)
    unclamped = (lvl >= 0) & (lvl + 1 <= 255)
    assert np.allclose(np.asarray(soft)[unclamped], np.asarray(w)[unclamped],
                       atol=1e-4)
    # hard quantization at init == nearest rounding (alpha >= 0 <-> rest >= .5)
    hard = adaround.adaround_fake_quant(w, qp, alpha, 8, soft=False)
    near = quant.fake_quant(w, qp, 8)
    # ties at rest == 0.5 round differently; exclude the knife-edge
    rest = np.asarray(w / qp.delta - jnp.floor(w / qp.delta))
    mask = np.abs(rest - 0.5) > 1e-3
    assert np.allclose(np.asarray(hard)[mask], np.asarray(near)[mask],
                       atol=1e-6)


def test_adaround_hard_rounding():
    w = jnp.array([0.0, 1.0, 2.0, 3.0])
    qp = quant.QParams(jnp.float32(1.0), jnp.float32(0.0))
    up = jnp.full(4, 5.0)    # alpha >= 0 -> round up
    down = jnp.full(4, -5.0)  # alpha < 0 -> round down (floor)
    w_off = w + 0.3
    hard_up = adaround.adaround_fake_quant(w_off, qp, up, 8, soft=False)
    hard_down = adaround.adaround_fake_quant(w_off, qp, down, 8, soft=False)
    assert np.allclose(hard_up, w + 1.0)
    assert np.allclose(hard_down, w)


def test_round_reg_and_temp_decay():
    # h in {0, 1} -> zero regularization
    alpha = jnp.array([20.0, -20.0])
    assert float(adaround.round_reg(alpha, jnp.float32(2.0))) < 1e-6
    # h = 0.5 (alpha such that sigmoid*1.2-0.1 = 0.5 -> sigmoid = 0.5 -> a=0)
    assert np.isclose(float(adaround.round_reg(jnp.array([0.0]),
                                               jnp.float32(2.0))), 1.0)
    # temperature schedule
    f = lambda t: float(adaround.linear_temp_decay(
        jnp.float32(t), t_max=100, rel_start_decay=0.2, start_b=20, end_b=2))
    assert f(0) == 20.0 and f(19) == 20.0
    assert np.isclose(f(100), 2.0)
    assert np.isclose(f(60), 2 + 18 * 0.5)


def test_adaround_grad_flows_to_alpha():
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    qp = quant.init_scale_max(w, n_bits=8)
    alpha = adaround.init_alpha(w, qp)

    def loss(a):
        wq = adaround.adaround_fake_quant(w, qp, a, 8, soft=True)
        return jnp.sum((wq - w) ** 2)

    g = jax.grad(loss)(alpha)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0.0


def test_lp_loss_reductions():
    p = jnp.ones((2, 3, 4))
    t = jnp.zeros((2, 3, 4))
    assert np.isclose(float(quant.lp_loss(p, t, 2.0, "mean")), 1.0)
    assert np.isclose(float(quant.lp_loss(p, t, 2.0, "channel_sum")), 4.0)
