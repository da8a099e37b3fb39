"""Mixed-precision sensitivity sweep + bit allocation tests."""

import jax
import numpy as np
import pytest

from rdoptq_tpu.models.minnen2018 import Minnen2018
from rdoptq_tpu.quant import rdo, sensitivity, wrap


@pytest.fixture(scope="module")
def setup():
    model = Minnen2018(N=8, M=8)
    params = model.init(jax.random.PRNGKey(0))
    cali = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    return model, params, cali


def test_unit_sensitivity_shapes_and_monotonicity(setup):
    model, params, cali = setup
    sens = sensitivity.unit_sensitivity(model, params, cali,
                                        bits_list=(2, 8))
    # every quantizable unit is covered
    assert "g_a/conv0" in sens and "ep/conv2" in sens
    # 8-bit hurts no more than 2-bit for the vast majority of units
    worse = sum(1 for v in sens.values() if v[8] > v[2] + 1e-6)
    assert worse <= len(sens) // 4


def test_allocate_bits_budget_and_plumbing(setup):
    model, params, cali = setup
    sens = sensitivity.unit_sensitivity(model, params, cali,
                                        bits_list=(2, 4, 8))
    ov_low = sensitivity.allocate_bits(model, sens, avg_bits=3.0,
                                       bits_list=(2, 4, 8))
    ov_high = sensitivity.allocate_bits(model, sens, avg_bits=7.0,
                                        bits_list=(2, 4, 8))
    def avg(ov):
        return np.mean([b for _, b in ov])

    # higher budget -> strictly more bits on average
    assert avg(ov_high) > avg(ov_low)
    # plugs into the quant config + engine
    cfg = wrap.WeightQuantConfig(n_bits=2, bit_overrides=ov_low)
    state = rdo.init_ptq_state(params, cfg)
    assert len(state.qstate) > 0
