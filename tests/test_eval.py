"""Tests for the evaluation harness, datasets, and BD-rate metrics."""

import os

import jax
import numpy as np
import pytest

from rdoptq_tpu.eval import bdrate, datasets, harness
from rdoptq_tpu.models.minnen2018 import Minnen2018


def test_bd_rate_identical_curves_zero():
    r = [0.2, 0.4, 0.8, 1.2]
    p = [30.0, 33.0, 36.0, 38.0]
    assert abs(bdrate.bd_rate(r, p, r, p)) < 1e-9
    assert abs(bdrate.bd_psnr(r, p, r, p)) < 1e-9


def test_bd_rate_10pct_rate_overhead():
    r = np.array([0.2, 0.4, 0.8, 1.2])
    p = np.array([30.0, 33.0, 36.0, 38.0])
    # test curve needs 10% more rate at the same quality
    val = bdrate.bd_rate(r, p, r * 1.1, p)
    assert abs(val - 10.0) < 0.2
    # and a worse-quality curve has positive BD-rate
    assert bdrate.bd_rate(r, p, r, p - 0.5) > 0


def test_bd_rate_pchip_variant():
    """The piecewise (pchip) variant (reference BD-rate.py:68-82) agrees
    with the cubic fit on smooth curves and satisfies the same
    invariants."""
    r = np.array([0.2, 0.4, 0.8, 1.2])
    p = np.array([30.0, 33.0, 36.0, 38.0])
    assert abs(bdrate.bd_rate(r, p, r, p, piecewise=True)) < 1e-9
    val = bdrate.bd_rate(r, p, r * 1.1, p, piecewise=True)
    assert abs(val - 10.0) < 0.2
    poly = bdrate.bd_rate(r, p, r * 1.05, p - 0.2)
    pch = bdrate.bd_rate(r, p, r * 1.05, p - 0.2, piecewise=True)
    assert abs(poly - pch) < 1.0
    assert bdrate.bd_psnr(r, p, r, p + 1.0,
                          piecewise=True) == pytest.approx(1.0, abs=1e-6)
    # 5+ points (where a single cubic can oscillate) still work
    r5 = np.array([0.15, 0.3, 0.5, 0.8, 1.3])
    p5 = np.array([29.0, 31.5, 33.5, 35.8, 38.0])
    assert abs(bdrate.bd_rate(r5, p5, r5, p5, piecewise=True)) < 1e-9


def test_bd_block_two_point_pchip():
    """Short sweeps (e.g. the two-quality ms-ssim block) get a BD block
    via the pchip fit (linear at 2 points); the cubic fit needs >=4."""
    from rdoptq_tpu.cli.sweep import _bd_block
    a = [{"psnr": 30.0, "ms_ssim_db": 15.0, "bpp": 0.3},
         {"psnr": 32.0, "ms_ssim_db": 16.0, "bpp": 0.5}]
    blk = _bd_block(a, a, piecewise=True)
    assert blk["bd_fit"] == "pchip"
    assert abs(blk["bd_rate_pct"]) < 1e-9
    assert abs(blk["bd_rate_msssim_pct"]) < 1e-9
    # 10% rate overhead at equal quality reads ~10% on both objectives
    t = [dict(r, bpp=r["bpp"] * 1.1) for r in a]
    blk = _bd_block(a, t, piecewise=True)
    assert blk["bd_rate_pct"] == pytest.approx(10.0, abs=0.2)
    assert blk["bd_rate_msssim_pct"] == pytest.approx(10.0, abs=0.2)
    # the block must be json-serializable (artifact files)
    import json
    json.dumps(blk)


def test_bd_psnr_sign():
    r = [0.2, 0.4, 0.8, 1.2]
    p = np.array([30.0, 33.0, 36.0, 38.0])
    assert bdrate.bd_psnr(r, p, r, p + 1.0) == pytest.approx(1.0, abs=1e-6)


@pytest.mark.skipif(not os.path.isdir(datasets.DEFAULT_KODAK),
                    reason="Kodak assets unavailable")
def test_kodak_loader():
    imgs = datasets.kodak(limit=2)
    assert len(imgs) == 2
    assert imgs[0].ndim == 4 and imgs[0].shape[-1] == 3
    assert imgs[0].max() <= 1.0 and imgs[0].min() >= 0.0
    assert {imgs[0].shape[1], imgs[0].shape[2]} == {512, 768}


@pytest.mark.skipif(not os.path.isdir(datasets.DEFAULT_KODAK),
                    reason="Kodak assets unavailable")
def test_random_crops():
    imgs = datasets.kodak(limit=3)
    crops = datasets.random_crops(imgs, num=5, size=128)
    assert crops.shape == (5, 128, 128, 3)
    # deterministic under the same seed
    crops2 = datasets.random_crops(imgs, num=5, size=128)
    assert np.array_equal(crops, crops2)


def test_evaluate_tiny_model_on_synthetic():
    model = Minnen2018(N=16, M=24)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    # smooth synthetic images (noise compresses at ~8bpp which is useless)
    base = rng.random((1, 100, 140, 3)).astype(np.float32)
    imgs = [np.clip(np.cumsum(base, axis=2) / 140.0, 0, 1),
            base * 0 + 0.5]
    res = harness.evaluate(model, params, imgs, pad_multiple=64)
    assert len(res.per_image) == 2
    assert np.isfinite(res.psnr) and np.isfinite(res.bpp)
    assert res.bpp > 0


def test_gated_eval_shares_one_program():
    from rdoptq_tpu.models.minnen2018 import Minnen2018
    model = Minnen2018(N=8, M=8)
    params = model.init(jax.random.PRNGKey(0))
    fn = harness.make_gated_eval_fn(model)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    all_stages = [st.name for c in model.coders.values()
                  for st in c.stages]
    g_off = harness.stage_gates(model, ())
    g_on = harness.stage_gates(model, all_stages)
    off = fn(params, x, g_off, (64, 64), (0, 0))
    on = fn(params, x, g_on, (64, 64), (0, 0))
    # same compiled program, different gate values, different outputs
    assert float(off[2]) != float(on[2])
    # off-gates match the ungated harness exactly
    ref = harness.make_eval_fn(model, harness.NULL_CTX)(
        params, x, (64, 64), (0, 0))
    assert np.isclose(float(off[0]), float(ref[0]), atol=1e-5)
