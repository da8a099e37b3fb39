"""RD training loop: loss decreases on a tiny model and the saved
checkpoint round-trips into the eval/calibration pipeline."""

import os

import jax
import numpy as np
import pytest

from rdoptq_tpu import train as T
from rdoptq_tpu.eval import harness
from rdoptq_tpu.models.minnen2018 import Minnen2018
from rdoptq_tpu.models import registry
from rdoptq_tpu.utils import checkpoint


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    model = Minnen2018(N=16, M=24)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    images = [rng.random((128, 128, 3)).astype(np.float32) for _ in range(4)]
    cfg = T.TrainConfig(steps=60, batch_size=2, patch_size=64, lr=3e-4,
                        lmbda=0.01, chunk=20, seed=0)
    res = T.train(model, params, images, cfg)
    return model, params, res


def test_train_reduces_rd_loss(trained):
    _, _, res = trained
    hist = res["history"]
    assert hist.shape == (60, 3)
    assert np.isfinite(hist).all()
    # smoothed early vs late loss must improve
    assert hist[-10:, 0].mean() < hist[:10, 0].mean()


def test_train_quantiles_solved(trained):
    """Returned params are codec-ready: tail quantiles satisfy the
    bisection targets (median logit ~ 0)."""
    from rdoptq_tpu.ops import entropy as E
    _, _, res = trained
    eb = res["params"]["eb"]
    logits = E.factorized_logits(eb, eb.quantiles)
    assert float(np.abs(np.asarray(logits[:, 0, 1])).max()) < 1e-3


def test_trained_checkpoint_roundtrip(trained, tmp_path):
    model, _, res = trained
    path = str(tmp_path / "ck.npz")
    checkpoint.save_pytree(path, res["params"])
    loaded = registry.load_params(model, "Minnen2018", path)
    rng = np.random.default_rng(1)
    img = rng.random((64, 64, 3)).astype(np.float32)
    r = harness.evaluate(model, loaded, [img[None]], pad_multiple=64)
    assert np.isfinite(r.psnr) and np.isfinite(r.bpp)


def test_train_sharded_matches_intent():
    """dp-sharded training step runs under a mesh and stays finite."""
    from rdoptq_tpu.parallel import mesh as mesh_lib
    if jax.device_count() < 2:
        pytest.skip("needs a multi-device mesh")
    model = Minnen2018(N=8, M=8)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    images = [rng.random((64, 64, 3)).astype(np.float32) for _ in range(2)]
    mesh = mesh_lib.make_mesh()
    cfg = T.TrainConfig(steps=8, batch_size=8, patch_size=64, lr=1e-4,
                        lmbda=0.01, chunk=4, seed=0)
    res = T.train(model, params, images, cfg, mesh=mesh)
    assert np.isfinite(res["history"]).all()


def test_train_variable_rate_tinylic():
    """Variable-rate training: one TinyLIC parameter set optimized under
    multiple λ (ScalingNet conditioning, reference tinylic.py:17-32);
    after training the same params give different rates at different λ."""
    from rdoptq_tpu.models import tinylic as TL

    model = TL.TinyLIC(N=8, M=12, slices=(4, 8), depths=(1,) * 6,
                       lambda_rd=0.01)
    params = model.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    images = [rng.random((96, 96, 3)).astype(np.float32) for _ in range(3)]
    cfg = T.TrainConfig(steps=40, batch_size=2, patch_size=64, lr=3e-4,
                        chunk=10, seed=0)
    res = T.train_variable_rate(model, params, images, cfg,
                                lambdas=(0.003, 0.05))
    hist = res["history"]
    assert hist.shape == (40, 3) and np.isfinite(hist).all()

    img = rng.random((64, 64, 3)).astype(np.float32)[None]
    r_lo = harness.evaluate(model.with_lambda(0.003), res["params"], [img],
                            pad_multiple=64)
    r_hi = harness.evaluate(model.with_lambda(0.05), res["params"], [img],
                            pad_multiple=64)
    assert np.isfinite(r_lo.bpp) and np.isfinite(r_hi.bpp)
    # λ-conditioning must actually change the operating point
    assert abs(r_hi.bpp - r_lo.bpp) > 1e-4
