"""Pipeline-parallel coder execution (parallel/pipeline.py).

Validated on the virtual 8-device CPU mesh: numerical agreement with the
single-device chain, genuine per-device parameter pruning, and sane
stage segmentation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdoptq_tpu.models.minnen2018 import Minnen2018
from rdoptq_tpu.parallel import pipeline as pp


@pytest.fixture(scope="module")
def model_params():
    model = Minnen2018(N=16, M=24)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_used_leaf_paths_exact(model_params):
    model, params = model_params
    x = jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.float32)

    def seg(p, v):
        return model.g_a.run(p, v, start=0, stop=2)  # conv0 + gdn0

    used = pp.used_leaf_paths(seg, params, x)
    assert "g_a/conv0/w" in used and "g_a/gdn0/gamma" in used
    # nothing outside the first two stages may be read
    assert not any(p.startswith(("g_s", "h_a", "h_s", "ep", "context", "eb"))
                   for p in used)
    assert "g_a/conv1/w" not in used


def test_split_stages_covers_all(model_params):
    model, params = model_params
    for n_seg in (1, 2, 3, 4, 7):
        ranges = pp.split_stages(model.g_a, params, n_seg)
        assert len(ranges) == n_seg
        assert ranges[0][0] == 0 and ranges[-1][1] == 7
        for (a, b), (c, _) in zip(ranges, ranges[1:]):
            assert b == c and a < b
        assert ranges[-1][0] < ranges[-1][1]


def test_pipeline_matches_single_device(model_params):
    model, params = model_params
    devices = jax.devices()[:4]
    xs = [jax.random.uniform(jax.random.PRNGKey(i), (1, 32, 32, 3))
          for i in range(3)]
    pipe = pp.CoderPipeline(model.g_a, params, devices, example=xs[0])
    outs = pipe(xs)
    assert outs[0].devices() == {devices[-1]}
    for x, out in zip(xs, outs):
        ref = jax.jit(lambda p, v: model.g_a.run(p, v))(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_pipeline_prunes_params(model_params):
    model, params = model_params
    devices = jax.devices()[:4]
    pipe = pp.CoderPipeline(
        model.g_a, params, devices,
        spec=jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.float32))
    total = sum(
        int(np.prod(l.shape)) * l.dtype.itemsize
        for l in jax.tree_util.tree_leaves(params))
    res = pipe.resident_bytes
    # every device holds strictly less than the whole model, and the
    # segments' g_a shares partition the coder (no duplication)
    assert all(0 < r < total for r in res)
    ga_bytes = sum(
        int(np.prod(l.shape)) * l.dtype.itemsize
        for l in jax.tree_util.tree_leaves(params["g_a"]))
    assert sum(res) == ga_bytes
    # pruned leaves really are placeholders on-device
    last = pipe.segments[-1].params
    assert last["g_a"]["conv0"]["w"].shape == ()
    assert last["g_a"]["conv3"]["w"].shape != ()


def test_pipeline_synthesis_coder(model_params):
    """g_s (transposed convs + iGDN) pipelines too — shape inference per
    segment via eval_shape handles the upsampling chain."""
    model, params = model_params
    devices = jax.devices()[:2]
    x = jax.random.uniform(jax.random.PRNGKey(9), (1, 4, 4, 24))
    pipe = pp.CoderPipeline(model.g_s, params, devices, example=x)
    out = pipe([x])[0]
    ref = jax.jit(lambda p, v: model.g_s.run(p, v))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
