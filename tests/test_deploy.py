"""Deployment-export bundle tests (rdoptq_tpu.deploy).

The exported StableHLO artifact must reproduce the live forward exactly
(same program, serialized), dispatch on input shape, survive the int8
serving-pytree transform, and carry multi-platform lowerings.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdoptq_tpu import deploy
from rdoptq_tpu.models.minnen2018 import Minnen2018


@pytest.fixture(scope="module")
def tiny():
    model = Minnen2018(N=8, M=8)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def _x(shape, seed=1):
    return jnp.asarray(
        np.random.RandomState(seed).rand(*shape).astype("float32"))


def test_roundtrip_exact(tiny, tmp_path):
    model, params = tiny
    shape = (1, 64, 64, 3)
    entries = deploy.export_serving(model, params, [shape],
                                    platforms=("cpu",))
    path = os.path.join(tmp_path, "m.rdx")
    deploy.save_bundle(path, entries, params, {"arch": "Minnen2018"})
    bundle = deploy.load_bundle(path)

    x = _x(shape)
    out = bundle(x)
    ref = deploy.serving_fn(model)(params, x)
    # same program, serialized: bit-identical
    assert float(jnp.abs(out["x_hat"] - ref["x_hat"]).max()) == 0.0
    assert float(out["bpp"]) == float(ref["bpp"])
    assert bundle.meta["arch"] == "Minnen2018"


def test_shape_dispatch(tiny, tmp_path):
    model, params = tiny
    shapes = [(1, 64, 64, 3), (1, 128, 64, 3)]
    entries = deploy.export_serving(model, params, shapes,
                                    platforms=("cpu",))
    path = os.path.join(tmp_path, "m.rdx")
    deploy.save_bundle(path, entries, params)
    bundle = deploy.load_bundle(path)
    assert sorted(bundle.shapes) == sorted(shapes)

    for shape in shapes:
        out = bundle(_x(shape))
        assert out["x_hat"].shape == shape
    with pytest.raises(KeyError):
        bundle(_x((1, 64, 128, 3)))


def test_multi_platform_lowering(tiny, tmp_path):
    """Cross-lowering for TPU from a CPU-only process: the artifact
    records both platforms and still executes on the local one."""
    model, params = tiny
    shape = (1, 64, 64, 3)
    entries = deploy.export_serving(model, params, [shape],
                                    platforms=("cpu", "tpu"))
    (exp,) = entries.values()
    assert set(exp.platforms) == {"cpu", "tpu"}
    path = os.path.join(tmp_path, "m.rdx")
    deploy.save_bundle(path, entries, params)
    out = deploy.load_bundle(path)(_x(shape))
    assert np.isfinite(float(out["bpp"]))


def test_int8_serving_bundle(tiny, tmp_path):
    """The true-int8 serving pytree (integer-kernel nodes) exports and
    reloads; outputs match the live int8 forward exactly."""
    from rdoptq_tpu.quant import serve_int8

    model, params = tiny
    qparams = serve_int8.int8_serving_params(params)
    shape = (1, 64, 64, 3)
    entries = deploy.export_serving(model, qparams, [shape],
                                    platforms=("cpu",))
    path = os.path.join(tmp_path, "m8.rdx")
    deploy.save_bundle(path, entries, qparams, {"int8": True})
    bundle = deploy.load_bundle(path)

    x = _x(shape)
    out = bundle(x)
    ref = deploy.serving_fn(model)(qparams, x)
    # separately-compiled instances of the same program may reassociate
    # the dequant arithmetic: tight tolerance, not bit equality
    assert float(jnp.abs(out["x_hat"] - ref["x_hat"]).max()) < 1e-6
    assert bundle.meta["int8"] is True


def test_transformer_models_export(tmp_path):
    """Window-attention models (static shift masks, RPB gathers) and the
    checkerboard entropy model must survive export/deserialize/call."""
    from rdoptq_tpu.models.lu2022 import Lu2022
    from rdoptq_tpu.models import tinylic as T

    for name, model, shape in (
            ("lu", Lu2022(embed_dim=16, latent_dim=16, window_size=4),
             (1, 64, 64, 3)),
            ("tl", T.TinyLIC(N=16, M=24, slices=(8, 16),
                             depths=(1, 1, 1, 1, 1, 1)), (1, 64, 64, 3))):
        params = model.init(jax.random.PRNGKey(0))
        entries = deploy.export_serving(model, params, [shape],
                                        platforms=("cpu",))
        path = os.path.join(tmp_path, f"{name}.rdx")
        deploy.save_bundle(path, entries, params, {"arch": name})
        x = _x(shape)
        out = deploy.load_bundle(path)(x)
        ref = deploy.serving_fn(model)(params, x)
        # separately-compiled instances may reassociate attention/LN
        # reductions: tight tolerance, not bit equality
        assert float(jnp.abs(out["x_hat"] - ref["x_hat"]).max()) < 1e-6


def test_cli_export(tiny, tmp_path):
    from rdoptq_tpu.cli import export as cli_export

    path = os.path.join(tmp_path, "cli.rdx")
    # random-init params (no ckpt): exercises the registry path end to
    # end on the smallest registry model config
    bundle = cli_export.main([
        "--arch", "Minnen2018", "--quality", "1",
        "--shapes", "1x64x64x3", "--platforms", "cpu",
        "--out", path])
    assert os.path.exists(path)
    out = bundle(_x((1, 64, 64, 3)))
    assert out["x_hat"].shape == (1, 64, 64, 3)


def test_export_with_ptq_artifact(tiny, tmp_path, monkeypatch):
    """A calibrated PTQState artifact applies (quantized weights) before
    export; the bundle output matches the live quantized forward."""
    from rdoptq_tpu.models import registry
    from rdoptq_tpu.quant import rdo, wrap
    from rdoptq_tpu.utils import checkpoint

    model, params = tiny
    monkeypatch.setattr(registry, "build_model",
                        lambda arch, q, lam=None: model)
    monkeypatch.setattr(registry, "load_params",
                        lambda m, a, p, seed=0: params)

    wcfg = wrap.WeightQuantConfig(n_bits=8, channel_wise=True)
    state = rdo.init_ptq_state(params, wcfg)
    art = os.path.join(tmp_path, "ptq.npz")
    checkpoint.save_ptq_state(art, state)

    path = os.path.join(tmp_path, "q.rdx")
    bundle = deploy.export_model_bundle(
        path, "Minnen2018", 1, [(1, 64, 64, 3)], artifact=art,
        platforms=("cpu",))
    assert bundle.meta["artifact"] == art

    x = _x((1, 64, 64, 3))
    params_q = state.quantized_params(params, untrained="nearest")
    ref = deploy.serving_fn(model)(params_q, x)
    out = bundle(x)
    assert float(jnp.abs(out["x_hat"] - ref["x_hat"]).max()) < 1e-6


def test_bundle_version_guard(tiny, tmp_path):
    """A bundle from a NEWER format version must be rejected cleanly."""
    import json
    import zipfile

    model, params = tiny
    entries = deploy.export_serving(model, params, [(1, 64, 64, 3)],
                                    platforms=("cpu",))
    path = os.path.join(tmp_path, "v.rdx")
    deploy.save_bundle(path, entries, params)

    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        members = {n: z.read(n) for n in z.namelist() if n != "meta.json"}
    meta["version"] = deploy.BUNDLE_VERSION + 1
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("meta.json", json.dumps(meta))
        for n, b in members.items():
            z.writestr(n, b)
    with pytest.raises(ValueError, match="newer"):
        deploy.load_bundle(path)
