"""Smoke tests for the CLI drivers on tiny models/datasets."""

import json
import os

import jax
import numpy as np
import pytest

from rdoptq_tpu.eval import datasets
from rdoptq_tpu.utils import config


def _has_kodak():
    return os.path.isdir(datasets.DEFAULT_KODAK)


@pytest.mark.skipif(not _has_kodak(), reason="Kodak assets unavailable")
def test_calibrate_driver_minnen_tiny(tmp_path, monkeypatch):
    """End-to-end calibrate pipeline: FP anchor -> nearest -> 3-iter RDO ->
    W/WA eval -> artifact save, on a tiny Minnen and 2 Kodak images."""
    from rdoptq_tpu.cli import calibrate
    from rdoptq_tpu.models import registry
    from rdoptq_tpu.models.minnen2018 import Minnen2018

    monkeypatch.setattr(registry, "build_model",
                        lambda arch, q, lam=None: Minnen2018(N=8, M=8))
    monkeypatch.setattr(datasets, "kodak",
                        lambda d=None, limit=None:
                        datasets.load_dir(datasets.DEFAULT_KODAK, 2))
    cfg = config.RunConfig(arch="Minnen2018", quality=1, iters_w=3,
                           num_samples=4, batch_size=2, act_quant=True,
                           save=True, results_dir=str(tmp_path),
                           name="t", patch_size=64)
    results = calibrate.run(cfg)
    assert "fp32" in results and "w_opt" in results and "wa_opt" in results
    assert os.path.exists(results["artifact"])
    # quantization at W8 on a random model shouldn't catastrophically
    # diverge from the FP anchor
    assert abs(results["w_opt"].psnr - results["fp32"].psnr) < 10

    # artifact reloads
    from rdoptq_tpu.utils.checkpoint import load_ptq_state
    state = load_ptq_state(results["artifact"])
    assert len(state.trained_leaves) > 0


@pytest.mark.skipif(not _has_kodak(), reason="Kodak assets unavailable")
def test_quantize_driver_tinylic(tmp_path, monkeypatch):
    from rdoptq_tpu.cli import quantize as qcli
    from rdoptq_tpu.models import registry
    from rdoptq_tpu.models.tinylic import TinyLIC

    monkeypatch.setattr(
        registry, "build_model",
        lambda arch, q, lam=None: TinyLIC(N=16, M=24, slices=(8, 16),
                                          depths=(1, 1, 1, 1, 1, 1)))
    res = qcli.run(arch="TinyLIC", mode="INT8",
                   out_dir=str(tmp_path / "q"))
    assert res["int8_size_mb"] < res["fp32_size_mb"] * 0.6
    assert "int8" in res and np.isfinite(res["int8"]["psnr"])
    assert res["int8"]["enc_s"] > 0 and res["int8"]["dec_s"] > 0
    assert os.path.exists(res["artifact"])


@pytest.mark.skipif(not _has_kodak(), reason="Kodak assets unavailable")
def test_sweep_driver(tmp_path, monkeypatch):
    from rdoptq_tpu.cli import sweep
    from rdoptq_tpu.models import registry
    from rdoptq_tpu.models.minnen2018 import Minnen2018

    monkeypatch.setattr(registry, "build_model",
                        lambda arch, q, lam=None: Minnen2018(N=8, M=8))
    monkeypatch.setattr(datasets, "kodak",
                        lambda d=None, limit=None:
                        datasets.load_dir(datasets.DEFAULT_KODAK, 1))
    out = sweep.run(arch="Minnen2018", qualities=(1, 2, 3, 4),
                    iters_w=0, act_quant=False,
                    out_path=str(tmp_path / "sweep.json"))
    assert "bd_rate_pct" in out
    assert os.path.exists(tmp_path / "sweep.json")
    data = json.load(open(tmp_path / "sweep.json"))
    assert len(data["per_quality"]) == 4


@pytest.mark.skipif(not _has_kodak(), reason="Kodak assets unavailable")
def test_sweep_partial_validation(tmp_path, monkeypatch):
    """A stale resume file from a differently-parameterized run must be
    ignored, and rows for qualities outside the requested set dropped
    (ADVICE r1: mixed-config artifacts)."""
    from rdoptq_tpu.cli import sweep
    from rdoptq_tpu.models import registry
    from rdoptq_tpu.models.minnen2018 import Minnen2018

    monkeypatch.setattr(registry, "build_model",
                        lambda arch, q, lam=None: Minnen2018(N=8, M=8))
    monkeypatch.setattr(datasets, "kodak",
                        lambda d=None, limit=None:
                        datasets.load_dir(datasets.DEFAULT_KODAK, 1))
    out_path = str(tmp_path / "sweep.json")
    bogus_row = {"fp32": {"psnr": 99.0, "ms_ssim": 1.0, "ms_ssim_db": 99.0,
                          "bpp": 0.1},
                 "quant": {"psnr": 99.0, "ms_ssim": 1.0,
                           "ms_ssim_db": 99.0, "bpp": 0.1},
                 "extra": {}, "calibration_seconds": 0.0}
    # config mismatch (different iters_w) -> whole partial ignored
    with open(out_path + ".partial", "w") as f:
        json.dump({"config": {"arch": "Minnen2018", "n_bits_w": 8,
                              "n_bits_a": 8, "iters_w": 777,
                              "act_quant": False, "batch_size": 4,
                              "compute_dtype": "float32"},
                   "per_quality": {"1": bogus_row}}, f)
    out = sweep.run(arch="Minnen2018", qualities=(1, 2, 3, 4), iters_w=0,
                    act_quant=False, out_path=out_path)
    assert out["per_quality"][1]["fp32"]["psnr"] != 99.0
    # legacy/garbage partial -> ignored, not crashed on
    with open(out_path + ".partial", "w") as f:
        f.write("{truncated")
    out = sweep.run(arch="Minnen2018", qualities=(1, 2), iters_w=0,
                    act_quant=False, out_path=out_path)
    assert sorted(out["per_quality"]) == [1, 2]
    # matching config but a quality outside the requested set -> dropped
    cfg = {"arch": "Minnen2018", "n_bits_w": 8, "n_bits_a": 8,
           "iters_w": 0, "act_quant": False, "batch_size": 4,
           "compute_dtype": "float32",
           # provenance keys (checkpoints / eval sets / calibration data)
           # are part of the resume fingerprint
           "ckpt_pattern": "", "test_dir": "", "seed": 1005,
           "extra_eval": []}
    with open(out_path + ".partial", "w") as f:
        json.dump({"config": cfg,
                   "per_quality": {"1": bogus_row, "9": bogus_row}}, f)
    out = sweep.run(arch="Minnen2018", qualities=(1, 2), iters_w=0,
                    act_quant=False, out_path=out_path)
    assert sorted(out["per_quality"]) == [1, 2]
    assert out["per_quality"][1]["fp32"]["psnr"] == 99.0  # resumed row
    assert 9 not in out["per_quality"]
    # batch_size is operational (device faults force mid-sweep drops):
    # a partial from batch 4 resumes into a batch-2 run, with each row
    # recording the batch it was actually calibrated at.
    with open(out_path + ".partial", "w") as f:
        json.dump({"config": cfg, "per_quality": {"1": bogus_row}}, f)
    out = sweep.run(arch="Minnen2018", qualities=(1, 2), iters_w=0,
                    act_quant=False, out_path=out_path, batch_size=2)
    assert out["per_quality"][1]["fp32"]["psnr"] == 99.0  # kept
    assert out["per_quality"][1]["batch_size"] == 4
    assert out["per_quality"][2]["batch_size"] == 2


def test_parse_extra_eval_pad_buckets():
    from rdoptq_tpu.cli.sweep import parse_extra_eval
    assert parse_extra_eval("") == ()
    assert parse_extra_eval("a=/d1,b=/d2@1792x2048") == (
        ("a", "/d1", None), ("b", "/d2", (1792, 2048)))
    with pytest.raises(ValueError):
        parse_extra_eval("noequals")


@pytest.mark.skipif(not _has_kodak(), reason="Kodak assets unavailable")
def test_evaluate_driver_with_dumps(tmp_path, monkeypatch):
    from rdoptq_tpu.cli import evaluate as ecli
    from rdoptq_tpu.models import registry
    from rdoptq_tpu.models.minnen2018 import Minnen2018

    monkeypatch.setattr(registry, "build_model",
                        lambda arch, q, lam=None: Minnen2018(N=8, M=8))
    monkeypatch.setattr(datasets, "kodak",
                        lambda d=None, limit=None:
                        datasets.load_dir(datasets.DEFAULT_KODAK, 2))
    out = ecli.run(arch="Minnen2018", dump_dir=str(tmp_path / "rec"),
                   freq=1)
    assert np.isfinite(out["psnr"]) and out["model_size_mb"] > 0
    dumps = os.listdir(tmp_path / "rec")
    assert len(dumps) == 2


@pytest.mark.skipif(not _has_kodak(), reason="Kodak assets unavailable")
def test_evaluate_driver_int8_serving(tmp_path, monkeypatch):
    from rdoptq_tpu.cli import evaluate as ecli
    from rdoptq_tpu.models import registry
    from rdoptq_tpu.models.minnen2018 import Minnen2018

    monkeypatch.setattr(registry, "build_model",
                        lambda arch, q, lam=None: Minnen2018(N=8, M=8))
    monkeypatch.setattr(datasets, "kodak",
                        lambda d=None, limit=None:
                        datasets.load_dir(datasets.DEFAULT_KODAK, 1))
    out = ecli.run(arch="Minnen2018", int8_serving=True)
    assert np.isfinite(out["psnr"])
    # int8 weights shrink the reported model size
    out_fp = ecli.run(arch="Minnen2018")
    assert out["model_size_mb"] < out_fp["model_size_mb"]


@pytest.mark.skipif(not _has_kodak(), reason="Kodak assets unavailable")
def test_codec_cli_file_roundtrip(tmp_path, monkeypatch):
    """encode file -> .rdoq -> decode file with the TinyLIC codec."""
    from PIL import Image
    from rdoptq_tpu.cli import codec as ccli
    from rdoptq_tpu.models import registry
    from rdoptq_tpu.models.tinylic import TinyLIC

    monkeypatch.setattr(
        registry, "build_model",
        lambda arch, q, lam=None: TinyLIC(N=16, M=24, slices=(8, 16),
                                          depths=(1, 1, 1, 1, 1, 1)))
    # small non-multiple-of-64 image exercises the padding path
    src = sorted(os.listdir(datasets.DEFAULT_KODAK))[0]
    img = Image.open(os.path.join(datasets.DEFAULT_KODAK, src)).crop(
        (0, 0, 100, 80))
    src_path = str(tmp_path / "in.png")
    img.save(src_path)

    bs_path = str(tmp_path / "out.rdoq")
    rec_path = str(tmp_path / "rec.png")
    enc = ccli.encode(src_path, bs_path, arch="TinyLIC")
    assert enc["bytes"] > 17 and np.isfinite(enc["bpp"])
    dec = ccli.decode(bs_path, rec_path)  # arch read from the header
    assert dec["size"] == (80, 100)
    rec = np.asarray(Image.open(rec_path))
    assert rec.shape == (80, 100, 3)

    # the wide (device-decode) format reconstructs the identical image:
    # both paths decode to the same y_hat by shared-program bit-agreement
    bs_w = str(tmp_path / "out_wide.rdoq")
    rec_w = str(tmp_path / "rec_wide.png")
    ccli.encode(src_path, bs_w, arch="TinyLIC", wide=True)
    dec_w = ccli.decode(bs_w, rec_w)  # framing selects the wide decoder
    assert dec_w["size"] == (80, 100)
    np.testing.assert_array_equal(np.asarray(Image.open(rec_w)), rec)


@pytest.mark.skipif(not _has_kodak(), reason="Kodak assets unavailable")
def test_calibration_is_deterministic(tmp_path, monkeypatch):
    """Same seed -> identical hard rounding decisions (the reference's
    seed_all reproducibility contract, main2.py:77-85)."""
    from rdoptq_tpu.models.minnen2018 import Minnen2018
    from rdoptq_tpu.quant import rdo, wrap

    model = Minnen2018(N=8, M=8)
    params = model.init(jax.random.PRNGKey(0))
    cali = jax.random.uniform(jax.random.PRNGKey(1), (4, 64, 64, 3))
    cfg = rdo.RDOConfig(iters=25, batch_size=2, act_quant=True)

    def run():
        state = rdo.calibrate_model(
            model, params, cali, wrap.WeightQuantConfig(n_bits=4), cfg,
            seed=7)
        return {k: np.asarray(v >= 0) for k, v in state.alphas.items()}

    a, b = run(), run()
    assert set(a) == set(b)
    for k in a:
        assert np.array_equal(a[k], b[k]), k
