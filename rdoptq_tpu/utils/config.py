"""Configuration system: YAML model/data config + CLI flags.

Parity with the reference's config layer (task-oriented-PTQ/config.yaml +
`get_config` utils.py:20-23 + the 30-flag argparse CLI main2.py:22-74,
light-uniform-PTQ/quantize.py:27-48): a dataclass per concern, YAML
loading, CLI override precedence (CLI λ/metric override config,
main2.py:150), and run-directory provenance (the config is copied into the
run dir, utils.py:50-53).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import shutil
from datetime import datetime
from typing import Optional

import yaml

# λ per quality index q1-q8 (reference ReadMe.md:52 lists q1-6;
# config.yaml:20 pins q8 λ=0.18 and ckpts/image.py:47-58 spans q1-8 with
# the (128,192)/(192,320) dim split — q7/q8 use the standard CompressAI
# table the reference checkpoints were trained with)
LAMBDAS_MSE = (0.0018, 0.0035, 0.0067, 0.0130, 0.0250, 0.0483,
               0.0932, 0.1800)
# MS-SSIM-objective λ per quality (reference ReadMe.md:54 lists q1-6,
# e.g. the q6 λ=60.50 usage at ReadMe.md:73/89; ckpts/image.py ships
# ms-ssim checkpoints through q8 — λ7/λ8 from the same CompressAI table)
LAMBDAS_MSSSIM = (2.40, 4.58, 8.73, 16.64, 31.73, 60.50, 115.37, 220.64)


def lambda_for(quality: int, metric: str = "mse") -> float:
    """RD λ for a quality index under the given training objective
    (reference: losses/losses.py:28-33 selects the loss form, the λ grids
    above select the operating point)."""
    table = LAMBDAS_MSSSIM if metric == "ms-ssim" else LAMBDAS_MSE
    return table[min(max(quality, 1), len(table)) - 1]


@dataclasses.dataclass
class RunConfig:
    """Everything a calibration/eval run needs (CLI-facing)."""

    # general
    seed: int = 1005
    quality: int = 6
    batch_size: int = 4
    arch: str = "Lu2022"          # Lu2022 | Cheng2020 | Minnen2018 | TinyLIC
    type: str = "mse"             # mse | ms-ssim
    lmbda: float = 0.0483
    name: str = ""
    save: bool = False
    resume: str = ""              # partial PTQState snapshot to resume from
    checkpoint: str = ""          # FP32 model checkpoint (.npz or torch)
    # quantization
    n_bits_w: int = 8
    n_bits_a: int = 8
    channel_wise: bool = True
    act_quant: bool = False
    disable_8bit_head_stem: bool = False
    test_before_calibration: bool = True
    # weight calibration
    input_prob: float = 0.5
    lr: float = 1e-3
    task_loss: float = 2.0
    num_samples: int = 12
    iters_w: int = 20000
    weight: float = 0.01
    sym: bool = False
    b_start: float = 20.0
    b_end: float = 2.0
    warmup: float = 0.2
    init: str = "max"             # max | mse | gaussian | l1 | l2
    remat: bool = False           # remat the task-loss suffix (memory<->FLOPs)
    compute_dtype: str = "float32"  # float32 | bfloat16 calibration forward
    # data
    calib_dir: str = ""
    test_dir: str = ""
    patch_size: int = 256
    results_dir: str = "./results"


def parse_args(argv=None) -> RunConfig:
    """Build a RunConfig from CLI flags (flag set mirrors main2.py:22-74)."""
    parser = argparse.ArgumentParser(
        description="TPU-native RDO-PTQ for learned image compression",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    cfg = RunConfig()
    for f in dataclasses.fields(RunConfig):
        flag = "--" + f.name
        default = getattr(cfg, f.name)
        # SUPPRESS: only explicitly-passed flags appear in the namespace,
        # so precedence is CLI > YAML > dataclass defaults
        if f.type == "bool" or isinstance(default, bool):
            parser.add_argument(flag, action="store_true",
                                default=argparse.SUPPRESS,
                                help=f"(default: {default})")
        else:
            parser.add_argument(flag, type=type(default),
                                default=argparse.SUPPRESS,
                                help=f"(default: {default})")
    parser.add_argument("--config", type=str, default="",
                        help="YAML config file (CLI flags take precedence)")
    args = parser.parse_args(argv)

    values = {}
    if getattr(args, "config", ""):
        with open(args.config) as f:
            values.update(yaml.safe_load(f) or {})
    explicit = {k: v for k, v in vars(args).items() if k != "config"}
    merged = {**values, **explicit}
    merged = {k: v for k, v in merged.items()
              if k in {f.name for f in dataclasses.fields(RunConfig)}}
    out = RunConfig(**merged)
    if not out.name:
        out.name = datetime.now().strftime("%Y-%m-%d_%H_%M_%S")
    return out


def load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def init_run_dirs(cfg: RunConfig, config_path: Optional[str] = None):
    """Create ./results/{arch}/{type}/{quality}/{outputs,logs} and copy the
    config for provenance (reference `init_lic`, utils.py:42-55)."""
    base = os.path.join(cfg.results_dir, cfg.arch, cfg.type,
                        str(cfg.quality))
    out_dir = os.path.join(base, "outputs", cfg.name)
    log_dir = os.path.join(base, "logs")
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)
    if config_path and os.path.exists(config_path):
        shutil.copy(config_path, os.path.join(out_dir, "config.yaml"))
    return out_dir, log_dir


__all__ = ["RunConfig", "LAMBDAS_MSE", "LAMBDAS_MSSSIM", "lambda_for",
           "parse_args", "load_yaml",
           "init_run_dirs"]
