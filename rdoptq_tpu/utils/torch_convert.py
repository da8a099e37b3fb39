"""Torch/CompressAI checkpoint conversion to this framework's pytrees.

The reference loads its FP32 model zoo from torch checkpoints
(ckpts/image.py:60-115 for Lu2022 state dicts, pickled CompressAI models
for Cheng2020/Minnen2018 at main2.py:160-162, `.pth.tar` for TinyLIC at
quantize.py:133). This module converts those state dicts (as
``{name: numpy array}``) into this framework's NHWC parameter pytrees:

* conv kernels:   torch (O, I, kh, kw)  ->  HWIO (kh, kw, I, O)
* tconv kernels:  torch (I, O, kh, kw)  ->  spatially flipped HWIO
* linear weights: torch (out, in)       ->  (in, out)
* GDN beta/gamma: de-reparametrized to effective non-negative values
  (CompressAI's NonNegativeParametrizer: value = lower_bound(stored,
  bound)^2 - pedestal)
* EntropyBottleneck `_matrix/_bias/_factor/quantiles` map 1:1 onto
  ``FactorizedParams``.

Layer-level conversions are validated against torch itself in
tests/test_torch_convert.py.
"""

from __future__ import annotations

import math
import re
from typing import Dict

import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def conv_kernel(w) -> np.ndarray:
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return _np(w).transpose(2, 3, 1, 0)


def tconv_kernel(w) -> np.ndarray:
    """torch ConvTranspose2d (I, O, kh, kw) -> HWIO kernel for
    `lax.conv_transpose` (spatially flipped; validated against torch in
    tests/test_torch_convert.py)."""
    w = _np(w)
    return w.transpose(2, 3, 0, 1)[::-1, ::-1].copy()


def linear_weight(w) -> np.ndarray:
    return _np(w).transpose(1, 0)


def gdn_params(beta_stored, gamma_stored, beta_min: float = 1e-6,
               pedestal_eps: float = 2 ** -18) -> Dict[str, np.ndarray]:
    """De-reparametrize CompressAI GDN parameters to effective values.

    CompressAI stores sqrt-domain values; effective = max(stored, bound)²
    − pedestal with pedestal = eps² (eps = 2^-9 for beta/gamma by default;
    beta bound = (beta_min + eps²)^0.5, gamma bound = eps).
    """
    eps = math.sqrt(pedestal_eps)
    beta_s = _np(beta_stored)
    gamma_s = _np(gamma_stored)
    beta_bound = (beta_min + pedestal_eps) ** 0.5
    beta = np.maximum(beta_s, beta_bound) ** 2 - pedestal_eps
    gamma = np.maximum(gamma_s, eps) ** 2 - pedestal_eps
    c = beta.shape[0]
    return {"gamma": gamma.reshape(c, c, 1, 1).transpose(2, 3, 1, 0),
            "beta": beta}


def entropy_bottleneck_params(sd: Dict[str, np.ndarray], prefix: str):
    """Collect _matrix{i}/_bias{i}/_factor{i}/quantiles into a
    FactorizedParams."""
    from ..ops.entropy import FactorizedParams
    matrices, biases, factors = [], [], []
    i = 0
    while f"{prefix}_matrix{i}" in sd or f"{prefix}_matrices.{i}" in sd:
        m = sd.get(f"{prefix}_matrix{i}", sd.get(f"{prefix}_matrices.{i}"))
        matrices.append(_np(m))
        b = sd.get(f"{prefix}_bias{i}", sd.get(f"{prefix}_biases.{i}"))
        biases.append(_np(b))
        f = sd.get(f"{prefix}_factor{i}", sd.get(f"{prefix}_factors.{i}"))
        if f is not None:
            factors.append(_np(f))
        i += 1
    quantiles = _np(sd[f"{prefix}quantiles"])
    import jax.numpy as jnp
    return FactorizedParams(
        tuple(jnp.asarray(m) for m in matrices),
        tuple(jnp.asarray(b) for b in biases),
        tuple(jnp.asarray(f) for f in factors),
        jnp.asarray(quantiles))


def _convert_leaf(sd, torch_name, kind):
    import jax.numpy as jnp
    w = sd[torch_name + ".weight"]
    out = {}
    if kind == "conv":
        out["w"] = jnp.asarray(conv_kernel(w))
    elif kind == "tconv":
        out["w"] = jnp.asarray(tconv_kernel(w))
    elif kind == "linear":
        out["w"] = jnp.asarray(linear_weight(w))
    elif kind == "ln":
        return {"scale": jnp.asarray(_np(w)),
                "bias": jnp.asarray(_np(sd[torch_name + ".bias"]))}
    if torch_name + ".bias" in sd:
        out["b"] = jnp.asarray(_np(sd[torch_name + ".bias"]))
    return out


def convert_minnen2018(sd: Dict) -> Dict:
    """CompressAI `mbt2018` state dict -> Minnen2018 params pytree."""
    import jax.numpy as jnp
    p: Dict = {"g_a": {}, "g_s": {}, "h_a": {}, "h_s": {}, "ep": {}}
    for i, idx in enumerate((0, 2, 4, 6)):
        p["g_a"][f"conv{i}"] = _convert_leaf(sd, f"g_a.{idx}", "conv")
        p["g_s"][f"deconv{i}"] = _convert_leaf(sd, f"g_s.{idx}", "tconv")
    for i, idx in enumerate((1, 3, 5)):
        p["g_a"][f"gdn{i}"] = gdn_params(sd[f"g_a.{idx}.beta"],
                                         sd[f"g_a.{idx}.gamma"])
        p["g_s"][f"igdn{i}"] = gdn_params(sd[f"g_s.{idx}.beta"],
                                          sd[f"g_s.{idx}.gamma"])
    for i, idx in enumerate((0, 2, 4)):
        p["h_a"][f"conv{i}"] = _convert_leaf(sd, f"h_a.{idx}", "conv")
    p["h_s"]["deconv0"] = _convert_leaf(sd, "h_s.0", "tconv")
    p["h_s"]["deconv1"] = _convert_leaf(sd, "h_s.2", "tconv")
    p["h_s"]["conv2"] = _convert_leaf(sd, "h_s.4", "conv")
    p["context"] = _convert_leaf(sd, "context_prediction", "conv")
    for i, idx in enumerate((0, 2, 4)):
        p["ep"][f"conv{i}"] = _convert_leaf(sd, f"entropy_parameters.{idx}",
                                            "conv")
    p["eb"] = entropy_bottleneck_params(sd, "entropy_bottleneck.")
    return p


def convert_lu2022(sd: Dict) -> Dict:
    """Reference NIC/TIC state dict (nic_cvt.py module names) ->
    Lu2022 params pytree."""
    import jax.numpy as jnp
    p: Dict = {"g_a": {}, "g_s": {}, "h_a": {}, "h_s": {}, "ep": {}}

    def rstb(tname: str):
        out: Dict = {}
        pat = re.compile(
            re.escape(tname) + r"\.residual_group\.blocks\.(\d+)\.")
        depths = set()
        for k in sd:
            m = pat.match(k)
            if m:
                depths.add(int(m.group(1)))
        for b in sorted(depths):
            base = f"{tname}.residual_group.blocks.{b}"
            out[f"block{b}"] = {
                "norm1": _convert_leaf(sd, f"{base}.norm1", "ln"),
                "norm2": _convert_leaf(sd, f"{base}.norm2", "ln"),
                "attn": {
                    "qkv": _convert_leaf(sd, f"{base}.attn.qkv", "linear"),
                    "proj": _convert_leaf(sd, f"{base}.attn.proj",
                                          "linear"),
                    "rpb_table": jnp.asarray(_np(
                        sd[f"{base}.attn.relative_position_bias_table"])),
                },
                "mlp": {
                    "fc1": _convert_leaf(sd, f"{base}.mlp.fc1", "linear"),
                    "fc2": _convert_leaf(sd, f"{base}.mlp.fc2", "linear"),
                },
            }
        return out

    for i in range(0, 8, 2):
        p["g_a"][f"conv{i}"] = _convert_leaf(sd, f"g_a{i}", "conv")
        p["g_a"][f"rstb{i + 1}"] = rstb(f"g_a{i + 1}")
    p["h_a"]["conv0"] = _convert_leaf(sd, "h_a0", "conv")
    p["h_a"]["rstb1"] = rstb("h_a1")
    p["h_a"]["conv2"] = _convert_leaf(sd, "h_a2", "conv")
    p["h_a"]["rstb3"] = rstb("h_a3")
    p["h_s"]["rstb0"] = rstb("h_s0")
    p["h_s"]["deconv1"] = _convert_leaf(sd, "h_s1", "tconv")
    p["h_s"]["rstb2"] = rstb("h_s2")
    p["h_s"]["deconv3"] = _convert_leaf(sd, "h_s3", "tconv")
    for i in range(0, 8, 2):
        p["g_s"][f"rstb{i}"] = rstb(f"g_s{i}")
        p["g_s"][f"deconv{i + 1}"] = _convert_leaf(sd, f"g_s{i + 1}",
                                                   "tconv")
    p["context"] = _convert_leaf(sd, "context_prediction", "conv")
    for i, idx in enumerate((0, 2, 4)):
        p["ep"][f"conv{i}"] = _convert_leaf(sd, f"entropy_parameters.{idx}",
                                            "conv")
    p["eb"] = entropy_bottleneck_params(sd, "entropy_bottleneck.")
    return p


def convert_cheng2020(sd: Dict) -> Dict:
    """CompressAI `cheng2020_anchor` state dict -> Cheng2020 pytree."""
    import jax.numpy as jnp

    def rb(t):
        out = {"conv1": _convert_leaf(sd, f"{t}.conv1", "conv"),
               "conv2": _convert_leaf(sd, f"{t}.conv2", "conv")}
        if f"{t}.skip.weight" in sd:
            out["skip"] = _convert_leaf(sd, f"{t}.skip", "conv")
        return out

    def rbws(t):
        out = rb(t)
        out["gdn"] = gdn_params(sd[f"{t}.gdn.beta"], sd[f"{t}.gdn.gamma"])
        return out

    def rbu(t):
        return {"subpel": _convert_leaf(sd, f"{t}.subpel_conv.0", "conv"),
                "conv": _convert_leaf(sd, f"{t}.conv", "conv"),
                "gdn": gdn_params(sd[f"{t}.igdn.beta"],
                                  sd[f"{t}.igdn.gamma"]),
                "upsample": _convert_leaf(sd, f"{t}.upsample.0", "conv")}

    p: Dict = {
        "g_a": {"rbws0": rbws("g_a.0"), "rb1": rb("g_a.1"),
                "rbws2": rbws("g_a.2"), "rb3": rb("g_a.3"),
                "rbws4": rbws("g_a.4"), "rb5": rb("g_a.5"),
                "conv6": _convert_leaf(sd, "g_a.6", "conv")},
        "g_s": {"rb0": rb("g_s.0"), "rbu1": rbu("g_s.1"),
                "rb2": rb("g_s.2"), "rbu3": rbu("g_s.3"),
                "rb4": rb("g_s.4"), "rbu5": rbu("g_s.5"),
                "rb6": rb("g_s.6"),
                "subpel7": _convert_leaf(sd, "g_s.7.0", "conv")},
        "h_a": {f"conv{i}": _convert_leaf(sd, f"h_a.{2 * i}", "conv")
                for i in range(5)},
        "h_s": {"conv0": _convert_leaf(sd, "h_s.0", "conv"),
                "subpel1": _convert_leaf(sd, "h_s.2.0", "conv"),
                "conv2": _convert_leaf(sd, "h_s.4", "conv"),
                "subpel3": _convert_leaf(sd, "h_s.6.0", "conv"),
                "conv4": _convert_leaf(sd, "h_s.8", "conv")},
        "context": _convert_leaf(sd, "context_prediction", "conv"),
        "ep": {f"conv{i}": _convert_leaf(sd,
                                         f"entropy_parameters.{2 * i}",
                                         "conv") for i in range(3)},
        "eb": entropy_bottleneck_params(sd, "entropy_bottleneck."),
    }
    return p


def convert_tinylic(sd: Dict) -> Dict:
    """Reference TinyLIC state dict (light-uniform-PTQ/models/tinylic.py
    module names) -> TinyLIC pytree."""
    import jax.numpy as jnp

    def mns(t):
        out: Dict = {}
        i = 0
        while f"{t}.blocks.{i}.norm.weight" in sd:
            b = f"{t}.blocks.{i}"
            out[f"block{i}"] = {
                "mixer": {
                    "dw_hw": _convert_leaf(sd, f"{b}.token_mixer.dwconv_hw",
                                           "conv"),
                    "dw_w": _convert_leaf(sd, f"{b}.token_mixer.dwconv_w",
                                          "conv"),
                    "dw_h": _convert_leaf(sd, f"{b}.token_mixer.dwconv_h",
                                          "conv"),
                },
                "norm": _convert_leaf(sd, f"{b}.norm", "ln"),
                "mlp": {"fc1": _convert_leaf(sd, f"{b}.mlp.fc1", "conv"),
                        "fc2": _convert_leaf(sd, f"{b}.mlp.fc2", "conv")},
                "ls": jnp.asarray(_np(sd[f"{b}.gamma"])),
            }
            i += 1
        return out

    def scaling(t):
        return {"fc1": _convert_leaf(sd, f"{t}.fc1", "linear"),
                "fc2": _convert_leaf(sd, f"{t}.fc2", "linear")}

    p: Dict = {"g_a": {}, "h_a": {}, "h_s": {}, "g_s": {},
               "cc": {}, "sc": {}, "ep": {}}
    for i, conv_i in enumerate((0, 2, 4, 6)):
        p["g_a"][f"conv{conv_i}"] = _convert_leaf(sd, f"g_a{conv_i}",
                                                  "conv")
        p["g_a"][f"mns{conv_i + 1}"] = mns(f"g_a{conv_i + 1}")
        p["g_a"][f"scale{i}"] = scaling(f"g_a_scale{i}")
    p["h_a"]["conv0"] = _convert_leaf(sd, "h_a0", "conv")
    p["h_a"]["mns1"] = mns("h_a1")
    p["h_a"]["conv2"] = _convert_leaf(sd, "h_a2", "conv")
    p["h_a"]["mns3"] = mns("h_a3")
    p["h_s"]["mns0"] = mns("h_s0")
    p["h_s"]["deconv1"] = _convert_leaf(sd, "h_s1", "tconv")
    p["h_s"]["mns2"] = mns("h_s2")
    p["h_s"]["deconv3"] = _convert_leaf(sd, "h_s3", "tconv")
    for i, mns_i in enumerate((0, 2, 4, 6)):
        p["g_s"][f"scale{i}"] = scaling(f"g_s_scale{i}")
        p["g_s"][f"mr{i}"] = scaling(f"g_s_mr{i}")
        p["g_s"][f"mns{mns_i}"] = mns(f"g_s{mns_i}")
        p["g_s"][f"deconv{mns_i + 1}"] = _convert_leaf(sd,
                                                       f"g_s{mns_i + 1}",
                                                       "tconv")
    i = 0
    while f"cc_transforms.{i}.0.weight" in sd:
        p["cc"][f"slice{i}"] = {
            "conv0": _convert_leaf(sd, f"cc_transforms.{i}.0", "conv"),
            "conv1": _convert_leaf(sd, f"cc_transforms.{i}.2", "conv"),
            "conv2": _convert_leaf(sd, f"cc_transforms.{i}.4", "conv")}
        p["sc"][f"slice{i}"] = _convert_leaf(sd, f"sc_transforms.{i}",
                                             "conv")
        p["ep"][f"slice{i}"] = {
            "conv0": _convert_leaf(sd, f"entropy_parameters.{i}.0", "conv"),
            "conv1": _convert_leaf(sd, f"entropy_parameters.{i}.2", "conv"),
            "conv2": _convert_leaf(sd, f"entropy_parameters.{i}.4", "conv")}
        i += 1
    p["eb"] = entropy_bottleneck_params(sd, "entropy_bottleneck.")
    return p


def strip_module_prefix(sd: Dict) -> Dict:
    """Drop DataParallel 'module.' prefixes (reference
    ckpts/pretrained.py:39-41)."""
    return {(k[7:] if k.startswith("module.") else k): v
            for k, v in sd.items()}


CONVERTERS = {
    "Minnen2018": convert_minnen2018,
    "Lu2022": convert_lu2022,
    "Cheng2020": convert_cheng2020,
    "TinyLIC": convert_tinylic,
}


def convert(arch: str, state_dict: Dict) -> Dict:
    sd = strip_module_prefix(state_dict)
    if arch not in CONVERTERS:
        raise NotImplementedError(
            f"no converter for {arch!r} (have {sorted(CONVERTERS)})")
    return CONVERTERS[arch](sd)


__all__ = ["conv_kernel", "tconv_kernel", "linear_weight", "gdn_params",
           "entropy_bottleneck_params", "convert", "CONVERTERS",
           "strip_module_prefix"]
