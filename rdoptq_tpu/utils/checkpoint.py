"""Checkpointing: numpy-archive serialization of parameter pytrees and
quantized artifacts.

Replaces three reference mechanisms (SURVEY §5 checkpoint/resume):
whole-model torch pickles (main2.py:285-290), state-dict checkpoints with
CDF-buffer resize logic (models/base.py:38-59), and — most importantly —
the 2,058-line vendored torch-serialization workaround the reference needs
to save uint8/int16 Parameters (light-uniform-PTQ/quant_int/load.py,
README.md:95). Here integer-valued leaves are just arrays in an .npz:
no patched loaders required.

The format is a flat ``path -> array`` archive plus a JSON structure
manifest, so it is stable across refactors and readable without this
package.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.entropy import FactorizedParams
from ..ops.quant import QParams


def _flatten(node, prefix: str, arrays: Dict[str, np.ndarray]):
    if isinstance(node, dict):
        return {"t": "dict",
                "k": {k: _flatten(v, f"{prefix}/{k}", arrays)
                      for k, v in node.items()}}
    if isinstance(node, FactorizedParams):
        return {"t": "factorized",
                "k": {f: _flatten(getattr(node, f), f"{prefix}/{f}", arrays)
                      for f in node._fields}}
    if isinstance(node, QParams):
        return {"t": "qparams",
                "k": {f: _flatten(getattr(node, f), f"{prefix}/{f}", arrays)
                      for f in node._fields}}
    if isinstance(node, (tuple, list)):
        return {"t": "tuple" if isinstance(node, tuple) else "list",
                "k": [_flatten(v, f"{prefix}/{i}", arrays)
                      for i, v in enumerate(node)]}
    if isinstance(node, (str, int, float, bool)) or node is None:
        return {"t": "scalar", "v": node}
    arrays[prefix] = np.asarray(node)
    return {"t": "leaf", "key": prefix}


def _unflatten(spec, arrays, as_jax: bool):
    t = spec["t"]
    if t == "dict":
        return {k: _unflatten(v, arrays, as_jax)
                for k, v in spec["k"].items()}
    if t == "factorized":
        return FactorizedParams(**{k: _unflatten(v, arrays, as_jax)
                                   for k, v in spec["k"].items()})
    if t == "qparams":
        return QParams(**{k: _unflatten(v, arrays, as_jax)
                          for k, v in spec["k"].items()})
    if t in ("tuple", "list"):
        vals = [_unflatten(v, arrays, as_jax) for v in spec["k"]]
        return tuple(vals) if t == "tuple" else vals
    if t == "scalar":
        return spec["v"]
    arr = arrays[spec["key"]]
    return jnp.asarray(arr) if as_jax else arr


def save_pytree(path: str, tree: Any) -> None:
    arrays: Dict[str, np.ndarray] = {}
    spec = _flatten(tree, "root", arrays)
    arrays["__manifest__"] = np.frombuffer(
        json.dumps(spec).encode(), dtype=np.uint8)
    # atomic write: resume snapshots are saved under SIGKILL-bounded
    # retry loops (scripts/repro_results.sh); a kill mid-write must not
    # leave a truncated archive that poisons every subsequent resume
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)


def load_pytree(path: str, as_jax: bool = True) -> Any:
    data = np.load(path, allow_pickle=False)
    spec = json.loads(bytes(data["__manifest__"]).decode())
    return _unflatten(spec, data, as_jax)


def save_ptq_state(path: str, state) -> None:
    """Serialize a PTQState (quant scales, zero-points, learned hard
    rounding masks) — the quantized-model artifact of a calibration run.
    Alphas are reduced to their hard boolean decision (alpha >= 0), the
    only thing inference needs."""
    tree = {
        "qstate": dict(state.qstate),
        "round_up": {k: np.asarray(v >= 0)
                     for k, v in state.alphas.items()},
        "trained_leaves": list(state.trained_leaves),
        "trained_stages": list(state.trained_stages),
        "wcfg": {"n_bits": state.cfg.n_bits,
                 "channel_wise": state.cfg.channel_wise,
                 "scale_method": state.cfg.scale_method,
                 "sym": state.cfg.sym,
                 "bit_overrides": [list(x) for x in state.cfg.bit_overrides]},
    }
    save_pytree(path, tree)


def load_ptq_state(path: str):
    from ..quant import rdo, wrap
    tree = load_pytree(path)
    cfg = wrap.WeightQuantConfig(
        n_bits=tree["wcfg"]["n_bits"],
        channel_wise=tree["wcfg"]["channel_wise"],
        scale_method=tree["wcfg"]["scale_method"],
        sym=tree["wcfg"]["sym"],
        bit_overrides=tuple((p, int(b))
                            for p, b in tree["wcfg"]["bit_overrides"]))
    state = rdo.PTQState(qstate=tree["qstate"], cfg=cfg)
    # hard round decisions re-enter as +-1 alphas (sign is all that matters)
    state.alphas = {k: jnp.where(jnp.asarray(v), 1.0, -1.0)
                    for k, v in tree["round_up"].items()}
    state.trained_leaves = tuple(tree["trained_leaves"])
    state.trained_stages = tuple(tree["trained_stages"])
    return state


def apply_ptq_artifact(params, path: str):
    """Load a calibrated PTQState and return the deployable quantized
    params (hard-rounded trained leaves, nearest for untrained) — the
    one artifact-application policy shared by the codec CLI and the
    deployment exporter."""
    state = load_ptq_state(path)
    return state.quantized_params(params, untrained="nearest")


__all__ = ["save_pytree", "load_pytree", "save_ptq_state", "load_ptq_state"]
