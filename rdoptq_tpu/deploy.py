"""Deployment export: portable StableHLO serving artifacts.

Beyond-reference capability. The reference "deploys" by unpickling a
full torch model inside a notebook and re-running its Python stack at
serving time (task-oriented-PTQ/main2.py:160-162 pickled models;
light-uniform-PTQ/single_test.ipynb). Here a (quantized) serving
function is exported ONCE through ``jax.export`` to StableHLO and the
resulting artifact executes on any machine with a JAX runtime for the
target platform — no model code, no framework-version lock-in, and the
same artifact carries lowerings for several platforms (TPU serving
fleet + CPU canaries from one file).

Design notes (TPU-first):

* Parameters are exported as *call arguments*, not baked-in constants.
  Baked constants become HLO literals, which (a) bloat the artifact by
  the full weight size per entry and (b) ship megabytes through the
  remote-compile tunnel on every cold compile (see CLAUDE.md). The
  bundle stores the parameter pytree once as an ``.npz`` member and the
  loader threads it into every entry.
* One bundle holds several exported entries (one per static input
  shape). Window-attention models (Lu2022, TinyLIC) require static
  shapes anyway; ``ServingBundle.__call__`` dispatches on ``x.shape``.
* The exported function is the eval-mode forward reduced to its serving
  outputs ``{"x_hat", "bpp"}`` — reconstruction plus the rate estimate,
  everything XLA can fuse into one program.

Bundle format (single ``.rdx`` file = zip):
  ``meta.json``   arch/quality/entry table (shape, dtype, platforms)
  ``params.npz``  parameter pytree (utils.checkpoint flat format)
  ``hlo/<name>``  ``jax.export.Exported.serialize()`` bytes per entry
"""

from __future__ import annotations

import io
import json
import math
import os
import tempfile
import zipfile
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models import registry
from .ops.entropy import FactorizedParams
from .ops.quant import QParams
from .utils import checkpoint

BUNDLE_VERSION = 1

# NamedTuple pytree nodes must be registered for jax.export pytreedef
# serialization (the serialized name is the wire-format identity — keep
# stable across refactors).
for _nt, _name in ((FactorizedParams, "rdoptq.FactorizedParams"),
                   (QParams, "rdoptq.QParams")):
    try:
        jax.export.register_namedtuple_serialization(
            _nt, serialized_name=_name)
    except ValueError:  # already registered (re-import)
        pass


def serving_fn(model):
    """Eval-mode forward reduced to serving outputs.

    Returns ``fn(params, x) -> {"x_hat": uint8-clamped f32 in [0,1],
    "bpp": scalar rate estimate}`` — the quantities the reference's
    serving notebook reports per image (single_test.ipynb cell 6).
    """

    def fn(params, x):
        out = model.forward(params, x)
        num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
        bpp = sum(-jnp.sum(jnp.log2(l)) for l in
                  jax.tree_util.tree_leaves(out["likelihoods"]))
        return {"x_hat": jnp.clip(out["x_hat"], 0.0, 1.0),
                "bpp": bpp / num_pixels}

    return fn


def _entry_name(shape: Tuple[int, ...]) -> str:
    return "x".join(str(d) for d in shape)


def export_serving(model, params, shapes: Sequence[Tuple[int, int, int, int]],
                   *, platforms: Sequence[str] = ("tpu", "cpu"),
                   dtype=jnp.float32) -> Dict[str, Any]:
    """Export the model's serving forward for each static NHWC shape.

    Cross-platform lowering: the export runs on whatever backend is
    local (CPU in CI) yet the artifact carries lowerings for every
    platform in ``platforms``.
    """
    fn = serving_fn(model)
    jitted = jax.jit(fn)
    entries = {}
    for shape in shapes:
        spec = jax.ShapeDtypeStruct(tuple(shape), dtype)
        exp = jax.export.export(jitted, platforms=list(platforms))(
            params, spec)
        entries[_entry_name(shape)] = exp
    return entries


def save_bundle(path: str, entries: Dict[str, Any], params,
                meta: Optional[Dict[str, Any]] = None) -> None:
    """Write entries + params + metadata as one ``.rdx`` zip file."""
    table = {}
    for name, exp in entries.items():
        x_aval = exp.in_avals[-1]
        table[name] = {"shape": [int(d) for d in x_aval.shape],
                       "dtype": str(x_aval.dtype),
                       "platforms": list(exp.platforms)}
    info = {"version": BUNDLE_VERSION, "entries": table}
    info.update(meta or {})
    with tempfile.TemporaryDirectory() as td:
        ppath = os.path.join(td, "params.npz")
        checkpoint.save_pytree(ppath, params)
        tmp = path + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED) as z:
            z.writestr("meta.json", json.dumps(info, indent=1))
            z.write(ppath, "params.npz")
            for name, exp in entries.items():
                z.writestr(f"hlo/{name}", bytes(exp.serialize()))
        os.replace(tmp, path)


class ServingBundle:
    """Loaded ``.rdx`` artifact: shape-dispatched serving calls.

    ``bundle(x)`` picks the entry whose static shape matches ``x``
    (padding the batch-of-one case is the caller's job — entries are
    exact-shape by design so every call hits a pre-exported program).
    """

    def __init__(self, meta: Dict[str, Any], params,
                 exported: Dict[str, Any]):
        self.meta = meta
        self.params = params
        self.exported = exported

    @property
    def shapes(self):
        return [tuple(e["shape"]) for e in self.meta["entries"].values()]

    def call(self, x, name: Optional[str] = None):
        if name is None:
            name = _entry_name(tuple(x.shape))
        if name not in self.exported:
            raise KeyError(
                f"no exported entry for shape {tuple(x.shape)}; "
                f"bundle has {sorted(self.exported)}")
        return self.exported[name].call(self.params, x)

    __call__ = call


def load_bundle(path: str) -> ServingBundle:
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        if meta["version"] > BUNDLE_VERSION:
            raise ValueError(f"bundle version {meta['version']} is newer "
                             f"than this loader ({BUNDLE_VERSION})")
        with tempfile.TemporaryDirectory() as td:
            ppath = os.path.join(td, "params.npz")
            with open(ppath, "wb") as f:
                f.write(z.read("params.npz"))
            params = checkpoint.load_pytree(ppath)
        exported = {name: jax.export.deserialize(
                        bytearray(z.read(f"hlo/{name}")))
                    for name in meta["entries"]}
    return ServingBundle(meta, params, exported)


def export_model_bundle(out: str, arch: str, quality: int,
                        shapes: Sequence[Tuple[int, int, int, int]],
                        *, ckpt: Optional[str] = None,
                        artifact: Optional[str] = None,
                        int8: bool = False,
                        platforms: Sequence[str] = ("tpu", "cpu"),
                        lam: Optional[float] = None,
                        seed: int = 0) -> ServingBundle:
    """One-call export: build arch, load params, (optionally) apply a
    calibrated PTQ artifact (hard-rounded AdaRound weights) and/or
    transform to the true-int8 serving pytree, export every shape,
    save, reload.

    Returns the reloaded bundle so callers can immediately validate the
    round trip (export → serialize → deserialize → call).
    """
    model = registry.build_model(arch, quality, lam=lam)
    params = registry.load_params(model, arch, ckpt, seed=seed)
    if artifact:
        from .utils.checkpoint import apply_ptq_artifact
        params = apply_ptq_artifact(params, artifact)
    if int8:
        from .quant import serve_int8
        params = serve_int8.int8_serving_params(params)
    entries = export_serving(model, params, shapes, platforms=platforms)
    meta = {"arch": arch, "quality": quality, "int8": bool(int8),
            "lam": lam, "artifact": artifact or None}
    save_bundle(out, entries, params, meta)
    return load_bundle(out)


__all__ = ["serving_fn", "export_serving", "save_bundle", "load_bundle",
           "ServingBundle", "export_model_bundle", "BUNDLE_VERSION"]
