"""Staged-pipeline model framework.

The reference manipulates models by *mutation*: module surgery
(quant_model.py), forward hooks to capture intermediate tensors
(quantization/utils.py:175-258), and `trained` flags. The TPU-native
equivalent here is structural: every coder (g_a / h_a / h_s / g_s) is an
explicit ordered tuple of named :class:`Stage` functions over the model's
parameter pytree, so

* prefix/suffix splits for calibration are list slices (no hooks),
* intermediate capture is an optional ``tape`` dict threaded through the
  pure forward (jit-safe: captured arrays are returned as outputs),
* "rest of current coder" (reference `fp_out`, layer_opt.py:45-75) is just
  ``coder.run(params, h, start=k+1)``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax

from .layers import NULL_CTX, QuantCtx

Tape = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class Stage:
    """One calibration unit: a named pure function
    ``fn(params, x, ctx) -> y`` where ``params`` is the *full* model pytree
    (the stage indexes its own subtree by path). ``leaf_paths`` lists the
    quantizable parameter leaves this stage consumes ('/'-joined keys into
    the params pytree), in application order."""

    name: str
    fn: Callable
    leaf_paths: Tuple[str, ...] = ()

    def __call__(self, params, x, ctx: QuantCtx = NULL_CTX):
        return self.fn(params, x, ctx)


@dataclasses.dataclass(frozen=True)
class Coder:
    """An ordered stage pipeline (one of g_a / h_a / h_s / g_s)."""

    name: str
    stages: Tuple[Stage, ...]
    # Whether the remaining stages of this coder act as the task-loss
    # suffix during calibration. Parity default: True for the four
    # transform coders, False for context/entropy-parameter pipelines
    # (the reference's find_unquantized_module only matches
    # g_a/h_a/h_s/g_s names — layer_opt.py:15-43).
    use_suffix: bool = True

    def run(self, params, x, ctx: QuantCtx = NULL_CTX,
            start: int = 0, stop: Optional[int] = None,
            tape: Optional[Tape] = None,
            tape_filter: Optional[frozenset] = None):
        def record(key, val):
            if tape is not None and (tape_filter is None
                                     or key in tape_filter):
                tape[key] = val

        for st in self.stages[start:stop]:
            record(st.name + ":in", x)
            x = st.fn(params, x, ctx)
            record(st.name + ":out", x)
        return x

    def __call__(self, params, x, ctx: QuantCtx = NULL_CTX,
                 tape: Optional[Tape] = None,
                 tape_filter: Optional[frozenset] = None):
        return self.run(params, x, ctx, tape=tape, tape_filter=tape_filter)

    def index(self, stage_name: str) -> int:
        for i, st in enumerate(self.stages):
            if st.name == stage_name:
                return i
        raise KeyError(stage_name)


def get_leaf(params, path: str):
    node = params
    for k in path.split("/"):
        node = node[k]
    return node


def set_leaf(params, path: str, value):
    """Functionally replace one leaf; returns a new pytree (shallow copies
    along the path only)."""
    keys = path.split("/")

    def rec(node, i):
        if i == len(keys):
            return value
        new = dict(node)
        new[keys[i]] = rec(node[keys[i]], i + 1)
        return new

    return rec(params, 0)
