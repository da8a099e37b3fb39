"""Pipeline-parallel (pp) execution of a staged Coder over devices.

The reference has no pipeline parallelism (SURVEY §2.4: no distributed
anything). This module adds the TPU-native capability: a
:class:`~rdoptq_tpu.models.base.Coder` — an ordered chain of pure stage
functions — is split into contiguous segments balanced by parameter
bytes, each segment's parameters live on exactly ONE device (per-chip
parameter memory divides by the segment count), and a stream of
microbatches is pushed through the chain. JAX's asynchronous dispatch
provides the GPipe-style overlap for free: the host enqueues
(microbatch m, segment s) in m-major order, every device executes its
own queue in order, and device s starts microbatch m while device s+1
is still working on microbatch m-1. On real hardware the inter-segment
activation transfers ride ICI.

When to use: pp is the right layout when one model's parameters (or a
segment's activations) do not fit a single chip, or when heterogeneous
stage costs would starve a tensor-parallel layout. For this zoo's model
sizes (50-120 MB) plain data parallelism over images
(:mod:`rdoptq_tpu.parallel.eval`) is strictly better — documented here
so the capability is not mistaken for a recommendation.

Segment parameter pruning is *structural*: a jaxpr-usage analysis
(:func:`used_leaf_paths`) finds the exact parameter leaves each segment
reads, everything else is replaced by a scalar placeholder before the
tree is placed on the segment's device, so resident bytes genuinely
shrink — no reliance on naming conventions.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.extend import core as jex_core

from ..models.base import Coder, get_leaf


# ---------------------------------------------------------------------------
# jaxpr leaf-usage analysis


def _used_invars(jaxpr) -> set:
    """Variables of ``jaxpr`` that are read anywhere (recursively through
    nested call/pjit/scan/cond sub-jaxprs). Conservative: a var feeding
    dead code still counts as used."""
    used: set = set()

    def visit(jxp):
        for v in jxp.outvars:
            if not isinstance(v, jex_core.Literal):
                used.add(v)
        for eqn in jxp.eqns:
            for v in eqn.invars:
                if not isinstance(v, jex_core.Literal):
                    used.add(v)
            for p in eqn.params.values():
                for sub in _sub_jaxprs(p):
                    visit(sub)

    visit(jaxpr)
    return used


def _sub_jaxprs(p):
    if isinstance(p, jex_core.ClosedJaxpr):
        yield p.jaxpr
    elif isinstance(p, jex_core.Jaxpr):
        yield p
    elif isinstance(p, (tuple, list)):
        for q in p:
            yield from _sub_jaxprs(q)


def used_leaf_mask(fn: Callable, params, *args) -> List[bool]:
    """Per-leaf (tree_flatten order) flags: does ``fn(params, *args)``
    read this parameter leaf? Traces to a jaxpr and checks which of the
    flattened parameter input variables appear anywhere in it. Extra
    ``args`` may be arrays or ShapeDtypeStructs (abstract tracing)."""
    closed = jax.make_jaxpr(fn)(params, *args)
    used = _used_invars(closed.jaxpr)
    n_leaves = len(jax.tree_util.tree_leaves(params))
    invars = closed.jaxpr.invars[:n_leaves]
    return [v in used for v in invars]


def used_leaf_paths(fn: Callable, params, *args) -> set:
    """Key paths of the parameter leaves ``fn`` actually reads (the
    human-readable view of :func:`used_leaf_mask`)."""
    mask = used_leaf_mask(fn, params, *args)
    return {p for p, u in zip(leaf_paths(params), mask) if u}


def _key_str(k) -> str:
    for attr in ("key", "name", "idx"):
        if hasattr(k, attr):
            return str(getattr(k, attr))
    return str(k)


def leaf_paths(tree) -> List[str]:
    """'/'-joined key paths of all leaves, in tree_flatten order. Handles
    dict, sequence, and namedtuple/dataclass nodes."""
    paths = []
    for kp, _ in jax.tree_util.tree_flatten_with_path(tree)[0]:
        paths.append("/".join(_key_str(k) for k in kp))
    return paths


def _leaf_bytes(x) -> int:
    return int(np.prod(x.shape)) * x.dtype.itemsize if hasattr(x, "shape") else 0


# ---------------------------------------------------------------------------
# segmentation


def split_stages(coder: Coder, params, n_segments: int) -> List[Tuple[int, int]]:
    """Contiguous [start, stop) stage ranges, greedily balanced by the
    parameter bytes under each stage's leaf-path subtrees (the same
    prefix convention as quant/wrap leaf discovery)."""
    n = len(coder.stages)
    if not 1 <= n_segments <= n:
        raise ValueError(f"n_segments must be in 1..{n}, got {n_segments}")
    weights = []
    for st in coder.stages:
        w = 1  # floor so parameter-free stages still cost something
        for lp in st.leaf_paths:
            subtree = get_leaf(params, lp.rsplit("/", 1)[0])
            w += sum(_leaf_bytes(x) for x in jax.tree_util.tree_leaves(subtree))
        weights.append(w)
    total = sum(weights)
    bounds, acc, cut = [0], 0, 1
    for i, w in enumerate(weights):
        acc += w
        # cut after stage i once this segment holds its fair share, while
        # leaving at least one stage per remaining segment
        remaining_segments = n_segments - cut
        if (cut < n_segments and acc >= cut * total / n_segments
                and (n - (i + 1)) >= remaining_segments):
            bounds.append(i + 1)
            cut += 1
    while len(bounds) < n_segments:
        bounds.append(n - (n_segments - len(bounds)))
    bounds.append(n)
    return [(bounds[i], bounds[i + 1]) for i in range(n_segments)]


# ---------------------------------------------------------------------------
# the pipeline


@dataclasses.dataclass(frozen=True)
class _Segment:
    device: Any
    fn: Callable          # jitted (pruned_params, x) -> y
    params: Any           # pruned tree, resident on `device`
    stage_range: Tuple[int, int]
    resident_bytes: int


class CoderPipeline:
    """Stage-per-device pipelined execution of one coder chain.

    >>> pipe = CoderPipeline(model.g_a, params, devices=jax.devices()[:4])
    >>> outs = pipe(list_of_inputs)        # overlapped across devices
    """

    def __init__(self, coder: Coder, params, devices: Sequence,
                 spec: Optional[jax.ShapeDtypeStruct] = None,
                 example: Optional[jax.Array] = None):
        if example is None and spec is None:
            raise ValueError("need an example input or a ShapeDtypeStruct")
        self.coder = coder
        ranges = split_stages(coder, params, len(devices))
        x_spec = spec if spec is not None else jax.ShapeDtypeStruct(
            example.shape, example.dtype)
        segments = []
        for dev, (a, b) in zip(devices, ranges):
            def seg_fn(p, x, a=a, b=b):
                return coder.run(p, x, start=a, stop=b)

            mask = used_leaf_mask(seg_fn, params, x_spec)
            leaves, treedef = jax.tree_util.tree_flatten(params)
            resident = sum(_leaf_bytes(l) for l, u in zip(leaves, mask) if u)
            pruned_leaves = [
                l if u else jnp.zeros((), dtype=getattr(l, "dtype",
                                                        jnp.float32))
                for l, u in zip(leaves, mask)]
            pruned = jax.device_put(
                jax.tree_util.tree_unflatten(treedef, pruned_leaves), dev)
            segments.append(_Segment(dev, jax.jit(seg_fn), pruned,
                                     (a, b), resident))
            # next segment traces from this segment's output spec
            x_spec = jax.eval_shape(seg_fn, params, x_spec)
        self.segments: Tuple[_Segment, ...] = tuple(segments)

    @property
    def resident_bytes(self) -> List[int]:
        """Per-device parameter bytes actually resident (the pp memory
        win: max(resident) << sum(resident) for balanced chains)."""
        return [s.resident_bytes for s in self.segments]

    def __call__(self, xs: Sequence[jax.Array]) -> List[jax.Array]:
        """Push microbatches through the chain. Dispatch is asynchronous,
        so segment s runs microbatch m while segment s+1 still works on
        m-1; the returned arrays live on the last segment's device."""
        outs = []
        for x in xs:
            h = x
            for seg in self.segments:
                h = jax.device_put(h, seg.device)
                h = seg.fn(seg.params, h)
            outs.append(h)
        return outs


__all__ = ["CoderPipeline", "split_stages", "used_leaf_mask",
           "used_leaf_paths", "leaf_paths"]
