"""Per-stage bias correction for zero-iteration (nearest) quantization.

Beyond-reference capability: quantizing weights shifts every stage's
expected output (E[f(x;W)] != E[f(x;Wq)]); folding the measured
per-channel shift into the stage's bias removes the DC component of the
quantization error for free — no calibration iterations (the classic
"bias correction" of data-free-quantization literature, applied here at
this framework's Stage granularity). The reference has no equivalent:
its nearest path ships the raw shift and only the 20k-iteration AdaRound
reconstruction can recover it.

TPU-native shape: ONE jitted program computes, for every qualifying
stage at once, the fp-vs-quantized output channel means on a calibration
batch AND the residual after the candidate correction; one host fetch,
then per-stage keep/drop on the host (a correction is kept only when it
reduces the channel-mean error — stages whose output is not affine in
their bias, e.g. conv+GDN blocks, are guarded empirically rather than
by structural analysis).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import get_leaf, set_leaf
from ..models.layers import NULL_CTX

log = logging.getLogger(__name__)


def _candidate_stages(model, params) -> List[Tuple[str, object, str]]:
    """(coder_name, stage, bias_path) for every stage whose last weight
    leaf has a 1-D bias sibling in ``params``."""
    out = []
    for cname, coder in model.coders.items():
        for st in coder.stages:
            w_paths = [p for p in st.leaf_paths if p.endswith("/w")]
            if not w_paths:
                continue
            bias_path = w_paths[-1].rsplit("/", 1)[0] + "/b"
            try:
                b = get_leaf(params, bias_path)
            except (KeyError, TypeError):
                continue
            if getattr(b, "ndim", None) == 1:
                out.append((cname, st, bias_path))
    return out


def bias_correct(model, params_fp, params_q, x, report: bool = False,
                 ctx=NULL_CTX):
    """Return ``params_q`` with per-stage bias corrections applied where
    they measurably help.

    ``x``: (B, H, W, C) calibration batch. Every stage sees its FP
    input (taped from one fp forward), so corrections are independent
    and the whole computation is one fused program + one fetch.

    ``ctx``: the QuantCtx the corrected model will be EVALUATED with.
    The quantized stage runs (and the keep/drop guard) use it, so when
    activation quantization is on, corrections target the act-quantized
    output distribution rather than an unquantized one the deployment
    never sees. The FP reference always runs unquantized.
    """
    cands = _candidate_stages(model, params_q)
    names = frozenset(f"{st.name}:in" for _, st, _ in cands)

    @jax.jit
    def measure(params_fp, params_q, x):
        tape: Dict[str, jax.Array] = {}
        model.forward(params_fp, x, tape=tape, tape_filter=names)
        res = {}
        for _, st, bias_path in cands:
            x_in = tape.get(f"{st.name}:in")
            if x_in is None:
                continue
            fp_out = st.fn(params_fp, x_in, NULL_CTX)
            q_out = st.fn(params_q, x_in, ctx)
            b = get_leaf(params_q, bias_path)
            if fp_out.shape[-1] != b.shape[0]:  # trace-time skip
                continue
            axes = tuple(range(fp_out.ndim - 1))
            err = jnp.mean(fp_out - q_out, axis=axes)
            q2 = set_leaf(params_q, bias_path, b + err)
            err2 = jnp.mean(fp_out - st.fn(q2, x_in, ctx), axis=axes)
            res[st.name] = (err, jnp.sum(err ** 2), jnp.sum(err2 ** 2))
        return res

    measured = jax.device_get(measure(params_fp, params_q, x))
    kept, dropped = [], []
    for _, st, bias_path in cands:
        if st.name not in measured:
            continue
        err, e1, e2 = measured[st.name]
        if e2 < e1:  # affine-in-bias stages: e2 ~ 0; others: empirical
            b = get_leaf(params_q, bias_path)
            params_q = set_leaf(params_q, bias_path,
                                b + jnp.asarray(err))
            kept.append((st.name, float(e1), float(e2)))
        else:
            dropped.append(st.name)
    log.info("bias correction: %d/%d stages corrected%s", len(kept),
             len(kept) + len(dropped),
             f" (dropped: {dropped})" if dropped else "")
    if report:
        return params_q, {"kept": kept, "dropped": dropped}
    return params_q


__all__ = ["bias_correct"]
