"""Sharded calibration + evaluation steps over a device mesh.

The RDO calibration step (rdoptq_tpu.quant.rdo) annotated for SPMD
execution: calibration caches shard over ``dp`` (batch axis), AdaRound
alphas and the current unit's kernel shard over ``tp`` (output-channel
axis). XLA inserts the psum for the data-parallel gradient reduction and
the all-gathers at tensor-parallel layer boundaries.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.base import Coder
from ..models.layers import NULL_CTX
from ..ops import adaround as AR
from ..ops import quant as Q
from ..ops.entropy import quantize_ste
from ..quant import rdo, wrap
from . import mesh as mesh_lib


def sharded_unit_step(model, state: rdo.PTQState, coder: Coder,
                      k: int, cfg: rdo.RDOConfig, mesh,
                      params, qstate, frozen_alphas, caches: Tuple,
                      alphas: Dict, opt_state, key, t: jax.Array):
    """One sharded AdaRound optimization step. All array state (params,
    quantizer scales, caches) enters as traced arguments — never closures,
    which would become HLO literals shipped to the compiler. Caches =
    (fp_in, q_in, fp_out, fp_net_out), sharded on the batch axis."""
    stage = coder.stages[k]
    leaf_paths = tuple(p for p in stage.leaf_paths if p in state.qstate)
    fp_in, q_in, fp_out, fp_net_out = caches
    opt = optax.adam(cfg.lr)
    loss_start = cfg.warmup * cfg.iters
    modes = state.weight_modes(extra={p: "soft" for p in leaf_paths})

    def loss_fn(alphas, inp, tgt_out, tgt_net):
        all_alphas = dict(frozen_alphas)
        all_alphas.update(alphas)
        params_soft = wrap.quantize_leaves(params, qstate, modes,
                                           state.cfg, all_alphas)
        out = stage.fn(params_soft, inp, NULL_CTX)
        rec = Q.lp_loss(out, tgt_out, cfg.p, "channel_sum")
        net = coder.run(params, out, NULL_CTX, start=k + 1) \
            if coder.use_suffix else out
        if coder.name == "g_a":
            net = quantize_ste(net)
        task = Q.lp_loss(net, tgt_net, cfg.task_p, "channel_sum")
        b = AR.linear_temp_decay(t.astype(jnp.float32), cfg.iters,
                                 cfg.warmup, cfg.b_start, cfg.b_end)
        reg = sum(AR.round_reg(a, b) for a in alphas.values())
        reg = jnp.where(t < loss_start, 0.0, cfg.weight * reg)
        return rec + task + reg

    key, k2 = jax.random.split(key)
    if cfg.input_prob < 1.0:
        mask = jax.random.uniform(k2, fp_in.shape) < cfg.input_prob
        inp = jnp.where(mask, q_in, fp_in)
    else:
        inp = q_in
    loss, g = jax.value_and_grad(loss_fn)(alphas, inp, fp_out, fp_net_out)
    updates, opt_state = opt.update(g, opt_state)
    alphas = optax.apply_updates(alphas, updates)
    return alphas, opt_state, key, loss


def make_sharded_unit_trainer(model, params, state: rdo.PTQState,
                              coder: Coder, k: int, cfg: rdo.RDOConfig,
                              mesh):
    """Compile the sharded step with explicit in/out shardings:
    caches dp-sharded, alphas tp-sharded on the output-channel axis."""
    stage = coder.stages[k]
    batch_sh = mesh_lib.batch_sharding(mesh)
    repl = mesh_lib.replicated(mesh)

    def alpha_sharding(a):
        if a.ndim >= 2:
            return mesh_lib.channel_sharding(mesh, a.ndim, -1)
        return repl

    def place(alphas, caches):
        alphas = {p: jax.device_put(a, alpha_sharding(a))
                  for p, a in alphas.items()}
        caches = tuple(jax.device_put(c, batch_sh) for c in caches)
        return alphas, caches

    step = functools.partial(sharded_unit_step, model, state, coder, k,
                             cfg, mesh)
    jitted = jax.jit(step)

    def call(caches, alphas, opt_state, key, t):
        return jitted(params, dict(state.qstate), dict(state.alphas),
                      caches, alphas, opt_state, key, t)

    return call, place


__all__ = ["sharded_unit_step", "make_sharded_unit_trainer"]
