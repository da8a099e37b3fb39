"""Task-oriented RDO calibration engine (AdaRound + task loss + QDrop).

TPU-native re-implementation of the reference's calibration core
(`layer_reconstruction` quantization/layer_opt.py:175-320,
`block_reconstruction` quantization/block_opt.py:176-324, caching utilities
quantization/utils.py:92-258). The reference runs 20 000 Python-side Adam
steps per layer with forward hooks; here each unit's whole optimization is
ONE jitted `lax.scan` running entirely on device:

* caches are collected by two tape'd forwards (FP pass; hard-quantized
  trained-prefix pass — the 'asym' input of BRECQ, utils.py:234-245),
* the task target is the FP rest-of-coder output, with STE latent rounding
  appended for g_a (the reference's `fp_out` round_ste, layer_opt.py:67-70),
* the scan body mixes quant/FP inputs elementwise with probability
  ``input_prob`` (QDrop, layer_opt.py:291-292), runs the unit with soft
  AdaRound weights, the FP suffix, and one optax Adam step on all alphas of
  the unit jointly (layer- and block-wise calibration are the same code
  here — a unit simply owns 1..n leaves).

Determinism: a single PRNG key drives batch sampling and QDrop masks.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.base import Coder
from ..models.layers import NULL_CTX, QuantCtx
from ..ops import adaround as AR
from ..ops import quant as Q
from ..ops.entropy import quantize_ste
from . import wrap

log = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class RDOConfig:
    """Calibration hyper-parameters (defaults = reference CLI defaults,
    main2.py:50-63)."""

    iters: int = 20000
    batch_size: int = 4
    weight: float = 0.01          # rounding-reg weight
    b_start: float = 20.0
    b_end: float = 2.0
    warmup: float = 0.2
    input_prob: float = 0.5       # P(use quant input) elementwise (QDrop)
    lr: float = 1e-3              # torch.optim.Adam default (layer_opt.py:254)
    p: float = 2.0                # rec-loss exponent
    task_p: float = 2.0           # task-loss exponent (--task_loss)
    act_quant: bool = False
    act_bits: int = 8
    act_kind: str = "dynamic"
    # rematerialize the suffix in the backward pass (memory <-> FLOPs
    # trade for deep suffixes, e.g. Lu2022 RSTB stacks on large patches)
    remat: bool = False
    # activation-compute dtype for the optimization loop: 'bfloat16' runs
    # the unit forward + suffix on bf16 (MXU-native, ~6x over f32 on v5e)
    # while the quantizer arithmetic, alphas, and losses stay f32.
    # Opt-in: bf16 forward noise (~1e-3 rel) is comparable to W8 rounding
    # deltas, so validate quality before using for low-bit production runs.
    compute_dtype: str = "float32"

    def __post_init__(self):
        # fail fast: a typo'd dtype would otherwise only surface minutes
        # into a run, after the FP32 anchor eval, at the first unit's trace
        dt = jnp.dtype(self.compute_dtype)
        if not jnp.issubdtype(dt, jnp.floating):
            raise ValueError(
                f"compute_dtype must be a float dtype, got {dt}")


@dataclasses.dataclass
class PTQState:
    """Mutable-on-host calibration state (all device data immutable)."""

    qstate: Dict[str, Q.QParams]
    cfg: wrap.WeightQuantConfig
    alphas: Dict[str, jax.Array] = dataclasses.field(default_factory=dict)
    trained_leaves: Tuple[str, ...] = ()
    trained_stages: Tuple[str, ...] = ()

    def weight_modes(self, extra: Dict[str, str] = {},
                     untrained: str = "fp") -> Dict[str, str]:
        """Per-leaf quantization modes: trained leaves use hard AdaRound;
        untrained leaves FP (during calibration) or nearest (eval)."""
        modes = {p: untrained for p in self.qstate}
        for p in self.trained_leaves:
            modes[p] = "hard"
        modes.update(extra)
        return modes

    def quantized_params(self, params, extra: Dict[str, str] = {},
                         untrained: str = "fp",
                         soft_alphas: Optional[Dict] = None):
        alphas = dict(self.alphas)
        if soft_alphas:
            alphas.update(soft_alphas)
        return wrap.quantize_leaves(params, self.qstate,
                                    self.weight_modes(extra, untrained),
                                    self.cfg, alphas)

    def act_ctx(self, cfg: RDOConfig,
                skip: frozenset = frozenset()) -> QuantCtx:
        if not cfg.act_quant:
            return NULL_CTX
        return QuantCtx(act_paths=frozenset(self.trained_stages),
                        act_kind="dynamic", act_bits=cfg.act_bits,
                        skip_paths=skip)


def init_ptq_state(params, wcfg: wrap.WeightQuantConfig) -> PTQState:
    """Scale-init every quantizable leaf (the reference's init forward
    pass, main2.py:195-201, without needing data for weight scales)."""
    leaves = wrap.find_quant_leaves(params)
    qstate = wrap.init_weight_qstate(params, leaves, wcfg)
    return PTQState(qstate=qstate, cfg=wcfg)


import functools


@functools.lru_cache(maxsize=64)
def _coder_tape_fn(model, coder_name: str, act_kind: str, act_bits: int,
                   skip_act: frozenset):
    """ONE jitted full-model forward per coder that returns every stage
    input (+ the coder's final output) of that coder. Parameters AND the
    per-stage act-quant gates are traced arguments, so this compiles once
    and serves the FP pass, every per-unit quantized-prefix pass, and every
    trained-set combination (the reference re-runs hooks and re-traces
    nothing-reusable per layer instead, utils.py:92-139)."""
    coder = model.coders[coder_name]
    filt = frozenset({st.name + ":in" for st in coder.stages}
                     | {coder.stages[-1].name + ":out"})

    @jax.jit
    def run(params, x, gates):
        ctx = QuantCtx(act_kind=act_kind, act_bits=act_bits,
                       skip_paths=skip_act, gates=dict(gates))
        tape = {}
        model.forward(params, x, ctx=ctx, tape=tape, tape_filter=filt)
        return tape

    return run


def _all_gates(model, trained, enabled: bool):
    """Boolean gate per stage: act-quant fires for trained stages only
    (quant_layer.py:132)."""
    gates = {}
    for coder in model.coders.values():
        for st in coder.stages:
            on = enabled and (st.name in trained)
            gates[st.name] = jnp.asarray(on)
    return gates


class CoderCache:
    """Per-calibration-run cache of FP tapes (identical for every unit of a
    coder, so computed once per coder)."""

    def __init__(self, model, params, cali_data, cfg: RDOConfig,
                 skip_act: frozenset):
        self.model = model
        self.params = params
        self.cali = cali_data
        self.cfg = cfg
        self.skip_act = skip_act
        self._fp: Dict[str, dict] = {}

    def tape_fn(self, coder_name: str):
        return _coder_tape_fn(self.model, coder_name, self.cfg.act_kind,
                              self.cfg.act_bits, self.skip_act)

    def fp_tape(self, coder_name: str) -> dict:
        if coder_name not in self._fp:
            gates = _all_gates(self.model, (), False)
            self._fp[coder_name] = self.tape_fn(coder_name)(
                self.params, self.cali, gates)
        return self._fp[coder_name]

    def q_tape(self, coder_name: str, state: "PTQState") -> dict:
        params_q = state.quantized_params(self.params)
        gates = _all_gates(self.model, frozenset(state.trained_stages),
                           self.cfg.act_quant)
        return self.tape_fn(coder_name)(params_q, self.cali, gates)


def _unit_caches(model, params, state: PTQState, coder: Coder, k: int,
                 cali_data, cfg: RDOConfig, skip_act: frozenset,
                 cache: Optional[CoderCache] = None):
    """Collect (fp_in, quant_in, fp_out, fp_net_out) for stage k of coder."""
    if cache is None:
        cache = CoderCache(model, params, cali_data, cfg, skip_act)
    stage = coder.stages[k]
    fp_tape = cache.fp_tape(coder.name)
    q_tape = cache.q_tape(coder.name, state)

    fp_in = fp_tape[stage.name + ":in"]
    q_in = q_tape[stage.name + ":in"]
    # unit FP output = next stage's input (act quant is off in the FP pass)
    if k + 1 < len(coder.stages):
        fp_out = fp_tape[coder.stages[k + 1].name + ":in"]
    else:
        fp_out = fp_tape[coder.stages[-1].name + ":out"]
    # FP task target: the rest of this coder applied to the FP output ==
    # the coder's FP final output (g_a additionally STE-rounds the latent,
    # layer_opt.py:67-70); suffix-less coders target the unit output.
    if coder.use_suffix:
        fp_net_out = fp_tape[coder.stages[-1].name + ":out"]
        if coder.name == "g_a":
            fp_net_out = quantize_ste(fp_net_out)
    else:
        fp_net_out = fp_out
    return fp_in, q_in, fp_out, fp_net_out, None


def calibrate_unit(model, params, state: PTQState, coder: Coder, k: int,
                   cali_data, cfg: RDOConfig,
                   skip_act: frozenset = frozenset(),
                   key: Optional[jax.Array] = None,
                   cache: Optional[CoderCache] = None,
                   mesh=None) -> Dict[str, float]:
    """Optimize the AdaRound alphas of one unit (stage) and fold the result
    into ``state``. Returns timing/loss diagnostics.

    With a ``mesh`` (dp × tp), the calibration caches shard over ``dp``
    (batch axis) and the unit's alphas over ``tp`` (output channels); XLA
    inserts the collectives. Without a mesh, everything runs single-device
    exactly as the reference schedule does."""
    stage = coder.stages[k]
    # stages may list optional leaves (e.g. identity-skip residual blocks
    # have no skip conv); keep only leaves that exist in this model
    leaf_paths = tuple(p for p in stage.leaf_paths if p in state.qstate)
    if not leaf_paths:
        state.trained_stages += (stage.name,)
        return {"skipped": True}
    key = key if key is not None else jax.random.PRNGKey(0)

    t0 = time.time()
    fp_in, q_in, fp_out, fp_net_out, _ = _unit_caches(
        model, params, state, coder, k, cali_data, cfg, skip_act, cache)
    cache_t = time.time() - t0

    alphas0 = wrap.init_alphas(params, state.qstate, leaf_paths)
    opt = optax.adam(cfg.lr)
    n = fp_in.shape[0]
    loss_start = cfg.warmup * cfg.iters
    # quant state needed inside the step (everything an ARGUMENT, never a
    # closure: closed-over arrays become HLO literals and the full model
    # params + caches would be re-shipped to the compiler for every unit)
    modes = state.weight_modes(extra={p: "soft" for p in leaf_paths})

    def _cast_tree(tree, dtype):
        return jax.tree_util.tree_map(
            lambda v: v.astype(dtype)
            if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)
            else v, tree)

    def loss_fn(alphas, frozen_alphas, params, qstate, inp, tgt_out,
                tgt_net, t):
        all_alphas = dict(frozen_alphas)
        all_alphas.update(alphas)
        # quantizer arithmetic always f32 (rounding decisions need it)
        params_soft = wrap.quantize_leaves(params, qstate, modes,
                                           state.cfg, all_alphas)
        params_fwd, params_sfx = params_soft, params
        if cfg.compute_dtype != "float32":
            dt = jnp.dtype(cfg.compute_dtype)
            params_fwd = _cast_tree(params_soft, dt)
            params_sfx = _cast_tree(params, dt)
            inp = inp.astype(dt)
        out = stage.fn(params_fwd, inp, NULL_CTX)
        rec = Q.lp_loss(out.astype(jnp.float32), tgt_out, cfg.p,
                        "channel_sum")
        suffix = lambda p, h: coder.run(p, h, NULL_CTX, start=k + 1)
        if cfg.remat:
            suffix = jax.checkpoint(suffix)
        net = suffix(params_sfx, out) if coder.use_suffix else out
        net = net.astype(jnp.float32)
        if coder.name == "g_a":
            net = quantize_ste(net)
        task = Q.lp_loss(net, tgt_net, cfg.task_p, "channel_sum")
        b = AR.linear_temp_decay(t.astype(jnp.float32), cfg.iters,
                                 cfg.warmup, cfg.b_start, cfg.b_end)
        reg = sum(AR.round_reg(a, b) for a in alphas.values())
        reg = jnp.where(t < loss_start, 0.0, cfg.weight * reg)
        return rec + task + reg, (rec, task, reg)

    @jax.jit
    def run_scan(alphas, frozen_alphas, key, params, qstate, fp_in, q_in,
                 fp_out, fp_net_out):
        opt_state = opt.init(alphas)

        def step(carry, t):
            alphas, opt_state, key = carry
            key, k1, k2 = jax.random.split(key, 3)
            idx = jax.random.permutation(k1, n)[:cfg.batch_size]
            fp_b, q_b = fp_in[idx], q_in[idx]
            # QDrop: elementwise quant-vs-fp input mix (layer_opt.py:291)
            if cfg.input_prob < 1.0:
                mask = jax.random.uniform(k2, fp_b.shape) < cfg.input_prob
                inp = jnp.where(mask, q_b, fp_b)
            else:
                inp = q_b
            (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                alphas, frozen_alphas, params, qstate, inp, fp_out[idx],
                fp_net_out[idx], t)
            updates, opt_state = opt.update(g, opt_state)
            alphas = optax.apply_updates(alphas, updates)
            return (alphas, opt_state, key), jnp.stack(
                [l, aux[0], aux[1], aux[2]])

        (alphas, _, _), losses = jax.lax.scan(
            step, (alphas, opt_state, key), jnp.arange(cfg.iters))
        return alphas, losses

    if mesh is not None:
        from ..parallel import mesh as mesh_lib
        batch_sh = mesh_lib.batch_sharding(mesh)
        fp_in, q_in, fp_out, fp_net_out = (
            jax.device_put(v, batch_sh)
            for v in (fp_in, q_in, fp_out, fp_net_out))
        alphas0 = {
            p: jax.device_put(
                a, mesh_lib.channel_sharding(mesh, a.ndim, -1)
                if a.ndim >= 2 else mesh_lib.replicated(mesh))
            for p, a in alphas0.items()}
        params = mesh_lib.replicate_tree(params, mesh)

    t0 = time.time()
    alphas, losses = run_scan(alphas0, dict(state.alphas), key, params,
                              dict(state.qstate), fp_in, q_in, fp_out,
                              fp_net_out)
    losses.block_until_ready()
    opt_t = time.time() - t0

    state.alphas.update(alphas)
    state.trained_leaves += tuple(leaf_paths)
    state.trained_stages += (stage.name,)
    # losses: (iters, 4) = total, rec, task, reg
    info = {"cache_s": cache_t, "opt_s": opt_t,
            "loss_first": float(losses[0, 0]),
            "loss_last": float(losses[-1, 0]),
            "rec_first": float(losses[0, 1]),
            "rec_last": float(losses[-1, 1]),
            "task_first": float(losses[0, 2]),
            "task_last": float(losses[-1, 2]),
            "reg_last": float(losses[-1, 3]),
            "steps_per_s": cfg.iters / max(opt_t, 1e-9)}
    log.info("unit %-16s cache %.2fs opt %.2fs (%.0f it/s) "
             "rec %.4g->%.4g task %.4g->%.4g reg %.4g",
             stage.name, cache_t, opt_t, info["steps_per_s"],
             info["rec_first"], info["rec_last"], info["task_first"],
             info["task_last"], info["reg_last"])
    return info


def calibrate_model(model, params, cali_data, wcfg: wrap.WeightQuantConfig,
                    cfg: RDOConfig, skip_act: frozenset = frozenset(),
                    seed: int = 1005, mesh=None) -> PTQState:
    """Full sequential calibration over the model's unit schedule
    (the reference's `recon_model` walk, main2.py:227-264). Pass ``mesh``
    to shard every unit's optimization over a device mesh."""
    state = init_ptq_state(params, wcfg)
    key = jax.random.PRNGKey(seed)
    cache = CoderCache(model, params, cali_data, cfg, skip_act)
    for coder_name in model.calibration_order():
        coder = model.coders[coder_name]
        for k in range(len(coder.stages)):
            key, sub = jax.random.split(key)
            calibrate_unit(model, params, state, coder, k, cali_data, cfg,
                           skip_act, sub, cache, mesh)
    return state


__all__ = ["RDOConfig", "PTQState", "init_ptq_state", "calibrate_unit",
           "calibrate_model"]
