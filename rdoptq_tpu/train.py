"""Rate-distortion training loop (beyond-reference capability).

The reference is PTQ-only: it consumes pretrained FP32 checkpoints
(task-oriented-PTQ/ckpts/image.py:60-115) that are not redistributable
with this repo. This module closes that gap TPU-natively: it trains any
zoo model with the reference's RD objective (λ·255²·MSE + bpp, or the
MS-SSIM variant — losses/losses.py:8-39) so the framework can produce its
own FP32 anchors for the BD-rate / W8A8 pipelines end to end.

TPU-first design:
* the whole optimization chunk is ONE jitted ``lax.scan`` over K steps —
  the host only samples crops and dispatches once per chunk (per-dispatch
  tunnel latency is ~10-50 ms, so step-per-dispatch would dominate);
* params/batches/keys are all traced arguments (never closures — see
  CLAUDE.md: closed-over arrays become HLO literals shipped through the
  remote-compile tunnel);
* the entropy-bottleneck tail quantiles are NOT trained with an auxiliary
  optimizer (the reference's ``aux_loss`` path, models/base.py:83-108) —
  they are solved exactly by bisection after training
  (``ops.entropy.fit_quantiles``), which is deterministic and jittable;
* optional ``mesh``: the batch shards over the ``dp`` axis and XLA inserts
  the gradient all-reduce.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .ops import entropy as E
from .ops import metrics as M

log = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    steps: int = 2000
    batch_size: int = 8
    patch_size: int = 256
    lr: float = 1e-4
    lmbda: float = 0.0483
    metric: str = "mse"          # mse | ms-ssim
    grad_clip: float = 1.0
    chunk: int = 50              # scan steps per device dispatch
    seed: int = 0


@functools.lru_cache(maxsize=16)
def _chunk_fn(model, cfg: TrainConfig):
    """One jitted program: scan ``cfg.chunk`` Adam steps over a
    pre-sampled batch stack. Cached per (model, config)."""
    opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip),
                      optax.adam(cfg.lr))

    def loss_fn(params, batch, key):
        # batches ship uint8 (4x less host->device traffic; the tunnel
        # transfer dominated chunk latency) and normalize on device
        batch = batch.astype(jnp.float32) / 255.0
        out = model.forward(params, batch, training=True, key=key)
        d = M.rd_loss(out, batch, cfg.lmbda, cfg.metric)
        return d["loss"], d

    @jax.jit
    def run(params, opt_state, batches, keys):
        def step(carry, xs):
            params, opt_state = carry
            batch, key = xs
            (_, d), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, key)
            updates, opt_state = opt.update(g, opt_state)
            params = optax.apply_updates(params, updates)
            dist = d.get("mse", 1.0 - d.get("ms_ssim", 0.0))
            return (params, opt_state), jnp.stack(
                [d["loss"], d["bpp"], dist])
        (params, opt_state), ms = jax.lax.scan(
            step, (params, opt_state), (batches, keys))
        return params, opt_state, ms

    return run, opt


def _sample_crops(rng: np.random.Generator, images, n: int, size: int):
    """Random `size`² crops from a list of HWC uint8/float images
    (the reference's calibration-crop semantics, datasets/dataset.py:8-43).
    Returns uint8 — normalization happens on device (see _chunk_fn)."""
    out = np.empty((n, size, size, 3), np.uint8)
    for i in range(n):
        img = images[rng.integers(len(images))]
        if img.ndim == 4:  # (1, H, W, C) loader convention
            img = img[0]
        h, w = img.shape[:2]
        top = rng.integers(max(h - size, 0) + 1)
        left = rng.integers(max(w - size, 0) + 1)
        crop = img[top:top + size, left:left + size]
        if crop.dtype != np.uint8:  # float [0,1] loader output: 8-bit PNGs
            crop = np.round(np.clip(crop, 0.0, 1.0) * 255.0)
        out[i] = crop
    return out


def train(model, params, images, cfg: TrainConfig,
          mesh=None, log_every: int = 1) -> Dict:
    """Train ``params`` in place of the random init; returns
    ``{"params": trained, "history": (chunks, 3) loss/bpp/dist}``.
    The entropy bottleneck's tail quantiles are re-solved at the end so
    the returned params are codec-ready (``update()`` parity)."""
    run, opt = _chunk_fn(model, cfg)
    opt_state = opt.init(params)
    rng = np.random.default_rng(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)

    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from .parallel import mesh as mesh_lib
        # batch stacks are (chunk, B, H, W, C): scan axis replicated,
        # per-step batch over dp — XLA inserts the gradient psum
        batch_sharding = NamedSharding(mesh, P(None, "dp"))
        params = mesh_lib.replicate_tree(params, mesh)

    history = []
    n_chunks = -(-cfg.steps // cfg.chunk)
    for c in range(n_chunks):
        k = min(cfg.chunk, cfg.steps - c * cfg.chunk)
        batches = _sample_crops(rng, images, k * cfg.batch_size,
                                cfg.patch_size).reshape(
            k, cfg.batch_size, cfg.patch_size, cfg.patch_size, 3)
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, k)
        bj = jnp.asarray(batches)
        if batch_sharding is not None:
            bj = jax.device_put(bj, batch_sharding)
        t0 = time.time()
        params, opt_state, ms = run(params, opt_state, bj, keys)
        ms = np.asarray(ms)
        history.append(ms)
        if (c + 1) % log_every == 0 or c + 1 == n_chunks:
            dt = time.time() - t0
            log.info("step %5d/%d  loss %.4f  bpp %.4f  dist %.3e  "
                     "(%.1f it/s)", (c + 1) * cfg.chunk - (cfg.chunk - k),
                     cfg.steps, ms[-1, 0], ms[-1, 1], ms[-1, 2], k / dt)
    # codec-ready: solve tail quantiles exactly (reference: aux optimizer
    # + model.update(); here deterministic bisection)
    params = dict(params)
    params["eb"] = E.fit_quantiles(params["eb"])
    return {"params": params, "history": np.concatenate(history, axis=0)}


def train_variable_rate(model, params, images, cfg: TrainConfig,
                        lambdas, log_every: int = 4) -> Dict:
    """Variable-rate training for λ-conditioned models (TinyLIC's
    ScalingNet FiLM conditioning, reference tinylic.py:17-32): ONE
    parameter set trained under every λ in ``lambdas``.

    λ is a static scalar inside each stage closure (a compile-time
    constant — cheap, λ is one float), so instead of tracing it we
    round-robin optimization chunks across ``model.with_lambda(λ)``
    variants: |lambdas| compiled programs, one shared Adam state. The
    returned params produce an RD curve by evaluating at each λ."""
    runs = []
    for lam in lambdas:
        m = model.with_lambda(lam)
        c = dataclasses.replace(cfg, lmbda=lam)
        runs.append((lam, *_chunk_fn(m, c)))
    opt = runs[0][2]
    opt_state = opt.init(params)
    rng = np.random.default_rng(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)

    history = []
    n_chunks = -(-cfg.steps // cfg.chunk)
    for c in range(n_chunks):
        lam, run, _ = runs[c % len(runs)]
        k = min(cfg.chunk, cfg.steps - c * cfg.chunk)
        batches = _sample_crops(rng, images, k * cfg.batch_size,
                                cfg.patch_size).reshape(
            k, cfg.batch_size, cfg.patch_size, cfg.patch_size, 3)
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, k)
        t0 = time.time()
        params, opt_state, ms = run(params, opt_state,
                                    jnp.asarray(batches), keys)
        ms = np.asarray(ms)
        history.append(ms)
        if (c + 1) % log_every == 0 or c + 1 == n_chunks:
            dt = time.time() - t0
            log.info("step %5d/%d  lam %.4f  loss %.4f  bpp %.4f  "
                     "dist %.3e  (%.1f it/s)", (c + 1) * cfg.chunk
                     - (cfg.chunk - k), cfg.steps, lam, ms[-1, 0],
                     ms[-1, 1], ms[-1, 2], k / dt)
    params = dict(params)
    params["eb"] = E.fit_quantiles(params["eb"])
    return {"params": params, "history": np.concatenate(history, axis=0)}


__all__ = ["TrainConfig", "train", "train_variable_rate"]
