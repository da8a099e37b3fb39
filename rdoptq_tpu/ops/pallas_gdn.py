"""Pallas TPU kernel for fused (inverse) GDN.

GDN — y = x * rsqrt(beta + (x*x) @ gamma) — is the per-conv
normalization of the Minnen2018/Cheng2020 transforms (reference
`f_gdn`, task-oriented-PTQ/quantization/quant_layer.py:142-154). The
stock XLA lowering keeps the 1x1 conv over channels as its own HBM
round trip, and the closing elementwise multiply re-reads ``x``; this
kernel performs the square, the channel mixing (an MXU dot: gamma is a
dense (C, C) matrix), and the rsqrt-scale in ONE VMEM residency —
``x`` is read once from HBM and the result written once.

The kernel is forward-only; gradients (the RDO calibration
differentiates through the coder suffix, quant/rdo.py) take the
standard jnp path via a custom VJP, so calibration numerics are
untouched by kernel fusion.

Falls back to the jnp reference off-TPU; numerical equivalence is
tested in interpret mode on CPU (tests/test_pallas_quant.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# (rows, C) f32 in/out blocks double-buffered + kernel intermediates
# (x², norm) must sit inside ~16 MB VMEM: at C=192, 1024 rows ≈ 0.75 MB
# per buffer → ~4-5 MB live, comfortable margin
_ROWS = 1024


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform.startswith(("tpu", "axon"))
    except Exception:  # pragma: no cover
        return False


def _reference(x: jax.Array, gamma: jax.Array, beta: jax.Array,
               inverse: bool, beta_min: float) -> jax.Array:
    """jnp math, identical to models/layers.gdn (kept here so the kernel
    module is self-contained for the VJP)."""
    g = jnp.maximum(gamma, 0.0)
    b = jnp.maximum(beta, beta_min)
    norm = (x * x).astype(jnp.float32) @ g.astype(jnp.float32) + b
    norm = norm.astype(x.dtype)
    return x * jnp.sqrt(norm) if inverse else x * jax.lax.rsqrt(norm)


def _kernel(inverse: bool, beta_min: float, x_ref, g_ref, b_ref, o_ref):
    x = x_ref[:]  # (rows, C)
    x32 = x.astype(jnp.float32)
    g = jnp.maximum(g_ref[:].astype(jnp.float32), 0.0)
    b = jnp.maximum(b_ref[:].astype(jnp.float32), beta_min)
    norm = jnp.dot(x32 * x32, g,
                   preferred_element_type=jnp.float32) + b
    norm = norm.astype(x.dtype)
    o_ref[:] = x * (jnp.sqrt(norm) if inverse else jax.lax.rsqrt(norm))


def _pallas_forward(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                    inverse: bool, beta_min: float,
                    interpret: bool) -> jax.Array:
    from jax.experimental import pallas as pl

    n, h, w, c = x.shape
    rows = n * h * w
    xr = x.reshape(rows, c)
    pad = (-rows) % _ROWS
    if pad:
        xr = jnp.pad(xr, ((0, pad), (0, 0)))
    grid = (xr.shape[0] // _ROWS,)
    out = pl.pallas_call(
        functools.partial(_kernel, inverse, beta_min),
        out_shape=jax.ShapeDtypeStruct(xr.shape, x.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((_ROWS, c), lambda i: (i, 0)),
                  pl.BlockSpec((c, c), lambda i: (0, 0)),
                  pl.BlockSpec((1, c), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((_ROWS, c), lambda i: (i, 0)),
        interpret=interpret,
    )(xr, gamma, beta.reshape(1, c))
    if pad:
        out = out[:rows]
    return out.reshape(n, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def gdn_pallas(x: jax.Array, gamma: jax.Array, beta: jax.Array,
               inverse: bool = False, beta_min: float = 1e-6,
               interpret: bool = False) -> jax.Array:
    """Fused (inverse) GDN. ``gamma`` is the dense (C, C) channel-mixing
    matrix (the squeezed 1x1-conv kernel), ``beta`` the (C,) bias."""
    if not (interpret or _on_tpu()):
        return _reference(x, gamma, beta, inverse, beta_min)
    return _pallas_forward(x, gamma, beta, inverse, beta_min, interpret)


def _fwd(x, gamma, beta, inverse, beta_min, interpret):
    out = gdn_pallas(x, gamma, beta, inverse, beta_min, interpret)
    return out, (x, gamma, beta)


def _bwd(inverse, beta_min, interpret, res, g_out):
    x, gamma, beta = res
    _, vjp = jax.vjp(
        lambda xx, gg, bb: _reference(xx, gg, bb, inverse, beta_min),
        x, gamma, beta)
    return vjp(g_out)


gdn_pallas.defvjp(_fwd, _bwd)


# models/layers.gdn consults this default (env-settable) so serving and
# benchmarks can flip the fused kernel on without touching call sites
PALLAS_GDN_DEFAULT = os.environ.get("RDOPTQ_PALLAS_GDN", "0") == "1"

__all__ = ["gdn_pallas", "PALLAS_GDN_DEFAULT"]
