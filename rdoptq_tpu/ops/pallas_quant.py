"""Pallas TPU kernels for the quantization hot paths.

Two kernels back the activation-quantization ops that run on every layer
output during W·A-quantized evaluation:

* ``dynamic_act_quant_pallas`` — per-channel dynamic fake quantization
  (the reference's Handle_Parameter/ActQuant semantics,
  quantizer.py:81-121) computed in ONE VMEM residency: the (rows, C-tile)
  block is loaded once, channel min/max reduced on the VPU, and the
  quantize-dequantize written back — versus separate reduce + elementwise
  HBM passes.
* ``fixed_point_quant_pallas`` — Q(int).(frac) fixed-point quantization
  (light-uniform ActQuantizer, quant_int/quantizer.py:120-128), a single
  fused elementwise pass.

Both fall back to the jnp reference implementations when the array is too
large for VMEM or when not running on TPU; numerical equivalence is tested
in interpret mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import quant as Q

# VMEM is ~16 MB/core on v5e and the pipeline holds in+out blocks
# double-buffered (4 block-sized buffers): cap the rows so
# rows * 128 lanes * 4 B * 4 buffers stays well under the limit.
_MAX_ROWS = 6144
_VMEM_BUDGET_BYTES = 2 * 1024 * 1024
_LANE = 128


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform.startswith(("tpu", "axon"))
    except Exception:  # pragma: no cover
        return False


def _dyn_kernel(n_rows: int, bit_range: float, x_ref, o_ref):
    x = x_ref[:]  # (rows_padded, C_tile)
    # rows beyond n_rows are padding: exclude from the statistics
    row_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    valid = row_ids < n_rows
    big = jnp.float32(3.4e38)
    cmin = jnp.min(jnp.where(valid, x, big), axis=0, keepdims=True)
    cmax = jnp.max(jnp.where(valid, x, -big), axis=0, keepdims=True)
    rng = jnp.maximum(cmax - cmin, 1e-6)
    x01 = (x - cmin) / rng  # in [0, 1] for valid rows
    o_ref[:] = jnp.round(x01 * bit_range) / bit_range * rng + cmin


def dynamic_act_quant_pallas(x: jax.Array, n_bits: int = 8,
                             interpret: bool = False) -> jax.Array:
    """Fused per-channel dynamic fake quant for NHWC activations.

    Equivalent to :func:`rdoptq_tpu.ops.quant.dynamic_act_fake_quant`
    (channel_axis=-1); note range = max-min == max|x-min| since x >= min.
    """
    from jax.experimental import pallas as pl

    orig_shape = x.shape
    c = orig_shape[-1]
    n = int(np.prod(orig_shape[:-1]))
    x2 = x.reshape(n, c)

    # pad to hardware tiles
    rows = -(-n // 8) * 8
    cols = -(-c // _LANE) * _LANE
    if rows > _MAX_ROWS:
        # needs full-column residency for the channel statistics; larger
        # tensors fall back to the XLA path
        return Q.dynamic_act_fake_quant(x, n_bits=n_bits, channel_axis=-1)
    x2 = jnp.pad(x2, ((0, rows - n), (0, cols - c)))

    kernel = functools.partial(_dyn_kernel, n, float(2 ** n_bits - 1))
    out = pl.pallas_call(
        kernel,
        grid=(cols // _LANE,),
        in_specs=[pl.BlockSpec((rows, _LANE), lambda j: (0, j))],
        out_specs=pl.BlockSpec((rows, _LANE), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((rows, cols), x.dtype),
        interpret=interpret,
    )(x2)
    return out[:n, :c].reshape(orig_shape)


def _fp_kernel(lo: float, hi: float, mult: float, x_ref, o_ref):
    o_ref[:] = jnp.round(jnp.clip(x_ref[:], lo, hi) * mult) / mult


def fixed_point_quant_pallas(x: jax.Array, int_bits: int = 8,
                             frac_bits: int = 8,
                             interpret: bool = False) -> jax.Array:
    """Fused Q(int).(frac) fixed-point quantization (elementwise)."""
    from jax.experimental import pallas as pl

    orig_shape = x.shape
    n = int(np.prod(orig_shape))
    cols = _LANE
    rows = -(-n // cols)
    rows_pad = -(-rows // 8) * 8
    x2 = jnp.pad(x.reshape(-1), (0, rows_pad * cols - n)).reshape(
        rows_pad, cols)
    kernel = functools.partial(
        _fp_kernel, -(2.0 ** (int_bits - 1)), 2.0 ** (int_bits - 1),
        2.0 ** frac_bits)
    # chunk rows to bound VMEM
    block_rows = min(rows_pad, _VMEM_BUDGET_BYTES // (cols * 4))
    block_rows = max(8, (block_rows // 8) * 8)
    grid = (-(-rows_pad // block_rows),)
    x2 = jnp.pad(x2, ((0, grid[0] * block_rows - rows_pad), (0, 0)))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((block_rows, cols), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((block_rows, cols), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        interpret=interpret,
    )(x2)
    return out.reshape(-1)[:n].reshape(orig_shape)


def dynamic_act_quant(x: jax.Array, n_bits: int = 8) -> jax.Array:
    """Dispatch: Pallas kernel on TPU (when it fits), jnp elsewhere."""
    if _on_tpu():
        return dynamic_act_quant_pallas(x, n_bits)
    return Q.dynamic_act_fake_quant(x, n_bits=n_bits, channel_axis=-1)


__all__ = ["dynamic_act_quant_pallas", "fixed_point_quant_pallas",
           "dynamic_act_quant"]
