"""Device mesh + sharding helpers.

The reference has no distributed layer at all (SURVEY §2.4: multi-GPU =
manually launching independent runs with CUDA_VISIBLE_DEVICES,
task-oriented-PTQ/ReadMe.md:65-90). The TPU-native replacement is a
first-class `jax.sharding.Mesh` with two logical axes:

* ``dp`` — data parallel: calibration patches / evaluation images.
* ``tp`` — tensor parallel: output-channel sharding of conv kernels and
  AdaRound alpha tensors (channel-wise quantization state is naturally
  per-output-channel, so the whole quantizer search and rounding
  optimization shard cleanly along it).

All collectives are inserted by XLA from sharding annotations (psum for
data-parallel gradient reduction, all-gathers at layer boundaries for
tensor-parallel kernels) and ride ICI on real hardware.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (dp, tp) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate over tp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def channel_sharding(mesh: Mesh, ndim: int,
                     channel_axis: int = -1) -> NamedSharding:
    """Shard one (channel) axis over tp, replicate everything else —
    used for conv kernels (HWIO axis 3), alphas, and per-channel QParams."""
    spec = [None] * ndim
    spec[channel_axis % ndim] = "tp"
    return NamedSharding(mesh, P(*spec))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the H axis of an NHWC image over dp — the sequence-parallel
    analogue for image codecs (SURVEY §5 long-context): one 2K-class
    image spreads over the mesh, GSPMD inserting conv halo exchanges at
    shard edges. Pad H to a multiple of ``pad_multiple * dp`` so every
    ×2-downsampled activation still shards evenly."""
    return NamedSharding(mesh, P(None, "dp", None, None))


def shard_batch(x, mesh: Mesh):
    return jax.device_put(x, batch_sharding(mesh))


def replicate_tree(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda v: jax.device_put(v, sh), tree)


__all__ = ["Mesh", "NamedSharding", "P", "make_mesh", "batch_sharding",
           "replicated", "channel_sharding", "spatial_sharding",
           "shard_batch", "replicate_tree"]
