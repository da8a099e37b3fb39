"""Sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdoptq_tpu.parallel import mesh as pmesh


def test_mesh_shapes():
    mesh = pmesh.make_mesh(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    mesh2 = pmesh.make_mesh(tp=2)
    assert mesh2.shape["dp"] * 2 == len(jax.devices())


def test_shard_batch_and_channel():
    mesh = pmesh.make_mesh(dp=4, tp=2)
    x = jnp.ones((8, 16, 16, 3))
    xs = pmesh.shard_batch(x, mesh)
    assert xs.sharding.spec == pmesh.P("dp")
    w = jnp.ones((3, 3, 4, 8))
    ws = jax.device_put(w, pmesh.channel_sharding(mesh, 4, -1))
    assert ws.sharding.spec[3] == "tp"
    # computation across shardings still correct
    y = jax.jit(lambda a, b: jnp.einsum("bhwc,hwcd->bd", a[:, :3, :3, :],
                                        b[:, :, :3, :]))(xs, ws)
    assert y.shape == (8, 8)


def test_dryrun_multichip_entrypoint():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(len(jax.devices()))
