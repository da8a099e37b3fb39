"""Pallas quantization kernels vs jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from rdoptq_tpu.ops import pallas_quant as PQ
from rdoptq_tpu.ops import quant as Q


def test_dynamic_act_quant_kernel_matches_reference():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 24)).astype(np.float32) * 3)
    got = PQ.dynamic_act_quant_pallas(x, interpret=True)
    want = Q.dynamic_act_fake_quant(x, channel_axis=-1)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_dynamic_act_quant_kernel_nonmultiple_channels():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 5, 7, 130)).astype(np.float32))
    got = PQ.dynamic_act_quant_pallas(x, interpret=True)
    want = Q.dynamic_act_fake_quant(x, channel_axis=-1)
    assert got.shape == x.shape
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fixed_point_kernel_matches_reference():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(3, 11, 6, 5)).astype(np.float32) * 100)
    got = PQ.fixed_point_quant_pallas(x, interpret=True)
    want = Q.fixed_point_act_quant(x)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_dispatch_falls_back_on_cpu():
    x = jnp.ones((1, 4, 4, 8))
    out = PQ.dynamic_act_quant(x)  # CPU -> jnp path
    assert out.shape == x.shape


def test_gdn_pallas_matches_layers_gdn():
    """Fused GDN kernel (interpret mode) vs the stock conv formula, both
    directions, including a row count that does not divide the kernel's
    row tile (exercises the padding path)."""
    from rdoptq_tpu.models import layers as L
    from rdoptq_tpu.ops import pallas_gdn as PG
    rng = np.random.default_rng(3)
    c = 24
    p = {"gamma": jnp.asarray(
             np.abs(rng.normal(size=(1, 1, c, c))).astype(np.float32) * .1),
         "beta": jnp.asarray(
             np.abs(rng.normal(size=(c,))).astype(np.float32) + 0.5)}
    x = jnp.asarray(rng.normal(size=(1, 7, 9, c)).astype(np.float32))
    for inverse in (False, True):
        want = L.gdn(p, x, inverse=inverse, use_pallas=False)
        got = PG.gdn_pallas(x, p["gamma"].reshape(c, c), p["beta"],
                            inverse, 1e-6, True)
        assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-6), \
            f"inverse={inverse}"


def test_gdn_pallas_grads_match_reference():
    """The custom VJP must reproduce the stock formula's gradients (the
    RDO calibration differentiates through GDN in the coder suffix)."""
    from rdoptq_tpu.models import layers as L
    from rdoptq_tpu.ops import pallas_gdn as PG
    rng = np.random.default_rng(4)
    c = 8
    gamma = jnp.asarray(
        np.abs(rng.normal(size=(c, c))).astype(np.float32) * .1)
    beta = jnp.asarray(np.abs(rng.normal(size=(c,))).astype(np.float32) + .5)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, c)).astype(np.float32))

    def f_pallas(xx, gg, bb):
        return jnp.sum(PG.gdn_pallas(xx, gg, bb, False, 1e-6, True) ** 2)

    def f_ref(xx, gg, bb):
        p = {"gamma": gg.reshape(1, 1, c, c), "beta": bb}
        return jnp.sum(L.gdn(p, xx, use_pallas=False) ** 2)

    g1 = jax.grad(f_pallas, argnums=(0, 1, 2))(x, gamma, beta)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(g1, g2):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_phase_conv_matches_lax_conv_int8():
    """Polyphase-GEMM stride-2 conv (ops/phase_conv.py) is bit-exact
    against XLA's conv lowering in int8/int32, including odd input
    sizes (asymmetric round-up padding of the phase planes)."""
    from rdoptq_tpu.ops import phase_conv

    rng = np.random.default_rng(0)
    for (h, w, cin, cout, k) in [(64, 48, 16, 24, 5), (37, 29, 8, 8, 3),
                                 (10, 11, 4, 6, 5)]:
        x = jnp.asarray(rng.integers(-127, 128, (2, h, w, cin))
                        .astype(np.int8))
        ww = jnp.asarray(rng.integers(-127, 128, (k, k, cin, cout))
                         .astype(np.int8))
        ref = jax.lax.conv_general_dilated(
            x, ww, (2, 2), ((k // 2, k // 2), (k // 2, k // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        got = phase_conv.phase_conv2d(ww, x, acc_dtype=jnp.int32)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_phase_conv_int8_node_path():
    """layers.conv2d with an int8-kernel node routes through the phase
    path when PHASE_CONV_DEFAULT is on and matches the XLA int8 path."""
    from rdoptq_tpu.models import layers as L
    from rdoptq_tpu.ops import phase_conv

    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(5, 5, 8, 16)).astype(np.float32) * .1)
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * .01)
    x = jnp.asarray(rng.normal(size=(1, 32, 24, 8)).astype(np.float32))
    s_w = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    node = {"w_int8": jnp.clip(jnp.round(w / s_w), -127, 127)
            .astype(jnp.int8), "s_w": s_w, "b": b}
    ref = L.conv2d(node, x, stride=2)
    old = phase_conv.PHASE_CONV_DEFAULT
    phase_conv.PHASE_CONV_DEFAULT = True
    try:
        got = L.conv2d(node, x, stride=2)
    finally:
        phase_conv.PHASE_CONV_DEFAULT = old
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=0, atol=1e-5)


def test_pallas_phase_conv_matches_reference():
    """Fused Pallas int8 phase-conv kernel (interpret mode) matches the
    XLA phase path, including non-multiple tile counts and bias."""
    from rdoptq_tpu.ops import pallas_phase_conv, phase_conv

    rng = np.random.default_rng(2)
    for (h, w, cin, cout, k, toh) in [(64, 48, 16, 24, 5, 8),
                                      (33, 31, 8, 8, 5, 8),
                                      (32, 32, 8, 16, 3, 16)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, cin))
                        .astype(np.float32))
        ww = jnp.asarray(rng.normal(size=(k, k, cin, cout))
                         .astype(np.float32) * 0.1)
        s_w = jnp.max(jnp.abs(ww), axis=(0, 1, 2)) / 127.0
        node = {"w_int8": jnp.clip(jnp.round(ww / s_w), -127, 127)
                .astype(jnp.int8), "s_w": s_w,
                "b": jnp.asarray(rng.normal(size=(cout,))
                                 .astype(np.float32) * 0.01)}
        s_x = float(jnp.abs(x).max()) / 127.0
        xi = jnp.clip(jnp.round(x / s_x), -127, 127).astype(jnp.int8)
        ref = phase_conv.phase_conv2d_int8(node, xi, s_x)
        got = pallas_phase_conv.pallas_phase_conv2d_int8(
            node, xi, s_x, tile_oh=toh, interpret=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   rtol=0, atol=1e-5)


def test_phase_tconv_matches_dilated_conv_int8():
    """Polyphase stride-2 transposed conv (4 dense stride-1 convs +
    interleave) is bit-exact against the input-dilated int8 lowering,
    and routes through layers.conv_transpose2d under the flag."""
    from rdoptq_tpu.models import layers as L
    from rdoptq_tpu.ops import phase_conv

    rng = np.random.default_rng(3)
    for (r, c, cin, cout, k) in [(16, 12, 8, 16, 5), (9, 11, 4, 6, 5),
                                 (8, 8, 8, 8, 3)]:
        x = jnp.asarray(rng.integers(-127, 128, (2, r, c, cin))
                        .astype(np.int8))
        w = jnp.asarray(rng.integers(-127, 128, (k, k, cin, cout))
                        .astype(np.int8))
        pad_lo = k - 1 - k // 2
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((pad_lo, pad_lo + 1), (pad_lo, pad_lo + 1)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        got = phase_conv.phase_tconv2d(w, x, acc_dtype=jnp.int32)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    # node-path routing equivalence (float in/out)
    wf = jnp.asarray(rng.normal(size=(5, 5, 8, 16)).astype(np.float32)
                     * 0.1)
    s_w = jnp.max(jnp.abs(wf), axis=(0, 1, 2)) / 127.0
    node = {"w_int8": jnp.clip(jnp.round(wf / s_w), -127, 127)
            .astype(jnp.int8), "s_w": s_w}
    xf = jnp.asarray(rng.normal(size=(1, 12, 10, 8)).astype(np.float32))
    ref = L.conv_transpose2d(node, xf, stride=2)
    old = phase_conv.PHASE_CONV_DEFAULT
    phase_conv.PHASE_CONV_DEFAULT = True
    try:
        got = L.conv_transpose2d(node, xf, stride=2)
    finally:
        phase_conv.PHASE_CONV_DEFAULT = old
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=0, atol=1e-5)
