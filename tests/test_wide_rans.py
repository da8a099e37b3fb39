"""Wide (lane-interleaved) rANS: the on-device entropy decoder.

Pins the format: numpy encode -> numpy decode, numpy encode -> jnp
(jit) decode, multi-section chaining across DIFFERENT tables (the
factorized-z-then-gaussian-y layout the device codec uses), exception
handling for out-of-range values, and lane-padding alignment.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdoptq_tpu.coding import cdf as cdf_mod
from rdoptq_tpu.coding import wide_rans as W
from rdoptq_tpu.ops import entropy as E


@pytest.fixture(scope="module")
def gaussian_wt():
    table = np.asarray(E.default_scale_table())
    return table, W.build_wide_tables(
        cdf_mod.build_gaussian_tables(table, precision=12))


def _sample(table, n, seed=0, exc_every=0):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, table.shape[0], n)
    vals = np.round(rng.normal(0, table[idx])).astype(np.int64)
    if exc_every:
        vals[::exc_every] = 10 ** 6
    return vals, idx


def _padded(stream):
    return np.concatenate([stream, np.zeros(W.LANES, np.uint16)])


def test_numpy_roundtrip_with_exceptions(gaussian_wt):
    table, wt = gaussian_wt
    vals, idx = _sample(table, 5000, exc_every=971)
    stream, states, exc_pos, exc_val, n = W.encode_wide(vals, idx, wt)
    assert exc_pos.size == len(range(0, 5000, 971))
    dec = W.decode_wide_np(_padded(stream), states, idx, wt)
    dec[exc_pos] = exc_val
    np.testing.assert_array_equal(dec, vals)


def test_jit_decoder_matches_and_tracks_stream(gaussian_wt):
    table, wt = gaussian_wt
    vals, idx = _sample(table, 5000, seed=1)
    stream, states, exc_pos, exc_val, _ = W.encode_wide(vals, idx, wt)
    dev = W.device_arrays(wt)
    f = jax.jit(lambda s, st, ix: W.decode_wide(s, jnp.int32(0), st, ix,
                                                dev))
    out, _, ptr = f(jnp.asarray(_padded(stream)), jnp.asarray(states),
                    jnp.asarray(idx, jnp.int32))
    out = np.asarray(out).astype(np.int64)
    out[exc_pos] = exc_val
    np.testing.assert_array_equal(out, vals)
    # the decoder consumed exactly the live stream
    assert int(ptr) == stream.size


def test_decode_unroll_invariant(gaussian_wt):
    """`unroll` is a pure scheduling knob: every factor must produce the
    same values, states, and stream pointer (the wide codec relies on
    this — RDOPTQ_WIDE_UNROLL changes compiled code, never the format).
    Length 2560/512 = 5 rows exercises the unroll remainder path."""
    table, wt = gaussian_wt
    vals, idx = _sample(table, 2560, seed=7)
    stream, states, exc_pos, exc_val, _ = W.encode_wide(vals, idx, wt)
    dev = W.device_arrays(wt)
    outs = []
    for unroll in (1, 2, 3, 8):
        f = jax.jit(lambda s, st, ix, u=unroll: W.decode_wide(
            s, jnp.int32(0), st, ix, dev, unroll=u))
        out, st, ptr = f(jnp.asarray(_padded(stream)), jnp.asarray(states),
                         jnp.asarray(idx, jnp.int32))
        outs.append((np.asarray(out), np.asarray(st), int(ptr)))
    for o, s, p in outs[1:]:
        np.testing.assert_array_equal(o, outs[0][0])
        np.testing.assert_array_equal(s, outs[0][1])
        assert p == outs[0][2]


def test_sections_chain_across_tables(gaussian_wt):
    """z (factorized rows) then y (gaussian rows) in one stream, decoded
    by two chained decode_wide calls with threaded states/ptr — the
    exact layout the device codec uses. Odd section sizes exercise the
    per-section lane padding."""
    table, wt_g = gaussian_wt
    eb = E.factorized_init(jax.random.PRNGKey(0), channels=8)
    eb = E.fit_quantiles(eb)
    wt_f = W.build_wide_tables(
        cdf_mod.build_factorized_tables(eb, precision=12))

    rng = np.random.default_rng(2)
    n1, n2 = 777, 1531  # deliberately not lane multiples
    idx1 = rng.integers(0, wt_f.cdf.shape[0], n1)
    v1 = np.round(rng.normal(0, 2, n1)).astype(np.int64) \
        + wt_f.offsets[idx1] + 1
    v2, idx2 = _sample(table, n2, seed=3)

    stream, states, excs = W.encode_wide_sections(
        [(v1, idx1, wt_f), (v2, idx2, wt_g)])

    pad = jnp.asarray(_padded(stream))
    dev_f, dev_g = W.device_arrays(wt_f), W.device_arrays(wt_g)

    @jax.jit
    def run(s, st, i1, i2):
        o1, st, ptr = W.decode_wide(s, jnp.int32(0), st, i1, dev_f)
        o2, st, ptr = W.decode_wide(s, ptr, st, i2, dev_g)
        return o1, o2

    o1, o2 = run(pad, jnp.asarray(states), jnp.asarray(idx1, jnp.int32),
                 jnp.asarray(idx2, jnp.int32))
    o1 = np.asarray(o1).astype(np.int64)
    o2 = np.asarray(o2).astype(np.int64)
    for o, (ep, ev) in zip((o1, o2), excs):
        o[ep] = ev
    np.testing.assert_array_equal(o1, v1)
    np.testing.assert_array_equal(o2, v2)


def test_apply_exceptions_on_device(gaussian_wt):
    table, wt = gaussian_wt
    vals, idx = _sample(table, 2000, seed=4, exc_every=333)
    stream, states, exc_pos, exc_val, _ = W.encode_wide(vals, idx, wt)
    dev = W.device_arrays(wt)
    k = 16  # fixed exception capacity inside the jitted program
    ep = np.zeros(k, np.int32)
    ev = np.zeros(k, np.int32)
    ep[:exc_pos.size] = exc_pos
    ev[:exc_pos.size] = exc_val

    @jax.jit
    def run(s, st, ix, ep, ev, en):
        out, _, _ = W.decode_wide(s, jnp.int32(0), st, ix, dev)
        return W.apply_exceptions(out, ep, ev, en)

    out = run(jnp.asarray(_padded(stream)), jnp.asarray(states),
              jnp.asarray(idx, jnp.int32), jnp.asarray(ep),
              jnp.asarray(ev), jnp.int32(exc_pos.size))
    np.testing.assert_array_equal(np.asarray(out).astype(np.int64), vals)


def test_rate_overhead_vs_host_rans(gaussian_wt):
    """The wide format's rate stays within a few percent of the host
    (precision-16, single-stream) rANS on the same symbols."""
    from rdoptq_tpu.coding import rans

    table, wt = gaussian_wt
    vals, idx = _sample(table, 20000, seed=5)
    stream, _, _, _, _ = W.encode_wide(vals, idx, wt)
    wide_bits = stream.size * 16 + W.LANES * 32  # + shipped states

    g16 = cdf_mod.build_gaussian_tables(table, precision=16)
    host = rans.encode_with_indexes(vals - 0, idx, g16.cdf,
                                    g16.cdf_lengths, g16.offsets)
    host_bits = len(host) * 8
    # precision 12 vs 16 costs a little rate; lane states cost 2 KB
    assert wide_bits < host_bits * 1.08 + W.LANES * 32
