"""Host rANS codec throughput (CPU-only; the entropy coder is the one
component that stays on host in the TPU design — its throughput bounds
the codec tail after the device work is a single async chain).

Measures encode/decode symbols/s and the bitstream efficiency vs the
symbols' empirical entropy, on a Gaussian-conditional workload shaped
like a real latent (768x512 image -> 48x32x320 latent, zero-mean
integer symbols with per-position scale indexes into the standard
64-entry scale table — the exact call pattern of coding/codec.py).

Writes artifacts/rans_bench.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# host-only benchmark: never wait on a (possibly absent) TPU tunnel
os.environ.setdefault("RDOPTQ_PLATFORM", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rdoptq_tpu.coding import cdf as cdf_mod
from rdoptq_tpu.coding import rans
from rdoptq_tpu.ops import entropy as E

REPS = 5


def main():
    rng = np.random.default_rng(0)
    table = np.asarray(E.default_scale_table())
    g = cdf_mod.build_gaussian_tables(table)

    rows = []
    for n in (48 * 32 * 320, 4 * 48 * 32 * 320):  # Kodak / ~2K latent
        # per-symbol scales drawn like a trained hyperprior's output
        idx = rng.integers(8, 40, size=n).astype(np.int32)
        sigma = table[idx]
        sym = np.round(rng.normal(0, sigma)).astype(np.int32)

        t0 = time.time()
        for _ in range(REPS):
            stream = rans.encode_with_indexes(sym, idx, g.cdf,
                                              g.cdf_lengths, g.offsets)
        enc_s = (time.time() - t0) / REPS

        t0 = time.time()
        for _ in range(REPS):
            dec = rans.decode_with_indexes(stream, idx, g.cdf,
                                           g.cdf_lengths, g.offsets)
        dec_s = (time.time() - t0) / REPS
        assert np.array_equal(dec, sym)

        t0 = time.time()
        for _ in range(REPS):
            dec2 = rans.decode_with_indexes(stream, idx, g.cdf,
                                            g.cdf_lengths, g.offsets,
                                            use_lut=False)
        dec_search_s = (time.time() - t0) / REPS
        assert np.array_equal(dec2, sym)

        # empirical entropy of the symbol stream under the model
        _, counts = np.unique(sym, return_counts=True)
        ent_bits = float(-(counts / n * np.log2(counts / n)).sum() * n)
        rows.append({
            "n_symbols": int(n),
            "encode_msym_per_s": round(n / enc_s / 1e6, 2),
            "decode_msym_per_s": round(n / dec_s / 1e6, 2),
            "decode_binsearch_msym_per_s": round(n / dec_search_s / 1e6, 2),
            "stream_bytes": len(stream),
            "bits_per_symbol": round(len(stream) * 8 / n, 4),
            "marginal_entropy_bps": round(ent_bits / n, 4),
        })
        print(rows[-1], flush=True)

    out = {"reps": REPS, "rows": rows}
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/rans_bench.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts/rans_bench.json")


if __name__ == "__main__":
    main()


