"""Summarize artifacts/*.json sweeps into RESULTS.md-ready markdown.

Usage: python scripts/summarize_results.py [artifacts_dir]
"""

from __future__ import annotations

import glob
import json
import os
import sys


def main(art_dir: str = "artifacts"):
    for path in sorted(glob.glob(os.path.join(art_dir, "*.json"))):
        with open(path) as f:
            d = json.load(f)
        if "per_quality" not in d:
            continue
        name = os.path.basename(path)
        bd = d.get("bd_rate_pct")
        bdp = d.get("bd_psnr_db")
        print(f"\n### {name} — {d['arch']} W{d['n_bits_w']}A{d['n_bits_a']}"
              + (f"  BD-rate {bd:+.2f}%  BD-PSNR {bdp:+.3f} dB"
                 if bd is not None else ""))
        print("| q | FP32 PSNR | FP32 bpp | quant PSNR | quant bpp | "
              "calib s |")
        print("|---|---|---|---|---|---|")
        for q, row in sorted(d["per_quality"].items(), key=lambda kv:
                             int(kv[0])):
            fp, qt = row["fp32"], row["quant"]
            print(f"| {q} | {fp['psnr']:.2f} | {fp['bpp']:.4f} | "
                  f"{qt['psnr']:.2f} | {qt['bpp']:.4f} | "
                  f"{row.get('calibration_seconds', 0)} |")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "artifacts")
