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
        name = os.path.basename(path)
        if "curves" in d:  # tinylic_light_ptq.json schema
            print(f"\n### {name} — TinyLIC light PTQ")
            for k in ("bd_int8_vs_fp32", "bd_bf16_vs_fp32"):
                if k in d:
                    print(f"  {k}: BD-rate {d[k]['bd_rate_pct']:+.2f}% "
                          f"BD-PSNR {d[k]['bd_psnr_db']:+.3f} dB")
            print(f"  one-shot quantize: {d.get('one_shot_quantize_s')} s"
                  f"  sizes MB: {d.get('size_mb')}")
            for tag, row in (d.get("codec_2k") or {}).items():
                print(f"  codec[{tag}]: {row}")
            continue
        if "per_quality" not in d:
            continue
        bd = d.get("bd_rate_pct")
        bdp = d.get("bd_psnr_db")
        prov = d.get("provenance", {})
        bits = (f"W{d['n_bits_w']}A{d['n_bits_a']}"
                if prov.get("act_quant") else f"W{d['n_bits_w']}")
        print(f"\n### {name} — {d['arch']} {bits}"
              + (f"  BD-rate {bd:+.2f}%  BD-PSNR {bdp:+.3f} dB"
                 if bd is not None else ""))
        for key, blk in sorted(d.items()):
            if key.startswith("bd_") and isinstance(blk, dict):
                print(f"  {key[3:]}: BD-rate {blk['bd_rate_pct']:+.2f}%  "
                      f"BD-PSNR {blk['bd_psnr_db']:+.3f} dB")
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
