"""Render an evaluate-run results.csv as the markdown sweep table used
in docs/round*_demo/README.md (test split: attack | WM-MSE after attack
| SNR dB | PESQ).

Usage: python scripts/sweep_to_md.py results/eval_r3_desync/results.csv
"""

import csv
import sys


def main(path: str, split: str = "test") -> None:
    with open(path) as f:
        rows = [r for r in csv.DictReader(f) if r["Set"] == split]
    has_ber = rows and rows[0].get("BER After Attack", "") != ""
    if has_ber:
        print("| attack | WM-MSE after attack | +-std | BER after attack "
              "| SNR dB | PESQ (vendored) | N utt |")
        print("|---|---|---|---|---|---|---|")
    else:
        print("| attack | WM-MSE after attack | SNR dB | PESQ (vendored) |")
        print("|---|---|---|---|")
    for r in rows:
        # codec rows carry their provenance (real ffmpeg vs calibrated sim)
        if r.get("Codec Path"):
            r["Attack"] = f"{r['Attack']} ({r['Codec Path']})"
        if has_ber:
            print(f"| {r['Attack']} "
                  f"| {float(r['WM Loss After Attack']):.4f} "
                  f"| {float(r['WM Att Std']):.4f} "
                  f"| {float(r['BER After Attack']):.4f} "
                  f"| {float(r['SNR Score']):.1f} "
                  f"| {float(r['PESQ Score']):.2f} "
                  f"| {r['Utterances']} |")
        else:
            print(f"| {r['Attack']} "
                  f"| {float(r['WM Loss After Attack']):.4f} "
                  f"| {float(r['SNR Score']):.1f} "
                  f"| {float(r['PESQ Score']):.2f} |")


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:] or []))
