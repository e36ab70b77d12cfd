"""Summarize HiDDeN noise-regime runs into the reference README table.

Reads each run folder under the given runs dir (cli.hidden_main output:
train.csv / validation.csv per epoch) and prints one row per run with the
reference's columns (hidden/README.md:94-101): validation loss, encoder
MSE, bitwise error, decoder MSE — at the final epoch and at the best
(lowest-bitwise-error) epoch.

Usage: python scripts/hidden_table_summary.py [results/hidden_table]
"""

from __future__ import annotations

import csv
import os
import sys


def read_rows(path):
    with open(path) as f:
        return list(csv.DictReader(f))


def main(runs_dir="results/hidden_table"):
    print(f"{'run':24s} {'ep':>4s} {'val_loss':>9s} {'enc_mse':>8s} "
          f"{'bitwise':>8s} {'dec_mse':>8s}   (best-bitwise epoch)")
    for name in sorted(os.listdir(runs_dir)):
        vpath = os.path.join(runs_dir, name, "validation.csv")
        if not os.path.exists(vpath):
            continue
        rows = read_rows(vpath)
        if not rows:
            continue
        fin = rows[-1]
        best = min(rows, key=lambda r: float(r["bitwise-error"]))
        print(f"{name.split(' ')[0]:24s} {fin['epoch']:>4s} "
              f"{float(fin['loss']):9.4f} "
              f"{float(fin['encoder_mse']):8.4f} "
              f"{float(fin['bitwise-error']):8.4f} "
              f"{float(fin['dec_mse']):8.4f}   "
              f"(ep {best['epoch']}: {float(best['bitwise-error']):.4f})")


if __name__ == "__main__":
    main(*sys.argv[1:])
