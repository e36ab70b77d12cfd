"""sample_result.txt -> results.csv extraction.

Parity target: uformerWM/result_extract.py:12-42 — identical regex and
CSV schema (Set, Attack, Total Clips, MSE Loss, WM Loss, WM Loss After
Attack, SNR Score, PESQ Score)."""

from __future__ import annotations

import csv
import re

PATTERN = (r"Result on (.*) set, attack: (.*): Total clips: (.*), "
           r"MSE loss (.*), WM loss: (.*), WM loss after attack: (.*), "
           r"SNR score: ([^,\n]*), PESQ score: ([^,\n]*)"
           # round-4 extension (optional; reference-format lines parse
           # with the extension fields empty): thresholded payload BER,
           # per-utterance WM-MSE spread, utterance count
           r"(?:, BER: ([^,\n]*), BER after attack: ([^,\n]*), "
           r"WM att std: ([^,\n]*), Utterances: ([^,\n]*))?"
           # round-5 extension: codec rows record which path produced
           # them (real ffmpeg transcode vs calibrated simulator)
           r"(?:, Codec path: ([^,\n]*))?")

FIELDNAMES = ["Set", "Attack", "Total Clips", "MSE Loss", "WM Loss",
              "WM Loss After Attack", "SNR Score", "PESQ Score",
              "BER", "BER After Attack", "WM Att Std", "Utterances",
              "Codec Path"]


def process_data_to_csv(data: str, out_csv: str) -> list[dict]:
    results = re.findall(PATTERN, data)
    rows = [{
        "Set": r[0],
        "Attack": r[1],
        "Total Clips": int(r[2]),
        "MSE Loss": float(r[3]),
        "WM Loss": float(r[4]),
        "WM Loss After Attack": float(r[5]),
        "SNR Score": float(r[6]),
        "PESQ Score": float(r[7]),
        "BER": float(r[8]) if r[8] else "",
        "BER After Attack": float(r[9]) if r[9] else "",
        "WM Att Std": float(r[10]) if r[10] else "",
        "Utterances": int(r[11]) if r[11] else "",
        "Codec Path": r[12],
    } for r in results]
    with open(out_csv, "w") as f:
        writer = csv.DictWriter(f, fieldnames=FIELDNAMES)
        writer.writeheader()
        for row in rows:
            writer.writerow(row)
    return rows
