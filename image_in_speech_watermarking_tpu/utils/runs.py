"""Run-folder and loss-CSV management.

Parity targets: hidden/utils.py:46-68 (create_folder_for_run: runs/<name>
<timestamp>/ with checkpoints/ and images/), hidden/utils.py:181-216
(write_losses: train.csv / validation.csv with epoch, losses,
duration)."""

from __future__ import annotations

import csv
import os
import time
from typing import Mapping


def create_folder_for_run(runs_folder: str, experiment_name: str) -> str:
    ts = time.strftime("%Y.%m.%d--%H-%M-%S")
    run = os.path.join(runs_folder, f"{experiment_name} {ts}")
    os.makedirs(os.path.join(run, "checkpoints"), exist_ok=True)
    os.makedirs(os.path.join(run, "images"), exist_ok=True)
    return run


def write_losses(file_name: str, losses: Mapping[str, float], epoch: int,
                 duration: float) -> None:
    new_file = not os.path.exists(file_name)
    with open(file_name, "a", newline="") as f:
        names = ["epoch"] + list(losses) + ["duration"]
        writer = csv.DictWriter(f, fieldnames=names)
        if new_file:
            writer.writeheader()
        row = {"epoch": epoch,
               **{k: f"{float(v):.6f}" for k, v in losses.items()},
               "duration": f"{duration:.2f}"}
        writer.writerow(row)
