"""Running-average metric accumulation.

Parity target: hidden/average_meter.py:3-18 (AverageMeter with NaN/inf
guard)."""

from __future__ import annotations

import math


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    @property
    def avg(self) -> float:
        return self.sum / self.count if self.count else 0.0

    def update(self, val: float, n: int = 1):
        if math.isnan(val) or math.isinf(val):  # guard
            return
        self.val = val
        self.sum += val * n
        self.count += n
