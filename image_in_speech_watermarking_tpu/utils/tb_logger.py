"""Training telemetry logger.

Parity target: hidden/tensorboard_logger.py:5-32 (optional tensorboardX
wrapper: scalar losses, gradient histograms, tensor histograms). When
tensorboardX is unavailable (this environment), scalars and histogram
summary statistics go to a jsonl file with the same logical schema —
grads come from the pytree (functional JAX has no backward hooks to
attach, so grad logging is explicit: pass the grad tree to
save_gradients)."""

from __future__ import annotations

import json
import os
from typing import Any, Mapping, Optional

import numpy as np


class TensorBoardLogger:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "events.jsonl"), "a")
        self._writer = None
        try:
            from tensorboardX import SummaryWriter  # type: ignore

            self._writer = SummaryWriter(log_dir)
        except Exception:
            pass

    def save_losses(self, losses: Mapping[str, float], step: int) -> None:
        for name, value in losses.items():
            if self._writer is not None:
                self._writer.add_scalar(f"losses/{name}", float(value),
                                        step)
        self._jsonl.write(json.dumps(
            {"step": step, "type": "losses",
             **{k: float(v) for k, v in losses.items()}}) + "\n")

    def _hist_stats(self, arr: np.ndarray) -> dict:
        return {"mean": float(arr.mean()), "std": float(arr.std()),
                "min": float(arr.min()), "max": float(arr.max()),
                "l2": float(np.linalg.norm(arr))}

    def save_gradients(self, grads: Any, step: int) -> None:
        """Histogram(-stats) per parameter path (the reference's backward
        hook histograms, tensorboard_logger.py:23-27)."""
        import jax

        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        for path, leaf in flat:
            name = "/".join(str(p.key) if hasattr(p, "key") else str(p)
                            for p in path)
            arr = np.asarray(leaf)
            if self._writer is not None:
                self._writer.add_histogram(f"grads/{name}", arr, step)
            self._jsonl.write(json.dumps(
                {"step": step, "type": "grad_hist", "name": name,
                 **self._hist_stats(arr)}) + "\n")

    def save_tensors(self, tensors: Mapping[str, Any], step: int) -> None:
        for name, t in tensors.items():
            arr = np.asarray(t)
            if self._writer is not None:
                self._writer.add_histogram(f"tensors/{name}", arr, step)
            self._jsonl.write(json.dumps(
                {"step": step, "type": "tensor_hist", "name": name,
                 **self._hist_stats(arr)}) + "\n")

    def flush(self):
        self._jsonl.flush()
        if self._writer is not None:
            self._writer.flush()

    def close(self):
        self.flush()
        self._jsonl.close()
