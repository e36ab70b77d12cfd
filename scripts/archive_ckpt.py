"""Params-only checkpoint archiver.

VM restarts have twice wiped the gitignored ``results/`` tree
(round-2 flagship, then the round-3 stage-B/C/D checkpoints). This
snapshots a checkpoint's params (+ batch_stats + epoch) into one
git-trackable compressed ``.npz`` under ``artifacts/`` and can rebuild
an ``--init_from``-able orbax checkpoint dir from it. Optimizer state
is deliberately dropped (3x the bytes; a params-only restart re-warms
the optimizer in a couple of epochs).

Usage:
  python scripts/archive_ckpt.py save    results/<run>/model artifacts/<name>.npz
  python scripts/archive_ckpt.py restore artifacts/<name>.npz results/<run>/model

Run with JAX_PLATFORMS=cpu so it never contends for the TPU with a
live trainer.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree = {}
    for k, v in flat.items():
        parts = k.split("/")
        cur = tree
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return tree


def save(ckpt_dir: str, out_npz: str, f16: bool = False) -> None:
    import orbax.checkpoint as ocp

    raw = ocp.PyTreeCheckpointer().restore(os.path.abspath(ckpt_dir))
    payload = {"params": raw["params"]}
    if "batch_stats" in raw:
        payload["batch_stats"] = raw["batch_stats"]
    flat = _flatten(payload)
    if f16:
        # half-size WIP snapshots: good enough to warm-restart training
        # after a VM wipe, not for final-eval archives
        flat = {k: (v.astype(np.float16)
                    if v.dtype == np.float32 else v)
                for k, v in flat.items()}
    flat["__epoch__"] = np.asarray(int(raw.get("epoch", 0)))
    os.makedirs(os.path.dirname(os.path.abspath(out_npz)), exist_ok=True)
    np.savez_compressed(out_npz, **flat)
    sidecar = os.path.abspath(ckpt_dir) + ".cfg.json"
    if os.path.exists(sidecar):
        with open(sidecar) as f, open(out_npz + ".cfg.json", "w") as g:
            g.write(f.read())
    size_mb = os.path.getsize(out_npz) / 1e6
    print(f"archived {ckpt_dir} (epoch {int(flat['__epoch__'])}) "
          f"-> {out_npz} ({size_mb:.1f} MB)")


def restore(in_npz: str, out_ckpt_dir: str) -> None:
    import orbax.checkpoint as ocp

    with np.load(in_npz) as z:
        flat = {k: z[k] for k in z.files}
    flat = {k: (v.astype(np.float32) if v.dtype == np.float16 else v)
            for k, v in flat.items()}
    epoch = int(flat.pop("__epoch__", 0))
    payload = _unflatten(flat)
    payload["step"] = np.asarray(0)
    payload["epoch"] = np.asarray(epoch)
    out = os.path.abspath(out_ckpt_dir)
    ocp.PyTreeCheckpointer().save(out, payload, force=True)
    cfg = in_npz + ".cfg.json"
    if os.path.exists(cfg):
        with open(cfg) as f, open(out + ".cfg.json", "w") as g:
            g.write(f.read())
    print(f"restored {in_npz} -> {out_ckpt_dir} (epoch {epoch}, params-only)")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--f16"]
    cmd, src, dst = args[0], args[1], args[2]
    if cmd == "save":
        save(src, dst, f16="--f16" in sys.argv)
    elif cmd == "restore":
        restore(src, dst)
    else:
        raise SystemExit(f"unknown command {cmd!r}")
