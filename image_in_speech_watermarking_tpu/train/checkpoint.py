"""Checkpoint save/restore.

Parity targets:
  uformerWM best-loss state_dict -> results/<run>/model.pth
      (audio_uformer_stft.py:545-549), load with `module.` prefix strip
      (utils/model_utils.py:27-47)
  hidden/ dict checkpoint {enc-dec model/optim, discrim model/optim,
      epoch} (hidden/utils.py:76-122)

Uses orbax (the TPU-native checkpointing stack: async-capable, sharding
aware) with a msgpack fallback. Stored tree: params / opt_state /
batch_stats / step / epoch.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


# -- crash-safe overwrite ---------------------------------------------------
# orbax's ``force=True`` DELETES the destination before writing the
# replacement; a SIGKILL inside that window (observed round 4: the
# flagship_r4_pw final save was interrupted and the run's only
# checkpoint was lost) leaves nothing but an unfinalized
# ``*.orbax-checkpoint-tmp``. Instead every overwrite-style save lands
# in ``<path>_staging`` and is promoted to ``<path>`` only once orbax
# has finalized it, so a valid checkpoint exists at all times.

def _promote(path: str) -> None:
    """If a finalized staging checkpoint exists, atomically swap it into
    place (keeping the previous one as ``<path>.old`` until the swap
    completes). No-op when there is nothing to promote."""
    import shutil

    staging = path + "_staging"
    if not os.path.isdir(staging):   # not written / not yet finalized
        return
    old = path + ".old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(path):
        os.rename(path, old)
    os.rename(staging, path)
    if os.path.isdir(old):
        shutil.rmtree(old)


def _resolve(path: str) -> str:
    """Restore-side fallback chain for interrupted promotions:
    live path, else finalized staging, else the displaced ``.old``."""
    if os.path.isdir(path):
        return path
    for suffix in ("_staging", ".old"):
        if os.path.isdir(path + suffix):
            return path + suffix
    return path   # let orbax raise its usual not-found error


def save(path: str, state, epoch: int = 0) -> str:
    """Save a TrainState (or any pytree-holding object) to ``path``."""
    import orbax.checkpoint as ocp

    payload = {
        "params": _to_host(state.params),
        "opt_state": _to_host(state.opt_state),
        "step": int(state.step),
        "epoch": epoch,
    }
    if getattr(state, "batch_stats", None) is not None:
        payload["batch_stats"] = _to_host(state.batch_stats)
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path + "_staging", payload, force=True)
    _promote(path)
    return path


_async_ckptr = None


def save_async(path: str, state, epoch: int = 0) -> str:
    """Async save: orbax snapshots device arrays to host synchronously
    (so the train loop may immediately donate/overwrite them) and
    persists in a background thread — the ~800 MB flagship write no
    longer stalls the step stream. Call ``wait_for_saves()`` before
    reading the checkpoint back or exiting."""
    global _async_ckptr
    import orbax.checkpoint as ocp

    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": int(state.step),
        "epoch": epoch,
    }
    if getattr(state, "batch_stats", None) is not None:
        payload["batch_stats"] = state.batch_stats
    path = os.path.abspath(path)
    global _pending_promote
    # ensure the PREVIOUS staging write is finalized, swap it live, then
    # kick off this save into (a fresh) staging
    _async_ckptr.wait_until_finished()
    _promote(path)
    _async_ckptr.save(path + "_staging", payload, force=True)
    _pending_promote = path
    return path


_pending_promote: Optional[str] = None


def wait_for_saves() -> None:
    """Block until every pending ``save_async`` has hit disk, then
    promote the final staging checkpoint to its live path."""
    global _pending_promote
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()
    if _pending_promote is not None:
        _promote(_pending_promote)
        _pending_promote = None


def pour_like(template: Any, stored: Any, fit=None) -> Any:
    """Pour an orbax-restored nested dict/list back into a typed
    template pytree BY KEY PATH, not position.

    Positional zip of flattened leaves is wrong whenever a namedtuple's
    field order differs from alphabetical order: orbax serializes
    namedtuples as dicts of field names and restores dicts with sorted
    keys, so e.g. ``optax.ApplyIfFiniteState(notfinite_count,
    last_finite, total_notfinite, inner_state)`` comes back with
    ``inner_state`` FIRST while the template flattens it LAST —
    observed round 4 as ``checkpoint leaf shape (512,) does not fit
    template ()`` on every flagship_r4_pw resume. (Round-3 states only
    zipped correctly because every namedtuple in a plain adamw chain
    happens to have alphabetically-ordered fields.)

    ``fit(template_leaf, stored_leaf)`` adapts each leaf (defaults to
    returning the stored leaf); tuples saved by orbax come back as
    lists or as dicts with ``'0','1',...`` keys — both are handled.
    """
    if fit is None:
        def fit(tpl, leaf):
            return leaf

    def child(sto, name, idx):
        if isinstance(sto, dict):
            if name in sto:
                return sto[name]
            if str(idx) in sto:
                return sto[str(idx)]
            raise KeyError(
                f"checkpoint is missing field {name!r} "
                f"(stored keys: {sorted(sto)})")
        if isinstance(sto, (list, tuple)):
            return sto[idx]
        raise TypeError(
            f"checkpoint node is a leaf ({type(sto).__name__}) where "
            f"the template expects a container with field {name!r}")

    def rec(tpl, sto):
        if tpl is None:
            return None
        if hasattr(tpl, "_fields"):   # namedtuple (optax states)
            if not tpl._fields:       # EmptyState & co: nothing stored
                return tpl
            return type(tpl)(*(rec(getattr(tpl, f), child(sto, f, i))
                               for i, f in enumerate(tpl._fields)))
        if isinstance(tpl, dict):
            return {k: rec(v, child(sto, k, i))
                    for i, (k, v) in enumerate(tpl.items())}
        if isinstance(tpl, (list, tuple)):
            vals = [rec(v, child(sto, str(i), i))
                    for i, v in enumerate(tpl)]
            return vals if isinstance(tpl, list) else tuple(vals)
        return fit(tpl, sto)

    return rec(template, stored)


def restore(path: str, like: Any = None) -> dict:
    """Restore a checkpoint; with ``like`` (a template pytree, e.g. a
    freshly-initialized state) the stored leaves are poured back into the
    template's exact structure (optax namedtuples etc.)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(_resolve(os.path.abspath(path)))
    if like is None:
        return restored
    return pour_like(like, restored)


def save_model_cfg(path: str, model_cfg: Any) -> str:
    """Write a JSON snapshot of the model config next to the checkpoint
    dir (``<path>.cfg.json``). Guards against silently restoring a
    checkpoint into a model that computes a different function with the
    same parameter shapes (e.g. the channel-sim ``stft_residual`` form —
    advisor r2 finding: a pre-flag checkpoint restores without error but
    the refinement is applied differently)."""
    import dataclasses as _dc
    import json as _json

    if model_cfg is None:   # cfg-less models (ModelA, UNet): no guard
        return ""
    snap = (_dc.asdict(model_cfg) if _dc.is_dataclass(model_cfg)
            else dict(model_cfg))
    # normalize through JSON so load-side comparison is type-stable
    # (tuples -> lists, dtypes -> strings)
    snap = _json.loads(_json.dumps(snap, default=str))
    sidecar = os.path.abspath(path) + ".cfg.json"
    with open(sidecar, "w") as f:
        _json.dump(snap, f, indent=2)
    return sidecar


def check_model_cfg(path: str, model_cfg: Any) -> list:
    """Compare a checkpoint's stored config snapshot against the config
    of the model it is being restored into. Returns the list of
    differing keys (empty when compatible or when no snapshot exists —
    pre-guard checkpoints restore silently, matching their era) and
    emits a warning naming each mismatch."""
    import dataclasses as _dc
    import json as _json
    import warnings

    sidecar = os.path.abspath(path) + ".cfg.json"
    if model_cfg is None or not os.path.exists(sidecar):
        return []
    with open(sidecar) as f:
        stored = _json.load(f)
    snap = (_dc.asdict(model_cfg) if _dc.is_dataclass(model_cfg)
            else dict(model_cfg))
    snap = _json.loads(_json.dumps(snap, default=str))
    # performance knobs, not function changes: a bf16-trained checkpoint
    # evaluates fine (better, even) at f32
    benign = {"compute_dtype", "use_pallas_block", "use_pallas_attention",
              "remat"}
    diffs = [k for k in stored
             if k in snap and k not in benign and snap[k] != stored[k]]
    if diffs:
        detail = ", ".join(f"{k}: ckpt={stored[k]!r} model={snap[k]!r}"
                           for k in diffs)
        warnings.warn(
            f"checkpoint {path} was saved with a different model config "
            f"({detail}); parameter shapes may still match, but the "
            "restored model computes a different function", stacklevel=2)
    return diffs


def save_tree(path: str, tree: Any) -> str:
    """Save an arbitrary pytree (e.g. the HiDDeN dict checkpoint,
    hidden/utils.py:84-90)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), _to_host(tree), force=True)
    return path


restore_tree = restore


def last_checkpoint_from_folder(folder: str) -> Optional[str]:
    """Newest checkpoint dir in a run folder (hidden/utils.py:70-73)."""
    if not os.path.isdir(folder):
        return None
    entries = [os.path.join(folder, d) for d in sorted(os.listdir(folder))
               if os.path.isdir(os.path.join(folder, d))]
    return entries[-1] if entries else None
