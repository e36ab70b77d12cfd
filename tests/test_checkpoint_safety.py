"""Crash-safe checkpoint overwrite (round 4).

Regression for the flagship_r4_pw loss: orbax ``force=True`` deletes
the destination before writing its replacement, so a SIGKILL during a
save destroyed the run's only checkpoint. The staging+promote scheme
must keep a restorable checkpoint on disk at every instant:

  save -> <path>_staging (orbax tmp -> finalized staging)
  promote: <path> -> <path>.old, staging -> <path>, drop .old

restore() resolves live path, then finalized staging, then .old.
"""

import os
import shutil
import types

import numpy as np
import pytest

from image_in_speech_watermarking_tpu.train import checkpoint as ckpt


def _state(step):
    return types.SimpleNamespace(
        params={"w": np.full(4, float(step))},
        opt_state={"m": np.zeros(4)},
        step=step, batch_stats=None)


@pytest.fixture
def run_dir(tmp_path):
    return str(tmp_path / "model")


def test_sync_save_promotes_and_leaves_no_staging(run_dir):
    ckpt.save(run_dir, _state(1), epoch=1)
    assert os.path.isdir(run_dir)
    assert not os.path.isdir(run_dir + "_staging")
    assert ckpt.restore(run_dir)["epoch"] == 1


def test_overwrite_keeps_previous_until_new_finalized(run_dir):
    ckpt.save(run_dir, _state(1), epoch=1)
    # interrupted second save: orbax got as far as the tmp dir only
    # (what a mid-save SIGKILL leaves behind)
    tmp = run_dir + "_staging.orbax-checkpoint-tmp"
    os.makedirs(tmp)
    assert ckpt.restore(run_dir)["epoch"] == 1   # old ckpt untouched
    shutil.rmtree(tmp)


def test_async_overwrite_roundtrip(run_dir):
    ckpt.save_async(run_dir, _state(1), epoch=1)
    ckpt.save_async(run_dir, _state(2), epoch=2)  # promotes epoch 1 first
    ckpt.wait_for_saves()
    r = ckpt.restore(run_dir)
    assert r["epoch"] == 2
    assert not os.path.isdir(run_dir + "_staging")
    assert not os.path.isdir(run_dir + ".old")


def test_restore_falls_back_to_finalized_staging(run_dir):
    ckpt.save(run_dir, _state(3), epoch=3)
    # killed between finalize and promote: staging exists, live missing
    os.rename(run_dir, run_dir + "_staging")
    assert ckpt.restore(run_dir)["epoch"] == 3


def test_restore_falls_back_to_displaced_old(run_dir):
    ckpt.save(run_dir, _state(4), epoch=4)
    # killed mid-promotion after the live -> .old rename
    os.rename(run_dir, run_dir + ".old")
    assert ckpt.restore(run_dir)["epoch"] == 4


# -- keyed pour (round 4: ApplyIfFiniteState field-order regression) --------

def test_pour_like_non_alphabetical_namedtuple_roundtrip(run_dir):
    """optax.apply_if_finite wraps the optimizer state in
    ApplyIfFiniteState(notfinite_count, last_finite, total_notfinite,
    inner_state) — field order is NOT alphabetical, so orbax's
    sorted-dict restore misaligns a positional leaf zip (observed round
    4: every flagship_r4_pw resume died with "checkpoint leaf shape
    (512,) does not fit template ()"). pour_like must match by name."""
    import optax

    params = {"w": np.ones((8, 4), np.float32), "b": np.zeros(4)}
    tx = optax.apply_if_finite(optax.adamw(1e-3), 50)
    opt_state = tx.init(params)
    state = types.SimpleNamespace(params=params, opt_state=opt_state,
                                  step=7, batch_stats=None)
    ckpt.save(run_dir, state, epoch=3)

    raw = ckpt.restore(run_dir)
    poured = ckpt.pour_like(opt_state, raw["opt_state"])
    # structure must match the template exactly
    import jax
    assert (jax.tree.structure(poured)
            == jax.tree.structure(opt_state))
    # and every leaf must land on a leaf of its own shape
    for t, p in zip(jax.tree.leaves(opt_state), jax.tree.leaves(poured)):
        assert np.shape(t) == np.shape(p)
    # the scalar bookkeeping fields must be scalars, not weight slices
    assert np.shape(poured.notfinite_count) == ()
    assert np.shape(poured.total_notfinite) == ()
    # mu tree of the inner adam state must carry the (8, 4) kernel
    mu = poured.inner_state[0].mu
    assert np.shape(mu["w"]) == (8, 4)


def test_pour_like_tuple_stored_as_indexed_dict():
    """Tuples serialize as {'0': ..., '1': ...}; both that and the
    list form orbax restores must pour back into a tuple template."""
    tpl = ({"a": np.zeros(2)}, {"b": np.zeros(3)})
    stored_dict = {"0": {"a": np.ones(2)}, "1": {"b": np.ones(3)}}
    stored_list = [{"a": np.ones(2)}, {"b": np.ones(3)}]
    for stored in (stored_dict, stored_list):
        out = ckpt.pour_like(tpl, stored)
        assert isinstance(out, tuple)
        assert np.all(out[0]["a"] == 1) and np.all(out[1]["b"] == 1)


def test_pour_like_missing_field_is_loud():
    import optax

    params = {"w": np.ones(2)}
    opt_state = optax.apply_if_finite(optax.adamw(1e-3), 50).init(params)
    with pytest.raises(KeyError, match="notfinite_count"):
        ckpt.pour_like(opt_state, {"inner_state": []})
