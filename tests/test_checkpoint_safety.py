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
