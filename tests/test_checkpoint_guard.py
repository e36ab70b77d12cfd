"""Checkpoint model-config guard (advisor r2 finding: a checkpoint
saved with one channel-sim form, e.g. stft_residual=True, restores
without error into a model built with the other form — same parameter
shapes, different function). The guard stores a JSON snapshot of the
model config next to the checkpoint and warns, naming the differing
keys, when restoring into a mismatched model."""

import dataclasses
import warnings

import pytest

from image_in_speech_watermarking_tpu.train import checkpoint as ckpt


@dataclasses.dataclass(frozen=True)
class _Cfg:
    stft_residual: bool = True
    embed_dim: int = 32
    depths: tuple = (1, 2, 2)
    compute_dtype: str = "float32"


def test_cfg_roundtrip_matches(tmp_path):
    path = str(tmp_path / "model")
    ckpt.save_model_cfg(path, _Cfg())
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert ckpt.check_model_cfg(path, _Cfg()) == []


def test_cfg_mismatch_warns(tmp_path):
    path = str(tmp_path / "model")
    ckpt.save_model_cfg(path, _Cfg(stft_residual=True))
    with pytest.warns(UserWarning, match="stft_residual"):
        diffs = ckpt.check_model_cfg(path, _Cfg(stft_residual=False))
    assert diffs == ["stft_residual"]


def test_cfg_tuple_normalization(tmp_path):
    # tuples JSON-ify to lists; comparison must be type-stable
    path = str(tmp_path / "model")
    ckpt.save_model_cfg(path, _Cfg(depths=(1, 2, 2)))
    assert ckpt.check_model_cfg(path, _Cfg(depths=(1, 2, 2))) == []
    with pytest.warns(UserWarning, match="depths"):
        assert ckpt.check_model_cfg(
            path, _Cfg(depths=(1, 2, 8))) == ["depths"]


def test_missing_sidecar_is_silent(tmp_path):
    # pre-guard checkpoints have no snapshot: restore silently
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert ckpt.check_model_cfg(str(tmp_path / "none"), _Cfg()) == []
