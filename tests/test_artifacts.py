"""Eval/training visual artifacts (VERDICT r1 item 8): the reference's
wav + figure + watermark-grid dumps (evaluate.py:239-282,
audio_uformer_stft.py:486-536)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from image_in_speech_watermarking_tpu import data, models
from image_in_speech_watermarking_tpu.config import TrainConfig
from image_in_speech_watermarking_tpu.eval import artifacts, evaluate_model
from image_in_speech_watermarking_tpu.train import Trainer


def test_save_eval_artifacts_via_sweep(tmp_path):
    """--save_artifacts N produces the full reference artifact set per
    (attack, split) for the first N utterances."""
    model = models.ModelA()
    waves = data.load_corpus("synthetic", 2, utt_seconds=2.0)
    ds = data.SpeechDataset(waves, kind="eval")
    msgs = data.digit_watermarks(2)
    v = model.init(jax.random.key(0), jnp.asarray(ds.utterance(0)[1][:1]),
                   jnp.asarray(msgs[:1]))
    evaluate_model(model, v, {"train": ds}, msgs,
                   attacks=("closed_loop",), model_name="modelA",
                   result_path=str(tmp_path), save_artifacts=1)
    adir = tmp_path / "artifacts"
    names = sorted(os.listdir(adir))
    tag = "train_closed_loop_utt0"
    for suffix in ("recon.wav", "attacked.wav", "soundwave.png",
                   "stft.png", "specgram.png", "watermark.png"):
        f = adir / f"{tag}_{suffix}"
        assert f.exists() and f.stat().st_size > 500, (f, names)
    # wav round trip is readable and 16 kHz
    from scipy.io import wavfile

    sr, pcm = wavfile.read(adir / f"{tag}_recon.wav")
    assert sr == 16000 and pcm.dtype == np.int16 and len(pcm) > 16000


def test_training_figures(tmp_path):
    """fit(fig_every=1) writes an epoch grid under <run>/figures."""
    waves = data.load_corpus("synthetic", 1, utt_seconds=3.0)
    ds = data.SpeechDataset(waves, kind="train")
    cfg = TrainConfig(arch="ModelA", batch_size=2, nepoch=1, warmup=False)
    tr = Trainer(models.ModelA(), cfg, steps_per_epoch=1)
    tr.fit(ds, lambda e: data.watermark_stream(2, seed=e), epochs=1,
           result_dir=str(tmp_path / "run"), fig_every=1)
    fig = tmp_path / "run" / "figures" / "epoch0001.png"
    assert fig.exists() and fig.stat().st_size > 1000
