"""End-to-end training slice (SURVEY §7 minimum slice): data pipeline ->
model -> loss -> optimizer, with loss decreasing, plus scheduler parity
and checkpoint round trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from image_in_speech_watermarking_tpu import data, models
from image_in_speech_watermarking_tpu.config import TrainConfig, UformerConfig
from image_in_speech_watermarking_tpu.train import (Trainer, checkpoint,
                                                    schedulers)


def test_data_pipeline_shapes():
    waves = data.load_corpus("synthetic", 2, utt_seconds=3.0)
    ds = data.SpeechDataset(waves, kind="train")
    batch = next(ds.batches(4, seed=0))
    assert batch.shape == (4, 128, 128, 2)
    wm = next(data.watermark_stream(4))
    assert wm.shape == (4, 32, 32, 1)
    assert 0.0 <= wm.min() and wm.max() <= 1.0

    ds_eval = data.SpeechDataset(waves, kind="eval")
    raw, clips, tail = ds_eval.utterance(0)
    assert clips.shape[1:] == (128, 128, 2)
    assert 1 <= tail <= 128


def test_audio_scale_modes():
    waves = data.load_corpus("synthetic", 1, utt_seconds=2.0)
    ds = data.SpeechDataset(waves, kind="train", audio_scale="0.025")
    assert np.abs(ds.clips).max() < np.abs(
        data.SpeechDataset(waves, kind="train").clips).max()
    ds2 = data.SpeechDataset(waves, kind="train", audio_scale="0-1")
    assert ds2.clips.min() >= -1e-6 and ds2.clips.max() <= 1 + 1e-6


def test_warmup_cosine_schedule():
    """3-epoch linear warmup then cosine to 1e-6
    (audio_uformer_stft.py:347-356)."""
    sched = schedulers.warmup_cosine(2e-4, 3, 10, steps_per_epoch=10)
    assert float(sched(0)) < 1e-5
    assert abs(float(sched(30)) - 2e-4) / 2e-4 < 0.05
    assert abs(float(sched(1000)) - 1e-6) < 1e-7
    step = schedulers.step_lr(2e-4, 10, 0.5, steps_per_epoch=1)
    assert abs(float(step(25)) - 2e-4 * 0.25) < 1e-9


@pytest.mark.slow
def test_model_a_overfits_tiny_batch():
    """The end-to-end slice: ModelA trained on one tiny batch drives both
    loss terms down (embedding + extraction learn)."""
    waves = data.load_corpus("synthetic", 2, utt_seconds=3.0)
    ds = data.SpeechDataset(waves, kind="train", audio_scale="0-1")
    cfg = TrainConfig(arch="ModelA", batch_size=4, nepoch=60, warmup=False,
                      lr_initial=2e-3, weight_decay=0.0)
    trainer = Trainer(models.ModelA(), cfg, steps_per_epoch=1)
    batch = jnp.asarray(next(ds.batches(4, seed=0)))
    msg = jnp.asarray(data.digit_watermarks(4, seed=1))
    state = trainer.init_state(batch, msg)
    rng = jax.random.key(0)
    losses = []
    for i in range(60):
        state, metrics = trainer.train_step(state, batch, msg, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_uformer_audio_one_step_updates():
    """One jitted train step on a small UformerAudio: params move, loss
    finite, all 4 metric terms present."""
    cfg_model = UformerConfig(img_size=64, embed_dim=8,
                              depths=(1, 1, 1, 1, 1, 1, 1, 1, 1),
                              num_heads=(1, 2, 4, 8, 8, 8, 8, 4, 2),
                              modulator=True, n_fft=127, hop_length=31)
    model = models.UformerAudio(cfg_model)
    cfg = TrainConfig(batch_size=2, nepoch=2)
    trainer = Trainer(model, cfg, steps_per_epoch=1)
    batch = jax.random.normal(jax.random.key(0), (2, 64, 64, 2)) * 0.1
    msg = jnp.asarray(data.digit_watermarks(2))
    state = trainer.init_state(batch, msg)
    p0 = jax.tree.map(np.asarray, state.params)
    state, metrics = trainer.train_step(state, batch, msg,
                                        jax.random.key(1))
    assert set(metrics) >= {"loss", "audio_mse", "wm_gen", "wm_decode",
                            "noise"}
    assert np.isfinite(float(metrics["loss"]))
    moved = jax.tree.map(lambda a, b: float(np.abs(a - b).max()),
                         p0, jax.tree.map(np.asarray, state.params))
    assert max(jax.tree.leaves(moved)) > 0


def test_checkpoint_roundtrip(tmp_path):
    waves = data.load_corpus("synthetic", 1, utt_seconds=5.0)
    ds = data.SpeechDataset(waves, kind="train")
    cfg = TrainConfig(arch="ModelA", batch_size=2, nepoch=1, warmup=False)
    trainer = Trainer(models.ModelA(), cfg, steps_per_epoch=1)
    batch = jnp.asarray(next(ds.batches(2, seed=0)))
    msg = jnp.asarray(data.digit_watermarks(2))
    state = trainer.init_state(batch, msg)
    path = checkpoint.save(str(tmp_path / "ckpt"), state, epoch=3)
    restored = checkpoint.restore(path)
    assert restored["epoch"] == 3
    orig = jax.tree.leaves(jax.tree.map(np.asarray, state.params))
    back = jax.tree.leaves(restored["params"])
    assert len(orig) == len(back)
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_uformer_bf16_train_step():
    """TrainConfig.dtype='bfloat16' flows into the model's compute dtype
    (VERDICT r1 item 4: the reference's AMP intent,
    audio_uformer_stft.py:372,538): the step runs, loss is finite and
    within a loose tolerance of the f32 step, and params stay f32."""
    cfg_model = UformerConfig(img_size=64, embed_dim=8,
                              depths=(1, 1, 1, 1, 1, 1, 1, 1, 1),
                              num_heads=(1, 2, 4, 8, 8, 8, 8, 4, 2),
                              modulator=True, n_fft=127, hop_length=31)
    batch = jax.random.normal(jax.random.key(0), (2, 64, 64, 2)) * 0.1
    msg = jnp.asarray(data.digit_watermarks(2))
    losses = {}
    for dtype in ("float32", "bfloat16"):
        cfg = TrainConfig(batch_size=2, nepoch=2, dtype=dtype)
        trainer = Trainer(models.UformerAudio(cfg_model), cfg,
                          steps_per_epoch=1)
        assert trainer.model.cfg.compute_dtype == dtype
        state = trainer.init_state(batch, msg)
        assert all(leaf.dtype == jnp.float32
                   for leaf in jax.tree.leaves(state.params))
        state, metrics = trainer.train_step(state, batch, msg,
                                            jax.random.key(1))
        losses[dtype] = float(metrics["loss"])
        assert np.isfinite(losses[dtype])
    assert abs(losses["bfloat16"] - losses["float32"]) < 0.05 * (
        1 + abs(losses["float32"]))


def test_train_aug_dataset():
    """SpeechDataTrainAug parity (audio_test.py:362-409): random
    128-frame STFT crops, optional transform, fixed shapes."""
    waves = data.load_corpus("synthetic", 3, utt_seconds=3.0)
    ds = data.SpeechDataset(waves, kind="train_aug")
    b = next(ds.batches(2, seed=0))
    assert b.shape == (2, 128, 128, 2)
    # crops are random: two epochs differ
    b2 = next(ds.batches(2, seed=1))
    assert np.abs(b - b2).max() > 0
    # with frequency masking transform a band is zeroed
    ds_m = data.SpeechDataset(
        waves, kind="train_aug",
        transform=lambda c, rng: data.frequency_masking(c, 16, rng))
    bm = next(ds_m.batches(2, seed=0))
    rows_zero = (np.abs(bm[0]).sum(axis=(1, 2)) == 0)
    assert rows_zero.sum() >= 16


def test_frequency_masking_shape_and_band():
    spec = np.ones((128, 64, 2), np.float32)
    out = data.frequency_masking(spec, 8, np.random.default_rng(0))
    assert out.shape == spec.shape
    zero_rows = np.where(out.sum(axis=(1, 2)) == 0)[0]
    assert len(zero_rows) == 8
    assert np.all(np.diff(zero_rows) == 1)  # contiguous band
    assert spec.sum() == 128 * 64 * 2      # input untouched


def test_eval129_exact_istft_roundtrip():
    """speechDataTest129 (audio_test.py:167-258): the retained 129th-bin
    row makes the clip->spec->ISTFT round trip exact (unlike 'eval'/'train'
    which drop it)."""
    from image_in_speech_watermarking_tpu.dsp.stft import istft_ri
    from image_in_speech_watermarking_tpu.config import (TRAIN_HOP,
                                                         TRAIN_N_FFT)

    waves = data.load_corpus("synthetic", 1, utt_seconds=2.0)
    ds = data.SpeechDataset(waves, kind="eval129")
    raw, clips, tail, last_row = ds.utterance(0)
    assert clips.shape[1:] == (128, 128, 2)
    assert last_row.shape[1] == 2
    # reassemble the full 129-bin spec and invert
    from image_in_speech_watermarking_tpu.dsp.stft import clips_to_spec
    spec128 = clips_to_spec(jnp.asarray(clips), tail)
    spec129 = jnp.concatenate(
        [spec128, jnp.asarray(last_row)[None, : spec128.shape[1]]], axis=0)
    recon = istft_ri(spec129, TRAIN_N_FFT, TRAIN_HOP,
                     length=len(raw))
    err = np.abs(np.asarray(recon) - raw).max()
    assert err < 1e-4, err


def _fit_with_curve(trainer, ds, epochs, result_dir, resume_from=None):
    curve = {}
    trainer.fit(ds,
                lambda epoch: data.watermark_stream(4, seed=100 + epoch),
                epochs=epochs, result_dir=result_dir,
                callback=lambda e, s, l: curve.__setitem__(e, l),
                resume_from=resume_from)
    return curve


@pytest.mark.slow
def test_kill_and_resume_reproduces_loss_curve(tmp_path):
    """VERDICT r1 item 9: resume restores params/opt_state/epoch and the
    per-epoch data+rng derivation makes the resumed curve equal the
    uninterrupted one."""
    waves = data.load_corpus("synthetic", 2, utt_seconds=3.0)
    ds = data.SpeechDataset(waves, kind="train", audio_scale="0-1")
    cfg = TrainConfig(arch="ModelA", batch_size=4, nepoch=4, warmup=False,
                      lr_initial=1e-3, weight_decay=0.0)

    full = _fit_with_curve(
        Trainer(models.ModelA(), cfg, steps_per_epoch=len(ds) // 4),
        ds, 4, str(tmp_path / "full"))

    interrupted = _fit_with_curve(
        Trainer(models.ModelA(), cfg, steps_per_epoch=len(ds) // 4),
        ds, 2, str(tmp_path / "part"))
    resumed = _fit_with_curve(
        Trainer(models.ModelA(), cfg, steps_per_epoch=len(ds) // 4),
        ds, 4, str(tmp_path / "part2"),
        resume_from=str(tmp_path / "part" / "model"))

    for e, l in resumed.items():
        assert abs(l - full[e]) < 1e-4 * (1 + abs(full[e])), (e, l, full[e])


@pytest.mark.slow
def test_init_from_params_only(tmp_path):
    """init_from (the reference's fine_tune entry) loads params but starts
    a fresh optimizer: params match the checkpoint, opt_state count is 0."""
    waves = data.load_corpus("synthetic", 1, utt_seconds=3.0)
    ds = data.SpeechDataset(waves, kind="train")
    cfg = TrainConfig(arch="ModelA", batch_size=2, nepoch=1, warmup=False)
    tr = Trainer(models.ModelA(), cfg, steps_per_epoch=1)
    state = tr.fit(ds, lambda e: data.watermark_stream(2, seed=e),
                   epochs=1, result_dir=str(tmp_path / "run"))

    tr2 = Trainer(models.ModelA(), cfg, steps_per_epoch=1)
    batch = jnp.asarray(next(ds.batches(2, seed=0)))
    msg = jnp.asarray(data.digit_watermarks(2))
    template = tr2.init_state(batch, msg)
    loaded, _ = tr2._restore_state(str(tmp_path / "run" / "model"),
                                   template, params_only=True)
    a = jax.tree.leaves(jax.tree.map(np.asarray, state.params))
    b = jax.tree.leaves(jax.tree.map(np.asarray, loaded.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    counts = [int(x) for x in jax.tree.leaves(loaded.opt_state)
              if np.ndim(x) == 0 and np.issubdtype(
                  np.asarray(x).dtype, np.integer)]
    assert all(c == 0 for c in counts)  # fresh schedule


@pytest.mark.slow
def test_freeze_masks_updates():
    """freeze=("det_conv",) pins matching params while others train
    (model_utils.py:10-25 equivalent)."""
    waves = data.load_corpus("synthetic", 1, utt_seconds=3.0)
    ds = data.SpeechDataset(waves, kind="train")
    cfg = TrainConfig(arch="ModelA", batch_size=2, nepoch=1, warmup=False)
    tr = Trainer(models.ModelA(), cfg, steps_per_epoch=1,
                 freeze=("det_conv",))
    batch = jnp.asarray(next(ds.batches(2, seed=0)))
    msg = jnp.asarray(data.digit_watermarks(2))
    state = tr.init_state(batch, msg)
    p0 = jax.tree.map(np.asarray, state.params)
    state, _ = tr.train_step(state, batch, msg, jax.random.key(0))
    p1 = jax.tree.map(np.asarray, state.params)
    flat0 = jax.tree_util.tree_flatten_with_path(p0)[0]
    flat1 = jax.tree.leaves(p1)
    moved_frozen, moved_train = 0.0, 0.0
    for (path, a), b in zip(flat0, flat1):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        d = float(np.abs(a - b).max())
        if "det_conv" in name:
            moved_frozen = max(moved_frozen, d)
        else:
            moved_train = max(moved_train, d)
    assert moved_frozen == 0.0
    assert moved_train > 0.0


@pytest.mark.slow
def test_async_checkpoint_roundtrip(tmp_path):
    """save_async + wait_for_saves must produce a checkpoint restore()
    reads back identically (train/checkpoint.py async path)."""
    import flax.struct
    import jax.numpy as jnp

    from image_in_speech_watermarking_tpu.train import checkpoint as ckpt

    @flax.struct.dataclass
    class S:
        params: dict
        opt_state: dict
        step: jnp.ndarray
        batch_stats: dict = None

    state = S(params={"w": jnp.arange(6.0).reshape(2, 3)},
              opt_state={"m": jnp.ones((2, 3))},
              step=jnp.asarray(7, jnp.int32))
    path = str(tmp_path / "ck")
    ckpt.save_async(path, state, epoch=3)
    ckpt.wait_for_saves()
    back = ckpt.restore(path)
    assert int(back["epoch"]) == 3 and int(back["step"]) == 7
    np.testing.assert_allclose(np.asarray(back["params"]["w"]),
                               np.arange(6.0).reshape(2, 3))


def test_warmup_reduce_lr_on_plateau():
    from image_in_speech_watermarking_tpu.train.schedulers import (
        WarmupReduceLROnPlateau)

    s = WarmupReduceLROnPlateau(lr=1.0, warmup_epochs=2, patience=1,
                                factor=0.5)
    assert s.step(1.0) == 0.5          # warmup epoch 1: lr * 1/2
    assert s.step(0.9) == 1.0          # warmup done
    assert s.step(0.5) == 1.0          # improvement, hold
    assert s.step(0.5) == 1.0          # bad epoch 1 (<= patience), hold
    assert s.step(0.5) == 0.5          # bad epoch 2 > patience: cut
    assert s.step(0.4) == 0.5          # improvement again, hold


def test_imagenet_cover_dataset_synthetic_fallback():
    from image_in_speech_watermarking_tpu.data.imagenet import (
        ImageCoverDataset, _MEAN, _STD)

    ds = ImageCoverDataset(size=6, seed=0, root="/nonexistent")
    assert ds.clips.shape == (6, 128, 128, 3)
    b = next(ds.batches(4, seed=1))
    assert b.shape == (4, 128, 128, 3)
    # normalized range: un-normalized values must be inside [0, 1]
    un = b * _STD + _MEAN
    assert un.min() >= -1e-5 and un.max() <= 1.0 + 1e-5
    # deterministic
    ds2 = ImageCoverDataset(size=6, seed=0, root="/nonexistent")
    np.testing.assert_array_equal(ds.clips, ds2.clips)
