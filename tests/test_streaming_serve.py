"""StreamingWatermarker must reproduce the whole-signal embed exactly.

Ground truth is the UNPADDED whole-signal pipeline (stft -> clips ->
model -> istft at true length). Watermarker.embed pads the wave to a
power-of-two bucket and lets the zero pad influence the last <= n_fft
samples (a documented speed/exactness trade); on a bucket-aligned
length it is exact and must agree too."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_in_speech_watermarking_tpu import data, models
from image_in_speech_watermarking_tpu.config import CLIP_FRAMES, EVAL_N_FFT
from image_in_speech_watermarking_tpu.dsp.stft import (istft_ri,
                                                       spec_to_clips,
                                                       stft_ri)
from image_in_speech_watermarking_tpu.serve import (StreamingWatermarker,
                                                    Watermarker)


@pytest.fixture(scope="module")
def wmk():
    model = models.get_arch("ModelA")
    variables = model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 2)),
                           jnp.zeros((1, 32, 32, 1)))
    return Watermarker(model, variables, model_name="modelA")


def _direct_embed(wmk, wave, msg):
    """Unpadded whole-signal embed (the eval-pipeline protocol)."""
    spec = stft_ri(jnp.asarray(wave), EVAL_N_FFT)
    clips, _ = spec_to_clips(spec, CLIP_FRAMES)
    b = clips.shape[0]
    m = jnp.broadcast_to(jnp.asarray(msg, jnp.float32).reshape(
        1, 32, 32, 1), (b, 32, 32, 1))
    marked, _ = wmk.model.apply(wmk.variables, clips, m)
    n, bins, f, _ = marked.shape
    out = marked.transpose(1, 0, 2, 3).reshape(bins, n * f, 2)
    out = out[:, : spec.shape[1]]
    return np.asarray(istft_ri(out, n_fft=EVAL_N_FFT,
                               length=wave.shape[-1]))


@pytest.mark.parametrize("length,pushes", [
    (40000, (40000,)),                       # one push
    (40000, (1111, 16000, 9000, 13889)),     # irregular pushes
    (20011, (20011,)),                       # non-multiple length
    (5000, (250, 4750)),                     # shorter than one chunk
])
def test_streaming_matches_direct(wmk, length, pushes):
    assert sum(pushes) == length
    wave = data.synthetic_speech(length, seed=3)
    msg = data.digit_watermarks(1, seed=1)[0, :, :, 0]
    direct = _direct_embed(wmk, wave, msg)

    sw = StreamingWatermarker(wmk, msg, clips_per_chunk=1)
    outs = []
    off = 0
    for p in pushes:
        outs.append(sw.push(wave[off:off + p]))
        off += p
    outs.append(sw.flush())
    stream = np.concatenate(outs)
    assert stream.shape == direct.shape
    np.testing.assert_allclose(stream, direct, rtol=1e-4, atol=1e-5)


def test_streaming_matches_bucketed_on_aligned_length(wmk):
    """On a power-of-two length Watermarker.embed has no pad -> both
    paths agree."""
    length = 32768
    wave = data.synthetic_speech(length, seed=7)
    msg = data.digit_watermarks(1, seed=4)[0, :, :, 0]
    whole = wmk.embed(wave, msg)
    sw = StreamingWatermarker(wmk, msg, clips_per_chunk=2)
    stream = np.concatenate([sw.push(wave), sw.flush()])
    np.testing.assert_allclose(stream, whole, rtol=1e-4, atol=1e-5)


def test_streaming_latency_bounded(wmk):
    """Pushing >= chunk+context samples must yield output immediately."""
    wave = data.synthetic_speech(40000, seed=5)
    msg = data.digit_watermarks(1, seed=2)[0, :, :, 0]
    sw = StreamingWatermarker(wmk, msg, clips_per_chunk=1)
    out = sw.push(wave[:20000])   # > chunk_in + pad
    assert len(out) > 0
