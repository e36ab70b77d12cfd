"""Attack battery parity tests.

Oracles: scipy for the DSP primitives (the reference's own substrate,
uformerWM/audio_attack.py), reference formulas for the rest (SURVEY §4:
"attack battery numeric parity on fixed wavs vs scipy/librosa").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import signal as sp_signal

from image_in_speech_watermarking_tpu.attacks import (
    filters, get_attack, noise_layers, waveform,
)

KEY = jax.random.key(0)


def _wav(n=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000
    return (0.3 * np.sin(2 * np.pi * 220 * t)
            + 0.1 * rng.standard_normal(n)).astype(np.float32)


# ------------------------- filtering primitives -------------------------

def test_lfilter_matches_scipy():
    b, a = sp_signal.butter(4, 0.3, "lowpass")
    x = _wav(4000)
    ours = np.asarray(filters.lfilter(b, a, jnp.asarray(x)))
    ref = sp_signal.lfilter(b, a, x)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_filtfilt_matches_scipy():
    b, a = sp_signal.butter(8, 0.5, "lowpass")
    x = _wav(8000)
    ours = np.asarray(filters.filtfilt(b, a, jnp.asarray(x)))
    ref = sp_signal.filtfilt(b, a, x)
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_resample_poly_matches_scipy():
    x = _wav(8000)
    ours = np.asarray(filters.resample_poly(jnp.asarray(x), 1, 2))
    ref = sp_signal.resample_poly(x, 1, 2)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4)
    ours_up = np.asarray(filters.resample_poly(jnp.asarray(x), 2, 1))
    ref_up = sp_signal.resample_poly(x, 2, 1)
    assert ours_up.shape == ref_up.shape
    np.testing.assert_allclose(ours_up, ref_up, atol=5e-4)


# ------------------------- waveform attacks -------------------------

def test_low_pass_matches_scipy_pipeline():
    """The reference's exact recipe: butter(8, 2*8000/(16000*2)) +
    filtfilt (audio_attack.py:21-30)."""
    x = _wav()
    wn = 2 * 8000 / (16000 * 2)
    b, a = sp_signal.butter(8, wn, "lowpass")
    ref = sp_signal.filtfilt(b, a, x.astype(np.float64))
    ours = np.asarray(waveform.low_pass_filter(KEY, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_echo_addition_reference_formula():
    """echo = [zeros(td*fs); A*x[:L-td*fs]] (audio_attack.py:33-53)."""
    x = _wav()
    d = int(0.5 * 16000)
    ref = x + 0.2 * np.concatenate([np.zeros(d), x[: len(x) - d]])
    ours = np.asarray(waveform.echo_addition(KEY, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.astype(np.float32), atol=1e-6)


def test_awgn_snr():
    x = _wav(64000)
    y = np.asarray(waveform.awgn(KEY, jnp.asarray(x), snr=15.0))
    noise = y - x
    snr = 10 * np.log10(np.mean(x ** 2) / np.mean(noise ** 2))
    assert abs(snr - 15.0) < 0.5


def test_amplitude_and_identity():
    x = jnp.asarray(_wav())
    np.testing.assert_allclose(
        np.asarray(waveform.amplitude_scaling(KEY, x, 0.8)),
        0.8 * np.asarray(x), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(waveform.closed_loop(KEY, x)),
                                  np.asarray(x))


def test_requantization_8bit():
    x = _wav()
    y = np.asarray(waveform.requantization(KEY, jnp.asarray(x)))
    # all values on the 1/128 grid
    np.testing.assert_allclose(y * 128, np.round(y * 128), atol=1e-4)
    assert np.abs(y - np.clip(x, -1, 127 / 128)).max() <= 1 / 256 + 1e-6
    # straight-through gradient is identity-like (in-graph trainability)
    g = jax.grad(lambda v: jnp.sum(waveform.requantization(KEY, v) ** 2))(
        jnp.asarray(x))
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_jittering_deletes_and_shifts():
    x = jnp.asarray(_wav())
    y = np.asarray(waveform.jittering(KEY, x, jit_ratio=100))
    assert y.shape == x.shape
    # tail is zeroed by the deleted count
    n_tail = int((np.asarray(y)[::-1] != 0).argmax())
    assert 0 < n_tail <= 100
    # surviving prefix preserves relative order: y's nonzero head is a
    # subsequence of x
    assert abs(float(np.abs(y).sum() - np.abs(np.asarray(x)).sum())) \
        < np.abs(np.asarray(x)).sum() * 0.05


def test_jittering_2_zeroes():
    x = jnp.asarray(_wav())
    y = np.asarray(waveform.jittering_2(KEY, x, jit_ratio=500))
    assert y.shape == x.shape
    changed = (y != np.asarray(x)).sum()
    assert 0 < changed <= 500


def test_time_warp_resamples():
    """time_warp (training surrogate): linear-interp read at rate
    r ~ U(1-p, 1+p), same output length, differentiable."""
    x = jnp.asarray(_wav(16000))
    y = np.asarray(waveform.time_warp(KEY, x, max_pct=10.0))
    assert y.shape == x.shape
    # the warp actually moves samples (not identity) ...
    assert np.abs(y - np.asarray(x)).mean() > 1e-4
    # ... but reads the same signal: energy within 15% (zero tail ok)
    assert abs(np.abs(y).sum() / np.abs(np.asarray(x)).sum() - 1) < 0.15
    # y equals x resampled at the rate the key draws (same derivation as
    # the implementation, so the reconstruction is exact)
    r = float(1.0 + (jax.random.uniform(KEY, ()) * 2.0 - 1.0) * 0.1)
    pos = np.arange(16000) * np.float32(r)
    expect = np.interp(pos, np.arange(16000), np.asarray(x))
    expect[pos > 15999] = 0.0
    # atol covers f32 floor-boundary rounding of the position grid
    np.testing.assert_allclose(y, expect, atol=1e-3)
    # differentiable w.r.t. the waveform
    g = jax.grad(lambda v: jnp.sum(
        waveform.time_warp(KEY, v, max_pct=10.0) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0
    # batched input works (robust bank applies it to (B, L))
    xb = jnp.stack([x, x * 0.5])
    yb = np.asarray(waveform.time_warp(KEY, xb, max_pct=10.0))
    assert yb.shape == xb.shape
    np.testing.assert_allclose(yb[0] * 0.5, yb[1], atol=1e-6)


def test_time_scaling_length():
    """time_stretch output length = round(L / rate)
    (librosa.effects.time_stretch semantics)."""
    x = jnp.asarray(_wav(32000))
    y = waveform.time_scaling(KEY, x, scaling_factor=0.8)
    assert y.shape[-1] == round(32000 / 0.8)
    y2 = waveform.time_scaling(KEY, x, scaling_factor=1.2)
    assert y2.shape[-1] == round(32000 / 1.2)


def test_pitch_scaling_preserves_length_and_shifts_pitch():
    sr = 16000
    t = np.arange(sr) / sr
    x = jnp.asarray(np.sin(2 * np.pi * 440 * t).astype(np.float32))
    y = np.asarray(waveform.pitch_scaling(KEY, x, scaling_factor=-6.0))
    assert y.shape[-1] == sr
    # dominant frequency should drop by ~2^(-6/12) = 0.707
    spec_x = np.abs(np.fft.rfft(np.asarray(x)[2000:14000]))
    spec_y = np.abs(np.fft.rfft(y[2000:14000]))
    fx, fy = spec_x.argmax(), spec_y.argmax()
    assert 0.63 < fy / fx < 0.78


def test_codec_sim_lossy_but_close():
    x = jnp.asarray(_wav())
    y = np.asarray(waveform.aac(KEY, x))
    assert y.shape == x.shape
    err = np.abs(y - np.asarray(x)).mean()
    assert 0 < err < 0.05  # lossy but small (cf. measured aac distortion
    #                        0.00037, audio_attack.py:285-293)


def test_get_attack_string_dispatch():
    """"name-param" parsing (audio_test.py:631-660)."""
    x = jnp.asarray(_wav(8000))
    fn = get_attack("amplitude_scaling-1.2")
    np.testing.assert_allclose(np.asarray(fn(KEY, x)),
                               1.2 * np.asarray(x), rtol=1e-6)
    assert get_attack("awgn-20")(KEY, x).shape == x.shape
    assert get_attack("closed_loop")(KEY, x).shape == x.shape
    with pytest.raises(ValueError):
        get_attack("nope")


def test_attacks_jit_and_grad():
    """Every static-param attack compiles under jit and is differentiable
    (the TPU-native upgrade: attacks on the training graph)."""
    x = jnp.asarray(_wav(16384))
    for name in ("closed_loop", "amplitude_scaling", "echo_addition",
                 "awgn", "requantization", "jittering_2", "aac"):
        fn = waveform.ATTACKS[name]
        y = jax.jit(fn)(KEY, x)
        assert y.shape == x.shape, name
        g = jax.grad(lambda v: jnp.mean(fn(KEY, v) ** 2))(x)
        assert np.isfinite(np.asarray(g)).all(), name


# ------------------------- image noise layers -------------------------

def _imgs(seed=0):
    rng = np.random.default_rng(seed)
    noised = jnp.asarray(rng.standard_normal((2, 64, 64, 1)).astype(np.float32))
    cover = jnp.asarray(rng.standard_normal((2, 64, 64, 1)).astype(np.float32))
    return noised, cover


def test_cropout_blend():
    noised, cover = _imgs()
    out = np.asarray(noise_layers.cropout(KEY, noised, cover))
    n, c = np.asarray(noised), np.asarray(cover)
    from_n = np.isclose(out, n)
    from_c = np.isclose(out, c)
    assert (from_n | from_c).all()
    assert from_n.any() and from_c.any()


def test_dropout_keep_ratio():
    noised, cover = _imgs()
    out = np.asarray(noise_layers.dropout(KEY, noised, cover,
                                          keep_ratio=(0.55, 0.6)))
    frac_noised = np.isclose(out, np.asarray(noised)).mean()
    assert 0.45 < frac_noised < 0.7


def test_quantization_reference_numbers():
    """The commented numeric check in quantization.py:48-70: on uniform
    data in an arbitrary range, the Fourier rounding gives a small mean-abs
    change and preserves min/max."""
    rng = np.random.default_rng(3)
    data = (2.334567 + 1.456668) * rng.random((12, 64, 64, 3)) - 1.456668
    x = jnp.asarray(data.astype(np.float32))
    out = np.asarray(noise_layers.quantization(KEY, x, x))
    assert abs(float(out.min()) - data.min()) < 1e-3
    assert abs(float(out.max()) - data.max()) < 1e-3
    mabs = np.abs(out - data).mean()
    assert 0 < mabs < 0.02  # quantization to ~256 levels of a ~3.8 range


def test_jpeg_is_lossy_lowpass():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    out = np.asarray(noise_layers.jpeg_compression(KEY, x, x))
    assert out.shape == x.shape
    assert 0 < np.abs(out - np.asarray(x)).mean()
    # smooth images survive nearly intact
    sm = jnp.ones((1, 64, 64, 3)) * 0.5
    out_sm = np.asarray(noise_layers.jpeg_compression(KEY, sm, sm))
    assert np.abs(out_sm - 0.5).mean() < 0.01


def test_noiser_switch_and_parse():
    noised, cover = _imgs()
    noiser = noise_layers.parse_noise_config(
        "crop((0.2,0.25),(0.2,0.25))+dropout(0.55,0.6)+jpeg()+quant()")
    assert len(noiser.layers) == 5  # + implicit Identity (noiser.py:15)
    out = jax.jit(noiser)(KEY, noised, cover)
    assert out.shape == noised.shape
    # different keys pick different branches eventually
    outs = [np.asarray(noiser(jax.random.key(s), noised, cover))
            for s in range(8)]
    assert len({float(np.abs(o).sum()) for o in outs}) > 1


def test_psychoacoustic_codec_properties():
    """attacks/codec.py: masking-threshold quantizer sanity — distortion
    grows monotonically with quantizer scale, vanishes as quality -> 0,
    the band cutoff removes HF, and gradients flow (straight-through)."""
    from image_in_speech_watermarking_tpu.attacks import codec

    x = jnp.asarray(_wav(32000))
    prev = 0.0
    for q in (0.1, 1.0, 3.0):
        y = np.asarray(codec.psychoacoustic_codec(KEY, x, quality=q))
        err = float(np.abs(y - np.asarray(x)).mean())
        assert err > prev, (q, err, prev)
        prev = err
    # near-lossless at tiny quality
    y0 = np.asarray(codec.psychoacoustic_codec(KEY, x, quality=1e-3))
    assert np.abs(y0 - np.asarray(x)).mean() < 1e-4

    # cutoff removes high frequencies
    yc = np.asarray(codec.psychoacoustic_codec(KEY, x, quality=1e-3,
                                               cutoff_hz=2000.0))
    spec = np.abs(np.fft.rfft(yc))
    freqs = np.fft.rfftfreq(len(yc), d=1 / 16000)
    hf = spec[freqs > 2600].sum() / (spec.sum() + 1e-9)
    assert hf < 0.01

    # differentiable: grad of output energy w.r.t. input is finite
    g = jax.grad(lambda w: jnp.sum(
        codec.psychoacoustic_codec(KEY, w, quality=1.0) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_codec_bitrate_ladder():
    """64k points distort more than 128k; aac@128k sits at the anchor
    ratio vs awgn-15 (docs/CODEC_CALIBRATION.md)."""
    x = jnp.asarray(_wav(48000))

    def d(spec):
        y = np.asarray(get_attack(spec)(KEY, x))
        return float(np.abs(y - np.asarray(x)).mean())

    assert d("aac-64k") > d("aac") * 1.5
    assert d("mp3compress-64k") > d("mp3compress-128k") * 1.5
    ratio = d("aac") / d("awgn-15")
    assert 0.06 < ratio < 0.25, ratio   # anchor 0.127


def test_phase_noise_scrambles_phase_not_magnitude():
    from image_in_speech_watermarking_tpu.dsp.stft import stft_ri

    from image_in_speech_watermarking_tpu import data

    wav = jnp.asarray(data.synthetic_speech(32768, seed=11))
    out = get_attack("phase_noise-1.0")(jax.random.key(5), wav)
    assert out.shape == wav.shape
    spec0 = np.asarray(stft_ri(wav, 255, hop_length=128))
    spec1 = np.asarray(stft_ri(out, 255, hop_length=128))
    mag0 = np.linalg.norm(spec0, axis=-1)
    mag1 = np.linalg.norm(spec1, axis=-1)
    mag_err = np.mean(np.abs(mag1 - mag0)) / np.mean(mag0)
    ri_err = np.mean(np.abs(spec1 - spec0)) / np.mean(np.abs(spec0))
    # phases move much more than magnitudes
    assert ri_err > 2 * mag_err
    assert mag_err < 0.35


def test_vocoder_roundtrip_is_lossy_but_aligned():
    """vocoder_roundtrip: stretch + inverse stretch back to the exact
    input length — magnitude spectra stay close (it is an alignment-
    preserving phase artifact, the post-resync residual of the vocoder
    attacks), while the raw waveform moves substantially."""
    from image_in_speech_watermarking_tpu import data
    from image_in_speech_watermarking_tpu.dsp.stft import stft_ri

    wav = jnp.asarray(data.synthetic_speech(32768, seed=3))
    out = get_attack("vocoder_roundtrip-0.9")(KEY, wav)
    assert out.shape == wav.shape
    wav_err = float(jnp.mean(jnp.abs(out - wav)) / jnp.mean(jnp.abs(wav)))
    spec0 = np.asarray(stft_ri(wav, 255, hop_length=128))
    spec1 = np.asarray(stft_ri(out, 255, hop_length=128))
    mag0 = np.linalg.norm(spec0, axis=-1)
    mag1 = np.linalg.norm(spec1, axis=-1)
    mag_err = np.mean(np.abs(mag1 - mag0)) / np.mean(mag0)
    # measured profile (seed 3): wav_err 0.95, mag_err 0.58 — severe
    # damage, but magnitude structure survives far better than the wave
    assert wav_err > 0.2
    assert mag_err < 0.75
    assert mag_err < 0.8 * wav_err
    # 1.1 (crop side) works too and differs from 0.9
    out2 = get_attack("vocoder_roundtrip-1.1")(KEY, wav)
    assert out2.shape == wav.shape
    assert float(jnp.mean(jnp.abs(out2 - out))) > 0.0


def test_phase_walk_scrambles_phase_with_finite_grads():
    """phase_walk (round-4 vocoder-decoherence surrogate): length-
    preserving heavy phase scramble on the 2048 vocoder grid. Unlike
    phase_noise (bounded walk on the 255 embedding grid) it must damage
    the waveform at the whole-wave-roundtrip severity level, and —
    because it rides the channel-mode robust bank — its VJP must be
    finite even on exactly-zero regions (jnp.angle's NaN pole took down
    a fine-tune; phase_walk uses cos/sin of a key-derived walk, no
    abs/angle)."""
    from image_in_speech_watermarking_tpu import data

    wav = jnp.asarray(data.synthetic_speech(16000, seed=4))
    fn = get_attack("phase_walk-0.8")
    out = fn(KEY, wav)
    assert out.shape == wav.shape
    assert bool(jnp.isfinite(out).all())
    # severity: decorrelates the waveform like the real whole-wave
    # vocoder roundtrip (measured decode-damage match 0.047 vs 0.049)
    rel = float(jnp.mean((out - wav) ** 2) / jnp.mean(wav ** 2))
    assert rel > 0.3
    # milder operating point is milder
    out_mild = get_attack("phase_walk-0.1")(KEY, wav)
    rel_mild = float(jnp.mean((out_mild - wav) ** 2) / jnp.mean(wav ** 2))
    assert rel_mild < rel
    # NaN micro-hunt: exact-zero half + all-zero input
    half = jnp.asarray(np.concatenate(
        [np.asarray(wav[:8000]), np.zeros(8000, np.float32)]))
    g = jax.grad(lambda w: jnp.sum(fn(KEY, w) ** 2))(half)
    assert bool(jnp.isfinite(g).all())
    g0 = jax.grad(lambda w: jnp.sum(fn(KEY, w) ** 2))(jnp.zeros(16000))
    assert bool(jnp.isfinite(g0).all())


def test_phase_walk_u_stationary_init():
    """phase_walk_u (round-4b): phase_walk started from the walk's
    stationary state — iid Uniform(-pi,pi) initial phase per 2048-grid
    bin, constant along frames. The whole-wave vocoder roundtrip's
    decode damage grows with clip position because the synthesis phase
    accumulates over the utterance (scripts/r4_vocoder_decomp.py: clip 0
    at 0.002, late clips 0.05-0.11); the static uniform all-pass
    (step_rad=0) alone reproduces the late-clip damage on every clip
    (scripts/r4_decomp2.py: 0.0532 flat vs roundtrip 0.0616), so the
    training branch must sample it."""
    from image_in_speech_watermarking_tpu import data

    wav = jnp.asarray(data.synthetic_speech(16000, seed=4))
    # step 0 = pure static all-pass: length-preserving, energy-
    # preserving-ish, heavy waveform damage
    fn0 = get_attack("phase_walk_u-0.0")
    out0 = fn0(KEY, wav)
    assert out0.shape == wav.shape
    assert bool(jnp.isfinite(out0).all())
    rel0 = float(jnp.mean((out0 - wav) ** 2) / jnp.mean(wav ** 2))
    assert rel0 > 0.3
    # all-pass keeps substantial energy (the ISTFT of the inconsistent
    # rotated STFT projects onto consistent signals, so some loss is
    # expected — this guards against a near-zero/blown-up output)
    e = float(jnp.sum(out0 ** 2) / jnp.sum(wav ** 2))
    assert 0.1 < e < 2.0
    # with a walk on top it differs from the static case and from
    # zero-init phase_walk under the same key
    outw = get_attack("phase_walk_u-0.8")(KEY, wav)
    assert float(jnp.mean(jnp.abs(outw - out0))) > 0.0
    outz = get_attack("phase_walk-0.8")(KEY, wav)
    assert float(jnp.mean(jnp.abs(outw - outz))) > 0.0
    # finite grads on exact-zero regions (rides the training graph)
    half = jnp.asarray(np.concatenate(
        [np.asarray(wav[:8000]), np.zeros(8000, np.float32)]))
    g = jax.grad(lambda w: jnp.sum(fn0(KEY, w) ** 2))(half)
    assert bool(jnp.isfinite(g).all())
