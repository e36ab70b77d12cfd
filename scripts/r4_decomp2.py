"""Round-4b decomposition: initial-phase-state hypothesis.

r4_vocoder_decomp.py on the phase-walk fine-tuned flagship showed the
train<->eval gap is POSITIONAL: clip 0 of a whole-wave vocoder roundtrip
decodes at 0.002 (= the training regime, walk starts at zero) while late
clips sit at 0.05-0.11. Hypothesis: the damage regime of a late clip is
the walk's STATIONARY state — a large accumulated per-bin phase
(effectively iid uniform) on the 2048 grid — which the per-clip training
branch never samples because its walk always starts at zero.

This script decodes, at oracle zero offset:
  identity                      — baseline
  static allpass (uniform)      — per-bin uniform phase, constant along
                                  frames: the pure accumulated state
  phase_walk 0.8 + uniform init — the proposed training branch
  whole-wave roundtrip 0.9      — the real eval damage (reference row)
  late-start walk               — walk whose variance matches clip c's
                                  accumulated state, per clip

If "static allpass"/"uniform init" reproduce the late-clip damage on
EVERY clip (flat profile ~0.05-0.11), the fix is a training branch with
uniform initial phase.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_decomp2.py [ckpt]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from image_in_speech_watermarking_tpu import data, models
from image_in_speech_watermarking_tpu.attacks import waveform as wf
from image_in_speech_watermarking_tpu.eval import pipeline as P
from image_in_speech_watermarking_tpu.train import checkpoint


def main(ckpt="results/flagship_r4_pw/model"):
    model = models.get_arch("Uformer_audio", extractor_mag=True)
    variables = {"params": checkpoint.restore(ckpt)["params"]}
    msg = jnp.asarray(data.digit_watermarks(1))
    msg_np = np.asarray(msg)
    waves = data.load_corpus("synthetic", 1, split="test")
    ds = data.SpeechDataset(waves, kind="eval")
    wave, clips, tail = ds.utterance(0)
    L = len(np.asarray(wave).reshape(-1))

    r = P.reconstruct_audio(wave, clips, tail, msg, model, variables,
                            attack="closed_loop")
    recon = np.asarray(r.recon_audio)

    def extract(w):
        att_len = len(w)
        pad = np.pad(w, (0, P._bucket(att_len, lo=16000) - att_len))
        from image_in_speech_watermarking_tpu.config import (CLIP_FRAMES,
                                                             EVAL_HOP,
                                                             EVAL_N_FFT)
        from image_in_speech_watermarking_tpu.dsp.stft import num_frames
        frames = num_frames(att_len, EVAL_N_FFT, EVAL_HOP)
        n = -(-frames // CLIP_FRAMES)
        out = P._extract_jit(model, variables, jnp.asarray(pad),
                             "uformer", "0", 0.0, 1.0)
        return np.asarray(out)[:n]

    def profile(name, w):
        dec = extract(np.asarray(w, np.float32))
        per = [float(np.mean((dec[i] - msg_np[0]) ** 2))
               for i in range(len(dec))]
        print(f"{name:28s} mean {np.mean(per):.4f}  "
              f"clips {[round(p, 3) for p in per]}", flush=True)

    profile("identity", recon)

    from image_in_speech_watermarking_tpu.dsp.stft import istft, stft
    w2 = wf._hann(2048)
    with jax.default_device(jax.devices("cpu")[0]):
        spec = np.asarray(stft(jnp.asarray(recon), 2048, hop_length=512,
                               window=w2, method="fft"))
    rng = np.random.default_rng(0)

    def synth(theta):
        with jax.default_device(jax.devices("cpu")[0]):
            out = istft(jnp.asarray(spec * np.exp(1j * theta)), 2048,
                        hop_length=512, window=w2, length=L, method="fft")
        return np.asarray(out)

    # static allpass: per-bin uniform phase, constant along frames
    phi = rng.uniform(-np.pi, np.pi, size=spec.shape[:-1] + (1,))
    profile("static allpass (uniform)", synth(np.broadcast_to(phi,
                                                              spec.shape)))

    # walk + uniform init (the proposed training branch)
    steps = rng.normal(size=spec.shape) * 0.8
    theta = np.cumsum(steps, axis=-1) + rng.uniform(
        -np.pi, np.pi, size=spec.shape[:-1] + (1,))
    profile("walk 0.8 + uniform init", synth(theta))

    # real whole-wave roundtrip (the eval row)
    with jax.default_device(jax.devices("cpu")[0]):
        st = np.asarray(wf.time_stretch_wave(jnp.asarray(recon), 0.9))
        back = np.asarray(wf.time_stretch_wave(jnp.asarray(st),
                                               len(st) / float(L)))
    back = np.pad(back[:L], (0, max(0, L - len(back))))
    profile("whole-wave roundtrip 0.9", back)


if __name__ == "__main__":
    main(*sys.argv[1:])
