"""Round-4c: measure the pitch-inverse candidates on the pw2 flagship.

The pw2 sync probe (docs/round4_demo/README.md §2h) shows the pitch row
failing BEFORE the pitch stage: the roll search on the pitch-shifted
wave finds a hop-stable garbage offset (stab 0.0037 vs the 0.006 gate),
the acceptance caches it as a lock, and best_candidate returns
identity+roll at true MSE 0.113 when plain identity decodes 0.081.
Design question for the fix: is the pitch-inverse hypothesis worth
delivering at all, i.e. what does pitch[+6] (the true inverse of the
battery's pitch_scaling n_steps=-6) decode at on this model? And what
are its confidence / hop-stability, so the prior can be gated.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/r4_pitch_probe.py [ckpt] [n_utts]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from image_in_speech_watermarking_tpu import data, models
from image_in_speech_watermarking_tpu.attacks import waveform as wf
from image_in_speech_watermarking_tpu.eval import pipeline as P
from image_in_speech_watermarking_tpu.eval import sync as S
from image_in_speech_watermarking_tpu.train import checkpoint


def main(ckpt="results/flagship_r4_pw2/model", n_utts="2"):
    model = models.get_arch("Uformer_audio", extractor_mag=True)
    S.set_profile("mag")
    variables = {"params": checkpoint.restore(ckpt)["params"]}
    msg = jnp.asarray(data.digit_watermarks(1))
    msg_np = np.asarray(msg)
    waves = data.load_corpus("synthetic", int(n_utts), split="test")
    ds = data.SpeechDataset(waves, kind="eval")

    for u in range(int(n_utts)):
        wave, clips, tail = ds.utterance(u)
        L = len(np.asarray(wave).reshape(-1))
        r = P.reconstruct_audio(wave, clips, tail, msg, model, variables,
                                attack="closed_loop")
        recon = np.asarray(r.recon_audio)
        with jax.default_device(jax.devices("cpu")[0]):
            att = np.asarray(wf.get_attack("pitch_scaling")(
                jax.random.key(0), jnp.asarray(recon)))

        def extract(w):
            att_len = len(w)
            pad = np.pad(w, (0, P._bucket(att_len, lo=16000) - att_len))
            from image_in_speech_watermarking_tpu.config import (
                CLIP_FRAMES, EVAL_HOP, EVAL_N_FFT)
            from image_in_speech_watermarking_tpu.dsp.stft import num_frames
            frames = num_frames(att_len, EVAL_N_FFT, EVAL_HOP)
            n = -(-frames // CLIP_FRAMES)
            out = P._extract_jit(model, variables, jnp.asarray(pad),
                                 "uformer", "0", 0.0, 1.0)
            return np.asarray(out)[:n]

        def stab(w):
            att_len = len(w)
            pad = jnp.asarray(np.pad(
                w.astype(np.float32),
                (0, P._bucket(att_len, lo=16000) - att_len)))
            d = P._decode_rolls_jit(
                model, variables, pad,
                jnp.asarray([0, 63, -63, 0], np.int32),
                "uformer", "0", jnp.int32(att_len), 0.0, 1.0)
            d = np.asarray(d)
            return 0.5 * (float(np.mean((d[0] - d[1]) ** 2))
                          + float(np.mean((d[0] - d[2]) ** 2)))

        def mse(dec):
            return float(np.mean((dec - msg_np[0]) ** 2))

        print(f"==== utterance {u} ====", flush=True)
        for name, w in S.resync_candidates(att, L, stage="all"):
            dec = extract(w)
            print(f"  cand {name:22s} conf {S.confidence(dec):.4f} "
                  f"stab@0 {stab(w):.5f} mse {mse(dec):.4f}", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
