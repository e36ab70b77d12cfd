"""Round-5 time_shift-1000 bimodality probe.

The N=20 headline sweep put time_shift-1000 at WM-MSE 0.0645 with a
per-utterance std of 0.067 — bimodal: most utterances repair to the
clean floor, a minority fail completely. This probe replays the row per
utterance with the sync debug trace on, printing each utterance's
candidate landscape, staged-search trace, final pick and true MSE — the
measurement needed to see WHICH gate rejects the true roll on the
failing utterances.

Run: python scripts/r5_ts_probe.py [ckpt] [attack] [n_utts]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("ISW_SYNC_DEBUG", "1")

from image_in_speech_watermarking_tpu import data, models
from image_in_speech_watermarking_tpu.attacks import waveform as wf
from image_in_speech_watermarking_tpu.eval import pipeline as P
from image_in_speech_watermarking_tpu.eval import sync as S
from image_in_speech_watermarking_tpu.train import checkpoint


def main(ckpt="results/flagship_r4_pw2/model", attack="time_shift-1000",
         n=10):
    model = models.get_arch("Uformer_audio", extractor_mag=True)
    S.set_profile("mag")
    variables = {"params": checkpoint.restore(ckpt)["params"]}
    msg = jnp.asarray(data.digit_watermarks(1))
    msg_np = np.asarray(msg)
    waves = data.load_corpus("synthetic", int(n), split="test")
    ds = data.SpeechDataset(waves, kind="eval")

    def extract_for(w):
        att_len = len(w)
        pad = np.pad(w, (0, P._bucket(att_len, lo=16000) - att_len))
        from image_in_speech_watermarking_tpu.config import (CLIP_FRAMES,
                                                             EVAL_HOP,
                                                             EVAL_N_FFT)
        from image_in_speech_watermarking_tpu.dsp.stft import num_frames
        frames = num_frames(att_len, EVAL_N_FFT, EVAL_HOP)
        nc = -(-frames // CLIP_FRAMES)
        out = P._extract_jit(model, variables, jnp.asarray(pad),
                             "uformer", "0", 0.0, 1.0)
        return np.asarray(out)[:nc]

    def make_roll_fns(wave_att):
        wave_att = np.asarray(wave_att, np.float32)
        att_len = wave_att.shape[-1]
        pad = jnp.asarray(np.pad(
            wave_att, (0, P._bucket(att_len, lo=16000) - att_len)))
        from image_in_speech_watermarking_tpu.config import (CLIP_FRAMES,
                                                             EVAL_HOP,
                                                             EVAL_N_FFT)
        from image_in_speech_watermarking_tpu.dsp.stft import num_frames
        frames = num_frames(att_len, EVAL_N_FFT, EVAL_HOP)
        n_att = -(-frames // CLIP_FRAMES)

        def score_rolls(offs):
            conf, sat = P._score_rolls_jit(
                model, variables, pad, jnp.asarray(offs, jnp.int32),
                "uformer", "0", jnp.int32(att_len), jnp.int32(n_att),
                0.0, 1.0)
            return np.asarray(conf), np.asarray(sat)[:, :n_att]

        def decode_rolls(offs):
            w = P._decode_rolls_jit(
                model, variables, pad, jnp.asarray(offs, jnp.int32),
                "uformer", "0", jnp.int32(att_len), 0.0, 1.0)
            return np.asarray(w)[:, :n_att]

        return score_rolls, decode_rolls

    def mse(dec):
        return float(np.mean((dec - msg_np[0]) ** 2))

    summary = []
    for u in range(int(n)):
        wave, clips, tail = ds.utterance(u)
        L = len(np.asarray(wave).reshape(-1))
        r = P.reconstruct_audio(wave, clips, tail, msg, model, variables,
                                attack="closed_loop")
        recon = np.asarray(r.recon_audio)
        with jax.default_device(jax.devices("cpu")[0]):
            att = np.asarray(wf.get_attack(attack)(jax.random.key(0),
                                                   jnp.asarray(recon)))
        print(f"==== utt {u} (len {L}) ====", flush=True)
        # ground truth: conf/stability at the TRUE repair offset
        shift = int(attack.split("-")[1]) if "-" in attack else 0
        sr_fn, dr_fn = make_roll_fns(att)
        c_true, _ = sr_fn(np.asarray([shift] * 16, np.int32))
        d = dr_fn(np.asarray([shift, shift + 63, shift - 63, shift],
                             np.int32))
        stab_true = 0.5 * (float(np.mean((d[0] - d[1]) ** 2))
                           + float(np.mean((d[0] - d[2]) ** 2)))
        print(f"  true off {shift}: conf {float(c_true[0]):.4f} "
              f"stab {stab_true:.5f} mse {mse(d[0]):.4f}", flush=True)
        wbest, dec, pick, score = S.best_candidate(
            att, L, extract_for, make_roll_fns=make_roll_fns)
        m = mse(dec)
        print(f"  PICK {pick} score {score:.4f} mse {m:.4f}", flush=True)
        summary.append((u, pick, round(score, 4), round(m, 4),
                        round(float(c_true[0]), 4), round(stab_true, 5)))
    print("\nutt | pick | score | mse | true_conf | true_stab")
    for row in summary:
        print(" ", row)


if __name__ == "__main__":
    main(*sys.argv[1:])
