"""Round-4b sync-selection probe on the vocoder rows.

The pw-flagship decomposition puts the oracle-unstretch decode at 0.0616
while the e2e probe row sits at 0.100: the sync stage loses ~0.04 on top
of the model's own late-clip damage. This probe shows exactly what
best_candidate does on a real vocoder row: every candidate's blind
confidence + true MSE, the debug trace of the staged search, and the
final pick — the measurement the mag-profile gate redesign needs.

Run: ISW_SYNC_DEBUG=1 PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/r4_sync_probe.py [ckpt] [attacks]
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("ISW_SYNC_DEBUG", "1")

from image_in_speech_watermarking_tpu import data, models
from image_in_speech_watermarking_tpu.attacks import waveform as wf
from image_in_speech_watermarking_tpu.eval import pipeline as P
from image_in_speech_watermarking_tpu.eval import sync as S
from image_in_speech_watermarking_tpu.train import checkpoint


def main(ckpt="results/flagship_r4_pw/model",
         attacks="time_scaling-0.9,pitch_scaling,jittering-1000"):
    model = models.get_arch("Uformer_audio", extractor_mag=True)
    S.set_profile("mag")
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

    def stab_at0(wave_c):
        _, dr = make_roll_fns(wave_c)
        d = dr(np.asarray([0, 63, -63, 0], np.int32))
        return 0.5 * (float(np.mean((d[0] - d[1]) ** 2))
                      + float(np.mean((d[0] - d[2]) ** 2)))

    for attack in attacks.split(","):
        with jax.default_device(jax.devices("cpu")[0]):
            att = np.asarray(wf.get_attack(attack)(jax.random.key(0),
                                                   jnp.asarray(recon)))
        print(f"==== {attack} (len {len(att)} vs {L}) ====", flush=True)
        for name, w in S.resync_candidates(att, L, stage="base"):
            dec = extract(w)
            print(f"  cand {name:22s} conf {S.confidence(dec):.4f} "
                  f"stab@0 {stab_at0(w):.5f} mse {mse(dec):.4f}",
                  flush=True)
        wbest, dec, pick, score = S.best_candidate(
            att, L, extract, make_roll_fns=make_roll_fns)
        print(f"  PICK {pick} score {score:.4f} mse {mse(dec):.4f}",
              flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
