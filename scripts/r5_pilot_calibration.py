"""Round-5 pilot-profile calibration on a pilot-trained checkpoint.

PILOT_PROFILE's constants (eval/sync.py) were set from first principles
(aligned pilot error ~ clean WM-MSE, garbage ~ 0.25 against a {0,1}
pattern). This script measures the actual pilot-error landscape on the
flagship_r5_pilot fine-tune, mirroring scripts/r4_sync_calibration.py's
protocol but scoring by pilot-region decode error:

A. time_shift landscape: pilot error at the true offset, graded
   neighbours (+-1..31), the hop lattice (+-63/126), and a background
   field -> lock/accept bands + bowl geometry for the pilot profile.
B. pitch siblings: pilot error of the true pitch inverse vs the wrong
   sibling vs identity on a pitch_scaling-attacked wave — the
   coin-flip the mag profile needed the hop-responsiveness tie-break
   for; the pilot should separate them directly.
C. vocoder rows: pilot error of unstretch candidates (the unstretch
   prior's margin in pilot units).

Run: python scripts/r5_pilot_calibration.py [ckpt] [n_utts]
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from image_in_speech_watermarking_tpu import data, models
from image_in_speech_watermarking_tpu.eval import pipeline as P
from image_in_speech_watermarking_tpu.eval import sync as S
from image_in_speech_watermarking_tpu.train import checkpoint


def roll_fns_for(model, variables, wave):
    wave = np.asarray(wave, np.float32)
    att_len = wave.shape[-1]
    pad = jnp.asarray(np.pad(
        wave, (0, P._bucket(att_len, lo=16000) - att_len)))
    from image_in_speech_watermarking_tpu.config import (CLIP_FRAMES,
                                                         EVAL_HOP,
                                                         EVAL_N_FFT)
    from image_in_speech_watermarking_tpu.dsp.stft import num_frames
    frames = num_frames(att_len, EVAL_N_FFT, EVAL_HOP)
    n_att = -(-frames // CLIP_FRAMES)
    pilot = jnp.asarray(S.get_pilot())

    def score_rolls(offs):
        conf, pe = P._score_rolls_jit(
            model, variables, pad, jnp.asarray(offs, jnp.int32),
            "uformer", "0", jnp.int32(att_len), jnp.int32(n_att), 0.0,
            1.0, pilot)
        return np.asarray(conf), np.asarray(pe)[:, :n_att]

    def decode_rolls(offs):
        w = P._decode_rolls_jit(
            model, variables, pad, jnp.asarray(offs, jnp.int32),
            "uformer", "0", jnp.int32(att_len), 0.0, 1.0)
        return np.asarray(w)[:, :n_att]

    return score_rolls, decode_rolls, n_att


def score_block(score_rolls, offs, block=16):
    confs, sats = [], []
    offs = [int(o) for o in offs]
    for i in range(0, len(offs), block):
        blk = offs[i:i + block]
        padded = blk + [0] * (block - len(blk))
        c, s = score_rolls(np.asarray(padded, np.int32))
        confs.extend(c[:len(blk)])
        sats.append(s[:len(blk)])
    return np.asarray(confs), np.concatenate(sats, 0)


def part_a(model, variables, recon, msg_np, shifts=(828, -301)):
    for shift in shifts:
        att = np.roll(recon, shift)
        score_rolls, decode_rolls, n_att = roll_fns_for(
            model, variables, att)
        neigh = [0, 1, -1, 2, -2, 3, -3, 5, -5, 8, -8, 16, -16, 31, -31]
        lattice = [63, -63, 126, -126]
        rng = np.random.default_rng(0)
        bg = [int(o) for o in rng.integers(-1024, 1025, 64)
              if abs(int(o) - shift) > 200]
        offs = [shift + d for d in neigh + lattice] + bg
        confs, _ = score_block(score_rolls, offs)
        by = dict(zip(offs, confs))
        bg_c = np.asarray([by[o] for o in bg])
        print(f"-- time_shift {shift:+d} (pilot err) --")
        print("  true", round(by[shift], 4),
              " +-1..5:", [round(by[shift + d], 4)
                           for d in (1, -1, 2, -2, 3, -3, 5, -5)])
        print("  +-8/16/31:", [round(by[shift + d], 4)
                               for d in (8, -8, 16, -16, 31, -31)])
        print("  hop lattice:", [round(by[shift + d], 4) for d in lattice])
        print(f"  background: min {bg_c.min():.4f} "
              f"median {np.median(bg_c):.4f}")
        d_true = decode_rolls(np.asarray(
            [shift] * 16, np.int32))[0]
        print("  payload mse at true:",
              round(float(np.mean((d_true - msg_np[0]) ** 2)), 4))


def part_b(model, variables, recon, msg_np, steps=(-6.0,)):
    """Pitch siblings scored by pilot error (the mag profile's
    coin-flip)."""
    from image_in_speech_watermarking_tpu.attacks import waveform as wf
    L = len(recon)
    for st in steps:
        with jax.default_device(jax.devices("cpu")[0]):
            att = np.asarray(wf.pitch_scaling(
                jax.random.key(0), jnp.asarray(recon),
                scaling_factor=float(st)))[:L]
        cands = S.resync_candidates(att, L, stage="all")
        print(f"-- pitch_scaling[{st:+.0f}] candidates (pilot err) --")
        for name, wave in cands:
            score_rolls, _, _ = roll_fns_for(model, variables, wave)
            c, _ = score_rolls(np.zeros(16, np.int32))
            print(f"  {name:20s} pilot_err {float(c[0]):.4f}")


def part_c(model, variables, recon, msg_np, rates=(0.9, 1.1)):
    from image_in_speech_watermarking_tpu.attacks import waveform as wf
    L = len(recon)
    for rate in rates:
        with jax.default_device(jax.devices("cpu")[0]):
            stw = np.asarray(wf.time_stretch_wave(jnp.asarray(recon),
                                                  rate))
        cands = S.resync_candidates(stw, L, stage="base")
        print(f"-- time_scaling[{rate}] candidates (pilot err / payload "
              "mse) --")
        for name, wave in cands:
            score_rolls, decode_rolls, _ = roll_fns_for(model, variables,
                                                        wave)
            c, _ = score_rolls(np.zeros(16, np.int32))
            d = decode_rolls(np.zeros(16, np.int32))[0]
            mse = float(np.mean((d - msg_np[0]) ** 2))
            print(f"  {name:20s} pilot_err {float(c[0]):.4f} "
                  f"payload_mse {mse:.4f}")


def main(ckpt="results/flagship_r5_pilot/model", n=2):
    model = models.get_arch("Uformer_audio", extractor_mag=True)
    variables = {"params": checkpoint.restore(ckpt)["params"]}
    S.set_pilot(data.pilot_pattern())
    S.set_profile("pilot")
    msg = jnp.asarray(data.stamp_pilot(data.digit_watermarks(1)))
    msg_np = np.asarray(msg)
    waves = data.load_corpus("synthetic", int(n), split="test")
    ds = data.SpeechDataset(waves, kind="eval")
    for u in range(int(n)):
        wave, clips, tail = ds.utterance(u)
        r = P.reconstruct_audio(wave, clips, tail, msg, model, variables,
                                attack="closed_loop")
        recon = np.asarray(r.recon_audio)
        print(f"==== utterance {u} (len {len(recon)}, clean wm_mse "
              f"{r.wm_mse:.4f}) ====")
        part_a(model, variables, recon, msg_np,
               shifts=(828, -301) if u == 0 else (413,))
        part_b(model, variables, recon, msg_np)
        part_c(model, variables, recon, msg_np,
               rates=(0.9, 1.1) if u == 0 else (1.1,))


if __name__ == "__main__":
    main(*sys.argv[1:])
