"""Round-4 sync-threshold calibration on the magnitude-channel flagship.

The eval/sync.py constants (LOCK/ACCEPT/CLIP_*/STABILITY_LOCK) were
measured on the round-3 real/imag flagship. The |STFT| payload channel
changes the whole blind-confidence landscape: the r4 probe's roll search
picked offset 754 for a true shift of 828 (conf 0.1135) and the finalist
table showed a WIDE basin (conf 0.092-0.096 at 3-16 samples off true) the
sample-exact-basin geometry assumptions can't handle, and garbage
compositions now reach blind scores ~0.095 (the r3 model's garbage floor
was >=0.13). This script measures, on the r4 flagship:

A. time_shift landscape: confidence at the true offset and graded
   neighbours (+-1..+-31), the hop lattice (+-63/+-126), and a background
   field sample -> recalibrated LOCK/ACCEPT bands + required refinement
   radius; hop-stability at true vs impostors -> STABILITY_LOCK.
B. unstretch residual drift (time_scaling-0.9/1.1): oracle per-clip
   drift of the length-restored wave (xcorr vs the pre-attack recon),
   per-clip saturation at the oracle drift vs the field -> CLIP_* gates,
   required piecewise window, and the oracle-composed repair quality
   (upper bound for a perfect per-clip repair).

Run: python scripts/r4_sync_calibration.py [ckpt] [n_utts]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

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

    def score_rolls(offs):
        conf, sat = P._score_rolls_jit(
            model, variables, pad, jnp.asarray(offs, jnp.int32),
            "uformer", "0", jnp.int32(att_len), jnp.int32(n_att), 0.0, 1.0)
        return np.asarray(conf), np.asarray(sat)[:, :n_att]

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


def decode_block(decode_rolls, offs, block=16):
    out = []
    offs = [int(o) for o in offs]
    for i in range(0, len(offs), block):
        blk = offs[i:i + block]
        padded = blk + [0] * (block - len(blk))
        out.extend(decode_rolls(np.asarray(padded, np.int32))[:len(blk)])
    return out


def stab_of(decode_rolls, off, hop=63):
    d0, dp, dm = decode_block(decode_rolls, [off, off + hop, off - hop])
    return 0.5 * (float(np.mean((d0 - dp) ** 2))
                  + float(np.mean((d0 - dm) ** 2)))


def part_a(model, variables, recon, msg_np, shifts=(828, -301)):
    L = len(recon)
    for shift in shifts:
        att = np.roll(recon, shift)
        score_rolls, decode_rolls, n_att = roll_fns_for(
            model, variables, att)
        neigh = [0, 1, -1, 2, -2, 3, -3, 4, -4, 5, -5, 8, -8,
                 16, -16, 31, -31]
        lattice = [63, -63, 126, -126]
        rng = np.random.default_rng(0)
        bg = [int(o) for o in rng.integers(-1024, 1025, 64)
              if abs(int(o) - shift) > 200]
        offs = [shift + d for d in neigh + lattice] + bg
        confs, sats = score_block(score_rolls, offs)
        by = dict(zip(offs, confs))
        print(f"-- time_shift {shift:+d} --")
        print("  true conf", round(by[shift], 4),
              " +-1:", [round(by[shift + d], 4) for d in (1, -1)],
              " +-2..5:", [round(by[shift + d], 4)
                           for d in (2, -2, 3, -3, 4, -4, 5, -5)])
        print("  +-8/16/31:", [round(by[shift + d], 4)
                               for d in (8, -8, 16, -16, 31, -31)])
        print("  hop lattice +-63/126:",
              [round(by[shift + d], 4) for d in lattice])
        bg_c = np.asarray([by[o] for o in bg])
        print(f"  background: min {bg_c.min():.4f} "
              f"median {np.median(bg_c):.4f} max {bg_c.max():.4f}")
        print("  stab: true", round(stab_of(decode_rolls, shift), 5),
              " true+63", round(stab_of(decode_rolls, shift + 63), 5),
              " bg_min", round(stab_of(decode_rolls,
                                       int(bg[int(np.argmin(bg_c))])), 5))
        d_true = decode_block(decode_rolls, [shift])[0]
        print("  decode mse at true:",
              round(float(np.mean((d_true - msg_np[0]) ** 2)), 4))


def oracle_drift(ref, wav, centers, width=4096, lag=200):
    """Per-clip lag (samples) maximizing xcorr(ref, wav) near each clip
    center; positive lag means wav is DELAYED vs ref (repair off=+lag)."""
    out = []
    for c in centers:
        a = ref[max(0, c - width // 2): c + width // 2]
        b = wav[max(0, c - width // 2 - lag): c + width // 2 + lag]
        if len(a) < width // 2 or len(b) <= len(a):
            out.append(0)
            continue
        corr = np.correlate(b, a, mode="valid")
        out.append(int(np.argmax(corr)) - (len(b) - len(a)) // 2
                   + (0 if c - width // 2 >= lag else 0))
    return out


def part_b(model, variables, recon, msg_np, rates=(0.9, 1.1)):
    from image_in_speech_watermarking_tpu.attacks import waveform as wf
    L = len(recon)
    blk = 8064
    for rate in rates:
        with jax.default_device(jax.devices("cpu")[0]):
            st = np.asarray(wf.time_stretch_wave(jnp.asarray(recon), rate))
        cands = S.resync_candidates(st, L, stage="base")
        un = dict(cands)[[n for n, _ in cands
                          if n.startswith("unstretch")][0]]
        score_rolls, decode_rolls, n_att = roll_fns_for(model, variables,
                                                        un)
        centers = [i * blk + blk // 2 for i in range(n_att)
                   if i * blk + blk // 2 < L]
        drifts = oracle_drift(recon, un, centers, lag=160)
        print(f"-- unstretch[{rate}] --  oracle per-clip drift:", drifts)
        # per-clip saturation at oracle drift vs 0 vs best over +-48 grid
        grid = sorted({*range(-48, 49, 2), *drifts,
                       *[d + e for d in drifts for e in (-1, 1)]})
        confs, sats = score_block(score_rolls, grid)
        gi = {o: j for j, o in enumerate(grid)}
        sat0 = sats[gi[0]]
        print("  per-clip sat at 0:     ",
              [round(float(s), 3) for s in sat0[:len(centers)]])
        so = [round(float(sats[gi[d], c]), 3)
              for c, d in enumerate(drifts)]
        print("  per-clip sat at oracle:", so)
        # oracle-composed repair quality
        uniq = sorted(set(drifts))
        decs = decode_block(decode_rolls, uniq)
        by = dict(zip(uniq, decs))
        per = [float(np.mean((by[d][c] - msg_np[0]) ** 2))
               for c, d in enumerate(drifts)]
        print("  oracle per-clip mse:   ", [round(p, 3) for p in per])
        print(f"  oracle mean mse: {np.mean(per):.4f}  "
              f"(vs decode-at-0 below)")
        d0 = decode_block(decode_rolls, [0])[0]
        per0 = [float(np.mean((d0[c] - msg_np[0]) ** 2))
                for c in range(len(centers))]
        print(f"  at-0 mean mse: {np.mean(per0):.4f} "
              f"clips {[round(p, 3) for p in per0]}")


def main(ckpt="results/flagship_r4_mag/model", n=2):
    model = models.get_arch("Uformer_audio", extractor_mag=True)
    variables = {"params": checkpoint.restore(ckpt)["params"]}
    msg = jnp.asarray(data.digit_watermarks(1))
    msg_np = np.asarray(msg)
    waves = data.load_corpus("synthetic", int(n), split="test")
    ds = data.SpeechDataset(waves, kind="eval")
    for u in range(int(n)):
        wave, clips, tail = ds.utterance(u)
        r = P.reconstruct_audio(wave, clips, tail, msg, model, variables,
                                attack="closed_loop")
        recon = np.asarray(r.recon_audio)
        print(f"==== utterance {u} (len {len(recon)}) ====")
        part_a(model, variables, recon, msg_np,
               shifts=(828, -301) if u == 0 else (413,))
        part_b(model, variables, recon, msg_np,
               rates=(0.9, 1.1) if u == 0 else (1.1,))


if __name__ == "__main__":
    main(*sys.argv[1:])
