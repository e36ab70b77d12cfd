"""Codec-sim calibration ladder vs the reference's distortion anchors.

The reference commits one informal distortion table (mean abs diff vs
the clean wav, audio_attack.py:285-293 comments):

  low_pass 0.00184   echo 0.00280   requant(8bit) 0.0152
  awgn-15  0.00292   aac@128k 0.00037   amp x1.2 0.0030

Absolute values depend on that wav's loudness; the scale-free target is
the LADDER — each attack's distortion relative to the others on the
same signal. This script measures our in-graph battery on the synthetic
corpus and prints both absolute and anchor-normalized columns; the
codec rows are the calibration subjects (attacks/codec.py
CODEC_POINTS). Output is recorded in docs/CODEC_CALIBRATION.md.

Run: JAX_PLATFORMS=cpu python scripts/calibrate_codec_sim.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from image_in_speech_watermarking_tpu import data
from image_in_speech_watermarking_tpu.attacks import waveform as wf

ANCHORS = {
    "low_pass": 0.00184,
    "echo_addition": 0.00280,
    "requantization-8": 0.0152,
    "awgn-15": 0.00292,
    "aac": 0.00037,
    "amplitude_scaling-1.2": 0.0030,
}

ATTACKS = ["low_pass", "echo_addition", "requantization-8", "awgn-15",
           "amplitude_scaling-1.2", "aac", "aac-64k", "mp3compress-128k",
           "mp3compress-64k"]


def main():
    waves = [data.synthetic_speech(48000, seed=s) for s in range(4)]
    key = jax.random.key(0)
    rows = []
    for spec in ATTACKS:
        fn = wf.get_attack(spec)
        ds = []
        for i, w in enumerate(waves):
            wj = jnp.asarray(w)
            att = np.asarray(fn(jax.random.fold_in(key, i), wj))
            n = min(len(att), len(w))
            ds.append(float(np.mean(np.abs(att[:n] - w[:n]))))
        rows.append((spec, float(np.mean(ds))))

    ref_base = ANCHORS["low_pass"]
    ours_base = dict(rows)["low_pass"]
    print(f"{'attack':24s} {'mean|d|':>10s} {'/low_pass':>10s} "
          f"{'anchor/low_pass':>16s}")
    for spec, d in rows:
        rel = d / ours_base
        a = ANCHORS.get(spec)
        arel = f"{a / ref_base:15.3f}" if a else " " * 15 + "-"
        print(f"{spec:24s} {d:10.6f} {rel:10.3f} {arel}")


if __name__ == "__main__":
    main()
