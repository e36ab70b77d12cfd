"""PESQ anchor calibration (VERDICT r3 #8) -> docs/PESQ_CALIBRATION.md.

The official P.862 conformance vectors and a reference pypesq binary are
not obtainable in this zero-egress environment (docs/PESQ_VALIDATION.md),
so the vendored implementation is anchored against the degradations whose
raw-PESQ behavior is well documented in the P.862 literature:

  - speech + additive white noise at exact SNRs (the canonical anchor
    curve; published speech+white-noise raw-PESQ curves cluster in a
    ~0.5-MOS band — Rix et al. 2001, ITU-T P.862 application guide)
  - codec pressure ordering at matched content: the calibrated
    psychoacoustic codec sim at 128k vs 64k (attacks/codec.py,
    distortion-calibrated in docs/CODEC_CALIBRATION.md) must score
    lower at 64k, with both above heavy-noise conditions
  - band-limit and nonlinear-distortion sanity points

Emits the measured table with the published anchor midpoints and the
deviation per condition. Run: PYTHONPATH=. JAX_PLATFORMS=cpu python
scripts/pesq_calibration.py > docs/PESQ_CALIBRATION.md
"""

from __future__ import annotations

import numpy as np
from scipy import signal

from image_in_speech_watermarking_tpu import data
from image_in_speech_watermarking_tpu.eval.pesq import pesq_numpy

# Published speech+white-noise raw-PESQ anchor band (midpoint, halfwidth):
# the spread of the P.862 literature's SNR curves (Rix et al. 2001 fig.;
# P.862 application-guide style QoE studies). Exact values vary by corpus
# and language; the band half-widths reflect that spread.
AWGN_ANCHORS = {
    40: (4.35, 0.15),
    30: (4.05, 0.25),
    20: (3.50, 0.30),
    15: (3.10, 0.30),
    10: (2.65, 0.25),
    5: (2.15, 0.25),
    0: (1.75, 0.25),
}


def main():
    rng = np.random.default_rng(0)
    refs = [data.synthetic_speech(48000, seed=s) for s in range(5)]

    print("# Vendored-PESQ calibration (round 4)\n")
    print("Anchor protocol and why these anchors: module docstring of")
    print("`scripts/pesq_calibration.py`; structural checks and known")
    print("simplifications: `docs/PESQ_VALIDATION.md`,")
    print("`tests/test_pesq.py`.\n")
    print("## Speech + white noise vs published anchor band\n")
    print("| SNR dB | ours | published mid +- band | offset |")
    print("|---|---|---|---|")
    offs = []
    for snr, (mid, half) in AWGN_ANCHORS.items():
        scores = []
        for ref in refs:
            p = np.mean(ref ** 2)
            noise = rng.standard_normal(len(ref)) * np.sqrt(
                p / 10 ** (snr / 10))
            scores.append(pesq_numpy(ref, ref + noise))
        ours = float(np.mean(scores))
        offs.append(ours - mid)
        print(f"| {snr} | {ours:.2f} | {mid:.2f} +- {half:.2f} "
              f"| {ours - mid:+.2f} |")
    print(f"\nMean offset {np.mean(offs):+.2f}, max |offset| "
          f"{np.max(np.abs(offs)):.2f} MOS.\n")

    print("## Codec-pressure ordering (calibrated psychoacoustic sim)\n")
    import jax
    import jax.numpy as jnp

    from image_in_speech_watermarking_tpu.attacks import waveform as wf

    rows = []
    for name, spec in (("aac-128k", "aac"), ("aac-64k", "aac-64k"),
                       ("mp3-128k", "mp3compress-128k"),
                       ("mp3-64k", "mp3compress-64k")):
        fn = wf.get_attack(spec)
        scores = [pesq_numpy(r, np.asarray(
            fn(jax.random.key(0), jnp.asarray(r)))) for r in refs]
        rows.append((name, float(np.mean(scores))))
        print(f"- {name}: {np.mean(scores):.2f}")
    ok64 = (rows[1][1] < rows[0][1]) and (rows[3][1] < rows[2][1])
    print(f"\n64k scores below 128k for both codecs: **{ok64}** (the "
          "matched-content bitrate ordering anchor; published P.862 "
          "behavior for MP3/AAC at 64k vs 128k).\n")

    print("## Sanity points\n")
    b, a = signal.butter(8, 3400 / 8000)
    lp = float(np.mean([pesq_numpy(r, signal.filtfilt(b, a, r))
                        for r in refs]))
    cl = float(np.mean([pesq_numpy(
        r, np.clip(r, -0.5 * np.abs(r).max(), 0.5 * np.abs(r).max()))
        for r in refs]))
    print(f"- low-pass 3.4 kHz (band-limit alone degrades little): {lp:.2f}")
    print(f"- 50% peak clipping (strong nonlinear distortion): {cl:.2f}\n")

    print("## Reading the sweep's PESQ column\n")
    print("The results.csv column keeps the reference's name "
          "(`PESQ Score`, result_extract.py:14 schema parity) but is the "
          "VENDORED raw-PESQ-style score: internally consistent across "
          "rows at ~0.1 resolution; absolute cross-paper comparisons "
          "carry the measured |offset| <= ~0.4 MOS above and need the "
          "P.862.1 MOS-LQO remap first. Markdown sweep tables label the "
          "column `PESQ (vendored)`.")


if __name__ == "__main__":
    main()
