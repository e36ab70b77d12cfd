"""Vendored-PESQ operating-point table (docs/PESQ_VALIDATION.md).

Measures eval/pesq.py on standard degradations: AWGN at exact SNRs,
telephone-band low-pass, peak clipping.

Run: JAX_PLATFORMS=cpu PYTHONPATH=. python scripts/validate_pesq.py
"""

import numpy as np
from scipy import signal

from image_in_speech_watermarking_tpu import data
from image_in_speech_watermarking_tpu.eval.pesq import pesq_numpy


def main():
    rng = np.random.default_rng(0)
    refs = [data.synthetic_speech(32000, seed=s) for s in range(3)]

    for snr in (40, 30, 20, 15, 10, 5, 0):
        scores = []
        for ref in refs:
            p = np.mean(ref ** 2)
            noise = rng.standard_normal(len(ref)) * np.sqrt(
                p / 10 ** (snr / 10))
            scores.append(pesq_numpy(ref, ref + noise))
        print(f"awgn {snr:>2} dB: PESQ {np.mean(scores):.2f} "
              f"+/- {np.std(scores):.2f}")

    b, a = signal.butter(8, 3400 / 8000)
    lp = [pesq_numpy(r, signal.filtfilt(b, a, r)) for r in refs]
    print(f"low-pass 3.4 kHz: PESQ {np.mean(lp):.2f}")

    cl = [pesq_numpy(r, np.clip(r, -0.5 * np.abs(r).max(),
                                0.5 * np.abs(r).max())) for r in refs]
    print(f"50% peak clipping: PESQ {np.mean(cl):.2f}")


if __name__ == "__main__":
    main()
