"""Round-4 vocoder decomposition on the magnitude-channel flagship.

Per-clip decode MSE of one embedded test utterance under:
  identity              — baseline
  per-clip roundtrip    — the training branch (vocoder_roundtrip-0.9)
  whole-wave roundtrip  — the eval path after resync's global unstretch
  heavy 2048-grid phase scramble — candidate surrogate for the
                          whole-wave accumulated decoherence

Round-3 ran this with the real/imag extractor (docs/round3_demo/README
"stage-C/D decomposition"); this rerun asks whether the |STFT| payload
channel closed the train<->eval gap, and if not, where the magnitude
damage comes from.

Run: python scripts/r4_vocoder_decomp.py [ckpt_dir]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from image_in_speech_watermarking_tpu import data, models
from image_in_speech_watermarking_tpu.attacks import waveform as wf
from image_in_speech_watermarking_tpu.eval import pipeline as P
from image_in_speech_watermarking_tpu.train import checkpoint


def main(ckpt="results/flagship_r4_mag/model"):
    model = models.get_arch("Uformer_audio", extractor_mag=True)
    restored = checkpoint.restore(ckpt)
    variables = {"params": restored["params"]}
    msg = jnp.asarray(data.digit_watermarks(1))
    waves = data.load_corpus("synthetic", 1, split="test")
    ds = data.SpeechDataset(waves, kind="eval")
    wave, clips, tail = ds.utterance(0)
    L = len(np.asarray(wave).reshape(-1))

    r = P.reconstruct_audio(wave, clips, tail, msg, model, variables,
                            attack="closed_loop")
    recon = np.asarray(r.recon_audio)
    msg_np = np.asarray(msg)

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
              f"clips {[round(p, 3) for p in per]}")

    profile("identity", recon)

    # per-clip roundtrip (training branch): independent 8064 blocks
    blk = 8064
    cl = [recon[i:i + blk] for i in range(0, len(recon), blk)]
    with jax.default_device(jax.devices("cpu")[0]):
        rt = [np.asarray(wf.vocoder_roundtrip(jax.random.key(0),
                                              jnp.asarray(c), 0.9))
              if len(c) == blk else c for c in cl]
    profile("per-clip roundtrip 0.9", np.concatenate(rt)[:L])

    # whole-wave roundtrip (eval path after global unstretch)
    with jax.default_device(jax.devices("cpu")[0]):
        st = np.asarray(wf.time_stretch_wave(jnp.asarray(recon), 0.9))
        back = np.asarray(wf.time_stretch_wave(jnp.asarray(st),
                                               len(st) / float(L)))
    back = np.pad(back[:L], (0, max(0, L - len(back))))
    profile("whole-wave roundtrip 0.9", back)

    # heavy phase scramble on the 2048 grid (candidate surrogate):
    # unbounded random-walk phase rotation per bin along frames
    with jax.default_device(jax.devices("cpu")[0]):
        from image_in_speech_watermarking_tpu.dsp.stft import istft, stft
        w2 = wf._hann(2048)
        spec = stft(jnp.asarray(recon), 2048, hop_length=512, window=w2,
                    method="fft")
        rng = np.random.default_rng(0)
        steps = rng.normal(size=spec.shape) * 0.8
        theta = np.cumsum(steps, axis=-1)
        out = istft(jnp.asarray(spec) * jnp.exp(1j * theta), 2048,
                    hop_length=512, window=w2, length=L, method="fft")
    profile("phase walk 2048 (0.8/step)", np.asarray(out))


if __name__ == "__main__":
    main(*sys.argv[1:])
