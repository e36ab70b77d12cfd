"""Headline benchmark: batched embed+extract throughput on the flagship
production UformerAudio, real TPU chip.

Metric: audio-seconds processed per wall-clock second (x realtime) for the
full watermark pipeline forward (embed incl. in-graph ISTFT->STFT channel
sim + extract). Headline is the bf16 compute policy (f32 LayerNorm/softmax
/DFT); an f32-everywhere operating point is reported alongside, plus the
bf16-vs-f32 decode agreement (fraction of thresholded payload bits that
match — the numerical-fidelity check for running inference in bf16).
Baseline (BASELINE.md north star): 100x realtime per chip. Prints ONE
JSON line.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCHES = (32, 64, 128, 256)   # throughput operating points; best wins
CLIP_SECONDS = 128 * 63 / 16000.0   # one 128-frame n_fft=255 clip
BASELINE_X_REALTIME = 100.0


def _bench_batch(model, batch: int) -> float:
    """Per-iteration forward wall time (s) at ``batch``."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (batch, 128, 128, 2)).astype(np.float32) * 0.1)
    msg = jnp.asarray(rng.uniform(size=(batch, 32, 32, 1)).astype(
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

    # timed two ways:
    #  - chained: each iteration consumes the previous output, so async
    #    dispatch cannot overlap anything — a per-batch LATENCY bound.
    #  - pipelined: independent batches enqueued back-to-back, one sync
    #    at the end — the serving THROUGHPUT number. Through the remote
    #    tunnel each chained step pays a full host->device dispatch RTT
    #    that a bulk watermarker would overlap; the pipelined form lets
    #    the device run back-to-back like a real serving queue.
    iters = 20
    t0 = time.perf_counter()
    cur = x
    for _ in range(iters):
        audio, wm, s = fwd(params, cur, msg)
        cur = audio  # dependency chain
    _ = float(s)     # host sync on the last step's checksum
    chained = (time.perf_counter() - t0) / iters

    t0 = time.perf_counter()
    outs = [fwd(params, x, msg)[2] for _ in range(iters)]
    _ = [float(s) for s in outs]
    pipelined = (time.perf_counter() - t0) / iters
    return chained, pipelined


def main():
    import dataclasses

    from image_in_speech_watermarking_tpu import models

    # bf16 compute policy (f32 LayerNorm/softmax/output): measured best on
    # v5e — XLA bf16 111 ms vs f32 140 ms vs pallas-attention 121-137 ms
    # at batch 32; decode-head max deviation vs f32 is ~0.2% of range.
    base = models.get_arch("Uformer_audio")
    model = models.UformerAudio(
        dataclasses.replace(base.cfg, compute_dtype="bfloat16"))
    model_f32 = models.UformerAudio(
        dataclasses.replace(base.cfg, compute_dtype="float32"))

    # Batch is a free serving knob for an offline/bulk watermarker; the
    # headline is the best-throughput operating point over BATCHES.
    best = None
    best_chained = None
    per_batch = {}
    for batch in BATCHES:
        dt_c, dt_p = _bench_batch(model, batch)
        per_batch[f"fwd_ms_b{batch}"] = round(dt_c * 1e3, 1)
        per_batch[f"fwd_ms_b{batch}_pipelined"] = round(dt_p * 1e3, 1)
        x_rt = batch * CLIP_SECONDS / dt_p
        x_rt_c = batch * CLIP_SECONDS / dt_c
        if best is None or x_rt > best[1]:
            best = (batch, x_rt)
        if best_chained is None or x_rt_c > best_chained[1]:
            best_chained = (batch, x_rt_c)
    per_batch["x_realtime_chained"] = round(best_chained[1], 1)
    # f32-everywhere operating point at the bf16 winner's batch, plus the
    # numerical check: same weights/inputs under both policies, fraction
    # of thresholded payload bits agreeing and max decode deviation
    dt32_c, dt32_p = _bench_batch(model_f32, best[0])
    per_batch["x_realtime_f32"] = round(best[0] * CLIP_SECONDS / dt32_p, 1)
    per_batch.update(_bf16_fidelity(model, model_f32, best[0]))

    extra = _train_step_metrics()
    print(json.dumps({
        "metric": "embed_extract_throughput",
        "value": round(best[1], 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(best[1] / BASELINE_X_REALTIME, 2),
        "best_batch": best[0],
        **per_batch,
        **extra,
    }))


def _load_flagship() -> tuple:
    """(variables, cfg) of the trained flagship from the git-tracked
    artifact, or (None, None). VERDICT r4 weak #5: fidelity measured on
    random-init weights decodes near the 0.5 threshold and is not the
    operational number — measure on the shipped checkpoint."""
    import os

    path = "artifacts/flagship_r4_pw2.npz"
    if not os.path.exists(path):
        return None, None
    with open(path + ".cfg.json") as f:
        cfg = json.load(f)
    flat = np.load(path)
    tree: dict = {}
    for k in flat.files:
        parts = k.split("/")
        cur = tree
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = np.asarray(flat[k])
    tree.pop("epoch", None)
    return tree, cfg


def _bf16_fidelity(model_bf16, model_f32, batch: int) -> dict:
    """Same params + inputs under both compute policies: BER delta
    (fraction of thresholded payload bits that DISAGREE between bf16 and
    f32 decodes) and max decode deviation. The param trees are dtype-
    independent (policy casts at apply time), so f32 params serve both.
    Uses the trained flagship checkpoint when the artifact is present
    (random init only as fallback)."""
    import dataclasses

    from image_in_speech_watermarking_tpu import models
    from image_in_speech_watermarking_tpu.config import UformerConfig

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(
        (batch, 128, 128, 2)).astype(np.float32) * 0.1)
    msg = jnp.asarray(rng.uniform(size=(batch, 32, 32, 1)).astype(
        np.float32))
    params, ck_cfg = _load_flagship()
    trained = params is not None
    if trained:
        cfg = UformerConfig(**{**ck_cfg, "compute_dtype": "bfloat16"})
        model_bf16 = models.UformerAudio(cfg)
        model_f32 = models.UformerAudio(
            dataclasses.replace(cfg, compute_dtype="float32"))
    else:
        params = jax.jit(model_f32.init)(jax.random.key(0), x, msg)
    wm16 = np.asarray(jax.jit(
        lambda p, a, m: model_bf16.apply(p, a, m)[3])(params, x, msg))
    wm32 = np.asarray(jax.jit(
        lambda p, a, m: model_f32.apply(p, a, m)[3])(params, x, msg))
    bits16 = np.round(np.clip(wm16, 0, 1))
    bits32 = np.round(np.clip(wm32, 0, 1))
    return {
        "bf16_vs_f32_bit_disagree": round(
            float(np.mean(np.abs(bits16 - bits32))), 6),
        "bf16_vs_f32_max_dev": round(
            float(np.abs(wm16 - wm32).max()), 6),
        "bf16_fidelity_weights": "trained" if trained else "random_init",
    }


def _train_step_metrics() -> dict:
    """Flagship train-step wall time + MFU (ROADMAP #8): flops from
    XLA cost analysis of the actual lowered step (remat recompute
    included — executed flops, which is what MFU means), peak 197
    TFLOP/s bf16 (TPU v5e)."""
    import dataclasses

    from image_in_speech_watermarking_tpu import data, models
    from image_in_speech_watermarking_tpu.config import TrainConfig
    from image_in_speech_watermarking_tpu.train import Trainer
    from image_in_speech_watermarking_tpu.utils import flops as F

    try:
        batch_size = 16
        cfg = TrainConfig(arch="Uformer_audio", batch_size=batch_size,
                          dtype="bfloat16", remat=True,
                          mesh_shape=(-1,), mesh_axes=("data",))
        model = models.get_arch("Uformer_audio",
                                compute_dtype="bfloat16", use_remat=True)
        trainer = Trainer(model, cfg, steps_per_epoch=100)
        rng = np.random.default_rng(1)
        batch = jnp.asarray(rng.standard_normal(
            (batch_size, 128, 128, 2)).astype(np.float32) * 0.1)
        msg = jnp.asarray(rng.uniform(
            size=(batch_size, 32, 32, 1)).astype(np.float32))
        state = trainer.init_state(batch, msg)
        key = jax.random.key(0)
        state, m = trainer.train_step(state, batch, msg, key)  # compile
        jax.block_until_ready(m)
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = trainer.train_step(state, batch, msg, key)
        jax.block_until_ready(m)
        step_ms = (time.perf_counter() - t0) / iters * 1e3
        if trainer._step_fn is None:            # pragma: no cover
            return {"train_step_ms": round(step_ms, 1)}
        prof = F.profile_fn(trainer._step_fn, state, batch, msg, key)
        mfu = prof["flops"] / (step_ms * 1e-3) / 197e12
        roof = F.roofline_ms(prof)
        return {"train_step_ms": round(step_ms, 1),
                "train_step_tflops": round(prof["flops"] / 1e12, 2),
                "train_mfu_bf16": round(mfu, 3),
                # HBM roofline of the lowered step (VERDICT r3 #6 /
                # r4 weak #4): memory_ms now comes from the HLO-level
                # traffic estimate (utils/flops.hbm_traffic — top-level
                # buffer reads+writes only), NOT cost-analysis
                # bytes_accessed, which counts fusion-internal operands
                # and claimed an impossible 228.6 ms "lower bound" on a
                # 153.1 ms step in BENCH_r04. The raw XLA number is kept
                # alongside for comparison. If step_ms >> both bounds the
                # gap is issue/shape inefficiency (small window-attention
                # matmuls), not a fundamental bound.
                "train_step_bytes_xla_gb": round(
                    prof["bytes_accessed"] / 1e9, 2),
                "train_step_hbm_gb": round(
                    prof.get("hbm_bytes", 0.0) / 1e9, 2),
                "train_roofline_compute_ms": round(roof["compute_ms"], 1),
                "train_roofline_memory_ms": round(roof["memory_ms"], 1)}
    except Exception as e:                      # pragma: no cover
        return {"train_step_error": f"{type(e).__name__}: {e}"[:200]}


if __name__ == "__main__":
    main()
