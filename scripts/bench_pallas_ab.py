"""A/B the whole-block fused Pallas kernels against stock XLA on the
real chip: full flagship forward (embed + channel sim + extract), batch
32, bf16 and f32. Run when the chip is free (training stopped)."""

import sys
sys.path.insert(0, "/root/repo")

import dataclasses  # noqa: E402
import time  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BATCH = 32


def bench_one(dtype: str, fused: bool, iters: int = 20) -> float:
    from image_in_speech_watermarking_tpu import models

    base = models.get_arch("Uformer_audio")
    model = models.UformerAudio(dataclasses.replace(
        base.cfg, compute_dtype=dtype, use_pallas_block=fused))
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
        return audio, wm, jnp.sum(audio) + jnp.sum(wm)

    out = fwd(params, x, msg)
    check = float(out[2])
    t0 = time.perf_counter()
    cur = x
    for _ in range(iters):
        audio, wm, s = fwd(params, cur, msg)
        cur = audio
    _ = float(s)
    dt = (time.perf_counter() - t0) / iters
    print(f"dtype={dtype} fused={fused}: {dt*1000:.1f} ms/iter "
          f"(checksum {check:.4f})", flush=True)
    return dt


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    results = {}
    combos = [("bfloat16", False), ("bfloat16", True),
              ("float32", False), ("float32", True)]
    if which == "bf16":
        combos = [("bfloat16", False), ("bfloat16", True)]
    for dt, fused in combos:
        try:
            results[(dt, fused)] = bench_one(dt, fused)
        except Exception as e:  # noqa: BLE001 — a Mosaic compile reject
            # IS the A/B result for that combo: the fused kernel loses
            # by not compiling on this chip generation. Record it and
            # keep the queue alive (the 2026-08-18 run died here on
            # "infer-vector-layout: unsupported shape cast").
            msg = str(e).splitlines()[0][:160]
            print(f"dtype={dt} fused={fused}: FAILED TO COMPILE — {msg}",
                  flush=True)
            results[(dt, fused)] = None
    for dt in ("bfloat16", "float32"):
        a, b = results.get((dt, False)), results.get((dt, True))
        if a and b:
            print(f"{dt}: fused speedup = {a / b:.2f}x")
        elif a and (dt, True) in results:
            print(f"{dt}: fused kernel does not compile on this chip — "
                  f"XLA path wins by default ({a*1000:.1f} ms/iter)")
