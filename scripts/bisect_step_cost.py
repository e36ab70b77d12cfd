"""Bisect where the train-step time goes: forward, backward, optimizer.

Chained timing (see tpu-env-quirks): thread a data dependency through
iterations, fetch one scalar at the end.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from image_in_speech_watermarking_tpu import data, models

B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
DT = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"

model = models.get_arch("Uformer_audio", compute_dtype=DT)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, 128, 128, 2)).astype(np.float32) * 0.1)
msg = jnp.asarray(data.digit_watermarks(B))

t0 = time.time()
variables = jax.jit(model.init)(jax.random.key(0), x, msg)
jax.block_until_ready(variables)
print(f"init {time.time()-t0:.1f}s", flush=True)
params = variables["params"]


def loss_fn(params, x, msg):
    out = model.apply({"params": params}, x, msg)
    audio, noise, wm_pred, wm_decode = out
    b = noise.shape[0]
    return (jnp.mean((audio - x) ** 2)
            + jnp.mean((wm_pred - msg) ** 2)
            + jnp.mean((wm_decode - msg) ** 2)
            + (jnp.linalg.norm(noise.reshape(-1)) / b - 1.0) ** 2)


def timed(name, fn, *args, iters=6, chain=None):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_t = time.time() - t0
    t0 = time.time()
    out = chain(fn, args, iters)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name}: compile {compile_t:.1f}s steady {dt*1000:.1f} ms",
          flush=True)


# 1. forward only
fwd = jax.jit(lambda p, x, msg: loss_fn(p, x, msg))


def chain_fwd(fn, args, iters):
    p, x, msg = args
    acc = 0.0
    for _ in range(iters):
        acc = acc + fn(p, x + acc * 1e-12, msg)
    return acc


timed("forward(loss)", fwd, params, x, msg, chain=chain_fwd)

# 2. grad
grad = jax.jit(jax.grad(loss_fn))


def chain_grad(fn, args, iters):
    p, x, msg = args
    acc = 0.0
    for _ in range(iters):
        g = fn(p, x + acc * 1e-12, msg)
        acc = acc + jax.tree.leaves(g)[0].reshape(-1)[0]
    return acc


timed("grad", grad, params, x, msg, chain=chain_grad)

# 3. grad + adamw update (full step, donated)
tx = optax.adamw(2e-4, weight_decay=0.02)
opt_state = tx.init(params)


@jax.jit
def step(params, opt_state, x, msg):
    g = jax.grad(loss_fn)(params, x, msg)
    updates, opt_state = tx.update(g, opt_state, params)
    return optax.apply_updates(params, updates), opt_state


t0 = time.time()
p2, o2 = step(params, opt_state, x, msg)
jax.block_until_ready(p2)
print(f"full step: compile {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for _ in range(6):
    p2, o2 = step(p2, o2, x, msg)
jax.block_until_ready(p2)
print(f"full step steady {(time.time()-t0)/6*1000:.1f} ms", flush=True)
