"""Isolate the Trainer-step slowdown: donation vs in_shardings vs rngs."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from image_in_speech_watermarking_tpu import data, models
from image_in_speech_watermarking_tpu.parallel import make_mesh

B = 24
model = models.get_arch("Uformer_audio", compute_dtype="bfloat16")
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, 128, 128, 2)).astype(np.float32) * 0.1)
msg = jnp.asarray(data.digit_watermarks(B))
variables = jax.jit(model.init)(jax.random.key(0), x, msg)
params = variables["params"]
print("init done", flush=True)


def loss_fn(params, x, msg, rngs=None):
    kw = {} if rngs is None else dict(deterministic=False, rngs=rngs)
    out = model.apply({"params": params}, x, msg, **kw)
    audio, noise, wm_pred, wm_decode = out
    b = noise.shape[0]
    return (jnp.mean((audio - x) ** 2) + jnp.mean((wm_pred - msg) ** 2)
            + jnp.mean((wm_decode - msg) ** 2)
            + (jnp.linalg.norm(noise.reshape(-1)) / b - 1.0) ** 2)


tx = optax.adamw(2e-4, weight_decay=0.02)


def run(tag, jit_kwargs, with_rngs=False):
    def step(carry, x, msg, key):
        params, opt_state = carry
        rngs = None
        if with_rngs:
            k1, k2 = jax.random.split(key)
            rngs = {"droppath": k1, "attack": k2}
        g = jax.grad(loss_fn)(params, x, msg, rngs)
        updates, opt_state = tx.update(g, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state)

    fn = jax.jit(step, **jit_kwargs)
    carry = (params, tx.init(params))
    t0 = time.time()
    carry = fn(carry, x, msg, jax.random.key(0))
    jax.block_until_ready(carry)
    ct = time.time() - t0
    t0 = time.time()
    for i in range(6):
        carry = fn(carry, x, msg, jax.random.key(i))
    jax.block_until_ready(carry)
    print(f"{tag}: compile {ct:.1f}s steady {(time.time()-t0)/6*1000:.1f} ms",
          flush=True)


mesh = make_mesh((1,), ("data",))
dshard = NamedSharding(mesh, P("data"))
noshard = NamedSharding(mesh, P())

run("plain", {})
run("donate", dict(donate_argnums=(0,)))
run("shardings", dict(in_shardings=((None, None), dshard, dshard, None)))
run("donate+shardings", dict(donate_argnums=(0,),
                             in_shardings=((None, None), dshard, dshard,
                                           None)))
run("donate+shardings+rngs", dict(donate_argnums=(0,),
                                  in_shardings=((None, None), dshard,
                                                dshard, None)),
    with_rngs=True)
