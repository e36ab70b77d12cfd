"""Device mesh + sharding utilities.

The reference has no working distribution (SURVEY §2.4: DataParallel
commented out, dead DDP flags). The TPU-native story is JAX sharding:

  * ``data`` axis — batch sharding (the reference-faithful strategy: per
    batch gradient psum is the complete communication need).
  * ``model`` axis — FSDP-style parameter sharding: each parameter's
    largest divisible axis is sharded over ``model``; XLA inserts
    all-gathers for use and reduce-scatters for grads over ICI.

Everything rides jit + NamedSharding; collectives are compiler-inserted.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Sequence[int] = (-1,),
              axes: Sequence[str] = ("data",),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a Mesh; a -1 dim absorbs the remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = len(devices) // known
    n = int(np.prod(shape))
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_param_specs(params, mesh: Mesh, axis: str = "model",
                     min_size: int = 2 ** 14):
    """PartitionSpec tree: shard each large parameter's largest
    ``axis``-divisible dimension; small params stay replicated."""
    if axis not in mesh.axis_names:
        return jax.tree.map(lambda _: P(), params)
    n = mesh.shape[axis]

    def spec(p):
        if p.ndim == 0 or p.size < min_size:
            return P()
        dims = sorted(range(p.ndim), key=lambda d: -p.shape[d])
        for d in dims:
            if p.shape[d] % n == 0:
                parts = [None] * p.ndim
                parts[d] = axis
                return P(*parts)
        return P()

    return jax.tree.map(spec, params)


def shard_params(params, mesh: Mesh, axis: str = "model",
                 min_size: int = 2 ** 14):
    """Place a param tree according to fsdp_param_specs."""
    specs = fsdp_param_specs(params, mesh, axis, min_size)
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params,
        specs)
