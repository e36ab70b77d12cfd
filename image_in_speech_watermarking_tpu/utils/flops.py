"""FLOPs / parameter / memory-traffic accounting.

Parity target: the reference annotates every Uformer module with a
hand-written .flops() method (uformerWM/model.py:78-87,556-575,2784-2805)
and prints ptflops complexity (model.py:2979-2985, commented). Here the
numbers come from the compiler instead: XLA's cost analysis on the lowered
program gives exact flop/byte counts for the fused computation actually
executed, which is what a roofline argument needs.

    >>> from image_in_speech_watermarking_tpu.utils import flops
    >>> prof = flops.profile_fn(jax.jit(fn), *args)
    >>> prof["flops"], prof["bytes_accessed"], prof["arithmetic_intensity"]

    >>> flops.param_count(variables["params"])      # 68_668_420
    >>> flops.param_table(variables["params"])      # per top-level module

A committed profile for the flagship lives in docs/PROFILE.md (see
scripts/profile_flagship.py).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import numpy as np


def param_count(params: Any) -> int:
    """Total parameter count of a params pytree."""
    return sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(params))


def param_table(params: Any, depth: int = 1) -> dict[str, int]:
    """Parameter counts grouped by the first ``depth`` path components
    (the reference's per-module accounting, model.py:2784-2805)."""
    out: dict[str, int] = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = [str(getattr(k, "key", k)) for k in path]
        group = "/".join(keys[:depth])
        out[group] = out.get(group, 0) + int(np.prod(np.shape(leaf)))
    return dict(sorted(out.items(), key=lambda kv: -kv[1]))


def profile_fn(fn: Callable, *args, static_argnums=(),
               **kwargs) -> dict[str, float]:
    """Compile ``fn`` for ``args`` and return XLA's cost analysis:
    flops, bytes_accessed, arithmetic intensity, plus a time estimate at
    the given peak numbers (defaults: TPU v5e ~197 TF/s bf16, 819 GB/s)."""
    jitted = fn if hasattr(fn, "lower") else jax.jit(
        fn, static_argnums=static_argnums)
    compiled = jitted.lower(*args, **kwargs).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns [dict]
        costs = costs[0]
    fl = float(costs.get("flops", 0.0))
    by = float(costs.get("bytes accessed", 0.0))
    return {
        "flops": fl,
        "bytes_accessed": by,
        "arithmetic_intensity": fl / by if by else float("inf"),
        "utilization_bound": "memory" if by and fl / by < 240 else "compute",
    }


def roofline_ms(prof: dict, peak_tflops: float = 197.0,
                peak_gbps: float = 819.0) -> dict[str, float]:
    """Lower-bound execution time from a profile_fn result on a chip with
    the given peaks (defaults: TPU v5e bf16)."""
    t_compute = prof["flops"] / (peak_tflops * 1e12) * 1e3
    t_memory = prof["bytes_accessed"] / (peak_gbps * 1e9) * 1e3
    return {"compute_ms": t_compute, "memory_ms": t_memory,
            "roofline_ms": max(t_compute, t_memory)}
