"""Differentiable filtering primitives for the attack battery.

IIR filtering (lfilter / filtfilt) is implemented as a ``lax.scan`` over a
direct-form-II-transposed state — numerically equivalent to
scipy.signal.lfilter/filtfilt (which the reference's low-pass attack uses,
uformerWM/audio_attack.py:21-30). Filter *design* (Butterworth, lfilter_zi)
runs host-side in float64 at trace time via scipy; the coefficients are
static constants in the compiled graph, so the on-device compute is pure
JAX and fully differentiable.

Resampling is a polyphase windowed-sinc FIR (scipy.signal.resample_poly
semantics with a Kaiser window) — the shape-static, differentiable stand-in
for librosa.resample in the resampling attack (audio_attack.py:72-85).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as sp_signal


@functools.lru_cache(maxsize=8)
def butter_lowpass(order: int, wn: float) -> tuple[tuple, tuple]:
    """scipy.signal.butter(order, wn, 'lowpass') — static host design."""
    b, a = sp_signal.butter(order, wn, "lowpass")
    return tuple(b.tolist()), tuple(a.tolist())


@functools.lru_cache(maxsize=8)
def _lfilter_zi(b: tuple, a: tuple) -> np.ndarray:
    """scipy.signal.lfilter_zi — steady-state step response ICs."""
    return sp_signal.lfilter_zi(np.asarray(b), np.asarray(a))


def _normalize_ba(b, a):
    b = np.asarray(b, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b, a = b / a[0], a / a[0]
    n = max(len(b), len(a))
    return np.pad(b, (0, n - len(b))), np.pad(a, (0, n - len(a))), n


def lfilter(b, a, x: jnp.ndarray, zi: jnp.ndarray = None):
    """scipy.signal.lfilter via lax.scan (direct form II transposed).

    x: (..., L). Returns (y, zf) if zi is given else y. zi broadcasts over
    the batch dims with trailing shape (order,).
    """
    b, a, n = _normalize_ba(b, a)
    bj = jnp.asarray(b, dtype=x.dtype)
    aj = jnp.asarray(a, dtype=x.dtype)

    batch_shape = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1])
    if zi is None:
        z0 = jnp.zeros((xf.shape[0], n - 1), dtype=x.dtype)
    else:
        z0 = jnp.broadcast_to(zi, batch_shape + (n - 1,)).reshape(-1, n - 1)

    def step(z, xt):
        # DF2T: y = b0*x + z0; z_i = b_{i+1}*x + z_{i+1} - a_{i+1}*y
        yt = bj[0] * xt + z[:, 0]
        znew = bj[1:] * xt[:, None] - aj[1:] * yt[:, None]
        znew = znew + jnp.pad(z[:, 1:], ((0, 0), (0, 1)))
        return znew, yt

    zf, ys = jax.lax.scan(step, z0, xf.T)
    y = ys.T.reshape(x.shape)
    if zi is not None:
        return y, zf.reshape(batch_shape + (n - 1,))
    return y


def filtfilt(b, a, x: jnp.ndarray) -> jnp.ndarray:
    """scipy.signal.filtfilt with default odd padding
    (padlen = 3 * max(len(a), len(b)))."""
    b_t = tuple(np.asarray(b, dtype=np.float64).tolist())
    a_t = tuple(np.asarray(a, dtype=np.float64).tolist())
    padlen = 3 * max(len(b_t), len(a_t))
    left = 2 * x[..., :1] - x[..., 1:padlen + 1][..., ::-1]
    right = 2 * x[..., -1:] - x[..., -padlen - 1:-1][..., ::-1]
    ext = jnp.concatenate([left, x, right], axis=-1)

    zi = jnp.asarray(_lfilter_zi(b_t, a_t), dtype=x.dtype)
    y, _ = lfilter(b_t, a_t, ext, zi=zi * ext[..., :1])
    y = y[..., ::-1]
    y, _ = lfilter(b_t, a_t, y, zi=zi * y[..., :1])
    y = y[..., ::-1]
    return y[..., padlen:-padlen]


@functools.lru_cache(maxsize=8)
def _resample_fir(up: int, down: int) -> np.ndarray:
    """scipy.signal.resample_poly default FIR: kaiser(beta=5.0) windowed
    sinc with half-width 10*max(up, down) taps, gain ``up``."""
    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    n = 2 * half_len + 1
    t = np.arange(n) - half_len
    h = f_c * np.sinc(f_c * t) * np.kaiser(n, 5.0)
    return (h * up).astype(np.float64)


def resample_poly(x: jnp.ndarray, up: int, down: int) -> jnp.ndarray:
    """Polyphase resampling, scipy.signal.resample_poly semantics
    (output length ceil(L*up/down)), differentiable and shape-static."""
    if up == down:
        return x
    h = _resample_fir(up, down)
    L = x.shape[-1]
    out_len = -(-L * up // down)
    if up > 1:
        shape = x.shape[:-1] + (L, up)
        xz = jnp.zeros(shape, dtype=x.dtype).at[..., 0].set(x)
        xu = xz.reshape(x.shape[:-1] + (L * up,))
    else:
        xu = x
    hj = jnp.asarray(h, dtype=x.dtype)
    pad = (len(h) - 1) // 2
    xp = jnp.pad(xu, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
    flat = xp.reshape(-1, xp.shape[-1])
    y = jax.vmap(lambda s: jnp.convolve(s, hj, mode="valid"))(flat)
    y = y.reshape(xu.shape[:-1] + (y.shape[-1],))
    y = y[..., ::down]
    return y[..., :out_len]
