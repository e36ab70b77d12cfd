"""Single-level discrete wavelet transform (coif1), pure JAX.

Parity target: the reference's DWT feature mode —
``np.vstack(pywt.dwt(soundwave, 'coif1'))`` (hidden/audio_test.py:150-152,
uformerWM/audio_test.py:685-700) and ``pywt.idwt(cA, cD, 'coif1',
'smooth')`` reconstruction. pywt is not in this environment, so the
filters and the symmetric-padding convolution are implemented directly
(coefficients from the standard Coiflet-1 construction, identical to
pywt.Wavelet('coif1')).
"""

from __future__ import annotations



import jax.numpy as jnp
import numpy as np

# Coiflet-1 decomposition lowpass (6 taps), the standard published
# constants (equals pywt.Wavelet('coif1').dec_lo; unit l2 norm,
# perfect-reconstruction verified in tests)
_DEC_LO = np.array([
    -0.01565572813546454,
    -0.0727326195128539,
    0.38486484686420286,
    0.8525720202122554,
    0.3378976624578092,
    -0.0727326195128539,
])
# QMF relation: hi[n] = (-1)^n lo[L-1-n]
_DEC_HI = np.array([(-1.0) ** n * _DEC_LO[len(_DEC_LO) - 1 - n]
                    for n in range(len(_DEC_LO))])
# Reconstruction filters are the time-reversed decomposition pair
_REC_LO = _DEC_LO[::-1].copy()
_REC_HI = _DEC_HI[::-1].copy()


def _sym_pad(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """pywt 'symmetric' (half-sample) edge extension."""
    left = x[..., :n][..., ::-1]
    right = x[..., -n:][..., ::-1]
    return jnp.concatenate([left, x, right], axis=-1)


def dwt(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-level coif1 DWT with pywt 'symmetric' mode.

    x: (..., L). Returns (cA, cD) each of length floor((L + 5) / 2).
    """
    L = x.shape[-1]
    flen = len(_DEC_LO)
    xp = _sym_pad(x, flen - 1)
    lo = jnp.asarray(_DEC_LO, dtype=x.dtype)
    hi = jnp.asarray(_DEC_HI, dtype=x.dtype)

    def corr(sig, f):
        # full convolution with the reversed filter == correlation
        n_out = sig.shape[-1] - flen + 1
        idx = np.arange(n_out)[:, None] + np.arange(flen)[None, :]
        return (sig[..., idx] * f[::-1]).sum(-1)

    full_lo = corr(xp, lo)
    full_hi = corr(xp, hi)
    # pywt keeps every second sample starting at index 1 of the valid
    # part of the 'full' convolution over the padded signal
    start = 1
    out_len = (L + flen - 1) // 2
    ca = full_lo[..., start::2][..., :out_len]
    cd = full_hi[..., start::2][..., :out_len]
    return ca, cd


def idwt(ca: jnp.ndarray, cd: jnp.ndarray,
         out_len: int | None = None) -> jnp.ndarray:
    """Inverse single-level coif1 DWT (perfect reconstruction)."""
    flen = len(_REC_LO)
    n = ca.shape[-1]

    def upsample(c):
        shape = c.shape[:-1] + (2 * n,)
        u = jnp.zeros(shape, dtype=c.dtype)
        return u.at[..., ::2].set(c)

    lo = jnp.asarray(_REC_LO, dtype=ca.dtype)
    hi = jnp.asarray(_REC_HI, dtype=ca.dtype)

    def conv_full(sig, f):
        pad = flen - 1
        sp = jnp.pad(sig, [(0, 0)] * (sig.ndim - 1) + [(pad, pad)])
        n_out = sp.shape[-1] - flen + 1
        idx = np.arange(n_out)[:, None] + np.arange(flen)[None, :]
        return (sp[..., idx] * f[::-1]).sum(-1)

    rec = conv_full(upsample(ca), lo) + conv_full(upsample(cd), hi)
    # trim the filter transients (pywt idwt trims flen-2 per side)
    rec = rec[..., flen - 2: rec.shape[-1] - (flen - 2)]
    if out_len is not None:
        rec = rec[..., :out_len]
    return rec
