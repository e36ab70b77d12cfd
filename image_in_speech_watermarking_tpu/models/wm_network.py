"""WMNetCNN baseline family + spectral loss.

The reference imports these from ``wm_network*.py`` modules that are
ABSENT from its snapshot (SURVEY §0: selected by
``--arch WMNetCNN|WMNetCNNTF|WMNetCNNAudio``,
uformerWM/utils/model_utils.py:88-95; ``spectral_loss`` imported at
audio_uformer_stft.py:32, its use commented out at :464). These are
documented reconstructions from the call contracts: all three share
ModelA's calling convention (``forward(stft/wave, watermark) ->
(encoded, extracted)``, dispatched like modelA at audio_test.py:552-555),
differing by input domain:

  WMNetCNN       2-ch STFT clips (128x128), deeper conv stack than ModelA
  WMNetCNNTF     time-frequency magnitude+phase split processing
  WMNetCNNAudio  1-ch time-domain 128x128 clips (hidden-style covers)
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from image_in_speech_watermarking_tpu.dsp.stft import stft_ri


def spectral_loss(target_wave: jnp.ndarray, pred_wave: jnp.ndarray,
                  n_fft: int = 255) -> jnp.ndarray:
    """Multi-scale magnitude-STFT MSE (the absent wm_network.spectral_loss;
    standard spectral reconstruction loss)."""
    loss = 0.0
    for nf in (n_fft, 511):
        st = stft_ri(target_wave, nf)
        sp = stft_ri(pred_wave, nf)
        mag_t = jnp.sqrt(st[..., 0] ** 2 + st[..., 1] ** 2 + 1e-9)
        mag_p = jnp.sqrt(sp[..., 0] ** 2 + sp[..., 1] ** 2 + 1e-9)
        loss = loss + jnp.mean((mag_t - mag_p) ** 2)
    return loss / 2.0


class _WMNetBase(nn.Module):
    """Conv embedder (down 4x, concat wm, up 4x) + conv detector."""

    in_chans: int = 2
    width: int = 32

    def setup(self):
        w = self.width
        self.enc1 = nn.Conv(w, (3, 3), padding=1, name="enc1")
        self.enc2 = nn.Conv(2 * w, (3, 3), padding=1, name="enc2")
        self.enc3 = nn.Conv(2 * w, (3, 3), padding=1, name="enc3")
        self.dec1 = nn.ConvTranspose(w, (2, 2), strides=(2, 2),
                                     name="dec1")
        self.dec2 = nn.ConvTranspose(self.in_chans, (2, 2), strides=(2, 2),
                                     name="dec2")
        self.det1 = nn.Conv(w, (3, 3), padding=1, name="det1")
        self.det2 = nn.Conv(2 * w, (3, 3), padding=1, name="det2")
        self.det3 = nn.Conv(1, (3, 3), padding=1, name="det3")

    def encode(self, x: jnp.ndarray, watermark: jnp.ndarray) -> jnp.ndarray:
        y = nn.leaky_relu(self.enc1(x), 0.2)
        y = nn.max_pool(y, (2, 2), strides=(2, 2))
        y = nn.leaky_relu(self.enc2(y), 0.2)
        y = nn.max_pool(y, (2, 2), strides=(2, 2))     # (B, 32, 32, 2w)
        y = nn.leaky_relu(self.enc3(y), 0.2)
        y = jnp.concatenate([y, watermark], axis=-1)
        y = nn.relu(self.dec1(y))
        residual = self.dec2(y)                        # (B, 128, 128, C)
        return x + residual

    def decode(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.leaky_relu(self.det1(x), 0.2)
        y = nn.max_pool(y, (2, 2), strides=(2, 2))
        y = nn.leaky_relu(self.det2(y), 0.2)
        y = nn.max_pool(y, (2, 2), strides=(2, 2))
        return nn.relu(self.det3(y))                   # (B, 32, 32, 1)

    def __call__(self, x: jnp.ndarray, watermark: jnp.ndarray):
        encoded = self.encode(x, watermark)
        return encoded, self.decode(encoded)


class WMNetCNN(_WMNetBase):
    """2-ch STFT-clip watermarker (``--arch WMNetCNN``)."""

    in_chans: int = 2


class WMNetCNNAudio(_WMNetBase):
    """1-ch time-domain-clip watermarker (``--arch WMNetCNNAudio``)."""

    in_chans: int = 1


class WMNetCNNTF(nn.Module):
    """Magnitude/phase-split variant (``--arch WMNetCNNTF``): embeds into
    the magnitude channel only, preserving phase."""

    width: int = 32

    def setup(self):
        self.core = _WMNetBase(in_chans=1, width=self.width, name="core")

    def _split(self, stft_clip):
        re, im = stft_clip[..., 0:1], stft_clip[..., 1:2]
        mag = jnp.sqrt(re ** 2 + im ** 2 + 1e-9)
        return mag, re / mag, im / mag

    def encode(self, stft_clip, watermark):
        mag, cos, sin = self._split(stft_clip)
        mag_wm = self.core.encode(mag, watermark)
        return jnp.concatenate([mag_wm * cos, mag_wm * sin], axis=-1)

    def decode(self, stft_clip):
        mag, _, _ = self._split(stft_clip)
        return self.core.decode(mag)

    def __call__(self, stft_clip, watermark):
        encoded = self.encode(stft_clip, watermark)
        return encoded, self.decode(encoded)
