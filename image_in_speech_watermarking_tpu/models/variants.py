"""Earlier / auxiliary UformerAudio research variants.

Parity targets (uformerWM/model.py):
  UformerAudioV2   model.py:1807-2050  — wm features fused with the audio
      bottleneck, extractor reads y + unit-variance randn (in-graph attack
      sim at model.py:1987). NOTE: the reference's ConvAutoencoder_2
      fusion path is broken as written (torch.cat called with two
      positional tensors at model.py:1676 and a self-naming bug at
      model.py:1647); the working interpretation implemented here is the
      documented intent: pool the audio bottleneck feature to the wm
      feature grid, concat on channels, 1x1-ish conv back to 4 channels.
  UformerAudioV4   model.py:2052-2213  — like V2 without the noise
      residual; returns a 3-tuple (y, wm_pred, wm).
  UformerAudioMod  model.py:2809-2967  — production-like forward with
      DiscriminatorMark/DiscriminatorCover attached (never trained in the
      reference's surviving code); 3-tuple return.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_in_speech_watermarking_tpu.config import UformerConfig
from image_in_speech_watermarking_tpu.models.layers import (InputProj,
                                                            OutputProj)
from image_in_speech_watermarking_tpu.models.uformer import (
    ConvAutoencoder, DiscriminatorCover, DiscriminatorMark,
    EncoderTransformerWM, UformerDecoder, UformerEncoder)


class ConvAutoencoder2(nn.Module):
    """ConvAutoencoder with an audio-feature fusion stage
    (model.py:1645-1693, de-bugged as documented above)."""

    in_chans: int = 1

    def setup(self):
        self.codec = ConvAutoencoder(in_chans=self.in_chans, name="codec")
        self.conv3 = nn.Conv(4, (3, 3), padding=1, name="conv3")

    def encode(self, x):
        return self.codec.encode(x)

    def decode(self, f):
        return self.codec.decode(f)

    def fusion(self, wm_feature: jnp.ndarray,
               audio_feature: jnp.ndarray) -> jnp.ndarray:
        """Pool the (B, L, C) bottleneck tokens onto the (B, 8, 8, ·) wm
        feature grid and fuse by concat + conv."""
        b, l, c = audio_feature.shape
        side = int(l ** 0.5)
        grid = audio_feature.reshape(b, side, side, c)
        pooled = jax.image.resize(grid, (b, 8, 8, c), method="linear")
        pooled = pooled.mean(axis=-1, keepdims=True)
        fused = jnp.concatenate(
            [wm_feature, jnp.broadcast_to(pooled, wm_feature.shape)],
            axis=-1)
        return self.conv3(fused)

    def __call__(self, x, audio_feature=None):
        f = self.encode(x)
        if audio_feature is not None:
            f = self.fusion(f, audio_feature)
        return f, self.decode(f)


class _VariantBase(nn.Module):
    cfg: UformerConfig = UformerConfig()

    def setup(self):
        cfg = self.cfg
        self.input_proj = InputProj(cfg.embed_dim, name="input_proj")
        self.output_proj = OutputProj(cfg.in_chans, name="output_proj")
        self.encoder = UformerEncoder(cfg, name="encoder")
        self.decoder = UformerDecoder(cfg, bottleneck_mult=32,
                                      name="decoder")
        self.decoder_wm = EncoderTransformerWM(cfg, name="decoder_wm")
        self._setup_codec()

    def _wm_tokens(self, feature_wm):
        b = feature_wm.shape[0]
        l4 = (self.cfg.img_size // 16) ** 2
        c16 = 16 * self.cfg.embed_dim
        f = feature_wm.transpose(0, 3, 1, 2).reshape(b, 4, 64)
        return jnp.tile(f, (1, l4 // 4, c16 // 64))

    def _embed(self, x, feature_wm, deterministic):
        tokens = self.input_proj(x)
        convs = self.encoder(tokens, deterministic)
        concat = jnp.concatenate(
            [self._wm_tokens(feature_wm), convs[-1]], axis=2)
        deconv3 = self.decoder(convs[:4] + (concat,), deterministic)
        return self.output_proj(deconv3, self.cfg.img_size,
                                self.cfg.img_size), convs[-1]


class UformerAudioV2(_VariantBase):
    """model.py:1807-2050: noise-residual output; extractor reads
    y + randn (the in-forward attack simulation)."""

    def _setup_codec(self):
        self.encoder_wm = ConvAutoencoder2(in_chans=1, name="encoder_wm")

    def __call__(self, x, message, deterministic: bool = True,
                 noise_rng=None):
        tokens = self.input_proj(x)
        convs = self.encoder(tokens, deterministic)
        feature_wm, wm_pred = self.encoder_wm(message, convs[-1])
        concat = jnp.concatenate(
            [self._wm_tokens(feature_wm), convs[-1]], axis=2)
        deconv3 = self.decoder(convs[:4] + (concat,), deterministic)
        noise = self.output_proj(deconv3, self.cfg.img_size,
                                 self.cfg.img_size)
        y = noise + x
        if noise_rng is None:
            noise_rng = self.make_rng("attack") if self.has_rng("attack") \
                else jax.random.key(0)
        y_attacked = y + jax.random.normal(noise_rng, y.shape, y.dtype)
        wm_feature = self.decoder_wm(y_attacked, deterministic)
        wm = self.encoder_wm.decode(wm_feature)
        return y, noise, wm_pred, wm


class UformerAudioV4(_VariantBase):
    """model.py:2052-2213: 3-tuple (y, wm_pred, wm), no residual."""

    def _setup_codec(self):
        self.encoder_wm = ConvAutoencoder2(in_chans=1, name="encoder_wm")

    def __call__(self, x, message, deterministic: bool = True):
        feature_wm, wm_pred = self.encoder_wm(message)
        y, _ = self._embed(x, feature_wm, deterministic)
        wm_feature = self.decoder_wm(y, deterministic)
        wm = self.encoder_wm.decode(wm_feature)
        return y, wm_pred, wm


class UformerAudioMod(_VariantBase):
    """model.py:2809-2967: production-like 3-tuple forward with
    discriminator heads attached (discriminate() exposes them)."""

    def _setup_codec(self):
        self.encoder_wm = ConvAutoencoder(in_chans=1, name="encoder_wm")
        self.discriminator_mark = DiscriminatorMark(
            name="discriminator_mark")
        self.discriminator_cover = DiscriminatorCover(
            name="discriminator_cover")

    def __call__(self, x, message, deterministic: bool = True):
        feature_wm, wm_pred = self.encoder_wm(message)
        y, _ = self._embed(x, feature_wm, deterministic)
        wm_feature = self.decoder_wm(y, deterministic)
        wm = self.encoder_wm.decode(wm_feature)
        return y, wm_pred, wm

    def discriminate(self, wm_image, cover_image, train: bool = False):
        return (self.discriminator_mark(wm_image, train),
                self.discriminator_cover(cover_image, train))
