"""HiDDeN-style conv watermarking nets (the ``hidden/`` subproject).

Parity targets:
  Decoder        hidden/model/decoder.py:6-40 (present in the reference)
  ConvBNRelu     hidden/model/conv_bn_relu.py:3-18
  Encoder / EncoderDecoder / Discriminator — absent from the reference
  snapshot; reconstructed from the published HiDDeN architecture and the
  call-site contracts (hidden/test_model.py:46-59, hidden/utils.py:84-109,
  hidden/audio_test.py:423,554,606) with the hyperparameters of
  hidden/options.py:20-49 (encoder_blocks=4, encoder_channels=64,
  decoder_blocks=7, decoder_channels=64, discriminator_blocks=3).

The "message" here is a 1x32x32 watermark image (MNIST via
hidden/utils.py:125-137), spatially tiled to the cover size for the
encoder's concat stage. Covers are 1x128x128 time-domain audio clips
reshaped to images (hidden/audio_test.py:98-114). All NHWC.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from image_in_speech_watermarking_tpu.config import HiDDenConfig
from image_in_speech_watermarking_tpu.models.layers import ConvBNRelu


def expand_message(message: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Tile a (B, mh, mw, C) watermark image to (B, h, w, C) by integer
    nearest-neighbour repeat (HiDDeN's spatial message replication,
    adapted to image-valued messages)."""
    b, mh, mw, c = message.shape
    assert h % mh == 0 and w % mw == 0, (message.shape, h, w)
    return jnp.repeat(jnp.repeat(message, h // mh, axis=1), w // mw, axis=2)


def expand_bits(message: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Broadcast a (B, L) bit vector to (B, h, w, L) constant planes —
    the upstream HiDDeN message replication (each bit is present at every
    spatial position, which is what makes the crop regimes decodable from
    a ~5%-area keep: the bitwise-error table of hidden/README.md:96-101
    was measured under this protocol)."""
    b, length = message.shape
    return jnp.broadcast_to(message[:, None, None, :], (b, h, w, length))


class HiddenEncoder(nn.Module):
    """Cover + message -> watermarked image (HiDDeN encoder topology):
    encoder_blocks-1 ConvBNRelu on the cover, concat [features, expanded
    message, cover], ConvBNRelu, 1x1 conv to cover channels."""

    config: HiDDenConfig = HiDDenConfig()
    cover_channels: int = 1

    @nn.compact
    def __call__(self, image: jnp.ndarray, message: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        cfg = self.config
        y = image
        for i in range(cfg.encoder_blocks - 1):
            y = ConvBNRelu(cfg.encoder_channels, name=f"conv{i+1}")(y, train)
        expand = expand_bits if message.ndim == 2 else expand_message
        msg = expand(message, image.shape[1], image.shape[2])
        y = jnp.concatenate([msg, y, image], axis=-1)
        y = ConvBNRelu(cfg.encoder_channels, name="after_concat")(y, train)
        return nn.Conv(self.cover_channels, (1, 1), name="final")(y)


class HiddenDecoder(nn.Module):
    """Watermarked image -> watermark image (hidden/model/decoder.py:6-40):
    ConvBNRelu(1->C), x(decoder_blocks-1) C->C, C->message_length,
    MaxPool2, message_length->1, MaxPool2. 128x128 in -> 32x32 out."""

    config: HiDDenConfig = HiDDenConfig()

    @nn.compact
    def __call__(self, image_with_wm: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        cfg = self.config
        y = ConvBNRelu(cfg.decoder_channels, name="conv0")(image_with_wm, train)
        for i in range(cfg.decoder_blocks - 1):
            y = ConvBNRelu(cfg.decoder_channels, name=f"conv{i+1}")(y, train)
        y = ConvBNRelu(cfg.message_length, name="to_msg")(y, train)
        y = nn.max_pool(y, (2, 2), strides=(2, 2))
        y = ConvBNRelu(1, name="to_one")(y, train)
        return nn.max_pool(y, (2, 2), strides=(2, 2))


class HiddenDecoderBits(nn.Module):
    """Watermarked image -> (B, message_length) bit logits — the upstream
    HiDDeN decoder the README bitwise-error table was measured with:
    conv stack, ConvBNRelu(C->L), global average pool, Linear(L->L).

    ``valid_mask`` (B- or batch-broadcast (h, w) 0/1): the pool averages
    only over valid positions. This reproduces the reference semantics
    for size-changing noise (crop returns a SMALLER tensor there and
    AdaptiveAvgPool2d averages over it alone; our static-shape crop
    zeroes the outside, so an unmasked mean would dilute the features
    ~20x and poison the pooled statistic)."""

    config: HiDDenConfig = HiDDenConfig()

    @nn.compact
    def __call__(self, image_with_wm: jnp.ndarray,
                 train: bool = False,
                 valid_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.config
        y = ConvBNRelu(cfg.decoder_channels, name="conv0")(image_with_wm,
                                                           train)
        for i in range(cfg.decoder_blocks - 1):
            y = ConvBNRelu(cfg.decoder_channels, name=f"conv{i+1}")(y, train)
        y = ConvBNRelu(cfg.message_length, name="to_msg")(y, train)
        if valid_mask is None:
            pooled = y.mean(axis=(1, 2))
        else:
            m = valid_mask[..., None]            # (h, w, 1) or (B, h, w, 1)
            while m.ndim < y.ndim:
                m = m[None]
            pooled = ((y * m).sum(axis=(1, 2))
                      / jnp.maximum(m.sum(axis=(1, 2)), 1.0))
        return nn.Dense(cfg.message_length, name="linear")(pooled)


class HiddenDiscriminator(nn.Module):
    """Watermark present/absent head (HiDDeN discriminator topology with
    hidden/options.py discriminator_blocks/channels)."""

    config: HiDDenConfig = HiDDenConfig()

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.config
        y = image
        for i in range(cfg.discriminator_blocks):
            y = ConvBNRelu(cfg.discriminator_channels,
                           name=f"conv{i+1}")(y, train)
        y = y.mean(axis=(1, 2))
        return nn.Dense(1, name="linear")(y)


class HiddenEncoderDecoder(nn.Module):
    """encoder -> noiser -> decoder chain (the reference's EncoderDecoder;
    noise is applied between encode and decode per the HiDDeN design,
    hidden/noise_layers/noiser.py:29-31). The noiser is a pure function
    ``(key, noised, cover) -> noised`` injected at call time so the module
    stays parameter-only."""

    config: HiDDenConfig = HiDDenConfig()
    cover_channels: int = 1

    def setup(self):
        self.encoder = HiddenEncoder(self.config, self.cover_channels,
                                     name="encoder")
        if self.config.message_mode == "bits":
            self.decoder = HiddenDecoderBits(self.config, name="decoder")
        else:
            self.decoder = HiddenDecoder(self.config, name="decoder")

    def __call__(self, image: jnp.ndarray, message: jnp.ndarray,
                 noiser: Optional[Callable] = None,
                 noiser_key=None, train: bool = False):
        encoded = self.encoder(image, message, train)
        if noiser is not None:
            noised = noiser(noiser_key, encoded, image)
        else:
            noised = encoded
        if self.config.message_mode == "bits":
            # masked global pool: the decoder must not average over
            # regions a size-changing layer (crop) blanked — the
            # reference decoder never sees them at all
            mask = (noiser.valid_mask(noiser_key, encoded.shape)
                    if noiser is not None
                    and hasattr(noiser, "valid_mask") else None)
            decoded = self.decoder(noised, train, valid_mask=mask)
        else:
            decoded = self.decoder(noised, train)
        return encoded, noised, decoded
