"""Baseline models: ModelA (small CNN watermarker) and UNet (restoration).

Parity targets:
  ModelA   uformerWM/model.py:3000-3066
  ConvBlock/UNet  uformerWM/model.py:112-228
All NHWC.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ModelA(nn.Module):
    """Small CNN watermark embedder/detector (model.py:3000-3066).

    encode(stft (B,128,128,2), wm (B,32,32,1)): conv stack downsamples /4
    to (B,32,32,32), concat the 1-ch watermark -> 33ch, two transposed
    convs back to (B,128,128,2) with sigmoid.
    decode(stft): conv stack -> (B,32,32,1) watermark with ReLU head.
    forward -> (encoded_stft, extracted_wm) 2-tuple
    (dispatch at uformerWM/audio_test.py:552-555).
    """

    def setup(self):
        self.emb_conv1 = nn.Conv(16, (3, 3), padding=1, name="emb_conv1")
        self.emb_bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name="emb_bn1")
        self.emb_conv2 = nn.Conv(32, (3, 3), padding=1, name="emb_conv2")
        self.emb_bn2 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name="emb_bn2")

        self.dec_tconv1 = nn.ConvTranspose(16, (2, 2), strides=(2, 2),
                                           name="dec_tconv1")
        self.dec_bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name="dec_bn1")
        self.dec_tconv2 = nn.ConvTranspose(2, (2, 2), strides=(2, 2),
                                           name="dec_tconv2")
        self.dec_bn2 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name="dec_bn2")

        self.det_conv1 = nn.Conv(16, (3, 3), padding=1, name="det_conv1")
        self.det_bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name="det_bn1")
        self.det_conv2 = nn.Conv(64, (3, 3), padding=1, name="det_conv2")
        self.det_bn2 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name="det_bn2")
        self.det_conv3 = nn.Conv(1, (3, 3), padding=1, name="det_conv3")

    def encode(self, stft: jnp.ndarray, watermark: jnp.ndarray,
               train: bool = False) -> jnp.ndarray:
        x = self.emb_conv1(stft)
        x = self.emb_bn1(x, use_running_average=not train)
        x = nn.leaky_relu(x, 0.2)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = self.emb_conv2(x)
        x = self.emb_bn2(x, use_running_average=not train)
        x = nn.leaky_relu(x, 0.2)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))           # (B,32,32,32)

        x = jnp.concatenate([x, watermark], axis=-1)         # (B,32,32,33)

        y = self.dec_tconv1(x)
        y = self.dec_bn1(y, use_running_average=not train)
        y = nn.relu(y)
        # reference has Dropout(0.5) here (model.py:3022); train-mode only
        y = self.dec_tconv2(y)
        y = self.dec_bn2(y, use_running_average=not train)
        return nn.sigmoid(y)                                 # (B,128,128,2)

    def decode(self, stft: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = self.det_conv1(stft)
        y = self.det_bn1(y, use_running_average=not train)
        y = nn.leaky_relu(y, 0.2)
        y = nn.max_pool(y, (2, 2), strides=(2, 2))
        y = self.det_conv2(y)
        y = self.det_bn2(y, use_running_average=not train)
        y = nn.leaky_relu(y, 0.2)
        y = nn.max_pool(y, (2, 2), strides=(2, 2))
        y = self.det_conv3(y)
        return nn.relu(y)                                    # (B,32,32,1)

    def __call__(self, stft: jnp.ndarray, watermark: jnp.ndarray,
                 train: bool = False):
        encoded = self.encode(stft, watermark, train)
        extracted = self.decode(encoded, train)
        return encoded, extracted


class ConvBlock(nn.Module):
    """Residual double-conv block (model.py:112-131)."""

    out_channel: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Conv(self.out_channel, (3, 3), padding=1, name="conv1")(x)
        y = nn.leaky_relu(y, 0.01)
        y = nn.Conv(self.out_channel, (3, 3), padding=1, name="conv2")(y)
        y = nn.leaky_relu(y, 0.01)
        skip = nn.Conv(self.out_channel, (1, 1), name="conv11")(x)
        return y + skip


class UNet(nn.Module):
    """Plain conv U-Net baseline, ``--arch UNet`` (model.py:136-228)."""

    dim: int = 32
    out_chans: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dim
        enc = []
        y = x
        for i in range(4):
            y = ConvBlock(d * (2 ** i), name=f"ConvBlock{i+1}")(y)
            enc.append(y)
            y = nn.Conv(d * (2 ** i), (4, 4), strides=2, padding=1,
                        name=f"pool{i+1}")(y)
        y = ConvBlock(d * 16, name="ConvBlock5")(y)
        for i in range(4):
            ch = d * (2 ** (3 - i))
            y = nn.ConvTranspose(ch, (2, 2), strides=(2, 2),
                                 name=f"upv{6+i}")(y)
            y = jnp.concatenate([y, enc[3 - i]], axis=-1)
            y = ConvBlock(ch, name=f"ConvBlock{6+i}")(y)
        y = nn.Conv(self.out_chans, (3, 3), padding=1, name="conv10")(y)
        return x[..., : self.out_chans] + y
