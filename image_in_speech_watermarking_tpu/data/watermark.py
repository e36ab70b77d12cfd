"""Watermark image sources.

Parity targets:
  MNIST 28x28 + Pad(2) -> 1x32x32, ToTensor, x image_scale, per-image
  min-max to [0,1]  (uformerWM/audio_uformer_stft.py:210-219,
  hidden/utils.py:125-137)
  BinaryWM: random 32x32 binary marks (audio_uformer_stft.py:222-244)
  img16/ digit images + random 0/1/+-1 marks (uformerWM/data_audio.py:88-127)

This environment is zero-egress so the real MNIST files may be absent; a
procedural digit renderer provides MNIST-shaped (digit-glyph 1x32x32)
watermarks so every pipeline stays runnable. If torchvision MNIST data is
on disk it is used instead.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

# 5x7 bitmap glyphs for digits 0-9 (classic font), upscaled to 28x28
_GLYPHS = {
    0: ["01110", "10001", "10011", "10101", "11001", "10001", "01110"],
    1: ["00100", "01100", "00100", "00100", "00100", "00100", "01110"],
    2: ["01110", "10001", "00001", "00010", "00100", "01000", "11111"],
    3: ["11111", "00010", "00100", "00010", "00001", "10001", "01110"],
    4: ["00010", "00110", "01010", "10010", "11111", "00010", "00010"],
    5: ["11111", "10000", "11110", "00001", "00001", "10001", "01110"],
    6: ["00110", "01000", "10000", "11110", "10001", "10001", "01110"],
    7: ["11111", "00001", "00010", "00100", "01000", "01000", "01000"],
    8: ["01110", "10001", "10001", "01110", "10001", "10001", "01110"],
    9: ["01110", "10001", "10001", "01111", "00001", "00010", "01100"],
}


def _render_digit(d: int, rng: np.random.Generator) -> np.ndarray:
    """Render one digit as a 28x28 anti-aliased image with small random
    offset/amplitude jitter (an MNIST-shaped stand-in)."""
    bitmap = np.array([[int(c) for c in row] for row in _GLYPHS[d]],
                      dtype=np.float32)                  # (7, 5)
    img = np.kron(bitmap, np.ones((4, 4), dtype=np.float32))  # (28, 20)
    canvas = np.zeros((28, 28), dtype=np.float32)
    ox = int(rng.integers(0, 28 - 20 + 1))
    canvas[:, ox:ox + 20] = img
    # slight blur for anti-aliasing
    k = np.array([0.25, 0.5, 0.25])
    canvas = np.apply_along_axis(
        lambda r: np.convolve(r, k, mode="same"), 0, canvas)
    canvas = np.apply_along_axis(
        lambda r: np.convolve(r, k, mode="same"), 1, canvas)
    return canvas * float(rng.uniform(0.85, 1.0))


def _minmax01(x: np.ndarray) -> np.ndarray:
    lo, hi = x.min(), x.max()
    return (x - lo) / (hi - lo) if hi > lo else x * 0.0


def digit_watermarks(batch: int, seed: int = 0,
                     image_scale: float = 1.0) -> np.ndarray:
    """(batch, 32, 32, 1) digit-glyph watermarks with MNIST transform
    parity: Pad(2), scale, per-image min-max to [0, 1]
    (audio_uformer_stft.py:210-219)."""
    rng = np.random.default_rng(seed)
    out = np.zeros((batch, 32, 32, 1), dtype=np.float32)
    for i in range(batch):
        d = int(rng.integers(0, 10))
        img = np.pad(_render_digit(d, rng), 2)           # Pad(2) -> 32x32
        out[i, :, :, 0] = _minmax01(img * image_scale)
    return out


def binary_watermarks(batch: int, seed: int = 0,
                      image_scale: float = 1.0) -> np.ndarray:
    """Random 32x32 binary marks (BinaryWM,
    audio_uformer_stft.py:222-244)."""
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, size=(batch, 32, 32, 1)).astype(np.float32)
    return bits * image_scale


def bit_messages(batch: int, length: int = 30, seed: int = 0) -> np.ndarray:
    """Random (batch, length) 0/1 bit vectors — the upstream-HiDDeN
    message protocol behind the hidden/README.md:94-101 bitwise-error
    table (hidden/test_model.py:53-56 draws the same at test time)."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2, size=(batch, length)).astype(np.float32)


def try_mnist_watermarks(batch: int, root: str, seed: int = 0,
                         image_scale: float = 1.0) -> Optional[np.ndarray]:
    """Real MNIST if the torchvision files exist locally (no download);
    returns None otherwise."""
    try:
        from torchvision import datasets  # type: ignore

        ds = datasets.MNIST(root=root, train=True, download=False)
    except Exception:
        return None
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(ds), size=batch)
    out = np.zeros((batch, 32, 32, 1), dtype=np.float32)
    for i, j in enumerate(idx):
        img = np.asarray(ds[int(j)][0], dtype=np.float32) / 255.0
        out[i, :, :, 0] = _minmax01(np.pad(img, 2) * image_scale)
    return out


# ---------------------------------------------------------------------------
# In-band sync pilot (round 5, beyond reference parity — the reference
# has no sync story at all): a fixed KNOWN pattern stamped into a small
# corner of every 32x32 message. At eval time "does the pilot decode?"
# is a calibrated, per-clip, model-independent alignment signal that
# replaces most of the hand-measured blind-confidence gates in
# eval/sync.py (VERDICT r4 next-step #4). 2x2-pixel blocks (not 1-px
# checkerboard) so the pattern survives the ConvAutoencoder's 4x spatial
# bottleneck; top-left corner, 8x8 = 6.25% of payload area.

PILOT_SIZE = 8
PILOT_BLOCK = 2


def pilot_pattern(size: int = PILOT_SIZE,
                  block: int = PILOT_BLOCK) -> np.ndarray:
    """(size, size) deterministic block-checkerboard pilot, values {0,1}."""
    idx = np.arange(size) // block
    return ((idx[:, None] + idx[None, :]) % 2).astype(np.float32)


def stamp_pilot(msgs: np.ndarray) -> np.ndarray:
    """Overwrite the pilot corner of (..., 32, 32, 1) messages with the
    canonical pattern. Returns a copy."""
    out = np.array(msgs, dtype=np.float32, copy=True)
    out[..., :PILOT_SIZE, :PILOT_SIZE, 0] = pilot_pattern()
    return out


def watermark_stream(batch: int, source: str = "digits", seed: int = 0,
                     image_scale: float = 1.0,
                     mnist_root: str = "data",
                     pilot: bool = False) -> Iterator[np.ndarray]:
    """Endless watermark batches (the reference re-iterates its DataLoader
    on StopIteration, audio_uformer_stft.py:425-431). ``pilot`` stamps
    the in-band sync pilot into every message."""
    i = 0
    while True:
        s = seed + i
        if source == "binary":
            wm = binary_watermarks(batch, s, image_scale)
        elif source == "mnist":
            wm = try_mnist_watermarks(batch, mnist_root, s, image_scale)
            if wm is None:
                wm = digit_watermarks(batch, s, image_scale)
        else:
            wm = digit_watermarks(batch, s, image_scale)
        yield stamp_pilot(wm) if pilot else wm
        i += 1
