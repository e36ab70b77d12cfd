"""Configuration dataclasses.

Mirrors the reference argparse/option surfaces:
  - uformerWM/options.py:4-68       (Uformer training options)
  - hidden/options.py:1-49          (TrainingOptions / HiDDenConfiguration)
  - uformerWM/utils/model_utils.py:60-108 (arch factory defaults)
  - uformerWM/audio_uformer_stft.py:41-54 (module-level constants)

Numeric contract constants are in SURVEY.md §2.3 and cited per-field below.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

# ---------------------------------------------------------------------------
# Signal front-end constants (SURVEY §2.3)
# ---------------------------------------------------------------------------

SAMPLE_RATE = 16_000  # uformerWM/audio_attack.py:21

# Training STFT: n_fft=256, hop=128, win=256, drop last freq row -> 128 bins
# (uformerWM/audio_test.py:465-469)
TRAIN_N_FFT = 256
TRAIN_HOP = 128

# Eval / in-model round-trip STFT: n_fft=255 (torch defaults hop=63, win=255)
# -> 128 bins (uformerWM/audio_test.py:315, model.py:2458-2463)
EVAL_N_FFT = 255
EVAL_HOP = 63

CLIP_FRAMES = 128       # frames per clip (uformerWM/audio_test.py:319-347)
FREQ_BINS = 128
WM_SIZE = 32            # watermark image is 1x32x32 (audio_uformer_stft.py:210-219)
WM_FEATURE_SHAPE = (8, 8, 4)  # NHWC; reference (4,8,8) NCHW (model.py:2386)


@dataclasses.dataclass(frozen=True)
class UformerConfig:
    """UformerAudio architecture hyperparameters.

    Defaults reproduce ``--arch Uformer_audio``
    (uformerWM/utils/model_utils.py:84-85, model.py:2227-2236).
    """

    img_size: int = 128
    in_chans: int = 2            # output channels (real/imag)
    dd_in: int = 2               # input channels (real/imag)
    embed_dim: int = 32
    depths: Sequence[int] = (1, 2, 8, 8, 2, 8, 8, 2, 1)
    num_heads: Sequence[int] = (1, 2, 4, 8, 16, 16, 8, 4, 2)
    win_size: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    token_projection: str = "linear"
    token_mlp: str = "leff"
    modulator: bool = True       # decoder-side window modulators
    shift_flag: bool = True      # alternate shifted windows
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    # In-graph channel simulation STFT (model.py:2458-2463)
    n_fft: int = EVAL_N_FFT
    hop_length: int = EVAL_HOP
    # stft_layer form. True (our default): zero-init residual refinement
    # stft_new = spec + conv(spec) — starts at the exact ISTFT->STFT
    # round trip instead of having to learn identity from random init
    # (intentional deviation, see PARITY.md). False: the reference's
    # plain conv stack stft_new = conv(spec) (model.py:2465). Param
    # shapes are identical either way, so this flag — not the checkpoint
    # tree — records which function a checkpoint computes; it is saved
    # in each run's exp_config.json and must match at restore time.
    stft_residual: bool = True
    # Phase-invariant payload channel (round-4 quality work, beyond
    # reference parity): feed the extractor a third input channel
    # |STFT| = sqrt(re^2+im^2) alongside real/imag. Whole-wave phase-
    # vocoder attacks (time/pitch scaling) decohere accumulated synthesis
    # phase — effectively a random smooth all-pass — which destroys the
    # real/imag embedding but approximately preserves magnitudes, and the
    # extractor's alignment basin widens from +-0 samples (a 1-sample
    # shift rotates every n_fft=255 bin's phase) to the magnitude
    # envelope's tolerance. False = reference parity
    # (model.py:1428-1583 reads 2-channel real/imag only). Changes the
    # extractor input_proj kernel 2->3 in-channels; checkpoints trained
    # without it are poured via zero-pad surgery (trainer._restore_state)
    # so the initial function is exactly the 2-channel one.
    extractor_mag: bool = False
    # TPU compute dtype policy: matmuls/convs run in this dtype;
    # LayerNorm, softmax, the DFT and output projections stay f32.
    compute_dtype: str = "float32"
    # Fused Pallas window-attention kernel (ops/window_attention.py)
    use_pallas_attention: bool = False
    # Whole-block fused LeWin kernels (ops/experimental/lewin_block.py): LN+W-MSA+proj
    # +residual and LN+LeFF+residual each as one HBM pass. Forward-only
    # fusion (the VJP replays the jnp reference); active when
    # deterministic or drop_path == 0.
    use_pallas_block: bool = False

    # Stock image-restoration Uformer (model.py:2545) uses depths of 2s and
    # dd_in=3/in_chans=3; construct via `stock_uformer()` below.

    @property
    def num_enc_layers(self) -> int:
        return len(self.depths) // 2


def stock_uformer(img_size: int = 256, embed_dim: int = 32) -> UformerConfig:
    """The inherited image-restoration Uformer config (model.py:2545-2805)."""
    return UformerConfig(
        img_size=img_size,
        in_chans=3,
        dd_in=3,
        embed_dim=embed_dim,
        depths=(2, 2, 2, 2, 2, 2, 2, 2, 2),
        modulator=False,
    )


@dataclasses.dataclass(frozen=True)
class HiDDenConfig:
    """HiDDeN network configuration (hidden/options.py:20-49)."""

    H: int = 128
    W: int = 128
    message_length: int = 32      # watermark side for the image-message variant
    # "image": the snapshot's image-message variant (hidden/model/
    # decoder.py outputs a 32x32 watermark image; message_length is the
    # image side). "bits": the upstream-HiDDeN bit-vector protocol the
    # README table (hidden/README.md:94-101) was measured under —
    # message_length bits broadcast as constant planes, decoder
    # global-pools to a length-L vector.
    message_mode: str = "image"
    encoder_blocks: int = 4
    encoder_channels: int = 64
    decoder_blocks: int = 7
    decoder_channels: int = 64
    use_discriminator: bool = True
    discriminator_blocks: int = 3
    discriminator_channels: int = 64
    decoder_loss: float = 1.0
    encoder_loss: float = 0.7
    adversarial_loss: float = 1e-3
    enable_fp16: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training options (uformerWM/options.py, audio_uformer_stft.py:41-54,
    252-257, 347-356)."""

    arch: str = "Uformer_audio"
    dataset: str = "synthetic"    # tedlium | librispeech | synthetic
    batch_size: int = 24
    nepoch: int = 300
    lr_initial: float = 2e-4      # AdamW lr (audio_uformer_stft.py:252)
    weight_decay: float = 0.02
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    warmup: bool = True
    warmup_epochs: int = 3        # audio_uformer_stft.py:347-356
    lr_min: float = 1e-6          # cosine floor
    step_lr_step: int = 10        # StepLR fallback (step=10, gamma=0.5)
    step_lr_gamma: float = 0.5
    train_ps: int = 128           # patch/clip size
    image_scale: float = 1.0      # watermark scaling
    audio_scale: str = "0"        # '0' off | '0.025' | 'min-max' range string
    seed: int = 42                # audio_uformer_stft.py:38-40
    # TPU-native additions (not in reference):
    dtype: str = "float32"        # compute dtype; "bfloat16" for MXU speed
    mesh_shape: Tuple[int, ...] = (1,)
    mesh_axes: Tuple[str, ...] = ("data",)
    remat: bool = False           # jax.checkpoint over transformer stages
    epoch_scan: bool = True       # device-resident epoch lax.scan; False
                                  # falls back to the per-step host loop
                                  # (smaller XLA program — contingency for
                                  # remote-worker compile-memory crashes)


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """4-term UformerAudio loss (audio_uformer_stft.py:463-482):
    L = MSE(audio, stft_in) + MSE(wm_pred, msg) + MSE(wm_decode, msg)
        + MSE(||noise||/B, 1).
    All unit-weighted in the reference; kept configurable here."""

    audio: float = 1.0
    wm_pred: float = 1.0
    wm_decode: float = 1.0
    noise_norm: float = 1.0
