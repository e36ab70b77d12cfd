"""Learning-rate schedules.

Parity targets:
  GradualWarmupScheduler (linear warmup -> CosineAnnealing to lr_min)
      uformerWM/warmup_scheduler/scheduler.py:5-63,
      wiring at audio_uformer_stft.py:347-356 (3 warmup epochs, eta_min
      1e-6, cosine over nepoch - warmup)
  StepLR(step_size=10, gamma=0.5) fallback (audio_uformer_stft.py:358-364)
Implemented as optax schedules over *steps* (epoch-granular like the
reference: the lr changes once per epoch via steps_per_epoch)."""

from __future__ import annotations

import optax


def warmup_cosine(lr: float, warmup_epochs: int, total_epochs: int,
                  steps_per_epoch: int, lr_min: float = 1e-6):
    """Linear 0->lr over warmup_epochs, cosine lr->lr_min over the rest
    (GradualWarmupScheduler with multiplier=1 + CosineAnnealingLR)."""
    warmup = optax.linear_schedule(
        init_value=lr / max(warmup_epochs * steps_per_epoch, 1),
        end_value=lr, transition_steps=warmup_epochs * steps_per_epoch)
    cosine = optax.cosine_decay_schedule(
        init_value=lr,
        decay_steps=max((total_epochs - warmup_epochs) * steps_per_epoch, 1),
        alpha=lr_min / lr)
    return optax.join_schedules([warmup, cosine],
                                [warmup_epochs * steps_per_epoch])


def step_lr(lr: float, step_epochs: int, gamma: float,
            steps_per_epoch: int):
    """StepLR: lr * gamma^(epoch // step_epochs)."""
    return optax.exponential_decay(
        init_value=lr, transition_steps=step_epochs * steps_per_epoch,
        decay_rate=gamma, staircase=True)
