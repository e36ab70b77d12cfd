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


class WarmupReduceLROnPlateau:
    """Linear warmup -> ReduceLROnPlateau, the reference's metric-driven
    after-scheduler mode (warmup_scheduler/scheduler.py:40-63 +
    torch.optim.lr_scheduler.ReduceLROnPlateau defaults: mode='min',
    factor=0.1, patience=10, relative threshold 1e-4).

    Metric-driven schedules cannot be a pure step->lr optax function;
    this is the host-side epoch controller: call ``step(metric)`` once
    per epoch and feed ``lr`` to an ``optax.inject_hyperparams``
    optimizer (or scale gradients by lr directly). During the warmup
    epochs the lr ramps multiplier-style like GradualWarmupScheduler's
    step_ReduceLROnPlateau branch; afterwards it is cut by ``factor``
    when the metric hasn't improved for ``patience`` epochs."""

    def __init__(self, lr: float, warmup_epochs: int = 3,
                 multiplier: float = 1.0, factor: float = 0.1,
                 patience: int = 10, threshold: float = 1e-4,
                 min_lr: float = 0.0):
        assert multiplier >= 1.0, "multiplier should be >= 1 (reference)"
        self.base_lr = lr
        self.warmup_epochs = warmup_epochs
        self.multiplier = multiplier
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = float("inf")
        self.bad_epochs = 0
        self.epoch = 0
        self.lr = lr if warmup_epochs == 0 else (
            lr * ((multiplier - 1.0) / warmup_epochs + 1.0)
            if multiplier > 1.0 else lr / warmup_epochs)

    def step(self, metric: float) -> float:
        """Advance one epoch with the validation metric; returns the lr
        to use for the NEXT epoch."""
        self.epoch += 1
        if self.epoch <= self.warmup_epochs:
            t = self.epoch / self.warmup_epochs
            self.lr = self.base_lr * ((self.multiplier - 1.0) * t + 1.0) \
                if self.multiplier > 1.0 else self.base_lr * t
            # plateau tracking starts fresh after warmup
            self.best = min(self.best, metric)
            return self.lr
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr
