"""Learning-rate scheduling: reduce-on-plateau + cosine decay.

Host-side equivalent of the reference's keras.callbacks.ReduceLROnPlateau
configuration (bin/train.py:144-153): monitor the training loss, factor 0.1,
patience 2 epochs, min_delta 1e-4 (relative mode 'auto' ~ min), cooldown 0,
floor min_lr 1e-7.

`cosine_lr` is the from-scratch alternative: heavy-augmentation epoch losses
are noisy enough that a plateau monitor can ride a slow creep for hundreds
of epochs without ever firing (observed: 250 epochs at a constant 3e-4 left
the corner regression at ~10 px median train error — Adam needs the final-LR
anneal to converge the precise-localization tail). A deterministic cosine
anneal is also resume-friendly: the LR is a pure function of the epoch, so
a restarted run recomputes the exact schedule with no carried state.
"""

from __future__ import annotations

import dataclasses
import math


def cosine_lr(
    base_lr: float,
    epoch: int,
    total_epochs: int,
    warmup_epochs: int = 0,
    min_lr: float = 1e-7,
) -> float:
    """LR for `epoch` (0-based): linear warmup to `base_lr` over
    `warmup_epochs`, then cosine anneal to `min_lr` at `total_epochs - 1`.

    Pure function of the epoch — restart-safe by construction.
    """
    if warmup_epochs > 0 and epoch < warmup_epochs:
        return base_lr * (epoch + 1) / warmup_epochs
    span = max(total_epochs - 1 - warmup_epochs, 1)
    t = min(max(epoch - warmup_epochs, 0), span) / span
    return min_lr + (base_lr - min_lr) * 0.5 * (1.0 + math.cos(math.pi * t))


@dataclasses.dataclass
class ReduceLROnPlateau:
    factor: float = 0.1
    patience: int = 2
    min_delta: float = 1e-4
    min_lr: float = 1e-7
    verbose: bool = True

    best: float = float("inf")
    wait: int = 0

    def update(self, metric: float, current_lr: float) -> float:
        """Feed one epoch's monitored value; returns the (possibly reduced) lr."""
        if metric < self.best - self.min_delta:
            self.best = metric
            self.wait = 0
            return current_lr
        self.wait += 1
        if self.wait > self.patience:
            self.wait = 0
            new_lr = max(current_lr * self.factor, self.min_lr)
            if self.verbose and new_lr < current_lr:
                print(f"ReduceLROnPlateau: lr {current_lr:.3g} -> {new_lr:.3g}")
            return new_lr
        return current_lr
