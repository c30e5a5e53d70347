"""Learning-rate scheduling: reduce-on-plateau.

Host-side equivalent of the reference's keras.callbacks.ReduceLROnPlateau
configuration (bin/train.py:144-153): monitor the training loss, factor 0.1,
patience 2 epochs, min_delta 1e-4 (relative mode 'auto' ~ min), cooldown 0,
floor min_lr 1e-7.
"""

from __future__ import annotations

import dataclasses


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
