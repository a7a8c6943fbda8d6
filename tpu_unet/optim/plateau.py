"""ReduceLROnPlateau with torch semantics.

Parity target (reference: train.py — ``ReduceLROnPlateau(optimizer,
'max', patience=5)``, UNVERIFIED mount, SURVEY.md §2 #13). optax has no
plateau scheduler with torch's exact bookkeeping, so this is a small host-side
state machine stepped on each validation score (5×/epoch in the trainer); the
current lr is fed into the jitted train step as a traced scalar, so lr changes
never trigger recompilation.

torch semantics reproduced (verified in tests/test_optim.py):
  * mode='max', threshold_mode='rel' (defaults): better ⇔ a > best·(1+thr)
    unconditionally (torch has NO sign branch — for negative metrics the
    rel threshold works "backwards", and so does ours); threshold=1e-4.
  * num_bad_epochs > patience → lr = max(lr·factor, min_lr), reset counter,
    enter cooldown (default 0).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass
class ReduceLROnPlateau:
    lr: float
    mode: str = "max"
    factor: float = 0.1
    patience: int = 5
    threshold: float = 1e-4
    threshold_mode: str = "rel"
    cooldown: int = 0
    min_lr: float = 0.0
    best: float = field(default=None)  # type: ignore[assignment]
    num_bad_epochs: int = 0
    cooldown_counter: int = 0

    def __post_init__(self):
        if self.best is None:
            self.best = -math.inf if self.mode == "max" else math.inf

    def _is_better(self, a: float) -> bool:
        # Torch applies the rel threshold UNCONDITIONALLY (no sign branch):
        # for a negative best under mode='max' the threshold then works
        # "backwards" — that quirk is part of the parity contract
        # (tests/test_optim.py asserts it against torch directly).
        if self.mode == "max":
            if self.threshold_mode == "rel":
                return a > self.best * (1 + self.threshold)
            return a > self.best + self.threshold
        else:
            if self.threshold_mode == "rel":
                return a < self.best * (1 - self.threshold)
            return a < self.best - self.threshold

    def step(self, metric: float) -> float:
        """Record a validation metric; returns the (possibly reduced) lr."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1

        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0

        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.lr

    def epoch_end(self) -> float:
        """Scheduler-menu interface (optim/schedulers.py): plateau reacts to
        validation metrics, not epoch boundaries — no-op."""
        return self.lr

    def state_dict(self) -> dict:
        return {
            "lr": self.lr,
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
            "cooldown_counter": self.cooldown_counter,
        }

    def load_state_dict(self, d: dict) -> None:
        for k, v in d.items():
            setattr(self, k, v)
