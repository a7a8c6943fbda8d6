"""LR-schedule menu beside the reference's ReduceLROnPlateau.

The reference's only schedule is plateau-on-val-Dice (reference: train.py
~L35, UNVERIFIED mount, SURVEY.md §2 #13 — optim/plateau.py). The menu adds
the standard epoch-stepped torch schedules as beyond-reference conveniences,
with torch.optim.lr_scheduler-exact math (tests/test_optim.py).

All schedulers share one interface so train_model treats them uniformly:

- ``.lr`` — the current value, fed to the jitted step as a traced scalar
  (changes never recompile);
- ``.step(metric) -> lr`` — called at each validation; only plateau reacts;
- ``.epoch_end() -> lr`` — called once per epoch; only the epoch-stepped
  schedules react (torch's ``scheduler.step()`` call point);
- ``state_dict()/load_state_dict()`` — rides the checkpoint for resume
  (train_model wraps it with the schedule's name and degrades to a fresh
  schedule on mismatch).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from tpu_unet.optim.plateau import ReduceLROnPlateau

SCHEDULERS = ("plateau", "cosine", "step", "constant")


@dataclass
class CosineAnnealingLR:
    """torch.optim.lr_scheduler.CosineAnnealingLR, closed form: stepped once
    per epoch, lr_k = eta_min + (base − eta_min)·(1 + cos(π·k/T_max))/2."""

    lr: float
    t_max: int
    eta_min: float = 0.0
    epoch: int = 0

    def __post_init__(self):
        self.base_lr = self.lr

    def step(self, metric: float | None = None) -> float:
        return self.lr

    def epoch_end(self) -> float:
        self.epoch += 1
        self.lr = self.eta_min + (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * self.epoch / self.t_max)) / 2
        return self.lr

    def state_dict(self) -> dict:
        # t_max/eta_min ride along so --resume continues the SAVED curve
        # even when the new run passes a different --epochs/--lr-min
        # (code-review r3: restoring only lr/epoch silently re-shaped the
        # annealing period to the new run's epochs).
        return {"lr": self.lr, "base_lr": self.base_lr, "epoch": self.epoch,
                "t_max": self.t_max, "eta_min": self.eta_min}

    def load_state_dict(self, d: dict) -> None:
        for k, v in d.items():
            setattr(self, k, v)


@dataclass
class StepLR:
    """torch.optim.lr_scheduler.StepLR: lr = base·gamma^(epoch // step_size)."""

    lr: float
    step_size: int
    gamma: float = 0.1
    epoch: int = 0

    def __post_init__(self):
        self.base_lr = self.lr

    def step(self, metric: float | None = None) -> float:
        return self.lr

    def epoch_end(self) -> float:
        self.epoch += 1
        self.lr = self.base_lr * self.gamma ** (self.epoch // self.step_size)
        return self.lr

    def state_dict(self) -> dict:
        return {"lr": self.lr, "base_lr": self.base_lr, "epoch": self.epoch,
                "step_size": self.step_size, "gamma": self.gamma}

    def load_state_dict(self, d: dict) -> None:
        for k, v in d.items():
            setattr(self, k, v)


@dataclass
class ConstantLR:
    lr: float

    def step(self, metric: float | None = None) -> float:
        return self.lr

    def epoch_end(self) -> float:
        return self.lr

    def state_dict(self) -> dict:
        return {"lr": self.lr}

    def load_state_dict(self, d: dict) -> None:
        for k, v in d.items():
            setattr(self, k, v)


def get_scheduler(
    name: str,
    lr: float,
    *,
    epochs: int = 5,
    patience: int = 5,
    step_size: int = 10,
    gamma: float = 0.1,
    eta_min: float = 0.0,
):
    """Resolve a schedule name. ``cosine`` anneals over the full run
    (T_max = epochs, the common torch idiom); ``plateau`` is the
    reference's exact configuration."""
    if name == "plateau":
        return ReduceLROnPlateau(lr=lr, mode="max", patience=patience)
    if name == "cosine":
        return CosineAnnealingLR(lr=lr, t_max=max(epochs, 1), eta_min=eta_min)
    if name == "step":
        return StepLR(lr=lr, step_size=step_size, gamma=gamma)
    if name == "constant":
        return ConstantLR(lr=lr)
    raise ValueError(f"unknown lr scheduler {name!r} (choose from {SCHEDULERS})")
