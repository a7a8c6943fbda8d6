"""Checkpoint policy for the training loop: per-epoch saves, retention,
best-model tracking, EMA siblings, and the resumable interrupt save
(VERDICT r3 next #6: extracted from train.py so train_model keeps
orchestration only).

Reference behavior mirrored: one checkpoint per epoch carrying mask_values
(reference: train.py ~L190, UNVERIFIED mount, SURVEY.md §2 #13/§5) — the
class-index->pixel-value palette riding inside the checkpoint is a
load-bearing API contract (predict needs it to render masks). Everything
else here (async writer, retention, best tracking, EMA siblings, interrupt
save) is beyond-reference and documented as such.
"""

from __future__ import annotations

import logging
from pathlib import Path

from tpu_unet.checkpoint import AsyncCheckpointer, read_checkpoint_meta

logger = logging.getLogger(__name__)


def prune_checkpoints(checkpoint_dir: Path, epoch: int, keep: int) -> None:
    """Delete per-epoch checkpoints older than the newest ``keep``."""
    for old in sorted(checkpoint_dir.glob("checkpoint_epoch*.npz")):
        try:
            ep = int(old.stem.removeprefix("checkpoint_epoch")
                     .removesuffix("_ema"))
        except ValueError:
            continue  # not ours (e.g. user-renamed file)
        if ep <= epoch - keep:
            old.unlink(missing_ok=True)
            logger.info("Pruned %s (keep-checkpoints=%d)", old.name, keep)


class CheckpointPolicy:
    """Owns the AsyncCheckpointer and every file the trainer writes.

    ``primary`` gates all writes (one writer across hosts under
    --multihost). Saves are async: trees are fetched to host immediately,
    written on a background thread while the next epoch trains.
    """

    def __init__(self, checkpoint_dir: Path, *, enabled: bool, primary: bool,
                 keep: int | None, save_best: bool, save_optimizer: bool,
                 optimizer: str, lr_scheduler: str, config, dataset,
                 ema_decay: float | None):
        self.dir = Path(checkpoint_dir)
        self.enabled = enabled
        self.primary = primary
        self.keep = keep
        self.save_best = save_best
        self.save_optimizer = save_optimizer
        self.optimizer = optimizer
        self.lr_scheduler = lr_scheduler
        self.config = config
        self.mask_values = getattr(dataset, "mask_values", None)
        self.ema_decay = ema_decay
        self.checkpointer = AsyncCheckpointer()
        self.best_dice = float("-inf")
        if save_best:
            # Seed from an existing best checkpoint so a --resume run can't
            # clobber a better model with its first (worse) validation.
            best_path = self.dir / "checkpoint_best.npz"
            if best_path.exists():
                try:
                    _, best_extra = read_checkpoint_meta(best_path)
                    self.best_dice = float(best_extra.get("val_dice",
                                                          self.best_dice))
                    logger.info(
                        "Existing checkpoint_best.npz at val Dice %.4f "
                        "— only better models will overwrite it",
                        self.best_dice)
                except Exception as e:  # unreadable file: treat as absent
                    logger.warning("Could not read %s (%s); starting best "
                                   "tracking fresh", best_path, e)

    def _es_extra(self, es_best: float, es_bad: int) -> dict:
        return ({"early_stop": {"best": es_best, "bad": es_bad}}
                if es_best != -float("inf") else {})

    def maybe_save_best(self, val_dice: float, *, epoch: int, step: int,
                        lr: float, params, bn_state, opt_state) -> bool:
        """Best-model tracking (beyond-reference): one extra file outside
        the per-epoch series, never touched by --keep-checkpoints
        retention. Returns True when the file was updated."""
        if not (self.save_best and self.primary and val_dice > self.best_dice):
            return False
        self.best_dice = val_dice
        self.dir.mkdir(parents=True, exist_ok=True)
        self.checkpointer.save(
            self.dir / "checkpoint_best.npz",
            params, bn_state,
            mask_values=self.mask_values,
            extra={"epoch": epoch, "step": step, "val_dice": val_dice,
                   "lr": lr, "optimizer": self.optimizer,
                   "config": self.config._asdict()},
            opt_state=opt_state if self.save_optimizer else None,
        )
        logger.info("New best val Dice %.4f — checkpoint_best.npz updated",
                    val_dice)
        return True

    def save_epoch(self, epoch: int, *, params, bn_state, opt_state,
                   scheduler, es_best: float, es_bad: int,
                   ema_params=None) -> None:
        if not (self.enabled and self.primary):
            return
        self.dir.mkdir(parents=True, exist_ok=True)
        self.checkpointer.save(
            self.dir / f"checkpoint_epoch{epoch}.npz",
            params, bn_state,
            mask_values=self.mask_values,
            # Self-describing checkpoints: loaders rebuild the exact model
            # config (arch, classes, deep supervision, ...).
            extra={"epoch": epoch, "lr": scheduler.lr,
                   "scheduler": {"name": self.lr_scheduler,
                                 **scheduler.state_dict()},
                   "optimizer": self.optimizer,
                   **self._es_extra(es_best, es_bad),
                   "config": self.config._asdict()},
            opt_state=opt_state if self.save_optimizer else None,
        )
        logger.info("Checkpoint %d saved!", epoch)
        if ema_params is not None:
            # Sibling EMA checkpoint: loads anywhere a normal one does
            # (predict/serve/evaluate/export), and lets a --resume run
            # continue the average.
            self.checkpointer.save(
                self.dir / f"checkpoint_epoch{epoch}_ema.npz",
                ema_params, bn_state,
                mask_values=self.mask_values,
                extra={"epoch": epoch, "ema_decay": self.ema_decay,
                       "config": self.config._asdict()},
            )
        if self.keep:
            # Retention (beyond-reference; the reference keeps every epoch —
            # ~124 MB each at 31M params): prune epochs older than the
            # newest N. Only strictly-older files are touched, so the async
            # write of THIS epoch is never raced.
            prune_checkpoints(self.dir, epoch, self.keep)

    def save_interrupted(self, *, epoch: int, step: int, scheduler,
                         es_best: float, es_bad: int, params, bn_state,
                         opt_state, ema_params=None) -> Path | None:
        """Save INTERRUPTED.npz with the full resumable state (primary only).

        epoch-1 is recorded: the interrupted epoch is incomplete, so
        --resume re-runs it from its start (optimizer/scheduler intact)."""
        if not self.primary:
            return None
        self.dir.mkdir(parents=True, exist_ok=True)
        path = self.dir / "INTERRUPTED.npz"
        self.checkpointer.save(
            path, params, bn_state,
            mask_values=self.mask_values,
            extra={"epoch": epoch - 1, "step": step,
                   "lr": scheduler.lr, "interrupted": True,
                   "scheduler": {"name": self.lr_scheduler,
                                 **scheduler.state_dict()},
                   "optimizer": self.optimizer,
                   **self._es_extra(es_best, es_bad),
                   "config": self.config._asdict()},
            opt_state=opt_state,  # always included: resumability is the point
        )
        if ema_params is not None:
            # Sibling EMA file: --resume INTERRUPTED.npz then continues the
            # average instead of restarting it from the restored params.
            self.checkpointer.save(
                self.dir / "INTERRUPTED_ema.npz",
                ema_params, bn_state,
                mask_values=self.mask_values,
                extra={"epoch": epoch - 1, "ema_decay": self.ema_decay,
                       "config": self.config._asdict()},
            )
        return path

    def finish(self, last_epoch: int, start_epoch: int, epochs: int) -> None:
        """Drain the async writer, then the final retention pass: an epoch
        whose async write was still queued when its per-epoch prune ran
        materializes afterwards (unlink(missing_ok) was a no-op), so
        without this more than N files can survive exit (ADVICE r2)."""
        self.checkpointer.wait()
        if self.enabled and self.primary and self.keep and epochs >= start_epoch:
            prune_checkpoints(self.dir, last_epoch, self.keep)
