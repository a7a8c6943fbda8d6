"""W&B + history logging for the training loop (VERDICT r3 next #6:
extracted from train.py so train_model keeps orchestration only).

Reference parity surface (reference: train.py W&B block, UNVERIFIED mount,
SURVEY.md §2 #22): wandb.init(project='U-Net', resume='allow',
anonymous='must'); config dict; per-step train loss/step/epoch; at each
validation: val Dice, lr, the sample triplet (image, true mask, predicted
mask), and weight + gradient histograms.

TPU-native deviations (measured, BENCH_NOTES):
- Per-step losses stay ON DEVICE and drain in one batched D2H fetch at
  validation/epoch boundaries (LossDrain) — a float() per step costs a full
  ~29 ms relay sync.
- Histograms come from a dedicated compiled step that SUBSAMPLES on device
  (<= _HIST_CAP elements per leaf, ~4 MB total at 31M params instead of
  2x124 MB through the ~16 MB/s relay — VERDICT r2 weak #4). Gradients are
  recomputed at the current params on the last full train batch — the same
  observability signal the reference's post-step p.grad histograms give.
"""

from __future__ import annotations

import logging
import os

import numpy as np

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

_HIST_CAP = 16384  # max elements fetched per leaf for W&B histograms


def _subsample_leaf(leaf):
    """Strided device-side subsample to ≤ _HIST_CAP elements (histograms
    don't need every element; the stride keeps the fetch a few MB total)."""
    flat = leaf.ravel()
    stride = max(1, flat.size // _HIST_CAP)
    return flat[::stride]


def init_wandb(use_wandb: bool, primary: bool, run_config: dict):
    """One W&B run per job (primary host only); offline by default — wandb
    is genuinely optional here (no network egress)."""
    if not (use_wandb and primary):
        return None
    try:
        import wandb

        os.environ.setdefault("WANDB_MODE", "offline")
        experiment = wandb.init(project="U-Net", resume="allow",
                                anonymous="must")
        experiment.config.update(run_config)
        return experiment
    except Exception as e:
        logger.warning("wandb unavailable (%s); continuing without it", e)
        return None


class LossDrain:
    """Per-step losses kept on device, drained in one batched D2H fetch.

    Per-step wandb logs ride the same drain so --wandb never reintroduces
    the ~29 ms/step float() sync; tqdm postfix updates likewise.
    """

    def __init__(self, history: dict, experiment):
        self.history = history
        self.experiment = experiment
        self.pbar = None  # assigned per-epoch by the trainer
        self._losses: list = []
        self._meta: list = []

    def append(self, loss, step: int, epoch: int) -> None:
        self._losses.append(loss)
        self._meta.append((step, epoch))

    def drain(self) -> None:
        if not self._losses:
            return
        vals = [float(l) for l in jax.device_get(self._losses)]
        self.history["train_loss"].extend(vals)
        if self.experiment:
            for (s, ep), v in zip(self._meta, vals):
                self.experiment.log({"train loss": v, "step": s, "epoch": ep})
        if self.pbar:
            self.pbar.set_postfix(loss=f"{vals[-1]:.4f}")
        self._losses.clear()
        self._meta.clear()


class WandbValidationPanel:
    """The per-validation W&B surface: scalars always; under --multihost
    ONLY scalars (every jit must be entered by ALL processes, but the
    experiment lives on the primary — running the histogram/predict steps
    here would deadlock the other hosts); otherwise the full reference
    panel (sample triplet + weight/grad histograms)."""

    def __init__(self, experiment, *, config, amp: bool, remat: bool,
                 dice_weight: float, accum_steps: int, multihost: bool):
        self.experiment = experiment
        self.config = config
        self.amp = amp
        self.remat = remat
        self.dice_weight = dice_weight
        self.accum_steps = accum_steps
        self.multihost = multihost
        self._hist_step = None
        self._predict_logits = None

    def _build_steps(self):
        # Lazy import: train_logging is imported by train.py at module
        # top — compute_loss/unet_apply resolve at first use instead.
        from tpu_unet.models import unet_apply
        from tpu_unet.train import compute_loss

        config, amp, remat = self.config, self.amp, self.remat
        dice_weight = self.dice_weight

        # W&B histograms get their own compiled step instead of making
        # every train step carry the grad pytree as a program output all
        # epoch; the fetch is subsampled on device (see module docstring).
        @jax.jit
        def hist_sample_step(p, s, images, masks):
            def loss_fn(pp):
                logits, _ = unet_apply(
                    pp, s, images, config=config, train=True,
                    compute_dtype=jnp.bfloat16 if amp else None, remat=remat,
                )
                return compute_loss(logits, masks, config.n_classes,
                                    dice_weight=dice_weight)

            grads = jax.grad(loss_fn)(p)
            sub = lambda t: jax.tree.map(_subsample_leaf, t)
            return sub(p), sub(grads)

        @jax.jit
        def predict_logits(p, s, im):
            """Eval forward for the W&B sample panel (pred mask)."""
            logits, _ = unet_apply(
                p, s, im, config=config, train=False,
                compute_dtype=jnp.bfloat16 if amp else None,
            )
            return logits

        self._hist_step = hist_sample_step
        self._predict_logits = predict_logits

    def log(self, *, lr_now, val_dice, val_iou, step: int, epoch: int,
            params, bn_state, images, masks, hist_batch) -> None:
        if self.experiment is None:
            return
        scalars = {
            "learning rate": lr_now, "validation Dice": val_dice,
            "validation IoU": val_iou, "step": step, "epoch": epoch,
        }
        if self.multihost:
            self.experiment.log(scalars)
            return
        import wandb

        if self._hist_step is None:
            self._build_steps()
        h_imgs, h_masks = hist_batch if hist_batch else (images, masks)
        if self.accum_steps > 1:
            # The hist step has no accumulation scan: keep its program
            # microbatch-sized, or it would compile the very full-batch
            # program --accum-steps avoids (b32 kills the remote compile
            # helper).
            mb = max(1, h_imgs.shape[0] // self.accum_steps)
            h_imgs, h_masks = h_imgs[:mb], h_masks[:mb]
        w_sub, g_sub = jax.device_get(
            self._hist_step(params, bn_state, h_imgs, h_masks)
        )

        def tree_histograms(tree, prefix):
            out = {}
            if tree is None:
                return out
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
                key = prefix + "/".join(
                    str(getattr(p, "key", p)) for p in path
                )
                vals = np.asarray(leaf).ravel()
                if np.all(np.isfinite(vals)):  # reference skips inf/nan
                    out[key] = wandb.Histogram(vals)
            return out

        lg = self._predict_logits(params, bn_state, images[:1])
        if self.config.n_classes > 1:
            pred0 = np.asarray(jnp.argmax(lg[0], axis=-1))
        else:
            pred0 = np.asarray(jax.nn.sigmoid(lg[0, ..., 0]) > 0.5)
        self.experiment.log({
            **scalars,
            "images": wandb.Image(np.asarray(images[0])),
            "masks": {
                "true": wandb.Image(np.asarray(masks[0]).astype(np.float32)),
                "pred": wandb.Image(pred0.astype(np.float32)),
            },
            **tree_histograms(w_sub, "Weights/"),
            **tree_histograms(g_sub, "Gradients/"),
        })
