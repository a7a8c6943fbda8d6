"""Validation loop with reference metric semantics.

Parity target (reference: evaluate.py — evaluate(net, dataloader, device,
amp); UNVERIFIED mount, SURVEY.md §2 #16 / §3.4):

  * binary (n_classes == 1): (sigmoid(pred) > 0.5) → dice_coeff vs float mask;
  * multiclass: one_hot(argmax(pred)) vs one_hot(mask), both EXCLUDING the
    background channel 0, → multiclass_dice_coeff;
  * mean over val batches (÷ max(num_batches, 1)).

TPU-first: the per-batch metric is a jitted pure function (inference mode =
eval-mode BN, no state update); only the scalar Dice crosses back to host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_unet.losses import dice_coeff, iou_coeff, multiclass_dice_coeff
from tpu_unet.models import UNetConfig, unet_apply


@functools.partial(jax.jit,
                   static_argnames=("config", "amp", "tta", "tta_mode"))
def eval_step(params, state, images, masks, *, config: UNetConfig,
              amp: bool = False, tta: bool = False, tta_mode: str = "flips"):
    """Dice (+IoU) for one validation batch. images NHWC, masks NHW int.

    ``tta`` ensembles the four flip views (models/tta.py), scanned one view
    at a time for activation memory (batched=False below), before
    thresholding — the measurement twin of ``predict --tta``.
    """
    compute_dtype = jnp.bfloat16 if amp else None
    if tta:
        from tpu_unet.models.tta import tta_logits

        # batched=False: at evaluation batch sizes the k·N view batch
        # multiplies activation memory by k and OOMs the heavier families
        # (UNet++ 320×480 eval b8 needed 19.6G vs 15.75G HBM, r4); the
        # scanned form runs one view at a time. predict/serve keep the
        # batched form — at batch 1 the 4-view batch is the MXU win.
        logits = tta_logits(params, state, images, config=config,
                            compute_dtype=compute_dtype, mode=tta_mode,
                            batched=False)
    else:
        logits, _ = unet_apply(
            params,
            state,
            images,
            config=config,
            train=False,
            compute_dtype=compute_dtype,
        )
    if config.n_classes == 1:
        pred = (jax.nn.sigmoid(logits[..., 0]) > 0.5).astype(jnp.float32)
        tgt = masks.astype(jnp.float32)
        return dice_coeff(pred, tgt, reduce_batch_first=False), iou_coeff(pred, tgt)
    else:
        pred_oh = jax.nn.one_hot(jnp.argmax(logits, axis=-1), config.n_classes)
        mask_oh = jax.nn.one_hot(masks, config.n_classes)
        # Background channel excluded, as the reference does.
        return (
            multiclass_dice_coeff(pred_oh[..., 1:], mask_oh[..., 1:], reduce_batch_first=False),
            iou_coeff(pred_oh[..., 1:], mask_oh[..., 1:]),
        )


@functools.partial(jax.jit,
                   static_argnames=("config", "amp", "tta", "tta_mode"))
def eval_step_per_class(params, state, images, masks, *, config: UNetConfig,
                        amp: bool = False, tta: bool = False,
                        tta_mode: str = "flips"):
    """Per-class Dice and IoU vectors [n_classes] for one batch.

    Diagnostic companion to eval_step (beyond-reference: the reference
    reports only the background-excluded mean, SURVEY.md §3.4). Same
    thresholding semantics; each class's score is the mean over the batch of
    its per-sample ratio, so mean(dice[1:]) over classes reproduces
    eval_step's background-excluded scalar exactly.
    """
    compute_dtype = jnp.bfloat16 if amp else None
    if tta:
        from tpu_unet.models.tta import tta_logits

        # Scanned (memory-lean) TTA, same rationale as eval_step.
        logits = tta_logits(params, state, images, config=config,
                            compute_dtype=compute_dtype, mode=tta_mode,
                            batched=False)
    else:
        logits, _ = unet_apply(params, state, images, config=config,
                               train=False, compute_dtype=compute_dtype)
    if config.n_classes == 1:
        pred_oh = (jax.nn.sigmoid(logits[..., :1]) > 0.5).astype(jnp.float32)
        mask_oh = masks.astype(jnp.float32)[..., None]
    else:
        pred_oh = jax.nn.one_hot(jnp.argmax(logits, axis=-1), config.n_classes)
        mask_oh = jax.nn.one_hot(masks, config.n_classes)
    eps = 1e-6
    inter = jnp.sum(pred_oh * mask_oh, axis=(1, 2))  # [N, C]
    s_pred = jnp.sum(pred_oh, axis=(1, 2))
    s_mask = jnp.sum(mask_oh, axis=(1, 2))
    sets = s_pred + s_mask
    sets = jnp.where(sets == 0, 2 * inter, sets)  # empty-mask guard, as dice_coeff
    dice_c = jnp.mean((2 * inter + eps) / (sets + eps), axis=0)  # [C]
    union = s_pred + s_mask - inter
    union = jnp.where(union == 0, inter, union)
    iou_c = jnp.mean((inter + eps) / (union + eps), axis=0)
    return dice_c, iou_c


def _shardable(sharding, shape) -> bool:
    """True when ``shape`` divides evenly over the sharding's mesh axes
    (covers 1-D data and 2-D data×spatial meshes uniformly)."""
    try:
        sharding.shard_shape(tuple(shape))
        return True
    except Exception:
        return False


def evaluate(
    params,
    state,
    dataloader,
    config: UNetConfig,
    amp: bool = False,
    sharding=None,
    tta: bool = False,
    tta_mode: str = "flips",
):
    """Mean validation Dice over the loader (reference signature analog).

    TPU-first accumulation (VERDICT r2 weak #3): the per-batch Dice/IoU
    scalars stay ON DEVICE and are summed lazily — dispatches are async, so
    the whole val split runs back-to-back with exactly ONE D2H sync at the
    end (~29 ms through the relay) instead of two blocking fetches per batch.

    ``sharding`` (the train step's image sharding under --data-parallel /
    --spatial-parallel) runs each eval forward over the same mesh — batch
    over 'data' (and height over 'spatial'), params replicated. A trailing
    batch that doesn't divide the mesh stays unsharded (it needs its own
    compile for the odd batch shape anyway); tests/test_parallel.py asserts
    sharded eval equals the host loop.
    """
    total = None
    n = 0
    for batch in dataloader:
        images = jnp.asarray(batch["image"])
        masks = jnp.asarray(batch["mask"])
        if (sharding is not None and images.is_fully_addressable
                and _shardable(sharding, images.shape)):
            # Host batches get placed; global (multi-host) arrays from the
            # MultiHostBatches loader are already laid out on the mesh.
            images = jax.device_put(images, sharding)
            masks = jax.device_put(masks, sharding)
        d, i = eval_step(params, state, images, masks, config=config, amp=amp,
                         tta=tta, tta_mode=tta_mode)
        pair = jnp.stack([d, i])
        total = pair if total is None else total + pair
        n += 1
    if total is None:
        return 0.0, 0.0  # reference's ÷max(n,1) on an empty loader
    dice, iou = (float(v) for v in jax.device_get(total))
    return dice / n, iou / n


def evaluate_per_class(
    params,
    state,
    dataloader,
    config: UNetConfig,
    amp: bool = False,
    sharding=None,
    tta: bool = False,
    tta_mode: str = "flips",
):
    """Per-class mean (Dice[c], IoU[c]) over the loader — same lazy on-device
    accumulation as evaluate(): one D2H sync for the whole split."""
    total = None
    n = 0
    for batch in dataloader:
        images = jnp.asarray(batch["image"])
        masks = jnp.asarray(batch["mask"])
        if (sharding is not None and images.is_fully_addressable
                and _shardable(sharding, images.shape)):
            images = jax.device_put(images, sharding)
            masks = jax.device_put(masks, sharding)
        d, i = eval_step_per_class(params, state, images, masks, config=config,
                                   amp=amp, tta=tta, tta_mode=tta_mode)
        pair = jnp.stack([d, i])
        total = pair if total is None else total + pair
        n += 1
    if total is None:
        import numpy as np

        z = np.zeros(config.n_classes)
        return z, z
    dice_c, iou_c = jax.device_get(total)
    return dice_c / n, iou_c / n


def main(argv=None):
    """Standalone evaluation CLI (additive; the reference only calls
    evaluate() from its training loop)."""
    import argparse
    import logging
    from pathlib import Path

    from tpu_unet.checkpoint import import_pth, load_checkpoint
    from tpu_unet.data import BasicDataset, CarvanaDataset, DataLoader
    from tpu_unet.models import init_unet

    p = argparse.ArgumentParser(description="Evaluate a checkpoint on a dataset")
    p.add_argument("--model", "-m", required=True)
    p.add_argument("--data-dir", type=str, default="./data")
    p.add_argument("--scale", "-s", type=float, default=0.5)
    p.add_argument("--batch-size", "-b", type=int, default=4)
    p.add_argument("--classes", "-c", type=int, default=1)
    p.add_argument("--bilinear", action="store_true")
    p.add_argument("--arch", choices=["unet", "unetpp", "attention", "r2u", "r2attu"], default="unet")
    p.add_argument("--amp", action="store_true")
    p.add_argument("--data-parallel", action="store_true", default=False,
                   help="Shard each eval batch over all visible chips "
                        "(GSPMD; batches that don't divide the mesh run "
                        "unsharded)")
    p.add_argument("--tta", action="store_true", default=False,
                   help="Flip-ensemble test-time augmentation "
                        "(one batched forward)")
    p.add_argument("--tta-mode", choices=["flips", "hflip"], default="flips",
                   help="TTA view set: all four flips, or identity+left-"
                        "right only (for scenes with a gravity axis)")
    p.add_argument("--per-class", action="store_true", default=False,
                   help="Additionally report per-class Dice/IoU (multiclass: "
                        "class 0 is background, excluded from the mean)")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")

    config = UNetConfig(3, args.classes, bilinear=args.bilinear, arch=args.arch)
    if str(args.model).endswith(".pth"):
        params, state, _ = import_pth(args.model, config)
    else:
        from tpu_unet.checkpoint import read_checkpoint_meta

        _, extra = read_checkpoint_meta(args.model)
        if "config" in extra:
            config = UNetConfig(**extra["config"])
        params, state = init_unet(jax.random.PRNGKey(0), config)
        params, state, _, _ = load_checkpoint(args.model, params, state)

    data_dir = Path(args.data_dir)
    try:
        ds = CarvanaDataset(data_dir / "imgs", data_dir / "masks", args.scale)
    except (AssertionError, RuntimeError, IndexError):
        ds = BasicDataset(data_dir / "imgs", data_dir / "masks", args.scale)
    loader = DataLoader(ds, args.batch_size)
    sharding = None
    if args.data_parallel and jax.device_count() > 1:
        from tpu_unet.parallel.mesh import image_sharding, make_mesh, replicated

        mesh = make_mesh()
        sharding = image_sharding(mesh)
        params = jax.device_put(params, replicated(mesh))
        state = jax.device_put(state, replicated(mesh))
    if args.per_class:
        # ONE inference sweep: the scalar metrics are exactly the
        # background-excluded means of the per-class vectors
        # (test_per_class_mean_reproduces_scalar), so don't run the split
        # twice through the relay.
        dice_c, iou_c = evaluate_per_class(
            params, state, loader, config, amp=args.amp,
            sharding=sharding, tta=args.tta, tta_mode=args.tta_mode)
        fg = slice(1, None) if config.n_classes > 1 else slice(None)
        dice = float(dice_c[fg].mean()) if len(dice_c) else 0.0
        iou = float(iou_c[fg].mean()) if len(iou_c) else 0.0
        print(f"Dice: {dice:.6f}  IoU: {iou:.6f}  (n={len(ds)})")
        for c in range(config.n_classes):
            tag = " (background)" if config.n_classes > 1 and c == 0 else ""
            print(f"  class {c}: Dice {dice_c[c]:.6f}  IoU {iou_c[c]:.6f}{tag}")
    else:
        dice, iou = evaluate(params, state, loader, config, amp=args.amp,
                             sharding=sharding, tta=args.tta,
                             tta_mode=args.tta_mode)
        print(f"Dice: {dice:.6f}  IoU: {iou:.6f}  (n={len(ds)})")
    return dice


if __name__ == "__main__":
    main()
