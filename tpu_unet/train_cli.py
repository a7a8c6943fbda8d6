"""Train CLI: argument parsing + main() entry point (VERDICT r3 next #6:
extracted from train.py so train_model keeps orchestration only).

Parity targets (reference: train.py — get_args, __main__; UNVERIFIED
mount, SURVEY.md §2 #14/#15, §3.1):

  * CLI flags: --epochs/-e 5, --batch-size/-b 1, --learning-rate/-l 1e-5,
    --load/-f, --scale/-s 0.5, --validation/-v 10.0, --amp, --bilinear,
    --classes/-c 1 (plus TPU-framework extras, kept additive).
  * OOM fallback: the reference catches torch.cuda.OutOfMemoryError and
    retries once with activation checkpointing; here we catch XLA
    RESOURCE_EXHAUSTED and retry once with remat=True (donation-safe:
    the retry rebuilds fresh device arrays from a host snapshot).

``main`` resolves train_model through the ``tpu_unet.train`` module
namespace at call time, so tests monkeypatching ``train_mod.train_model``
keep working.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

dir_checkpoint = Path("./checkpoints/")


def get_args(argv=None):
    parser = argparse.ArgumentParser(description="Train the UNet on images and target masks")
    parser.add_argument("--epochs", "-e", metavar="E", type=int, default=5, help="Number of epochs")
    parser.add_argument("--batch-size", "-b", dest="batch_size", metavar="B", type=int, default=1, help="Batch size")
    parser.add_argument("--learning-rate", "-l", metavar="LR", type=float, default=1e-5, dest="lr", help="Learning rate")
    parser.add_argument("--load", "-f", type=str, default=False, help="Load model from a .npz/.pth file")
    parser.add_argument("--scale", "-s", type=float, default=0.5, help="Downscaling factor of the images")
    parser.add_argument("--validation", "-v", dest="val", type=float, default=10.0,
                        help="Percent of the data that is used as validation (0-100)")
    parser.add_argument("--amp", action="store_true", default=False, help="Use mixed precision (bf16 on TPU)")
    parser.add_argument("--bilinear", action="store_true", default=False, help="Use bilinear upsampling")
    parser.add_argument("--classes", "-c", type=int, default=1, help="Number of classes")
    # TPU-framework extensions (additive, not in the reference CLI):
    parser.add_argument("--optimizer", choices=["rmsprop", "sgd", "adam", "adamw"],
                        default="rmsprop",
                        help="Update rule (optim/optimizers.py): the "
                             "reference's RMSprop (default), the legacy "
                             "reference's SGD(momentum=0.9) (SURVEY.md "
                             "§A.1), or Adam/AdamW (torch-parity, "
                             "beyond-reference). Composes with --zero/"
                             "--tensor-parallel; --pipeline-parallel is "
                             "RMSprop-only")
    parser.add_argument("--nesterov", action="store_true", default=False,
                        help="Nesterov momentum (--optimizer sgd only)")
    parser.add_argument("--momentum", type=float, default=None,
                        help="Momentum override (default: 0.999 for rmsprop "
                             "— the reference's value — and 0.9 for sgd; "
                             "ignored by adam/adamw)")
    parser.add_argument("--weight-decay", type=float, default=1e-8,
                        help="Weight decay (reference RMSprop default 1e-8; "
                             "L2-folded for rmsprop/sgd/adam, decoupled for "
                             "adamw)")
    parser.add_argument("--dice-weight", type=float, default=1.0,
                        help="Weight of the Dice term in the loss (the "
                             "reference adds it at 1.0); 0 trains on plain "
                             "BCE/CE — the LEGACY reference layout's loss "
                             "(SURVEY.md §A.1)")
    parser.add_argument("--lr-scheduler",
                        choices=["plateau", "cosine", "step", "constant"],
                        default="plateau",
                        help="LR schedule (optim/schedulers.py): the "
                             "reference's ReduceLROnPlateau on val Dice "
                             "(default), cosine annealing over the run, "
                             "StepLR, or constant — torch-parity math, "
                             "state rides the checkpoints for --resume")
    parser.add_argument("--lr-step-size", type=int, default=10, metavar="E",
                        help="StepLR period in epochs (--lr-scheduler step)")
    parser.add_argument("--lr-gamma", type=float, default=0.1,
                        help="StepLR decay factor (--lr-scheduler step)")
    parser.add_argument("--lr-min", type=float, default=0.0,
                        help="Cosine annealing floor (--lr-scheduler cosine)")
    parser.add_argument("--arch", choices=["unet", "unetpp", "attention", "r2u", "r2attu"], default="unet",
                        help="Model family: classic U-Net (reference parity), "
                             "UNet++, Attention U-Net, R2U-Net, or R2AttU-Net")
    parser.add_argument("--recur-t", type=int, default=2, metavar="T",
                        help="r2u/r2attu only: recurrence depth of each shared "
                             "conv unit (arXiv:1802.06955 uses t=2)")
    parser.add_argument("--deep-supervision", action="store_true", default=False,
                        help="UNet++ only: per-column output heads, averaged")
    parser.add_argument("--data-parallel", action="store_true", default=False,
                        help="Shard the batch across all visible TPU devices (GSPMD)")
    parser.add_argument("--multihost", action="store_true", default=False,
                        help="Multi-host SPMD: call jax.distributed."
                             "initialize() before device use (one process "
                             "per TPU host; auto-detects the cluster, or "
                             "use --coordinator/--num-processes/"
                             "--process-id). Each host loads only its rows "
                             "of every global batch; requires "
                             "--data-parallel")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="With --multihost: coordinator address "
                             "host:port for manual clusters")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--spatial-parallel", type=int, default=1,
                        help="With --data-parallel: also shard image HEIGHT "
                             "over this many devices (2-D dp×sp mesh; XLA "
                             "inserts the conv halo exchanges). Use when "
                             "chips outnumber the batch or activations "
                             "exceed one chip's HBM")
    parser.add_argument("--ema-decay", type=float, default=None,
                        help="Maintain an exponential moving average of the "
                             "weights (e.g. 0.999): ema <- d*ema + (1-d)*w "
                             "after every step. Writes a sibling "
                             "checkpoint_epochN_ema.npz each epoch (loads "
                             "anywhere a normal checkpoint does) and "
                             "validates it alongside the raw weights. "
                             "--resume continues the average when the "
                             "sibling file exists")
    parser.add_argument("--accum-steps", type=int, default=1,
                        help="Run each batch as this many microbatches under "
                             "a lax.scan inside the one compiled step "
                             "(gradient accumulation): activation memory is "
                             "O(batch/accum), the optimizer sees the averaged "
                             "full-batch gradient. Must divide --batch-size. "
                             "The memory lever orthogonal to remat")
    parser.add_argument("--tensor-parallel", type=int, default=1,
                        help="With --data-parallel: also shard DoubleConv "
                             "CHANNELS over this many devices (3-D dp×sp×tp "
                             "mesh; Megatron-style column→row weight "
                             "shardings, one all-reduce per block). For "
                             "wide models whose params + fp32 optimizer "
                             "state outgrow one chip's HBM")
    parser.add_argument("--zero", action="store_true", default=False,
                        help="With --data-parallel: ZeRO-1 — shard the fp32 "
                             "optimizer state trees over the data axis (1/N "
                             "per chip instead of replicated ≈248 MB at 31M "
                             "params; one all-gathered param delta per "
                             "step). Matches plain DP to fp32 round-off")
    parser.add_argument("--pipeline-parallel", type=int, default=1,
                        metavar="S",
                        help="GPipe depth partitioning: split the U-Net's "
                             "block chain into S stages, one whole device "
                             "each (params + fp32 optimizer state 1/S per "
                             "chip; backward recomputes each stage). "
                             "--accum-steps sets the microbatch count "
                             "(default: S). An ALTERNATIVE to the GSPMD "
                             "mesh axes — does not compose with "
                             "--data/--spatial/--tensor-parallel")
    parser.add_argument("--checkpoint-dir", type=str, default=str(dir_checkpoint))
    parser.add_argument("--data-dir", type=str, default="./data")
    parser.add_argument("--wandb", action="store_true", default=False, help="Enable W&B logging (offline by default)")
    parser.add_argument("--early-stopping", type=int, default=None, metavar="N",
                        help="Stop training after N consecutive validations "
                             "without val-Dice improvement (beyond-"
                             "reference; decision is identical on every "
                             "host, the final per-epoch checkpoint holds "
                             "the stopping weights)")
    parser.add_argument("--val-per-epoch", type=int, default=5, metavar="N",
                        help="Validation cadence: N times per epoch "
                             "(reference hardcodes 5). Plateau scheduling, "
                             "W&B panels, --save-best, and the multihost "
                             "stop broadcast all ride these steps")
    parser.add_argument("--vmem-limit-mb", type=int, default=None, metavar="MB",
                        help="Raise the TPU compiler's scoped-VMEM budget for "
                             "the train step (per-jit compiler option). "
                             "Measured: 64 gives +1.5%% at 572^2 b16 bf16 "
                             "(BENCH_NOTES r3). TPU-only; ignored elsewhere")
    parser.add_argument("--kernels", choices=["xla", "pallas"], default=None,
                        help="Conv backend for the train step: fused Pallas "
                             "kernels (shard_map under --data-parallel) or "
                             "XLA (default)")
    parser.add_argument("--augment", action="store_true", default=False,
                        help="Device-side augmentation: random h-flip + "
                             "brightness/contrast jitter (beyond-reference)")
    parser.add_argument("--augment-elastic", type=float, default=0.0,
                        metavar="ALPHA",
                        help="Also apply random elastic deformation with "
                             "this displacement magnitude in pixels (the "
                             "original U-Net paper's key augmentation; "
                             "smooth per-sample warp, masks nearest-"
                             "sampled). Implies augmentation on")
    parser.add_argument("--augment-rot", type=float, default=0.0, metavar="DEG",
                        help="Random rotation up to ±DEG degrees (same "
                             "single warp pass; implies augmentation on)")
    parser.add_argument("--augment-scale", type=float, default=0.0, metavar="J",
                        help="Random isotropic scale in [1-J, 1+J]")
    parser.add_argument("--augment-shift", type=float, default=0.0, metavar="PX",
                        help="Random translation up to ±PX pixels per axis")
    parser.add_argument("--device-dataset", action="store_true", default=False,
                        help="Stage the whole (preprocessed) corpus to HBM "
                             "as uint8 and gather batches on device — "
                             "per-step H2D shrinks to the index vector. "
                             "Corpus must fit HBM (Carvana at scale .5 is "
                             "~3 GB vs 16 GB); under --data-parallel the "
                             "corpus rows are sharded over the mesh")
    parser.add_argument("--cache-dataset", action="store_true", default=False,
                        help="RAM-cache preprocessed samples after first "
                             "decode (beyond-reference). At 959x640 host "
                             "PNG decode is ~300ms/image and the 5x/epoch "
                             "validation re-decodes the val split every "
                             "time, leaving the TPU >95%% idle "
                             "(BENCH_NOTES.md r2)")
    parser.add_argument("--device-preprocess", action="store_true", default=False,
                        help="Decode on host, resize/normalize on the TPU "
                             "(Pillow-bit-exact int32 resample on device; "
                             "same tensors as the host PIL path)")
    parser.add_argument("--keep-checkpoints", type=int, default=None, metavar="N",
                        help="Retain only the newest N per-epoch checkpoints "
                             "(~124 MB each at 31M params); default keeps "
                             "all, like the reference")
    parser.add_argument("--save-best", action="store_true", default=False,
                        help="Additionally keep checkpoint_best.npz, updated "
                             "whenever validation Dice improves (survives "
                             "--keep-checkpoints pruning)")
    parser.add_argument("--history-out", type=str, default=None, metavar="PATH",
                        help="Write the training history (per-step loss, "
                             "per-validation Dice/lr) as JSON on exit")
    parser.add_argument("--save-optimizer", action="store_true", default=False,
                        help="Include optimizer state in checkpoints (enables full --resume)")
    parser.add_argument("--resume", type=str, default=None,
                        help="Full-state resume from a checkpoint (params+BN+optimizer+epoch)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--profile", type=str, default=None,
                        help="Write a jax.profiler trace to this directory")
    parser.add_argument("--debug-nans", action="store_true", default=False)
    return parser.parse_args(argv)


def _build_augment(flips_jitter: bool, elastic_alpha: float,
                   rot_deg: float = 0.0, scale_jitter: float = 0.0,
                   shift_px: float = 0.0):
    from tpu_unet.data.augment import AugmentConfig

    return AugmentConfig(
        hflip=flips_jitter,
        brightness=0.1 if flips_jitter else 0.0,
        contrast=0.1 if flips_jitter else 0.0,
        elastic_alpha=elastic_alpha,
        rot_deg=rot_deg,
        scale_jitter=scale_jitter,
        shift_px=shift_px,
    )


def main(argv=None):
    # Late import through the module namespace: tests monkeypatch
    # tpu_unet.train.train_model and call main().
    import tpu_unet.train as train_mod
    from tpu_unet.checkpoint import import_pth, load_checkpoint
    from tpu_unet.data import BasicDataset, CarvanaDataset
    from tpu_unet.models import UNetConfig, init_unet, param_count

    args = get_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")
    if args.multihost:
        # Must run before ANY device use — it forms the global runtime.
        from tpu_unet.parallel.multihost import initialize

        initialize(args.coordinator, args.num_processes, args.process_id)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    config = UNetConfig(
        n_channels=3, n_classes=args.classes, bilinear=args.bilinear,
        arch=args.arch, deep_supervision=args.deep_supervision,
        recur_t=args.recur_t,
    )
    logger.info(
        "Network:\n\t%d input channels\n\t%d output channels (classes)\n\t%s upscaling",
        config.n_channels, config.n_classes,
        "Bilinear" if config.bilinear else "Transposed conv",
    )

    params, bn_state = init_unet(jax.random.PRNGKey(args.seed), config)
    logger.info("Model parameters: %.1fM", param_count(params) / 1e6)

    if args.load:
        if str(args.load).endswith(".pth"):
            params, bn_state, _ = import_pth(args.load, config)
        else:
            params, bn_state, _, _ = load_checkpoint(args.load, params, bn_state)
        logger.info("Model loaded from %s", args.load)

    data_dir = Path(args.data_dir)
    if args.device_preprocess:
        from tpu_unet.data.loading import RawCarvanaDataset, RawDataset

        try:
            dataset = RawCarvanaDataset(data_dir / "imgs", data_dir / "masks", args.scale)
        except (AssertionError, RuntimeError, IndexError):
            dataset = RawDataset(data_dir / "imgs", data_dir / "masks", args.scale)
    else:
        try:
            dataset = CarvanaDataset(data_dir / "imgs", data_dir / "masks", args.scale,
                                     cache=args.cache_dataset)
        except (AssertionError, RuntimeError, IndexError):
            dataset = BasicDataset(data_dir / "imgs", data_dir / "masks", args.scale,
                                   cache=args.cache_dataset)

    # The train step donates the params/BN/opt buffers, so after a first
    # attempt that completed ≥1 step the original `params` arrays are
    # DELETED — a retry re-passing them would crash on use-after-donate
    # (VERDICT r2 weak #8). Keep a host-side snapshot and rebuild fresh
    # device arrays per attempt; the reference's fallback contract is
    # "retry works whenever OOM strikes".
    params_h = jax.device_get(params)
    bn_state_h = jax.device_get(bn_state)

    def run(remat: bool):
        fresh_params = jax.tree.map(jnp.asarray, params_h)
        fresh_bn = jax.tree.map(jnp.asarray, bn_state_h)
        return train_mod.train_model(
            fresh_params, fresh_bn, config,
            dataset=dataset,
            epochs=args.epochs,
            batch_size=args.batch_size,
            learning_rate=args.lr,
            val_percent=args.val / 100,
            amp=args.amp,
            optimizer=args.optimizer,
            nesterov=args.nesterov,
            momentum=args.momentum,
            weight_decay=args.weight_decay,
            dice_weight=args.dice_weight,
            lr_scheduler=args.lr_scheduler,
            lr_step_size=args.lr_step_size,
            lr_gamma=args.lr_gamma,
            lr_min=args.lr_min,
            remat=remat,
            data_parallel=args.data_parallel,
            use_wandb=args.wandb,
            checkpoint_dir=Path(args.checkpoint_dir),
            seed=args.seed,
            save_optimizer=args.save_optimizer,
            resume=args.resume,
            device_preprocess=args.device_preprocess,
            device_dataset=args.device_dataset,
            kernels=None if args.kernels == "xla" else args.kernels,
            spatial_parallel=args.spatial_parallel,
            tensor_parallel=args.tensor_parallel,
            pipeline_parallel=args.pipeline_parallel,
            zero=args.zero,
            accum_steps=args.accum_steps,
            ema_decay=args.ema_decay,
            val_per_epoch=args.val_per_epoch,
            early_stopping=args.early_stopping,
            vmem_limit_kib=(args.vmem_limit_mb * 1024
                            if (args.vmem_limit_mb
                                and jax.default_backend() != "cpu") else None),
            keep_checkpoints=args.keep_checkpoints,
            save_best=args.save_best,
            augment=(_build_augment(args.augment, args.augment_elastic,
                                    args.augment_rot, args.augment_scale,
                                    args.augment_shift)
                     if (args.augment or args.augment_elastic
                         or args.augment_rot or args.augment_scale
                         or args.augment_shift) else None),
        )

    profiling = False
    if args.profile:
        try:
            jax.profiler.start_trace(args.profile)
            profiling = True
        except Exception as e:  # profiler may be unsupported on some PJRT plugins
            logger.warning("Profiler unavailable (%s); continuing without trace", e)
    try:
        result = run(remat=False)
    except Exception as e:  # XLA OOM → remat retry, the reference's fallback
        if "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e):
            logger.error(
                "Detected OOM! Enabling activation checkpointing (remat) and retrying. "
                "Consider reducing --batch-size or --scale."
            )
            result = run(remat=True)
        else:
            raise
    finally:
        if profiling:
            try:
                jax.profiler.stop_trace()
                logger.info("Profiler trace written to %s", args.profile)
            except Exception as e:
                logger.warning("Profiler stop failed: %s", e)
    from tpu_unet.parallel.multihost import is_primary

    if args.history_out and is_primary():
        import json

        _, _, history = result
        Path(args.history_out).write_text(json.dumps(history))
        logger.info("Training history written to %s", args.history_out)


if __name__ == "__main__":
    main()
