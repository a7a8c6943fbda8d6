"""Training driver + CLI, mirroring the reference's public surface.

Parity targets (reference: train.py — train_model, get_args, __main__;
UNVERIFIED mount, SURVEY.md §2 #13–#15, §3.1):

  * CLI flags: --epochs/-e 5, --batch-size/-b 1, --learning-rate/-l 1e-5,
    --load/-f, --scale/-s 0.5, --validation/-v 10.0, --amp, --bilinear,
    --classes/-c 1 (plus TPU-framework extras, kept additive).
  * Loss: CrossEntropy + multiclass Dice (n_classes>1) else BCEWithLogits +
    binary Dice on the squeezed channel.
  * RMSprop(lr, weight_decay=1e-8, momentum=0.999), grad-clip 1.0,
    ReduceLROnPlateau('max', patience=5) on val Dice, validation 5×/epoch
    (division_step = n_train // (5·batch_size)), per-epoch checkpoint
    carrying mask_values, optional W&B logging.
  * OOM fallback: the reference catches torch.cuda.OutOfMemoryError and
    retries once with activation checkpointing; here we catch XLA
    RESOURCE_EXHAUSTED and retry once with remat=True.

TPU-native design: ONE jitted train step (fwd+loss+bwd+clip+RMSprop fused
into a single XLA program, donated buffers, lr as a traced scalar so plateau
updates never recompile). AMP = bf16 compute; no GradScaler needed — bf16
keeps fp32 exponent range, so the reference's loss-scaling machinery has no
TPU counterpart by design. Data parallelism is GSPMD: params replicated,
batch sharded over a 1-D mesh; XLA emits the ICI psum.
"""

from __future__ import annotations

import argparse
import functools
import logging
import os
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from tpu_unet.checkpoint import (
    AsyncCheckpointer,
    import_pth,
    load_checkpoint,
    read_checkpoint_meta,
)
from tpu_unet.data import (
    BasicDataset,
    CarvanaDataset,
    DataLoader,
    prefetch_to_device,
    random_split_indices,
)
from tpu_unet.evaluate import evaluate
from tpu_unet.losses import bce_with_logits, cross_entropy, dice_loss
from tpu_unet.models import UNetConfig, init_unet, param_count, unet_apply
from tpu_unet.optim import clip_grad_norm, get_optimizer, get_scheduler
from tpu_unet.parallel.mesh import (
    batch_sharding, image_sharding, make_mesh, make_mesh_2d, replicated,
)

logger = logging.getLogger(__name__)

dir_img = Path("./data/imgs/")
dir_mask = Path("./data/masks/")
dir_checkpoint = Path("./checkpoints/")


def compute_loss(logits, masks, n_classes: int, axis_name: str | None = None,
                 dice_weight: float = 1.0):
    """The reference's combined criterion (SURVEY.md §3.1 hot loop).

    ``dice_weight`` scales the Dice term (static at trace time); 0 drops it
    entirely — the LEGACY reference layout trained on plain BCE with no
    Dice (SURVEY.md §A.1), reachable via ``train --dice-weight 0``.

    With ``axis_name`` (shard_map DP) the returned scalar is the REPLICATED
    global-batch loss: the BCE/CE local means are pmean'd (equal shards) and
    the Dice ratio's sums are psum'd before the division — a mean of
    per-shard Dice ratios would NOT equal the global-batch Dice the GSPMD
    path computes. Gradients of this replicated scalar must be pmean'd (NOT
    psum'd) by the caller: JAX transposes psum as psum, so each device's
    partial already carries an extra factor of the axis size on the
    collective-reduced terms — see the matching comment in make_train_step,
    whose pmean is asserted against the single-device gradient in
    tests/test_parallel.py.
    """
    if n_classes == 1:
        logit = logits[..., 0]
        mask_f = masks.astype(jnp.float32)
        ce = bce_with_logits(logit, mask_f)
        dl = (dice_loss(jax.nn.sigmoid(logit), mask_f, multiclass=False,
                        axis_name=axis_name)
              if dice_weight else None)
    else:
        mask_oh = jax.nn.one_hot(masks, n_classes, dtype=jnp.float32)
        ce = cross_entropy(logits, masks)
        dl = (dice_loss(jax.nn.softmax(logits, axis=-1), mask_oh,
                        multiclass=True, axis_name=axis_name)
              if dice_weight else None)
    if axis_name is not None:
        ce = jax.lax.pmean(ce, axis_name)
    return ce if dl is None else ce + dice_weight * dl


_HIST_CAP = 16384  # max elements fetched per leaf for W&B histograms


def _subsample_leaf(leaf):
    """Strided device-side subsample to ≤ _HIST_CAP elements (histograms
    don't need every element; the stride keeps the fetch a few MB total)."""
    flat = leaf.ravel()
    stride = max(1, flat.size // _HIST_CAP)
    return flat[::stride]


def make_train_step(
    config: UNetConfig,
    *,
    amp: bool = False,
    remat: bool = False,
    weight_decay: float = 1e-8,
    momentum: float | None = None,
    grad_clip: float = 1.0,
    return_grads: bool = False,
    kernels: str | None = None,
    mesh=None,
    accum_steps: int = 1,
    vmem_limit_kib: int | None = None,
    opt_shardings=None,
    optimizer: str = "rmsprop",
    nesterov: bool = False,
    dice_weight: float = 1.0,
):
    """Build the single fused train step: fwd+loss+bwd+clip+optimizer.

    ``optimizer`` selects the update rule (optim/optimizers.py): the
    reference's RMSprop by default, ``sgd`` for the legacy reference's
    SGD(momentum=0.9) (SURVEY.md §A.1), ``adam``/``adamw`` beyond-reference.
    ``momentum`` None takes the per-optimizer default. The caller's
    ``opt_state`` argument must come from the matching init (get_optimizer).

    ``return_grads`` appends the clipped gradient pytree to the outputs
    (for W&B gradient histograms, reference parity SURVEY.md §2 #22); off by
    default so the hot path doesn't keep grads alive as program outputs.
    ``kernels="pallas"`` selects the fused train-path conv kernels
    (ops/conv_stats.py). With ``mesh`` (a 1-D ('data',) mesh) the step runs
    under shard_map — params replicated, batch sharded, grads/loss pmean'd,
    BN stat sums psum'd — which is how the Pallas kernels participate in
    data parallelism (pallas_call is not auto-partitionable under GSPMD, so
    the plain jit path cannot shard them).

    ``vmem_limit_kib`` raises the TPU compiler's scoped-VMEM budget for this
    one program via per-jit compiler options (the only route on this relay:
    TPU backend flags in XLA_FLAGS are rejected by the CLIENT-side parser,
    but PJRT compile options serialize through — BENCH_NOTES r3). Measured
    at 572² b16 bf16: 70.9 → 72.0 img/s with 65536 (+1.5%, consistent
    across 9 interleaved reps). TPU-only — the CPU backend rejects the
    option, so tests leave it None.

    ``accum_steps`` > 1 runs the batch as that many microbatches under a
    ``lax.scan`` INSIDE the one program — activation memory is
    O(batch/accum_steps) while the optimizer still sees the averaged
    full-batch gradient (the orthogonal memory lever to ``remat``: remat
    trades FLOPs, accumulation trades MXU occupancy at small microbatches).
    Microbatch j takes rows ``j::accum_steps`` so that under GSPMD data
    parallelism every device contributes rows to EVERY microbatch (a
    contiguous split would place whole microbatches on single devices).
    Semantics match running ``accum_steps`` sequential loader batches
    between optimizer updates, exactly as in torch: BN batch statistics are
    per-microbatch (running stats thread through the scan in order), and
    the Dice term is per-microbatch — NOT the full-batch joint Dice, which
    is nonlinear in the batch (documented divergence; the beyond-reference
    feature has no reference counterpart).
    """
    compute_dtype = jnp.bfloat16 if amp else None
    axis_name = "data" if mesh is not None else None
    _, opt_update = get_optimizer(
        optimizer, weight_decay=weight_decay, momentum=momentum,
        nesterov=nesterov,
    )

    def grads_and_loss(params, bn_state, images, masks):
        def loss_fn(p):
            logits, new_bn = unet_apply(
                p, bn_state, images, config=config, train=True,
                compute_dtype=compute_dtype, remat=remat, kernels=kernels,
                axis_name=axis_name,
            )
            return compute_loss(logits, masks, config.n_classes, axis_name,
                                dice_weight=dice_weight), new_bn

        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if axis_name is not None:
            # compute_loss returns the replicated GLOBAL loss (collectives
            # inside). JAX transposes psum as psum, so each device's grad
            # already carries an extra factor of the axis size on the
            # collective-reduced terms — pmean (not psum) of the per-device
            # partials reproduces the single-device gradient exactly
            # (asserted vs the XLA GSPMD step in test_parallel.py).
            grads = jax.lax.pmean(grads, axis_name)
        return loss, new_bn, grads

    def step_body(params, bn_state, opt_state, images, masks, lr):
        n = images.shape[0]
        if accum_steps == 1 or n % accum_steps:
            # Indivisible (trailing partial) batches run unaccumulated: n is
            # static at trace time, so each compiled program takes exactly
            # one branch (the partial shape recompiles anyway).
            loss, new_bn, grads = grads_and_loss(params, bn_state, images, masks)
        else:
            mb = n // accum_steps
            # rows j::accum -> microbatch j (see docstring): reshape to
            # (mb, A, ...) then lead with the microbatch axis.
            def strided(x):
                return jnp.moveaxis(
                    x.reshape((mb, accum_steps) + x.shape[1:]), 1, 0)

            def scan_fn(carry, xs):
                bn, gsum, lsum = carry
                im, mk = xs
                l, bn, g = grads_and_loss(params, bn, im, mk)
                gsum = jax.tree.map(jnp.add, gsum, g)
                return (bn, gsum, lsum + l), None

            zeros = jax.tree.map(jnp.zeros_like, params)
            (new_bn, gsum, lsum), _ = jax.lax.scan(
                scan_fn, (bn_state, zeros, jnp.float32(0.0)),
                (strided(images), strided(masks)),
            )
            inv = jnp.float32(1.0 / accum_steps)
            grads = jax.tree.map(lambda g: g * inv, gsum)
            loss = lsum * inv
        grads, gnorm = clip_grad_norm(grads, grad_clip)
        new_params, new_opt = opt_update(grads, opt_state, params, lr)
        if opt_shardings is not None:
            # ZeRO-1 (parallel/zero.py): pin the updated state to its
            # input shardings so GSPMD keeps the fp32 trees 1/N per chip
            # (and the donated buffers reusable) instead of re-replicating
            # the outputs.
            new_opt = jax.tree.map(
                jax.lax.with_sharding_constraint, new_opt, opt_shardings
            )
        if return_grads:
            return new_params, new_bn, new_opt, loss, gnorm, grads
        return new_params, new_bn, new_opt, loss, gnorm

    jit_kwargs: dict = {"donate_argnums": (0, 1, 2)}
    if vmem_limit_kib:
        jit_kwargs["compiler_options"] = {
            "xla_tpu_scoped_vmem_limit_kib": str(int(vmem_limit_kib))
        }
    if mesh is None:
        return functools.partial(jax.jit, **jit_kwargs)(step_body)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_out = 6 if return_grads else 5
    sharded = shard_map(
        step_body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("data"), P("data"), P()),
        out_specs=(P(),) * n_out,
        check_vma=False,
    )
    return functools.partial(jax.jit, **jit_kwargs)(sharded)


def train_model(
    params,
    bn_state,
    config: UNetConfig,
    *,
    dataset,
    epochs: int = 5,
    batch_size: int = 1,
    learning_rate: float = 1e-5,
    val_percent: float = 0.1,
    save_checkpoint_flag: bool = True,
    keep_checkpoints: int | None = None,
    save_best: bool = False,
    amp: bool = False,
    weight_decay: float = 1e-8,
    momentum: float | None = None,
    gradient_clipping: float = 1.0,
    optimizer: str = "rmsprop",
    nesterov: bool = False,
    dice_weight: float = 1.0,
    lr_scheduler: str = "plateau",
    lr_step_size: int = 10,
    lr_gamma: float = 0.1,
    lr_min: float = 0.0,
    remat: bool = False,
    data_parallel: bool = False,
    use_wandb: bool = False,
    checkpoint_dir: Path = dir_checkpoint,
    seed: int = 0,
    save_optimizer: bool = False,
    resume: str | None = None,
    device_preprocess: bool = False,
    device_dataset: bool = False,
    kernels: str | None = None,
    spatial_parallel: int = 1,
    tensor_parallel: int = 1,
    pipeline_parallel: int = 1,
    accum_steps: int = 1,
    ema_decay: float | None = None,
    augment=None,
    vmem_limit_kib: int | None = None,
    val_per_epoch: int = 5,
    zero: bool = False,
    early_stopping: int | None = None,
):
    """The reference's train_model, TPU-native. Returns (params, bn_state, history)."""
    if accum_steps > 1 and batch_size % accum_steps:
        raise ValueError(
            f"--accum-steps {accum_steps} must divide --batch-size {batch_size}"
        )
    if early_stopping is not None and early_stopping < 1:
        raise ValueError(f"--early-stopping must be >= 1, got {early_stopping}")
    if zero:
        # ZeRO-1 shards the fp32 RMSprop trees over the 'data' axis
        # (parallel/zero.py) — it needs that axis, the GSPMD step (the
        # shard_map Pallas path pins P() state specs), and not tp (which
        # already shards the state over 'model').
        if not data_parallel:
            raise ValueError("--zero requires --data-parallel")
        if kernels == "pallas":
            raise ValueError("--zero requires the XLA backend")
        if jax.process_count() > 1:
            # The sharded fp32 state spans non-addressable devices under
            # multi-host, so checkpointing (device_get in
            # AsyncCheckpointer.save — incl. the unconditional interrupt
            # save) cannot fetch it; reject up front instead of dying at
            # the first save.
            raise ValueError("--zero is single-host for now (sharded "
                             "optimizer state cannot be fetched for "
                             "checkpointing across processes)")
        if tensor_parallel > 1:
            raise ValueError("--zero is redundant with --tensor-parallel "
                             "(tp already shards the optimizer state)")
        if pipeline_parallel > 1:
            raise ValueError("--zero does not compose with "
                             "--pipeline-parallel (stages hold 1/S of the "
                             "state already)")
    if tensor_parallel > 1 and not data_parallel:
        # The 'model' axis is part of the one global mesh; a tp-only run is
        # the degenerate mesh with data axis 1, reached the same way.
        raise ValueError("--tensor-parallel requires --data-parallel "
                         "(the data axis may still end up size 1)")
    if pipeline_parallel > 1:
        # Depth partitioning assigns whole devices to stages (GPipe,
        # parallel/pipeline.py) — it is an ALTERNATIVE to the GSPMD mesh
        # axes, not a fourth axis of the same mesh.
        if optimizer != "rmsprop":
            raise ValueError(
                "--pipeline-parallel supports the reference RMSprop only "
                "(the stage runner splits RMSpropState by stage; "
                "parallel/pipeline.py)")
        if data_parallel or spatial_parallel > 1 or tensor_parallel > 1:
            raise ValueError(
                "--pipeline-parallel does not compose with --data-parallel/"
                "--spatial-parallel/--tensor-parallel (depth partitioning "
                "claims whole devices; use the dp×sp×tp mesh for those "
                "regimes)")
        if kernels == "pallas":
            raise ValueError("--pipeline-parallel requires the XLA backend")
        if ema_decay is not None:
            raise ValueError("--ema-decay is not supported with "
                             "--pipeline-parallel (the shadow tree would "
                             "need per-step gathers)")
        if jax.process_count() > 1:
            raise ValueError("--pipeline-parallel is single-host "
                             "(stage-placed devices); use --multihost with "
                             "the GSPMD axes instead")
        if remat:
            # GPipe backward already recomputes each stage from its input
            # payload — per-stage remat is the schedule's memory model.
            logger.info("--pipeline-parallel implies per-stage recompute; "
                        "remat flag is redundant and ignored")
    # 1–2. Split into train / validation partitions (torch randperm parity).
    train_idx, val_idx = random_split_indices(len(dataset), val_percent, seed=seed)
    n_train, n_val = len(train_idx), len(val_idx)

    # Mesh first (the device-resident dataset stages onto it).
    sharding = None
    step_mesh = None
    mesh = None
    if data_parallel and jax.device_count() > 1:
        if tensor_parallel > 1:
            # 3-D dp×sp×tp GSPMD: batch over 'data', image height over
            # 'spatial', DoubleConv channels over 'model' (Megatron-style
            # column→row pairing expressed as weight shardings —
            # parallel/tensor.py). For param/optimizer-dominated regimes
            # (wide base_channels) where replicated RMSprop state would not
            # fit per-chip HBM.
            if kernels == "pallas":
                raise ValueError(
                    "--kernels pallas data parallelism is 1-D (shard_map); "
                    "--tensor-parallel requires the XLA backend"
                )
            from tpu_unet.parallel.tensor import make_mesh_3d

            mesh = make_mesh_3d(model=tensor_parallel, spatial=spatial_parallel)
        elif spatial_parallel > 1:
            # 2-D dp×sp GSPMD: batch over 'data', image height over
            # 'spatial' (XLA spatially partitions the convs and inserts the
            # halo exchanges). For when chips outnumber the batch or one
            # image's activations exceed a chip's HBM.
            if kernels == "pallas":
                raise ValueError(
                    "--kernels pallas data parallelism is 1-D (shard_map); "
                    "--spatial-parallel requires the XLA backend"
                )
            mesh = make_mesh_2d(spatial_parallel)
        else:
            mesh = make_mesh()
        sharding = image_sharding(mesh)
        if tensor_parallel > 1:
            from tpu_unet.parallel.tensor import shard_model

            params, bn_state = shard_model(mesh, params, bn_state)
        else:
            rep = replicated(mesh)
            params = jax.device_put(params, rep)
            bn_state = jax.device_put(bn_state, rep)
        if kernels == "pallas":
            # pallas_call is not auto-partitionable under GSPMD, so the DP
            # step runs under shard_map instead: each device runs the fused
            # kernels on its local batch shard, BN stat sums are psum'd
            # (global-batch stats, same semantics as the GSPMD XLA path).
            step_mesh = mesh

    # 3. Data loaders: host decode threads + device double-buffer prefetch,
    # or the HBM-resident corpus (per-step H2D = the index vector).
    from tpu_unet.parallel.multihost import is_primary

    multihost = jax.process_count() > 1
    primary = is_primary()
    if multihost:
        # Multi-host SPMD (parallel/multihost.py): every process loads only
        # its rows of each global batch (or, with --device-dataset, stages
        # only its shard of the corpus) and the global arrays feed the same
        # GSPMD step. Requires --data-parallel (the global mesh IS the
        # point); device-preprocess and the host double-buffer prefetch are
        # single-process features.
        if not data_parallel:
            raise ValueError("multi-host training requires --data-parallel")
        if device_preprocess:
            raise ValueError("--device-preprocess is not supported under "
                             "multi-host yet")
    if multihost and not device_dataset:
        from tpu_unet.parallel.multihost import MultiHostBatches

        train_loader = MultiHostBatches(
            dataset, train_idx, batch_size, sharding, shuffle=True, seed=seed
        )
        # Val batch: the multihost loader drops batches that don't divide
        # the process count, so a val split smaller than batch_size must
        # shrink its batch — otherwise validation would silently yield
        # NOTHING and the plateau scheduler would decay lr on constant 0.0.
        nproc = jax.process_count()
        val_batch = min(batch_size, (n_val // nproc) * nproc)
        if n_val and val_batch == 0:
            raise ValueError(
                f"validation split ({n_val} samples) is smaller than the "
                f"process count ({nproc}); raise --validation or the "
                "dataset size for multi-host training"
            )
        val_loader = MultiHostBatches(dataset, val_idx, val_batch or batch_size,
                                      sharding)
    elif device_dataset:
        if device_preprocess:
            raise ValueError("--device-dataset already preprocesses on host once; "
                             "it is mutually exclusive with --device-preprocess")
        from tpu_unet.data.device_cache import DeviceResidentData

        dd = DeviceResidentData(
            dataset,
            # Under DP the corpus rows live sharded over the mesh and the
            # gather is a GSPMD program whose output batch is already laid
            # out for the train step (XLA inserts the sample->slot
            # all-to-all).
            data_sharding=batch_sharding(mesh) if mesh is not None else None,
            out_sharding=sharding,
        )
        train_loader = dd.batches(train_idx, batch_size, shuffle=True, seed=seed,
                                  drop_last=data_parallel)
        val_loader = dd.batches(val_idx, batch_size)
    else:
        train_loader = DataLoader(
            dataset, batch_size, shuffle=True, indices=train_idx, seed=seed,
            drop_last=data_parallel,  # static sharded shapes under DP
        )
        val_loader = DataLoader(dataset, batch_size, shuffle=False, indices=val_idx)
    if device_preprocess:
        # North-star fast path: host decodes uint8 only; resize/normalize/
        # palette-index run on device (data/device_pipeline.py).
        from tpu_unet.data.device_pipeline import DevicePipeline

        def wrap(loader):
            return DevicePipeline(
                loader, dataset.mask_values, dataset.scale,
                dataset.raw_h, dataset.raw_w,
            )

        train_loader = wrap(train_loader)
        val_loader = wrap(val_loader)

    experiment = None
    if use_wandb and primary:  # one W&B run per job, not per host
        try:
            import wandb

            os.environ.setdefault("WANDB_MODE", "offline")
            experiment = wandb.init(project="U-Net", resume="allow", anonymous="must")
            experiment.config.update(
                dict(epochs=epochs, batch_size=batch_size, learning_rate=learning_rate,
                     val_percent=val_percent, amp=amp,
                     # Beyond-reference knobs, so runs stay comparable:
                     optimizer=optimizer, lr_scheduler=lr_scheduler,
                     dice_weight=dice_weight, arch=config.arch)
            )
        except Exception as e:  # wandb genuinely optional (no network here)
            logger.warning("wandb unavailable (%s); continuing without it", e)

    logger.info(
        "Starting training: epochs=%d batch=%d lr=%g train=%d val=%d amp=%s devices=%d",
        epochs, batch_size, learning_rate, n_train, n_val, amp, jax.device_count(),
    )

    opt_init, _ = get_optimizer(optimizer, weight_decay=weight_decay,
                                momentum=momentum, nesterov=nesterov)
    opt_state = opt_init(params)
    # The reference's schedule is plateau-on-val-Dice (patience 5); the menu
    # (optim/schedulers.py) adds epoch-stepped torch schedules. All feed the
    # SAME traced lr scalar — schedule changes never recompile the step.
    scheduler = get_scheduler(
        lr_scheduler, learning_rate, epochs=epochs,
        step_size=lr_step_size, gamma=lr_gamma, eta_min=lr_min,
    )
    start_epoch = 1
    resume_es = None  # early-stopping (best, bad) saved by a prior run
    if resume:
        # Full-state resume (beyond-reference: the reference's --load restores
        # weights only and restarts epochs; SURVEY.md §5). Optimizer state
        # only restores into the SAME optimizer's structure — checkpoints
        # are self-describing (extra['optimizer']), so a mismatch degrades
        # to weights-only resume with a warning instead of cryptic opt/
        # key errors.
        _, prev_extra = read_checkpoint_meta(resume)
        saved_opt = prev_extra.get("optimizer", "rmsprop")
        opt_like = opt_state
        if saved_opt != optimizer:
            logger.warning(
                "Resume checkpoint was written by optimizer %r but this run "
                "uses %r — optimizer state (if any) is discarded; weights/"
                "scheduler/epoch still restore.", saved_opt, optimizer)
            opt_like = None
        params, bn_state, _, extra = load_checkpoint(resume, params, bn_state, opt_like)
        if "opt_state" in extra:
            opt_state = extra.pop("opt_state")
        start_epoch = int(extra.get("epoch", 0)) + 1
        if "scheduler" in extra:
            # Full schedule state (plateau: best/num_bad_epochs/cooldown;
            # epoch schedules: base_lr/epoch), so a resumed run neither
            # forgets plateau progress nor re-triggers lr drops. The saved
            # name (missing in pre-menu checkpoints = plateau) must match
            # the configured schedule; otherwise start the new schedule
            # fresh rather than load mismatched fields.
            sched_state = dict(extra["scheduler"])
            saved_sched = sched_state.pop("name", "plateau")
            if saved_sched == lr_scheduler:
                scheduler.load_state_dict(sched_state)
            else:
                logger.warning(
                    "Resume checkpoint used lr scheduler %r but this run "
                    "uses %r — starting the schedule fresh at lr %g.",
                    saved_sched, lr_scheduler, scheduler.lr)
        else:  # older checkpoints carry only the lr
            scheduler.lr = float(extra.get("lr", learning_rate))
        resume_es = extra.get("early_stop")
        logger.info("Resumed from %s at epoch %d (lr %g)", resume, start_epoch, scheduler.lr)
        if sharding is not None:
            # Re-place: the load put the restored trees on one device.
            if tensor_parallel > 1:
                from tpu_unet.parallel.tensor import shard_model

                params, bn_state = shard_model(mesh, params, bn_state)
            else:
                rep = replicated(sharding.mesh)
                params = jax.device_put(params, rep)
                bn_state = jax.device_put(bn_state, rep)
    opt_shardings = None
    if sharding is not None:
        if tensor_parallel > 1:
            # Shard the fp32 RMSprop trees like the params: the optimizer
            # update stays shard-local, which is the memory point of tp.
            from tpu_unet.parallel.tensor import shard_opt_state

            opt_state = shard_opt_state(mesh, opt_state, params)
        elif zero:
            # ZeRO-1: fp32 state 1/N per chip, one all-gathered param delta
            # per step (parallel/zero.py); matches the replicated update
            # to fp32 round-off (the reduce-scatter regroups reductions).
            from tpu_unet.parallel.zero import (
                shard_opt_state_zero, zero_opt_shardings,
            )

            opt_state = shard_opt_state_zero(mesh, opt_state, params)
            opt_shardings = zero_opt_shardings(mesh, opt_state, params)
        else:
            opt_state = jax.device_put(opt_state, replicated(sharding.mesh))
    pipeline = None
    if pipeline_parallel > 1:
        from tpu_unet.parallel.pipeline import PipelineRunner

        # --accum-steps doubles as the pipeline's microbatch count (they are
        # the same semantics: strided microbatches, averaged gradient, one
        # update); default = one microbatch per stage so the GPipe bubble
        # stays bounded at (S-1)/(2S-1).
        microbatches = accum_steps if accum_steps > 1 else pipeline_parallel
        pipeline = PipelineRunner(
            params, bn_state, config,
            n_stages=pipeline_parallel, microbatches=microbatches,
            opt_state=opt_state, amp=amp, weight_decay=weight_decay,
            momentum=0.999 if momentum is None else momentum,
            grad_clip=gradient_clipping, dice_weight=dice_weight,
        )
        logger.info(
            "Pipeline parallelism: %d stages %s over %d devices, "
            "%d microbatches/step",
            pipeline_parallel,
            [f"{s[0]}..{s[-1]}" if len(s) > 1 else s[0]
             for s in pipeline._stages],
            pipeline_parallel, microbatches,
        )
        train_step = None
    else:
        train_step = make_train_step(
            config, amp=amp, remat=remat, weight_decay=weight_decay,
            momentum=momentum, grad_clip=gradient_clipping,
            kernels=kernels, mesh=step_mesh, accum_steps=accum_steps,
            vmem_limit_kib=vmem_limit_kib, opt_shardings=opt_shardings,
            optimizer=optimizer, nesterov=nesterov, dice_weight=dice_weight,
        )

    # W&B histograms (5×/epoch) get their own compiled step instead of
    # making every train step carry the grad pytree as a program output all
    # epoch, and the fetch is SUBSAMPLED on device: ≤ _HIST_CAP elements per
    # leaf (~4 MB total at 31M params instead of 2×124 MB ≈ tens of seconds
    # through the ~16 MB/s relay — VERDICT r2 weak #4). Gradients are
    # recomputed at the current params on the last train batch — the same
    # observability signal the reference's post-step p.grad histograms give.
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
        """Eval forward for the W&B sample panel (pred mask at validation)."""
        logits, _ = unet_apply(
            p, s, im, config=config, train=False,
            compute_dtype=jnp.bfloat16 if amp else None,
        )
        return logits

    # EMA shadow weights (beyond-reference; no reference counterpart):
    # ema ← d·ema + (1−d)·params after every optimizer step, as its own
    # tiny jitted program (one fused multiply-add sweep over the tree —
    # dispatch is async, so it rides the step pipeline). The shadow tree
    # inherits the params' shardings (tp/replicated) via tree.map.
    ema_params = None
    ema_update = None
    if ema_decay is not None:
        if not (0.0 < ema_decay < 1.0):
            raise ValueError(f"--ema-decay must be in (0, 1), got {ema_decay}")

        @functools.partial(jax.jit, donate_argnums=(0,))
        def ema_update(e, p):
            d = jnp.float32(ema_decay)
            return jax.tree.map(lambda a, b: a * d + b * (1.0 - d), e, p)

        # Horizon guardrail (measured foot-gun, BENCH_NOTES r3): the shadow
        # tree starts at the INITIAL params, and d^T of that mass survives a
        # T-step run — 0.999 over 480 steps leaves 62% random init in the
        # average and a near-zero EMA Dice. Warn when >10% would remain.
        total_steps = (epochs - start_epoch + 1) * max(1, len(train_loader))
        init_mass = ema_decay ** max(0, total_steps)
        if total_steps > 0 and init_mass > 0.1:
            logger.warning(
                "--ema-decay %g keeps %.0f%% of the INITIAL weights after "
                "this run's ~%d steps — the EMA checkpoint will trail far "
                "behind training. Use a decay with horizon 1/(1-d) well "
                "below the step count (e.g. %.3g).",
                ema_decay, 100 * init_mass, total_steps,
                max(0.5, 1.0 - 10.0 / total_steps),
            )
        ema_params = jax.tree.map(jnp.copy, params)
        if resume:
            # Continue the average across restarts when the sibling
            # _ema.npz exists (written next to every per-epoch checkpoint);
            # otherwise the average restarts from the restored params.
            rp = Path(resume)
            ema_path = rp.with_name(rp.name.replace(".npz", "_ema.npz"))
            if ema_path.exists():
                ema_params = load_checkpoint(ema_path, ema_params, bn_state)[0]
                if sharding is not None:
                    # Match the live params' placement exactly.
                    ema_params = jax.tree.map(
                        lambda e, p: jax.device_put(e, p.sharding),
                        ema_params, params)
                logger.info("Resumed EMA weights from %s", ema_path)

    history = {"train_loss": [], "val_dice": [], "lr": []}
    if ema_decay is not None:
        history["val_dice_ema"] = []
    global_step = 0
    hist_batch = None  # last full-size batch, for W&B histogram sampling
    best_dice = float("-inf")  # --save-best tracking
    if save_best:
        # Seed from an existing best checkpoint so a --resume run can't
        # clobber a better model with its first (worse) validation.
        best_path = checkpoint_dir / "checkpoint_best.npz"
        if best_path.exists():
            try:
                _, best_extra = read_checkpoint_meta(best_path)
                best_dice = float(best_extra.get("val_dice", best_dice))
                logger.info("Existing checkpoint_best.npz at val Dice %.4f "
                            "— only better models will overwrite it", best_dice)
            except Exception as e:  # unreadable file: treat as absent
                logger.warning("Could not read %s (%s); starting best "
                               "tracking fresh", best_path, e)
    # Reference cadence: val_per_epoch=5 → division_step = n_train//(5·B).
    division_step = n_train // (max(1, val_per_epoch) * batch_size)
    checkpointer = AsyncCheckpointer()

    # Preemption-safe training: production pods stop with SIGTERM + a grace
    # period; interactive runs stop with Ctrl-C. Either sets a flag the step
    # loop honors at the next safe boundary, saving a fully-resumable
    # INTERRUPTED.npz (params+BN+optimizer+scheduler+epoch) before returning
    # normally. The legacy reference saved INTERRUPTED.pth on
    # KeyboardInterrupt (reference: legacy train.py __main__, UNVERIFIED
    # mount — same contingency class as SURVEY.md §A.1); here it is the
    # checkpoint/resume machinery, so nothing is lost but the tail of the
    # current epoch. A second Ctrl-C aborts immediately.
    import signal as _signal
    import threading as _threading

    stop_requested = {"set": False}
    _prev_handlers: dict = {}
    if _threading.current_thread() is _threading.main_thread():
        def _on_stop_signal(signum, frame):
            if stop_requested["set"] and signum == _signal.SIGINT:
                raise KeyboardInterrupt  # second Ctrl-C: abort now
            stop_requested["set"] = True
            logger.info(
                "%s received — will save a resumable checkpoint and stop at "
                "the next batch boundary", _signal.Signals(signum).name,
            )
        for _sig in (_signal.SIGTERM, _signal.SIGINT):
            _prev_handlers[_sig] = _signal.signal(_sig, _on_stop_signal)

    def _interrupt_save():
        """Save INTERRUPTED.npz with the full resumable state (primary only)."""
        if not primary:
            return None
        checkpoint_dir.mkdir(parents=True, exist_ok=True)
        path = checkpoint_dir / "INTERRUPTED.npz"
        checkpointer.save(
            path, params, bn_state,
            mask_values=getattr(dataset, "mask_values", None),
            # epoch-1: the interrupted epoch is incomplete, so --resume
            # re-runs it from its start (optimizer/scheduler state intact).
            extra={"epoch": epoch - 1, "step": global_step,
                   "lr": scheduler.lr, "interrupted": True,
                   "scheduler": {"name": lr_scheduler, **scheduler.state_dict()},
                   "optimizer": optimizer,
                   **({"early_stop": {"best": es_best, "bad": es_bad}}
                      if es_best != -float("inf") else {}),
                   "config": config._asdict()},
            opt_state=opt_state,  # always included: resumability is the point
        )
        if ema_params is not None:
            # Sibling EMA file: --resume INTERRUPTED.npz then continues the
            # average instead of restarting it from the restored params.
            checkpointer.save(
                checkpoint_dir / "INTERRUPTED_ema.npz",
                ema_params, bn_state,
                mask_values=getattr(dataset, "mask_values", None),
                extra={"epoch": epoch - 1, "ema_decay": ema_decay,
                       "config": config._asdict()},
            )
        return path

    interrupted = False
    # Early stopping (beyond-reference): stop after N consecutive
    # validations without val-Dice improvement. val_dice is identical on
    # every process (the sharded eval returns a replicated scalar), so the
    # decision is synchronized under --multihost with no broadcast.
    early_stopped = False
    es_best, es_bad = -float("inf"), 0
    if resume_es:
        # Resume the patience bookkeeping with everything else — otherwise
        # a resumed run forgets the best Dice and trains past the
        # configured stop (code-review r3).
        es_best = float(resume_es.get("best", es_best))
        es_bad = int(resume_es.get("bad", es_bad))
    epoch = start_epoch  # defined even if the loop body never runs
    last_epoch = start_epoch - 1

    try:
        from tqdm import tqdm
    except ImportError:  # progress bars are cosmetic; never required
        tqdm = None

    pbar = None  # assigned per-epoch below; drain_losses may run first

    def drain_losses():
        # One batched D2H fetch; per-step wandb logs ride the same drain so
        # --wandb never reintroduces the ~29 ms/step float() sync.
        if pending_losses:
            vals = [float(l) for l in jax.device_get(pending_losses)]
            history["train_loss"].extend(vals)
            if experiment:
                for (s, ep), v in zip(pending_meta, vals):
                    experiment.log({"train loss": v, "step": s, "epoch": ep})
            if pbar:
                pbar.set_postfix(loss=f"{vals[-1]:.4f}")
            pending_losses.clear()
            pending_meta.clear()

    try:
        for epoch in range(start_epoch, epochs + 1):
            pending_losses: list = []
            pending_meta: list = []
            feed = (
                train_loader  # batches are already device-resident / global
                if device_dataset or multihost
                else prefetch_to_device(train_loader, buffer_size=2, sharding=sharding)
            )
            pbar = (
                tqdm(total=n_train, desc=f"Epoch {epoch}/{epochs}", unit="img", leave=False)
                if tqdm and primary else None
            )
            for batch in feed:
                if stop_requested["set"] and not multihost:
                    interrupted = True  # single-host: act at this batch boundary
                    break
                images = jnp.asarray(batch["image"])
                masks = jnp.asarray(batch["mask"])
                if augment is not None:
                    # Device-side augmentation (beyond-reference, data/augment.py):
                    # one jitted program over the already-resident batch, keyed by
                    # (seed, global_step) so every draw is reproducible regardless
                    # of host iteration timing.
                    from tpu_unet.data.augment import augment_batch

                    akey = jax.random.fold_in(jax.random.PRNGKey(seed), global_step)
                    images, masks = augment_batch(akey, images, masks, config=augment)
                if pipeline is not None:
                    loss, _ = pipeline.step(images, masks, scheduler.lr)
                else:
                    params, bn_state, opt_state, loss, _ = train_step(
                        params, bn_state, opt_state, images, masks,
                        jnp.float32(scheduler.lr),
                    )
                if ema_update is not None:
                    ema_params = ema_update(ema_params, params)
                global_step += 1
                if experiment is not None and images.shape[0] == batch_size:
                    # Histograms sample the last FULL batch: a trailing partial
                    # batch would hand hist_sample_step a second shape and cost
                    # another full fwd+bwd compile (~10 min through the relay)
                    # mid-training. images/masks are not donated, so holding the
                    # reference keeps exactly one extra batch alive.
                    hist_batch = (images, masks)
                # Keep the loss on device: a float() here costs a full D2H sync
                # (~29 ms on the relay) EVERY step; values (and wandb step logs)
                # are fetched lazily at validation/epoch boundaries instead.
                pending_losses.append(loss)
                pending_meta.append((global_step, epoch))
                if pbar:
                    # Postfix updates ride the lazy drain (validation/epoch
                    # boundaries) — a float(loss) here would reintroduce the
                    # very D2H sync the comment above avoids.
                    pbar.update(images.shape[0])

                # Validation 5×/epoch, reference cadence.
                if division_step > 0 and global_step % division_step == 0:
                    drain_losses()
                    if pipeline is not None:
                        # Refresh the full trees from the stage devices once
                        # per validation (cheap D2D) — evaluation, plateau,
                        # --save-best, and W&B all read the gathered copies.
                        params, bn_state, opt_state = pipeline.gather()
                    val_dice, val_iou = evaluate(params, bn_state, val_loader, config,
                                                 amp, sharding=sharding)
                    lr_now = scheduler.step(val_dice)
                    history["val_dice"].append(val_dice)
                    history["lr"].append(lr_now)
                    logger.info("Validation Dice score: %f (IoU %f)", val_dice, val_iou)
                    if early_stopping is not None:
                        if val_dice > es_best:
                            es_best, es_bad = val_dice, 0
                        else:
                            es_bad += 1
                            if es_bad >= early_stopping:
                                early_stopped = True
                                logger.info(
                                    "Early stopping: no val Dice improvement "
                                    "in %d validations (best %.4f)",
                                    early_stopping, es_best)
                    if ema_params is not None:
                        # The shadow weights' own validation (same sharded
                        # path; runs on every host under --multihost).
                        ema_dice, _ = evaluate(ema_params, bn_state, val_loader,
                                               config, amp, sharding=sharding)
                        history["val_dice_ema"].append(ema_dice)
                        logger.info("Validation Dice (EMA): %f", ema_dice)
                    if save_best and primary and val_dice > best_dice:
                        # Best-model tracking (beyond-reference): one extra file
                        # outside the per-epoch series, never touched by
                        # --keep-checkpoints retention.
                        best_dice = val_dice
                        checkpoint_dir.mkdir(parents=True, exist_ok=True)
                        checkpointer.save(
                            checkpoint_dir / "checkpoint_best.npz",
                            params, bn_state,
                            mask_values=getattr(dataset, "mask_values", None),
                            extra={"epoch": epoch, "step": global_step,
                                   "val_dice": val_dice, "lr": scheduler.lr,
                                   "optimizer": optimizer,
                                   "config": config._asdict()},
                            opt_state=opt_state if save_optimizer else None,
                        )
                        logger.info("New best val Dice %.4f — checkpoint_best.npz "
                                    "updated", val_dice)
                    if experiment and multihost:
                        # Multi-host: every jit must be entered by ALL processes,
                        # but the experiment lives on the primary only — running
                        # hist_sample_step/predict_logits here would deadlock the
                        # other hosts. Log the scalars; skip the heavy panel.
                        experiment.log({
                            "learning rate": lr_now, "validation Dice": val_dice,
                            "validation IoU": val_iou, "step": global_step,
                            "epoch": epoch,
                        })
                    elif experiment:
                        # Reference parity: weight AND gradient histograms + the
                        # sample triplet (image, true mask, predicted mask) at
                        # each validation (train.py W&B block, SURVEY.md §2 #22).
                        # Both trees come back subsampled from one compiled step
                        # (hist_sample_step above) — a few MB per validation.
                        import wandb

                        h_imgs, h_masks = hist_batch if hist_batch else (images, masks)
                        if accum_steps > 1:
                            # The hist step has no accumulation scan: keep its
                            # program microbatch-sized, or it would compile the
                            # very full-batch program --accum-steps avoids
                            # (b32 kills the remote compile helper).
                            mb = max(1, h_imgs.shape[0] // accum_steps)
                            h_imgs, h_masks = h_imgs[:mb], h_masks[:mb]
                        w_sub, g_sub = jax.device_get(
                            hist_sample_step(params, bn_state, h_imgs, h_masks)
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

                        lg = predict_logits(params, bn_state, images[:1])
                        if config.n_classes > 1:
                            pred0 = np.asarray(jnp.argmax(lg[0], axis=-1))
                        else:
                            pred0 = np.asarray(jax.nn.sigmoid(lg[0, ..., 0]) > 0.5)
                        experiment.log({
                            "learning rate": lr_now, "validation Dice": val_dice,
                            "validation IoU": val_iou, "step": global_step, "epoch": epoch,
                            "images": wandb.Image(np.asarray(images[0])),
                            "masks": {
                                "true": wandb.Image(np.asarray(masks[0]).astype(np.float32)),
                                "pred": wandb.Image(pred0.astype(np.float32)),
                            },
                            **tree_histograms(w_sub, "Weights/"),
                            **tree_histograms(g_sub, "Gradients/"),
                        })
                    if multihost:
                        # Synchronized stop: every process reaches this division
                        # step, so broadcasting the PRIMARY's SIGTERM/SIGINT flag
                        # makes all hosts leave the loop at the same batch — a
                        # unilateral local break would strand the other hosts in
                        # the next step's collectives.
                        from jax.experimental import multihost_utils

                        interrupted = bool(multihost_utils.broadcast_one_to_all(
                            np.int32(1 if stop_requested["set"] else 0)))
                if interrupted or early_stopped:
                    break

            if pbar:
                pbar.close()
            drain_losses()
            if pipeline is not None:
                # Epoch boundary: sync the gathered trees for checkpointing
                # (and the interrupt save below).
                params, bn_state, opt_state = pipeline.gather()
            if interrupted:
                ipath = _interrupt_save()
                if ipath is not None:
                    logger.info("Training interrupted — resumable checkpoint "
                                "saved to %s (continue with --resume %s)",
                                ipath, ipath)
                break
            epoch_losses = history["train_loss"][-len(train_loader):]
            logger.info(
                "Epoch %d finished, mean loss %f",
                epoch, float(np.mean(epoch_losses)) if epoch_losses else float("nan"),
            )
            # Epoch-stepped schedules (cosine/step) advance here — torch's
            # scheduler.step()-at-epoch-end call point; plateau no-ops (it
            # already reacted to val Dice above). The checkpoint below
            # carries the advanced state, so --resume continues the curve.
            scheduler.epoch_end()
            if save_checkpoint_flag and primary:  # one writer across hosts
                checkpoint_dir.mkdir(parents=True, exist_ok=True)
                # Async: fetch-to-host now, write on a background thread while
                # the next epoch trains.
                checkpointer.save(
                    checkpoint_dir / f"checkpoint_epoch{epoch}.npz",
                    params, bn_state,
                    mask_values=getattr(dataset, "mask_values", None),
                    # Self-describing checkpoints: loaders rebuild the exact
                    # model config (arch, classes, deep supervision, ...).
                    extra={"epoch": epoch, "lr": scheduler.lr,
                           "scheduler": {"name": lr_scheduler, **scheduler.state_dict()},
                           "optimizer": optimizer,
                           **({"early_stop": {"best": es_best, "bad": es_bad}}
                              if es_best != -float("inf") else {}),
                           "config": config._asdict()},
                    opt_state=opt_state if save_optimizer else None,
                )
                logger.info("Checkpoint %d saved!", epoch)
                if ema_params is not None:
                    # Sibling EMA checkpoint: loads anywhere a normal one
                    # does (predict/serve/evaluate/export), and lets a
                    # --resume run continue the average.
                    checkpointer.save(
                        checkpoint_dir / f"checkpoint_epoch{epoch}_ema.npz",
                        ema_params, bn_state,
                        mask_values=getattr(dataset, "mask_values", None),
                        extra={"epoch": epoch, "ema_decay": ema_decay,
                               "config": config._asdict()},
                    )
                if keep_checkpoints:
                    # Retention (beyond-reference; the reference keeps every
                    # epoch — ~124 MB each at 31M params): prune epochs older
                    # than the newest N. Only strictly-older files are touched,
                    # so the async write of THIS epoch is never raced.
                    _prune_checkpoints(checkpoint_dir, epoch, keep_checkpoints)
            last_epoch = epoch
            if early_stopped:
                # The per-epoch checkpoint above already holds the final
                # weights (the stop happened at a validation inside this
                # epoch, so the epoch is partial — logged, not hidden).
                logger.info("Stopped early during epoch %d.", epoch)
                break
    finally:
        # Always restore the caller's handlers: a leaked no-op SIGTERM
        # handler would make the process un-stoppable afterwards.
        for _sig, _h in _prev_handlers.items():
            _signal.signal(_sig, _h)


    if pipeline is not None:
        params, bn_state, opt_state = pipeline.gather()
    checkpointer.wait()
    if save_checkpoint_flag and primary and keep_checkpoints and epochs >= start_epoch:
        # Final prune AFTER the writer drains: an epoch whose async write was
        # still queued when its per-epoch prune ran materializes afterwards
        # (unlink(missing_ok) was a no-op), so without this pass more than N
        # files can survive exit (ADVICE r2).
        _prune_checkpoints(checkpoint_dir, last_epoch, keep_checkpoints)
    return params, bn_state, history


def _prune_checkpoints(checkpoint_dir: Path, epoch: int, keep: int) -> None:
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
        return train_model(
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
