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

Layout (VERDICT r4 next #7): ``train_model`` is the orchestrator; setup
phases live in module-level helpers (`_check_train_flags`, `_build_mesh`,
`_build_loaders`, `_restore_resume`, `_place_opt_state`, `_build_stepper`),
and the sibling modules own EMA (train_ema), logging (train_logging),
signals (train_signals), and checkpoint policy (train_checkpoints).
"""

from __future__ import annotations

import functools
import logging
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from tpu_unet import train_ema
from tpu_unet.checkpoint import load_checkpoint, read_checkpoint_meta
from tpu_unet.data import (
    DataLoader,
    prefetch_to_device,
    random_split_indices,
)
from tpu_unet.evaluate import evaluate
from tpu_unet.losses import bce_with_logits, cross_entropy, dice_loss
from tpu_unet.models import UNetConfig, unet_apply
from tpu_unet.optim import clip_grad_norm, get_optimizer, get_scheduler
from tpu_unet.parallel.mesh import (
    batch_sharding, image_sharding, make_mesh, make_mesh_2d, replicated,
)
from tpu_unet.train_checkpoints import CheckpointPolicy
from tpu_unet.train_logging import LossDrain, WandbValidationPanel, init_wandb
from tpu_unet.train_signals import StopSignal

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


def _check_train_flags(*, accum_steps, batch_size, early_stopping, zero,
                       data_parallel, kernels, tensor_parallel,
                       pipeline_parallel, spatial_parallel, optimizer,
                       ema_decay, remat):
    """Reject invalid flag compositions up front (one clear error instead of
    a cryptic failure deep in setup). Pure checks — no state."""
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


def _build_mesh(params, bn_state, *, data_parallel, tensor_parallel,
                spatial_parallel, kernels):
    """GSPMD mesh selection + initial tree placement.

    Returns (params, bn_state, mesh, step_mesh, sharding): ``mesh`` is the
    global device mesh (None off-DP), ``sharding`` the batch image sharding,
    ``step_mesh`` non-None only for the shard_map Pallas DP path.
    """
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
    return params, bn_state, mesh, step_mesh, sharding


def _build_loaders(dataset, train_idx, val_idx, *, batch_size, sharding, mesh,
                   seed, data_parallel, device_dataset, device_preprocess,
                   multihost):
    """Train/val feeds: host decode threads + device double-buffer prefetch,
    the HBM-resident corpus, or the per-process multi-host loader."""
    n_val = len(val_idx)
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
    return train_loader, val_loader


def _restore_resume(resume, params, bn_state, opt_state, scheduler, *,
                    optimizer, lr_scheduler, learning_rate, sharding, mesh,
                    tensor_parallel):
    """Full-state resume (beyond-reference: the reference's --load restores
    weights only and restarts epochs; SURVEY.md §5). Optimizer state only
    restores into the SAME optimizer's structure — checkpoints are
    self-describing (extra['optimizer']), so a mismatch degrades to
    weights-only resume with a warning instead of cryptic opt/key errors.

    Returns (params, bn_state, opt_state, start_epoch, resume_es) with the
    scheduler mutated in place and trees re-placed on the mesh.
    """
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
    logger.info("Resumed from %s at epoch %d (lr %g)", resume, start_epoch,
                scheduler.lr)
    if sharding is not None:
        # Re-place: the load put the restored trees on one device.
        if tensor_parallel > 1:
            from tpu_unet.parallel.tensor import shard_model

            params, bn_state = shard_model(mesh, params, bn_state)
        else:
            rep = replicated(sharding.mesh)
            params = jax.device_put(params, rep)
            bn_state = jax.device_put(bn_state, rep)
    return params, bn_state, opt_state, start_epoch, resume_es


def _place_opt_state(opt_state, params, *, sharding, mesh, tensor_parallel,
                     zero):
    """Optimizer-state placement on the mesh. Returns (opt_state,
    opt_shardings) — opt_shardings non-None only for ZeRO-1, where the step
    pins its outputs to the 1/N placement."""
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
    return opt_state, opt_shardings


def _build_stepper(params, bn_state, opt_state, config, *, pipeline_parallel,
                   accum_steps, amp, weight_decay, momentum,
                   gradient_clipping, dice_weight, remat, kernels, step_mesh,
                   vmem_limit_kib, opt_shardings, optimizer, nesterov):
    """Either the GPipe runner or the fused jitted step.

    Returns (pipeline, train_step) — exactly one is non-None.
    """
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
        return pipeline, None
    train_step = make_train_step(
        config, amp=amp, remat=remat, weight_decay=weight_decay,
        momentum=momentum, grad_clip=gradient_clipping,
        kernels=kernels, mesh=step_mesh, accum_steps=accum_steps,
        vmem_limit_kib=vmem_limit_kib, opt_shardings=opt_shardings,
        optimizer=optimizer, nesterov=nesterov, dice_weight=dice_weight,
    )
    return None, train_step


def _validation_pass(*, params, bn_state, opt_state, pipeline, val_loader,
                     config, amp, sharding, scheduler, history, ema,
                     early_stopping, es_best, es_bad, policy, panel, epoch,
                     global_step, images, masks, hist_batch, multihost, stop):
    """One validation event (reference cadence: 5×/epoch): evaluate, step the
    plateau scheduler, early-stopping bookkeeping, EMA validation, best
    checkpoint, W&B panel, and the multi-host synchronized-stop broadcast.

    Returns (params, bn_state, opt_state, es_best, es_bad, early_stopped,
    interrupted) — the trees change only on the pipeline path (gather).
    """
    if pipeline is not None:
        # Refresh the full trees from the stage devices once per validation
        # (cheap D2D) — evaluation, plateau, --save-best, and W&B all read
        # the gathered copies.
        params, bn_state, opt_state = pipeline.gather()
    val_dice, val_iou = evaluate(params, bn_state, val_loader, config,
                                 amp, sharding=sharding)
    lr_now = scheduler.step(val_dice)
    history["val_dice"].append(val_dice)
    history["lr"].append(lr_now)
    logger.info("Validation Dice score: %f (IoU %f)", val_dice, val_iou)
    early_stopped = False
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
    if ema is not None:
        # The shadow weights' own validation (same sharded path; runs on
        # every host under --multihost).
        ema_dice, _ = evaluate(ema.params, bn_state, val_loader,
                               config, amp, sharding=sharding)
        history["val_dice_ema"].append(ema_dice)
        logger.info("Validation Dice (EMA): %f", ema_dice)
    policy.maybe_save_best(
        val_dice, epoch=epoch, step=global_step,
        lr=scheduler.lr, params=params, bn_state=bn_state,
        opt_state=opt_state,
    )
    # Reference parity W&B surface (train_logging.py): the sample triplet +
    # subsampled weight/grad histograms — scalars only under --multihost
    # (the heavy jits would deadlock the non-primary hosts).
    panel.log(
        lr_now=lr_now, val_dice=val_dice, val_iou=val_iou,
        step=global_step, epoch=epoch, params=params,
        bn_state=bn_state, images=images, masks=masks,
        hist_batch=hist_batch,
    )
    interrupted = False
    if multihost:
        # Synchronized stop: every process reaches this division step, so
        # broadcasting the PRIMARY's SIGTERM/SIGINT flag makes all hosts
        # leave the loop at the same batch — a unilateral local break would
        # strand the other hosts in the next step's collectives.
        from jax.experimental import multihost_utils

        interrupted = bool(multihost_utils.broadcast_one_to_all(
            np.int32(1 if stop.requested else 0)))
    return (params, bn_state, opt_state, es_best, es_bad, early_stopped,
            interrupted)


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
    _check_train_flags(
        accum_steps=accum_steps, batch_size=batch_size,
        early_stopping=early_stopping, zero=zero, data_parallel=data_parallel,
        kernels=kernels, tensor_parallel=tensor_parallel,
        pipeline_parallel=pipeline_parallel, spatial_parallel=spatial_parallel,
        optimizer=optimizer, ema_decay=ema_decay, remat=remat,
    )
    # 1–2. Split into train / validation partitions (torch randperm parity).
    train_idx, val_idx = random_split_indices(len(dataset), val_percent, seed=seed)
    n_train, n_val = len(train_idx), len(val_idx)

    # Mesh first (the device-resident dataset stages onto it), then feeds.
    params, bn_state, mesh, step_mesh, sharding = _build_mesh(
        params, bn_state, data_parallel=data_parallel,
        tensor_parallel=tensor_parallel, spatial_parallel=spatial_parallel,
        kernels=kernels,
    )
    from tpu_unet.parallel.multihost import is_primary

    multihost = jax.process_count() > 1
    primary = is_primary()
    train_loader, val_loader = _build_loaders(
        dataset, train_idx, val_idx, batch_size=batch_size, sharding=sharding,
        mesh=mesh, seed=seed, data_parallel=data_parallel,
        device_dataset=device_dataset, device_preprocess=device_preprocess,
        multihost=multihost,
    )

    experiment = init_wandb(
        use_wandb, primary,
        dict(epochs=epochs, batch_size=batch_size, learning_rate=learning_rate,
             val_percent=val_percent, amp=amp,
             # Beyond-reference knobs, so runs stay comparable:
             optimizer=optimizer, lr_scheduler=lr_scheduler,
             dice_weight=dice_weight, arch=config.arch),
    )

    logger.info(
        "Starting training: epochs=%d batch=%d lr=%g train=%d val=%d amp=%s devices=%d",
        epochs, batch_size, learning_rate, n_train, n_val, amp, jax.device_count(),
    )

    if (config.arch in ("r2u", "r2attu") and optimizer == "rmsprop"
            and (momentum is None or momentum >= 0.99)
            and learning_rate >= 1e-4):
        # Measured on chip (BENCH_NOTES r4): the t=2 recurrence doubles
        # effective conv depth, and RMSprop momentum=0.999 integrates
        # ~1000 normalized steps, so these families blow up within ~10
        # optimizer steps at lr 3e-4 where the other families converge.
        logger.warning(
            "--arch %s at lr %g under RMSprop(momentum>=0.99) diverged in "
            "on-chip measurements (stable at ~3e-5); drop -l ~10x — or use "
            "--optimizer adam, measured at this lr to beat the calibrated "
            "RMSprop recipe by +0.09-0.10 held-out Dice (ARCH_DEMOS.json r5).",
            config.arch, learning_rate)

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
        params, bn_state, opt_state, start_epoch, resume_es = _restore_resume(
            resume, params, bn_state, opt_state, scheduler,
            optimizer=optimizer, lr_scheduler=lr_scheduler,
            learning_rate=learning_rate, sharding=sharding, mesh=mesh,
            tensor_parallel=tensor_parallel,
        )
    opt_state, opt_shardings = _place_opt_state(
        opt_state, params, sharding=sharding, mesh=mesh,
        tensor_parallel=tensor_parallel, zero=zero,
    )
    pipeline, train_step = _build_stepper(
        params, bn_state, opt_state, config,
        pipeline_parallel=pipeline_parallel, accum_steps=accum_steps, amp=amp,
        weight_decay=weight_decay, momentum=momentum,
        gradient_clipping=gradient_clipping, dice_weight=dice_weight,
        remat=remat, kernels=kernels, step_mesh=step_mesh,
        vmem_limit_kib=vmem_limit_kib, opt_shardings=opt_shardings,
        optimizer=optimizer, nesterov=nesterov,
    )

    # The per-validation W&B surface (train_logging.py): scalars always,
    # sample triplet + subsampled weight/grad histograms off-multihost.
    panel = WandbValidationPanel(
        experiment, config=config, amp=amp, remat=remat,
        dice_weight=dice_weight, accum_steps=accum_steps, multihost=multihost,
    )

    # EMA shadow weights (train_ema.py; beyond-reference): validates the
    # decay and warns on the measured horizon foot-gun.
    ema = train_ema.maybe_create(
        ema_decay, params,
        total_steps=(epochs - start_epoch + 1) * max(1, len(train_loader)),
    )
    if ema is not None and resume:
        ema.resume_from_sibling(resume, bn_state, params)

    history = {"train_loss": [], "val_dice": [], "lr": []}
    if ema is not None:
        history["val_dice_ema"] = []
    global_step = 0
    hist_batch = None  # last full-size batch, for W&B histogram sampling
    # Reference cadence: val_per_epoch=5 → division_step = n_train//(5·B).
    division_step = n_train // (max(1, val_per_epoch) * batch_size)
    # Every file the trainer writes — per-epoch series + retention,
    # checkpoint_best, EMA siblings, INTERRUPTED — goes through the policy
    # (train_checkpoints.py; async writer, primary-only across hosts).
    policy = CheckpointPolicy(
        checkpoint_dir, enabled=save_checkpoint_flag, primary=primary,
        keep=keep_checkpoints, save_best=save_best,
        save_optimizer=save_optimizer, optimizer=optimizer,
        lr_scheduler=lr_scheduler, config=config, dataset=dataset,
        ema_decay=ema_decay,
    )

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

    # Per-step losses stay on device and drain in one batched D2H fetch at
    # validation/epoch boundaries (train_logging.LossDrain — a float() per
    # step costs a full ~29 ms relay sync).
    drain = LossDrain(history, experiment)

    # Preemption-safe training (train_signals.StopSignal): SIGTERM/Ctrl-C
    # set a soft-stop flag the loop honors at the next batch boundary,
    # saving a fully-resumable INTERRUPTED.npz before returning normally;
    # a second Ctrl-C aborts immediately. Handlers restore on exit.
    with StopSignal() as stop:
        for epoch in range(start_epoch, epochs + 1):
            feed = (
                train_loader  # batches are already device-resident / global
                if device_dataset or multihost
                else prefetch_to_device(train_loader, buffer_size=2, sharding=sharding)
            )
            pbar = (
                tqdm(total=n_train, desc=f"Epoch {epoch}/{epochs}", unit="img", leave=False)
                if tqdm and primary else None
            )
            drain.pbar = pbar
            for batch in feed:
                if stop.requested and not multihost:
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
                if ema is not None:
                    ema.update(params)
                global_step += 1
                if experiment is not None and images.shape[0] == batch_size:
                    # Histograms sample the last FULL batch: a trailing partial
                    # batch would hand the hist step a second shape and cost
                    # another full fwd+bwd compile (~10 min through the relay)
                    # mid-training. images/masks are not donated, so holding the
                    # reference keeps exactly one extra batch alive.
                    hist_batch = (images, masks)
                drain.append(loss, global_step, epoch)
                if pbar:
                    # Postfix updates ride the lazy drain (validation/epoch
                    # boundaries) — a float(loss) here would reintroduce the
                    # very D2H sync LossDrain exists to avoid.
                    pbar.update(images.shape[0])

                # Validation 5×/epoch, reference cadence (_validation_pass:
                # evaluate + plateau + early-stop + EMA + best-ckpt + W&B +
                # multi-host synchronized stop).
                if division_step > 0 and global_step % division_step == 0:
                    drain.drain()
                    (params, bn_state, opt_state, es_best, es_bad, stopped,
                     mh_interrupt) = _validation_pass(
                        params=params, bn_state=bn_state, opt_state=opt_state,
                        pipeline=pipeline, val_loader=val_loader,
                        config=config, amp=amp, sharding=sharding,
                        scheduler=scheduler, history=history, ema=ema,
                        early_stopping=early_stopping, es_best=es_best,
                        es_bad=es_bad, policy=policy, panel=panel,
                        epoch=epoch, global_step=global_step, images=images,
                        masks=masks, hist_batch=hist_batch,
                        multihost=multihost, stop=stop,
                    )
                    early_stopped = early_stopped or stopped
                    interrupted = interrupted or mh_interrupt
                if interrupted or early_stopped:
                    break

            if pbar:
                pbar.close()
            drain.drain()
            if pipeline is not None:
                # Epoch boundary: sync the gathered trees for checkpointing
                # (and the interrupt save below).
                params, bn_state, opt_state = pipeline.gather()
            if interrupted:
                ipath = policy.save_interrupted(
                    epoch=epoch, step=global_step, scheduler=scheduler,
                    es_best=es_best, es_bad=es_bad, params=params,
                    bn_state=bn_state, opt_state=opt_state,
                    ema_params=ema.params if ema is not None else None,
                )
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
            policy.save_epoch(
                epoch, params=params, bn_state=bn_state, opt_state=opt_state,
                scheduler=scheduler, es_best=es_best, es_bad=es_bad,
                ema_params=ema.params if ema is not None else None,
            )
            last_epoch = epoch
            if early_stopped:
                # The per-epoch checkpoint above already holds the final
                # weights (the stop happened at a validation inside this
                # epoch, so the epoch is partial — logged, not hidden).
                logger.info("Stopped early during epoch %d.", epoch)
                break

    if pipeline is not None:
        params, bn_state, opt_state = pipeline.gather()
    # Drain the async writer + the final retention pass (ADVICE r2).
    policy.finish(last_epoch, start_epoch, epochs)
    return params, bn_state, history


# CLI surface lives in train_cli.py (VERDICT r3 next #6); re-exported here
# because the console script (pyproject) and tests address tpu_unet.train.
from tpu_unet.train_cli import _build_augment, get_args, main  # noqa: E402

if __name__ == "__main__":
    main()
