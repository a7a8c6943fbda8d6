"""Pipeline parallelism (GPipe) for the flagship U-Net — the 'pipe' axis.

The reference has no distributed code at all (SURVEY.md §2.2); this module
completes the parallelism portfolio next to data (parallel/mesh.py), spatial
(same), and tensor (parallel/tensor.py) parallelism: **depth partitioning**.
The network's block sequence is split into S contiguous stages; stage i's
params, BN state, and fp32 RMSprop trees live ONLY on device i (1/S of the
model memory per chip), microbatches stream through the stages, and
activations cross stage boundaries as device-to-device transfers (ICI on a
real slice).

TPU-native design notes:

  * Stages are HETEROGENEOUS (a U-Net's levels differ in shape and channel
    count), so the single-program shard_map+ppermute pipelining idiom for
    uniform decoder stacks does not apply. Instead each stage is its own
    jitted XLA program placed by its inputs' device, and the GPipe schedule
    is host-orchestrated: JAX's async dispatch overlaps stage s of
    microbatch j with stage s-1 of microbatch j+1 — the host enqueues the
    whole schedule without blocking and the dataflow graph pipelines across
    the devices. No collectives are hand-written; the only cross-device
    traffic is the boundary payload (and two scalars for the global grad
    norm).
  * Backward is GPipe-canonical **recompute**: the forward stores only each
    stage's input payload; the backward re-runs the stage under jax.vjp.
    Per-device activation memory is O(one stage × in-flight microbatches),
    the same trade `remat=True` makes globally.
  * Skip connections ride the payload: a U-Net skip produced in an encoder
    stage is consumed by a decoder stage several boundaries later, so the
    inter-stage payload is a dict carrying the not-yet-consumed skips
    alongside the working activation (see _SEGMENTS). This is the honest
    cost of pipelining a U-topology: boundary payloads near the middle of
    the pipe carry up to 4 skip tensors.

Semantics contract (asserted in tests/test_pipeline.py): one pipeline step
with M microbatches is EXACTLY the fused step's ``accum_steps=M`` semantics
(train.py make_train_step) — same strided row split (rows j::M form
microbatch j), per-microbatch BN batch statistics threaded in order,
averaged loss and gradients, one global-norm clip, one RMSprop update — to
fp32 reassociation tolerance.

When to use: dp×sp×tp covers the flagship's scaling (activations dominate a
31M-param convnet, and GSPMD keeps the MXU busy with no bubble). The 'pipe'
axis is for DEPTH-dominated regimes — models whose per-stage weights +
optimizer state exceed one chip's HBM but whose boundary payloads are small,
or serving topologies where stages map to heterogeneous device pools. GPipe's
bubble (S-1)/(M+S-1) means throughput needs M >> S; the equivalence tests run
exact at any M.
"""

from __future__ import annotations

import functools
import logging
from typing import Any

import jax
import jax.numpy as jnp

from tpu_unet.models.unet import UNetConfig, _double_conv_apply, _up_apply
from tpu_unet.ops import conv2d, max_pool2d
from tpu_unet.optim import RMSpropState, rmsprop_init, rmsprop_update

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Segment table: the flagship U-Net as a linear chain over a payload dict.
# Each segment consumes/produces named tensors; keys that later segments
# still need (the skips) are carried through unchanged. Keys are dropped at
# the LAST segment that reads them, so stage-boundary transfers move exactly
# the live set.
# ---------------------------------------------------------------------------


def _seg_inc(p, s, pl, cfg):
    h, ns = _double_conv_apply(p, s, pl["x"], train=True, first=True)
    return {"x1": h}, ns


def _make_seg_down(i: int):
    def seg(p, s, pl, cfg):
        h, ns = _double_conv_apply(p, s, max_pool2d(pl[f"x{i}"]), train=True)
        out = dict(pl)
        out[f"x{i + 1}"] = h
        return out, ns

    return seg


def _make_seg_up(i: int):
    # up_i consumes the working activation and skip x_{5-i}; afterwards that
    # skip is dead and is dropped from the payload.
    skip_key = f"x{5 - i}"
    cur_key = "x5" if i == 1 else "h"

    def seg(p, s, pl, cfg):
        h, ns = _up_apply(
            p, s, pl[cur_key], pl[skip_key], bilinear=cfg.bilinear, train=True
        )
        out = {k: v for k, v in pl.items() if k not in (cur_key, skip_key)}
        out["h"] = h
        return out, ns

    return seg


def _seg_outc(p, s, pl, cfg):
    logits = conv2d(pl["h"], p["w"], stride=1, padding=0)
    logits = logits + p["b"].astype(jnp.float32)
    return {"logits": logits.astype(jnp.float32)}, None


_SEGMENTS: list[tuple[str, Any]] = [
    ("inc", _seg_inc),
    *[(f"down{i}", _make_seg_down(i)) for i in range(1, 5)],
    *[(f"up{i}", _make_seg_up(i)) for i in range(1, 5)],
    ("outc", _seg_outc),
]
SEGMENT_NAMES = [name for name, _ in _SEGMENTS]
_SEGMENT_FN = dict(_SEGMENTS)

# Relative WALL-CLOCK weights per segment for stage balancing, derived from
# the on-chip per-level profile (BENCH_NOTES.md r2: the full-resolution C=64
# level — inc + up4 — is ~50% of the 572² step despite ~33% of the MACs;
# decoder DoubleConvs carry ~2× the MACs of their encoder twins). Heuristic
# by construction — balancing only affects speed, never results.
_SEGMENT_WEIGHT = {
    "inc": 20, "down1": 6, "down2": 6, "down3": 5, "down4": 5,
    "up1": 9, "up2": 9, "up3": 10, "up4": 29, "outc": 1,
}


def split_stages(n_stages: int) -> list[list[str]]:
    """Contiguous segment partition minimizing the max stage weight.

    Exhaustive over split-point combinations — 10 segments make this trivial
    (≤ C(9, S-1) ≤ 126 candidates).
    """
    n_seg = len(SEGMENT_NAMES)
    if not 2 <= n_stages <= n_seg:
        raise ValueError(f"n_stages must be in [2, {n_seg}], got {n_stages}")
    import itertools

    weights = [_SEGMENT_WEIGHT[n] for n in SEGMENT_NAMES]
    best, best_cost = None, float("inf")
    for cuts in itertools.combinations(range(1, n_seg), n_stages - 1):
        bounds = (0, *cuts, n_seg)
        cost = max(
            sum(weights[a:b]) for a, b in zip(bounds, bounds[1:])
        )
        if cost < best_cost:
            best, best_cost = bounds, cost
    assert best is not None
    return [SEGMENT_NAMES[a:b] for a, b in zip(best, best[1:])]


def _stage_forward(params_s, state_s, payload, *, seg_names, config,
                   compute_dtype):
    """Run one stage's contiguous segments. Returns (payload_out, new_state)."""
    if compute_dtype is not None:
        params_s = jax.tree.map(lambda p: p.astype(compute_dtype), params_s)
        if "inc" in seg_names:  # mirror unet_apply's input cast exactly
            payload = {**payload, "x": payload["x"].astype(compute_dtype)}
    new_state = {}
    for name in seg_names:
        payload, ns = _SEGMENT_FN[name](
            params_s.get(name), state_s.get(name), payload, config
        )
        if ns is not None:
            new_state[name] = ns
    return payload, new_state


class PipelineRunner:
    """Stage-placed GPipe training step for the flagship U-Net.

    Holds the per-stage (params, bn_state, opt_state) trees committed to
    their stage devices; ``step()`` runs one optimizer step over a batch;
    ``gather()`` reassembles full trees on the default device for
    validation / checkpointing (cheap D2D per call, not per step).
    """

    def __init__(
        self,
        params,
        bn_state,
        config: UNetConfig,
        *,
        n_stages: int,
        microbatches: int,
        opt_state: RMSpropState | None = None,
        amp: bool = False,
        weight_decay: float = 1e-8,
        momentum: float = 0.999,
        grad_clip: float = 1.0,
        dice_weight: float = 1.0,
        devices: list | None = None,
    ):
        if config.arch != "unet":
            raise ValueError(
                f"pipeline parallelism is wired for the flagship U-Net's "
                f"block chain only, not arch={config.arch!r}")
        if config.s2d_level0:
            raise ValueError("pipeline parallelism does not support the "
                             "s2d_level0 experiment path")
        if microbatches < 1:
            raise ValueError(f"microbatches must be >= 1, got {microbatches}")
        devices = list(devices if devices is not None else jax.devices())
        if len(devices) < n_stages:
            raise ValueError(
                f"pipeline needs {n_stages} devices, have {len(devices)}")
        self.config = config
        self.microbatches = microbatches
        self.grad_clip = float(grad_clip)
        self._stages = split_stages(n_stages)
        self.n_stages = n_stages
        self.devices = devices[:n_stages]
        self._compute_dtype = jnp.bfloat16 if amp else None

        # Partition the trees by segment key and commit each part to its
        # stage device. Missing opt_state is initialized fresh (fp32 zeros).
        if opt_state is None:
            opt_state = rmsprop_init(params)
        unknown = set(params) - set(SEGMENT_NAMES)
        if unknown:
            raise ValueError(f"unexpected param keys for pipeline: {unknown}")
        self.params: list = []
        self.state: list = []
        self.opt: list = []
        for s, segs in enumerate(self._stages):
            dev = self.devices[s]
            put = functools.partial(jax.device_put, device=dev)
            self.params.append(put({k: params[k] for k in segs if k in params}))
            self.state.append(put({k: bn_state[k] for k in segs if k in bn_state}))
            self.opt.append(RMSpropState(
                put({k: opt_state.square_avg[k] for k in segs if k in params}),
                put({k: opt_state.momentum_buf[k] for k in segs if k in params}),
            ))

        cfg = config
        cdt = self._compute_dtype
        S = n_stages

        self._fwd = [
            jax.jit(functools.partial(
                _stage_forward, seg_names=tuple(segs), config=cfg,
                compute_dtype=cdt,
            ))
            for segs in self._stages[:-1]
        ]

        def make_bwd(segs):
            def bwd(params_s, state_s, payload_in, cot_out):
                def f(p, x):
                    out, _ = _stage_forward(
                        p, state_s, x, seg_names=tuple(segs), config=cfg,
                        compute_dtype=cdt,
                    )
                    return out

                _, vjp = jax.vjp(f, params_s, payload_in)
                return vjp(cot_out)  # (param_grads, payload_in_cotangent)

            return jax.jit(bwd)

        self._bwd = [make_bwd(segs) for segs in self._stages[:-1]]

        from tpu_unet.train import compute_loss  # local import: avoid cycle

        last_segs = tuple(self._stages[-1])

        def last_fwd_bwd(params_s, state_s, payload_in, masks):
            def loss_fn(p, x):
                out, ns = _stage_forward(
                    p, state_s, x, seg_names=last_segs, config=cfg,
                    compute_dtype=cdt,
                )
                return compute_loss(out["logits"], masks, cfg.n_classes,
                                    dice_weight=dice_weight), ns

            (loss, ns), (gp, gx) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params_s, payload_in)
            return loss, ns, gp, gx

        self._last = jax.jit(last_fwd_bwd)

        # Tiny helpers, compiled per stage shape set on first use.
        self._tree_add = jax.jit(lambda a, b: jax.tree.map(jnp.add, a, b))

        def finalize(gsum, inv):
            g = jax.tree.map(lambda x: x.astype(jnp.float32) * inv, gsum)
            sq = sum(jnp.sum(jnp.square(l)) for l in jax.tree.leaves(g))
            return g, sq

        self._finalize = jax.jit(finalize)

        max_norm = self.grad_clip

        def combine_norm(*sqs):
            total = jnp.sqrt(sum(sqs))
            # torch clip_grad_norm_ parity (optim/rmsprop.py clip_grad_norm).
            coef = jnp.minimum(max_norm / (total + 1e-6), 1.0)
            return total, coef

        self._combine_norm = jax.jit(combine_norm)

        wd, mom = weight_decay, momentum

        self._scale_tree = jax.jit(
            lambda g, coef: jax.tree.map(lambda x: x * coef, g))

        def update(p, o, g, lr):
            return rmsprop_update(g, o, p, lr, weight_decay=wd, momentum=mom)

        self._update = jax.jit(update, donate_argnums=(0, 1))
        self._mean_loss = jax.jit(lambda ls, inv: sum(ls) * inv)
        # Test/debug hook: when set, step() keeps the clipped per-stage
        # gradient trees on their devices (gather_grads() reassembles them).
        # The equivalence tests compare THESE against the fused step's
        # grads — post-RMSprop params are ill-conditioned for elementwise
        # comparison (the first-step update is ≈10·sign(g): any fp32
        # reassociation flips near-zero elements).
        self.keep_grads = False
        self._last_grads: list | None = None

    # -- one optimizer step over a batch ------------------------------------

    def step(self, images, masks, lr):
        """GPipe step: fwd all microbatches, bwd all, clip, RMSprop.

        Returns (loss, grad_norm) as device scalars (caller fetches lazily,
        matching the fused step's contract). The whole schedule is enqueued
        without a single host sync — async dispatch pipelines the stages.
        """
        n = images.shape[0]
        # Mirror make_train_step's partial-batch rule: indivisible batches
        # run as one microbatch (n is static; each shape recompiles anyway).
        M = self.microbatches if n % self.microbatches == 0 else 1
        S = self.n_stages
        dev = self.devices
        lr = jnp.float32(lr)
        inv = jnp.float32(1.0 / M)

        # Forward wave. cache[j][s] = stage s's input payload for microbatch
        # j (the ONLY per-microbatch residency — backward recomputes).
        cache = [[None] * S for _ in range(M)]
        mb_masks = []
        for j in range(M):
            pl = {"x": jax.device_put(images[j::M], dev[0])}
            mb_masks.append(jax.device_put(masks[j::M], dev[-1]))
            for s in range(S - 1):
                cache[j][s] = pl
                out, ns = self._fwd[s](self.params[s], self.state[s], pl)
                self.state[s] = ns
                pl = jax.device_put(out, dev[s + 1])
            cache[j][S - 1] = pl

        # Backward wave, accumulating per-stage gradient sums in place.
        gsum: list = [None] * S
        losses = []
        for j in range(M):
            loss, ns, gp, cot = self._last(
                self.params[-1], self.state[-1], cache[j][S - 1], mb_masks[j]
            )
            self.state[-1] = ns
            losses.append(loss)
            gsum[-1] = gp if gsum[-1] is None else self._tree_add(gsum[-1], gp)
            for s in range(S - 2, -1, -1):
                cot = jax.device_put(cot, dev[s])
                gp, cot = self._bwd[s](
                    self.params[s], self.state[s], cache[j][s], cot
                )
                gsum[s] = gp if gsum[s] is None else self._tree_add(gsum[s], gp)
            cache[j] = None  # release payload buffers as each chain retires

        # Average, global-norm clip across ALL stages (two scalar hops over
        # the mesh — the only cross-stage reduction in the step), update.
        scaled, sqs = zip(*(
            self._finalize(gsum[s], jax.device_put(inv, dev[s]))
            for s in range(S)
        ))
        gnorm, coef = self._combine_norm(
            *(jax.device_put(sq, dev[0]) for sq in sqs)
        )
        clipped = [
            self._scale_tree(scaled[s], jax.device_put(coef, dev[s]))
            for s in range(S)
        ]
        self._last_grads = clipped if self.keep_grads else None
        for s in range(S):
            self.params[s], self.opt[s] = self._update(
                self.params[s], self.opt[s], clipped[s],
                jax.device_put(lr, dev[s]),
            )
        loss = self._mean_loss(losses, inv)
        return loss, gnorm

    # -- full-tree access (validation / checkpointing) ----------------------

    def gather(self):
        """Reassemble (params, bn_state, opt_state) on the default device."""
        dev0 = jax.devices()[0]
        put = functools.partial(jax.device_put, device=dev0)
        params = {k: put(v) for tree in self.params for k, v in tree.items()}
        state = {k: put(v) for tree in self.state for k, v in tree.items()}
        opt = RMSpropState(
            {k: put(v) for o in self.opt for k, v in o.square_avg.items()},
            {k: put(v) for o in self.opt for k, v in o.momentum_buf.items()},
        )
        return params, state, opt

    def gather_grads(self):
        """Last step's clipped gradient tree (requires keep_grads=True)."""
        if self._last_grads is None:
            raise RuntimeError("set keep_grads=True before step()")
        dev0 = jax.devices()[0]
        return {k: jax.device_put(v, dev0)
                for tree in self._last_grads for k, v in tree.items()}
