"""On-chip timing experiments to locate the train-step MFU gap (round 2).

Each experiment prints one JSON line. All timings sync via a final D2H
fetch (the axon relay returns from block_until_ready at dispatch —
BENCH_NOTES.md). Run in background: each NEW program costs ~10 min through
the remote-compile tunnel.

Usage: python tools/bench_experiments.py [exp ...]
  train_b16     full train step, batch 16 (round-1 headline, cache-warm)
  train_b32     full train step, batch 32 (does bigger batch amortize?)
  train_b24     full train step, batch 24
  fwd_b16       train-mode forward+loss only (no grad) — splits fwd vs bwd
  evalbn_b16    full train step but BN in EVAL mode inside the grad
                (running stats; no batch-stat reductions) — isolates the
                train-BN stats cost end-to-end
  noremat variants omitted: remat is off by default.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from tpu_unet.models import UNetConfig, init_unet, unet_apply
from tpu_unet.optim import clip_grad_norm, rmsprop_init, rmsprop_update
from tpu_unet.train import compute_loss, make_train_step

H = W = 572
CONFIG = UNetConfig(n_channels=3, n_classes=1, bilinear=False)


def _data(batch):
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((batch, H, W, 3), dtype=np.float32))
    masks = jnp.asarray(rng.integers(0, 2, (batch, H, W)))
    return images, masks


def _time_steps(step_fn, carry, args, iters, fetch):
    # Warmup (compile) + 1 stabilizer.
    for _ in range(2):
        carry = step_fn(carry, *args)
        float(fetch(carry))
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = step_fn(carry, *args)
    float(fetch(carry))  # device stream is in-order: one fetch bounds all
    return time.perf_counter() - t0


def run_train(batch, iters=10, bn_train=True, kernels=None):
    params, state = init_unet(jax.random.PRNGKey(0), CONFIG)
    opt = rmsprop_init(params)
    images, masks = _data(batch)
    lr = jnp.float32(1e-5)

    if bn_train:
        step = make_train_step(CONFIG, amp=True, kernels=kernels)

        def step_fn(c, images, masks):
            p, s, o, loss, _ = step(c[0], c[1], c[2], images, masks, lr)
            return (p, s, o, loss)
    else:
        @functools.partial(jax.jit, donate_argnums=(0,))
        def evalbn_step(carry, images, masks):
            params, bn_state, opt_state = carry

            def loss_fn(p):
                logits, _ = unet_apply(
                    p, bn_state, images, config=CONFIG, train=False,
                    compute_dtype=jnp.bfloat16,
                )
                return compute_loss(logits, masks, CONFIG.n_classes)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads, _ = clip_grad_norm(grads, 1.0)
            new_params, new_opt = rmsprop_update(grads, opt_state, params, lr)
            return (new_params, bn_state, new_opt), loss

        def step_fn(c, images, masks):
            (p, s, o), loss = evalbn_step((c[0], c[1], c[2]), images, masks)
            return (p, s, o, loss)

    dt = _time_steps(step_fn, (params, state, opt, None), (images, masks),
                     iters, fetch=lambda c: c[3])
    return batch * iters / dt


def run_fwd(batch, iters=10):
    params, state = init_unet(jax.random.PRNGKey(0), CONFIG)
    images, masks = _data(batch)

    @jax.jit
    def fwd(params, state, images, masks):
        logits, new_bn = unet_apply(
            params, state, images, config=CONFIG, train=True,
            compute_dtype=jnp.bfloat16,
        )
        return compute_loss(logits, masks, CONFIG.n_classes), new_bn

    def step_fn(c, images, masks):
        loss, s = fwd(c[0], c[1], images, masks)
        return (c[0], s, loss)

    dt = _time_steps(step_fn, (params, state, None), (images, masks),
                     iters, fetch=lambda c: c[2])
    return batch * iters / dt


EXPERIMENTS = {
    "train_b16": lambda: ("train fwd+bwd+opt b16", run_train(16)),
    "train_b24": lambda: ("train fwd+bwd+opt b24", run_train(24)),
    "train_b32": lambda: ("train fwd+bwd+opt b32", run_train(32)),
    "fwd_b16": lambda: ("train-mode fwd+loss b16", run_fwd(16)),
    "evalbn_b16": lambda: ("train step, eval-mode BN b16", run_train(16, bn_train=False)),
    "pallas_b16": lambda: ("train fwd+bwd+opt b16, fused Pallas convs",
                           run_train(16, kernels="pallas")),
    "pallas_b8": lambda: ("train fwd+bwd+opt b8, fused Pallas convs",
                          run_train(8, kernels="pallas")),
}


def main():
    names = sys.argv[1:] or list(EXPERIMENTS)
    for name in names:
        t0 = time.time()
        try:
            desc, imgs_per_s = EXPERIMENTS[name]()
            print(json.dumps({
                "exp": name, "desc": desc,
                "images_per_sec": round(imgs_per_s, 2),
                "wall_s": round(time.time() - t0, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "exp": name, "error": str(e)[:500],
                "wall_s": round(time.time() - t0, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
