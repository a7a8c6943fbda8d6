"""Full-model inference benchmark: folded-BN forward, XLA vs Pallas backends
(plus the unfolded train-graph forward), at Carvana scale. Full-step timing
with D2H sync — the only reliable measurement through the relay.

Prints one JSON line per configuration.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from tpu_unet.models import UNetConfig, init_unet, unet_apply
from tpu_unet.models.infer import fold_bn, unet_infer_apply

CONFIG = UNetConfig(3, 1, bilinear=False)
H, W = 320, 480


def timeit(fn, x, iters=20):
    out = fn(x)
    float(jnp.sum(out[0, 0, 0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    float(jnp.sum(out[0, 0, 0]))
    return (time.perf_counter() - t0) / iters


def main():
    params, state = init_unet(jax.random.PRNGKey(0), CONFIG)
    folded = fold_bn(params, state, CONFIG)
    rng = np.random.default_rng(0)

    for batch in (1, 8):
        x = jnp.asarray(rng.random((batch, H, W, 3), dtype=np.float32))
        unfolded = jax.jit(
            lambda x: unet_apply(params, state, x, config=CONFIG, train=False,
                                 compute_dtype=jnp.bfloat16)[0]
        )
        variants = {
            "train-graph fwd (unfolded BN)": unfolded,
            "folded xla": lambda x: unet_infer_apply(
                folded, x, config=CONFIG, backend="xla",
                compute_dtype=jnp.bfloat16),
            "folded pallas": lambda x: unet_infer_apply(
                folded, x, config=CONFIG, backend="pallas",
                compute_dtype=jnp.bfloat16),
        }
        for name, fn in variants.items():
            try:
                t = timeit(fn, x)
                print(json.dumps({
                    "variant": name, "batch": batch, "hw": f"{H}x{W}",
                    "ms": round(t * 1e3, 2),
                    "img_per_sec": round(batch / t, 1),
                }), flush=True)
            except Exception as e:
                print(json.dumps({"variant": name, "batch": batch,
                                  "error": str(e)[:150]}), flush=True)


if __name__ == "__main__":
    main()
