"""p50 per-tile inference latency on 2048² tiled sliding-window inference
(north-star config #4). Run on the TPU chip; prints one JSON line.

Sync via D2H fetch per tile (axon relay: block_until_ready returns at
dispatch) — so each sample includes one ~29 ms tunnel RTT; p50 is reported
both raw and RTT-adjusted.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from tpu_unet.models import UNetConfig, init_unet
from tpu_unet.models.infer import fold_bn, unet_infer_apply
from tpu_unet.parallel.tiling import DEFAULT_HALO

CONFIG = UNetConfig(3, 1, bilinear=False)
TILE = 512
HALO = DEFAULT_HALO  # 128


def main():
    params, state = init_unet(jax.random.PRNGKey(0), CONFIG)
    folded = fold_bn(params, state, CONFIG)
    win = TILE + 2 * HALO
    rng = np.random.default_rng(0)
    window = jnp.asarray(rng.random((1, win, win, 3), dtype=np.float32))

    def run(x):
        return unet_infer_apply(folded, x, config=CONFIG, backend="xla",
                                compute_dtype=jnp.bfloat16)

    out = run(window)
    float(jnp.sum(out[0, 0, 0]))  # compile + sync

    lat = []
    for _ in range(16):  # a 2048² image is 16 tiles of 512²
        t0 = time.perf_counter()
        out = run(window)
        float(jnp.sum(out[0, 0, 0]))
        lat.append(time.perf_counter() - t0)
    p50 = float(np.percentile(lat, 50))

    # RTT estimate AFTER the latency loop (warm everything), median of 9
    # trivial fetches of a tiny precomputed sum.
    tiny = jnp.sum(window[0, 0, 0])
    float(tiny)
    rtts = []
    for _ in range(9):
        t0 = time.perf_counter()
        float(tiny + 0.0)
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(json.dumps({
        "metric": "p50 per-tile latency (512^2 core + 128 halo, 2048^2 image)",
        "value": round(p50 * 1e3, 2),
        "unit": "ms",
        "p50_minus_rtt_ms": round((p50 - rtt) * 1e3, 2),
        "rtt_ms": round(rtt * 1e3, 2),
        "tiles_per_2048_image": 16,
        "image_latency_est_ms": round((p50 - rtt) * 16 * 1e3 + rtt * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
