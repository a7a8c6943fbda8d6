"""Tiled-inference latency on a 2048² image (north-star config #4).

Round 2: the sliding-window sweep is ONE device program
(parallel/tiling._tiled_forward_jit — window gather, batched forward, core
scatter inside a jitted fori_loop), so the whole 2048² image costs one
dispatch and one D2H fetch. This bench reports the RAW per-image latency
and the derived RAW per-tile number alongside the round-1-style
RTT-adjusted figure (VERDICT r1 next-round #4 asks for both).

Sync via a D2H fetch (axon relay: block_until_ready returns at dispatch).
Run on the TPU chip; prints one JSON line.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from tpu_unet.models import UNetConfig, init_unet
from tpu_unet.parallel.tiling import DEFAULT_HALO, tiled_forward

CONFIG = UNetConfig(3, 1, bilinear=False)
TILE = 512
HALO = DEFAULT_HALO  # 128
SIZE = 2048
N_TILES = (SIZE // TILE) ** 2  # 16


def main():
    params, state = init_unet(jax.random.PRNGKey(0), CONFIG)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((1, SIZE, SIZE, 3), dtype=np.float32))

    def run(x):
        return tiled_forward(
            params, state, x, config=CONFIG, tile=TILE, halo=HALO, amp=True,
            window_batch=4,
        )

    out = run(image)
    float(jnp.sum(out[0, 0, 0]))  # compile + sync

    lat = []
    for _ in range(8):
        t0 = time.perf_counter()
        out = run(image)
        float(jnp.sum(out[0, 0, 0]))
        lat.append(time.perf_counter() - t0)
    p50_img = float(np.percentile(lat, 50))

    # Tunnel RTT, measured warm: median of 9 trivial fetches.
    tiny = jnp.sum(image[0, 0, 0])
    float(tiny)
    rtts = []
    for _ in range(9):
        t0 = time.perf_counter()
        float(tiny + 0.0)
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    print(json.dumps({
        "metric": "2048^2 tiled inference latency (512 tile + 128 halo, bf16, one dispatch)",
        "value": round(p50_img * 1e3, 1),
        "unit": "ms",
        "raw_per_tile_ms": round(p50_img / N_TILES * 1e3, 2),
        "rtt_adjusted_image_ms": round((p50_img - rtt) * 1e3, 1),
        "rtt_adjusted_per_tile_ms": round((p50_img - rtt) / N_TILES * 1e3, 2),
        "rtt_ms": round(rtt * 1e3, 2),
        "tiles": N_TILES,
        "window_batch": 4,
    }))


if __name__ == "__main__":
    main()
