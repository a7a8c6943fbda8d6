"""Per-kernel benchmark: Pallas fused conv vs the XLA path at the U-Net's
actual layer shapes (Carvana scale 0.5 ≈ 480×320). Run on the TPU chip.

All timings sync via D2H fetch (block_until_ready returns at dispatch on the
axon relay). Prints one JSON line per shape.
"""

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from tpu_unet.kernels.fused_conv import fused_conv3x3_scale_relu
from tpu_unet.kernels.pooling import max_pool2x2
from tpu_unet.ops import conv2d, max_pool2d


@functools.partial(jax.jit, static_argnames=())
def xla_fused(x, w, scale, bias):
    return jax.nn.relu(conv2d(x, w, stride=1, padding=1) * scale + bias).astype(x.dtype)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(out[0, 0, 0]))  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0, 0, 0]))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    # (H, W, Cin, Cout) for the encoder/decoder levels at Carvana scale 0.5.
    shapes = [
        (320, 480, 64, 64),
        (160, 240, 128, 128),
        (80, 120, 256, 256),
        (40, 60, 512, 512),
    ]
    for h, w, cin, cout in shapes:
        x = jnp.asarray(rng.standard_normal((1, h, w, cin), dtype=np.float32), dtype=jnp.bfloat16)
        wt = jnp.asarray(rng.standard_normal((3, 3, cin, cout), dtype=np.float32) * 0.05, dtype=jnp.bfloat16)
        scale = jnp.ones(cout, jnp.float32)
        bias = jnp.zeros(cout, jnp.float32)

        t_xla = timeit(xla_fused, x, wt, scale, bias)
        t_pal = timeit(
            functools.partial(fused_conv3x3_scale_relu, tile_h=8), x, wt, scale, bias
        )
        flops = 2 * 9 * h * w * cin * cout
        print(json.dumps({
            "shape": f"{h}x{w}x{cin}->{cout}",
            "xla_ms": round(t_xla * 1e3, 3),
            "pallas_ms": round(t_pal * 1e3, 3),
            "xla_tflops": round(flops / t_xla / 1e12, 1),
            "pallas_tflops": round(flops / t_pal / 1e12, 1),
        }))

        t_xp = timeit(max_pool2d, x)
        t_pp = timeit(max_pool2x2, x)
        print(json.dumps({
            "shape": f"pool {h}x{w}x{cin}",
            "xla_ms": round(t_xp * 1e3, 3),
            "pallas_ms": round(t_pp * 1e3, 3),
        }))


if __name__ == "__main__":
    main()
