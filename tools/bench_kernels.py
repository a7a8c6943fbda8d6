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
    from tpu_unet.kernels.fused_double_conv import fused_double_conv

    for h, w, cin, cout in shapes:
        x = jnp.asarray(rng.standard_normal((1, h, w, cin), dtype=np.float32), dtype=jnp.bfloat16)
        wt = jnp.asarray(rng.standard_normal((3, 3, cin, cout), dtype=np.float32) * 0.05, dtype=jnp.bfloat16)
        wt2 = jnp.asarray(rng.standard_normal((3, 3, cout, cout), dtype=np.float32) * 0.05, dtype=jnp.bfloat16)
        scale = jnp.ones(cout, jnp.float32)
        bias = jnp.zeros(cout, jnp.float32)
        rec = {"shape": f"{h}x{w}x{cin}->{cout}"}
        flops = 2 * 9 * h * w * cin * cout
        for name, fn, args in [
            ("xla", xla_fused, (x, wt, scale, bias)),
            ("pallas", functools.partial(fused_conv3x3_scale_relu, tile_h=8), (x, wt, scale, bias)),
            ("pallas_dc", fused_double_conv, (x, wt, scale, bias, wt2, scale, bias)),
            ("xla_dc", lambda x, w1, s1, b1, w2, s2, b2: xla_fused(xla_fused(x, w1, s1, b1), w2, s2, b2),
             (x, wt, scale, bias, wt2, scale, bias)),
        ]:
            try:
                t = timeit(fn, *args)
                rec[f"{name}_ms"] = round(t * 1e3, 3)
                f = flops * (2 * cout / (cin + cout) if name.endswith("_dc") else 1)
                rec[f"{name}_tflops"] = round(f / t / 1e12, 1)
            except Exception as e:
                rec[f"{name}_error"] = str(e)[:120]
        print(json.dumps(rec), flush=True)

    for h, w, cin, cout in shapes:
        x = jnp.asarray(rng.standard_normal((1, h, w, cin), dtype=np.float32), dtype=jnp.bfloat16)
        rec = {"shape": f"pool {h}x{w}x{cin}"}
        for name, fn in [("xla", max_pool2d), ("pallas", max_pool2x2)]:
            try:
                rec[f"{name}_ms"] = round(timeit(fn, x) * 1e3, 3)
            except Exception as e:
                rec[f"{name}_error"] = str(e)[:120]
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
