"""Microbench: pallas conv_valid vs XLA conv at the SR step's hot shapes.

Shapes from the conv trace of the SR train step (see PERF.md round 3):
the stage-2 translator bottleneck (3x3 256ch @ 256x320, frozen => fwd-only),
the Depth_f resnet blocks (3x3 128ch @ 256x320), the I2D blocks
(3x3 128ch @ 128x160), and the 7x7 32->128 Depth_f head at HR (the
measured 35%-MXU offender).

Run on the real chip: python tools/bench_pallas_conv.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from desr_tpu.ops.pallas_conv import conv2d_pallas, _conv_ref, _plan

SHAPES = [
    # (input shape, cin, cout, k, pad, label). pad=1 entries are the
    # ring-correction base convs (virtual zero pad); pad=0 entries arrive
    # pre-padded with W rounded up to a multiple of 8 (Mosaic DMA alignment).
    ((1, 256, 320, 256), 256, 256, 3, 1, "translator block 256ch"),
    ((2, 256, 320, 128), 128, 128, 3, 1, "Depth_f block 128ch"),
    ((2, 128, 160, 128), 128, 128, 3, 1, "I2D block 128ch"),
    ((2, 1030, 1288, 32), 32, 128, 7, 0, "Depth_f 7x7 head HR"),
    ((2, 518, 648, 32), 32, 128, 7, 0, "I2D 7x7 head LR"),
]


def timeit(fn, *args, n=30, warmup=12):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / n


def main():
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} dtype={dt.__name__}")
    for shape, cin, cout, k, pad, label in SHAPES:
        x = jnp.asarray(rng.standard_normal(shape), dt)
        w = jnp.asarray(0.05 * rng.standard_normal((cout, cin, k, k)), dt)
        plan = _plan(shape, k, cout, pad, 2)
        ho, wo = shape[1] - k + 1 + 2 * pad, shape[2] - k + 1 + 2 * pad
        gflop = 2 * shape[0] * ho * wo * cin * cout * k * k / 1e9

        ref = jax.jit(lambda a, b, p=pad: _conv_ref(a, b, p))
        pal = jax.jit(lambda a, b, p=pad: conv2d_pallas(a, b, p, False))

        o1 = ref(x, w)
        o2 = pal(x, w)
        err = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))

        t_ref = timeit(ref, x, w)
        t_pal = timeit(pal, x, w)
        print(f"{label:28s} plan={plan} {gflop:7.1f}GF  "
              f"xla {t_ref*1e3:7.3f}ms ({gflop/t_ref/1e3:6.1f} TF/s)  "
              f"pallas {t_pal*1e3:7.3f}ms ({gflop/t_pal/1e3:6.1f} TF/s)  "
              f"ratio {t_ref/t_pal:5.2f}x  maxerr {err:.4f}")


if __name__ == "__main__":
    main()
