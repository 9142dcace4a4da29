"""MXU peak-rate probe: what matmul throughput can this chip actually hit,
and does splitting a Pallas matmul into independent chains engage more than
one MXU?

Usage: python benchmarks/mxu_probe.py
"""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

ITERS = 50


def timed(run, args, iters=ITERS):
    import jax
    import jax.numpy as jnp

    float(run(args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(args))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    # --- XLA big matmul peak -------------------------------------------------
    M, K, N = 8192, 2048, 2048
    a = jax.device_put(rng.normal(size=(M, K)).astype(np.float32))
    b = jax.device_put(rng.normal(size=(K, N)).astype(np.float32))
    gflop = 2 * M * K * N / 1e9

    for dt, prec in (("f32_default", None), ("bf16", "bf16")):
        @jax.jit
        def run(args):
            aa, bb = args
            if prec == "bf16":
                aa = aa.astype(jnp.bfloat16)
                bb = bb.astype(jnp.bfloat16)

            def step(c, i):
                out = jnp.dot(aa + c * 1e-30, bb,
                              preferred_element_type=jnp.float32)
                return c + out[0, 0], ()
            c, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(ITERS))
            return c

        t = timed(run, (a, b))
        print(f"XLA  {M}x{K}x{N} {dt:12s}: {t:7.3f} ms  "
              f"{gflop / t * 1e3 / 1e3:7.1f} TFLOP/s", flush=True)

    # --- Pallas matmul: one chain vs split chains ----------------------------
    # mirror the trunk shape: per-tile (B,128)@(128,128) x layers, chained
    B, LAYERS, TILES = 512, 20, 160
    x = jax.device_put(rng.normal(size=(TILES * B, 128)).astype(np.float32)
                       * 0.1)
    w = jax.device_put(
        (np.stack([np.eye(128)] * LAYERS) * 0.999).astype(np.float32))
    gflop_trunk = 2 * TILES * B * 128 * 128 * LAYERS / 1e9

    def make_kernel(splits):
        def kernel(x_ref, w_ref, o_ref):
            hs = [x_ref[j * (B // splits):(j + 1) * (B // splits), :]
                  for j in range(splits)]
            for l in range(LAYERS):
                wl = w_ref[l]
                # independent per-split chains: within a layer the split
                # matmuls have no data dependence on each other
                hs = [jnp.dot(h, wl, preferred_element_type=jnp.float32)
                      for h in hs]
            for j in range(splits):
                o_ref[j * (B // splits):(j + 1) * (B // splits), :] = hs[j]
        return kernel

    for splits in (1, 2, 4):
        @jax.jit
        def run(args):
            xx, ww = args

            def step(c, i):
                out = pl.pallas_call(
                    make_kernel(splits),
                    grid=(TILES,),
                    in_specs=[
                        pl.BlockSpec((B, 128), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((LAYERS, 128, 128), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((B, 128), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((TILES * B, 128),
                                                   jnp.float32),
                )(xx + c * 1e-30, ww)
                return c + out[0, 0], ()
            c, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(ITERS))
            return c

        t = timed(run, (x, w))
        print(f"Pallas trunk-like splits={splits}: {t:7.3f} ms  "
              f"{gflop_trunk / t * 1e3 / 1e3:7.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
