"""Fused-MLP-trunk tuning probe: block size x precision, in-scan timed.

The trunk is the step's dominant cost (breakdown_scan: 6.4 of 7.8 ms at
1M obs): 20 sequential (BLOCK, 128) x (128, 128) matmuls per tile, 326
tiles. This measures fwd and fwd+bwd per BLOCK_ROWS and mlp_dtype to find
whether the cost is MXU-throughput-bound (bf16 should win ~4x) or
per-matmul-overhead-bound (bigger blocks should win).

Usage: python benchmarks/trunk_probe.py [n_obs]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

ITERS = 100


def main(n_obs=1_000_000):
    import jax
    import jax.numpy as jnp

    from careless_tpu.ops import fused_mlp

    d, width, n_layers = 10, 10, 20
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n_obs, d)).astype(np.float32)
    layers = [{"w": jnp.asarray(np.eye(d if i == 0 else width, width,
                                       dtype=np.float32)),
               "b": jnp.zeros(width, jnp.float32)} for i in range(n_layers)]
    x_dev = jax.device_put(x)

    def timed(fn, *args):
        @jax.jit
        def run(args):
            def step(carry, i):
                return fn(carry, *args), ()
            c, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(ITERS))
            return c
        # float() readback is the only reliable sync through the axon
        # tunnel (block_until_ready can return before remote completion);
        # its ~5 ms D2H latency amortizes over ITERS
        float(run(args))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(args))
            best = min(best, time.perf_counter() - t0)
        return best / ITERS * 1e3

    for block in (256, 512, 1024):
        fused_mlp.BLOCK_ROWS = block
        for bf16 in (False, True):
            if block > 512 and not bf16:
                continue  # bwd activation stash exceeds VMEM at f32
            def fwd(carry, x, layers):
                ls = [{"w": l["w"] + carry * 1e-30, "b": l["b"]}
                      for l in layers]
                h = fused_mlp.fused_mlp_trunk(x, ls, 0.01, bf16=bf16)
                return carry + jnp.sum(h)

            def both(carry, x, layers):
                def f(ls):
                    ls = [{"w": l["w"] + carry * 1e-30, "b": l["b"]}
                          for l in ls]
                    return jnp.sum(
                        fused_mlp.fused_mlp_trunk(x, ls, 0.01, bf16=bf16))
                v, g = jax.value_and_grad(f)(layers)
                return v + sum(jnp.sum(l) for l in jax.tree.leaves(g))

            t_f = timed(fwd, x_dev, layers)
            try:
                t_b = timed(both, x_dev, layers)
            except Exception as e:
                t_b = float('nan')
                print(f"block={block} bf16={int(bf16)} bwd failed: "
                      f"{str(e)[:120]}", flush=True)
            print(f"block={block:5d} bf16={int(bf16)}  "
                  f"fwd {t_f:7.3f} ms   fwd+bwd {t_b:7.3f} ms", flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    main(n)
