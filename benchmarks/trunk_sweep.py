"""Sweep BLOCK_ROWS x SPLIT_ROWS of the real fused trunk (fwd+bwd through
MLPScaler.apply, hoist/DCE-proof, in-scan timed).

Usage: python benchmarks/trunk_sweep.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

ITERS = 200


def main(n_obs=1_000_000):
    import jax
    import jax.numpy as jnp

    from careless_tpu.models.base import Inputs
    from careless_tpu.models.scaling.nn import MLPScaler
    from careless_tpu.ops import fused_mlp

    rng = np.random.default_rng(0)
    meta = rng.normal(size=(n_obs, 10)).astype(np.float32)

    def timed(body, args):
        @jax.jit
        def run(args):
            def step(c, i):
                return body(c, *args), ()
            c, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(ITERS))
            return c
        float(run(args))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(args))
            best = min(best, time.perf_counter() - t0)
        return best / ITERS * 1e3

    for block, split in ((512, 256), (512, 512), (1024, 256), (1024, 512),
                         (2048, 512), (2048, 1024), (1024, 128)):
        fused_mlp.BLOCK_ROWS = block
        fused_mlp.SPLIT_ROWS = split
        scaler = MLPScaler(20, 10)
        params = scaler.init(None, 10)
        inputs = Inputs.from_arrays(
            np.zeros(n_obs, np.int32), np.zeros(n_obs, np.int32),
            np.zeros(n_obs), meta, np.ones(n_obs, np.float32),
            np.ones(n_obs, np.float32))
        x2d = fused_mlp.pack_metadata(meta, 10)
        inputs = inputs._replace(plans=None)
        inputs_dev = jax.device_put(inputs)
        params = jax.device_put(params)
        packed = jax.device_put(x2d)

        def body(c, params, inputs, packed):
            def f(p):
                p = dict(p)
                p2 = {"layers": [
                    {"w": p["layers"][0]["w"] + c * 1e-30,
                     "b": p["layers"][0]["b"]}] + p["layers"][1:],
                    "out": p["out"]}
                h = fused_mlp.fused_mlp_trunk(
                    inputs.metadata, p2["layers"], 0.01, packed=packed)
                y = jnp.dot(h, p2["out"]["w"]) + p2["out"]["b"]
                return jnp.sum(y)
            v, g = jax.value_and_grad(f)(params)
            return v + sum(jnp.sum(x) for x in jax.tree.leaves(g))

        try:
            t = timed(body, (params, inputs_dev, packed))
        except Exception as e:
            print(f"block={block} split={split} failed: {str(e)[:100]}",
                  flush=True)
            continue
        print(f"block={block:5d} split={split:4d}  fwd+bwd {t:7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
