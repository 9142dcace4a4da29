"""Image-scale FORWARD gather formulations at the production shape
(1M obs, 2k-image table): full-window windowed kernel (current dispatch)
vs one-hot MXU gather. The windowed kernel loops all 16 table chunks per
tile when the ids are random over a small table; the one-hot matmul's
comparison count scales with the same 16 rows but runs on the MXU.

Usage: python benchmarks/image_fwd_probe.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

ITERS = 200


def main(n_obs=1_000_000, t_img=2000):
    import jax
    import jax.numpy as jnp

    from careless_tpu.ops import plan_gather as pg
    from careless_tpu.ops.table_gather import windowed_gather

    rng = np.random.default_rng(0)
    ids = rng.integers(0, t_img, n_obs).astype(np.int32)
    plan = pg.make_gather_plan(ids, t_img)
    print(f"backend={jax.default_backend()} window={plan.window} "
          f"rows={-(-t_img // 128)}")
    table = jax.device_put(rng.normal(size=t_img).astype(np.float32))
    ids2d = jax.device_put(np.asarray(plan.ids2d))
    bases = jax.device_put(np.asarray(plan.bases))

    def timed(body, args):
        @jax.jit
        def run(args):
            def step(c, i):
                return c + body(c, *args), ()
            c, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(ITERS))
            return c
        float(run(args))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(args))
            best = min(best, time.perf_counter() - t0)
        return best / ITERS * 1e3

    def win(c, table, ids2d, bases):
        return jnp.sum(windowed_gather(table * (1 + c * 1e-30), ids2d,
                                       bases, plan.window)[:n_obs])

    def onehot(c, table, ids2d):
        return jnp.sum(pg._onehot_gather(table * (1 + c * 1e-30), ids2d,
                                         t_img)[:n_obs])

    print(f"windowed (w={plan.window}): {timed(win, (table, ids2d, bases)):.3f} ms")
    print(f"one-hot MXU            : {timed(onehot, (table, ids2d)):.3f} ms")


if __name__ == "__main__":
    main()
