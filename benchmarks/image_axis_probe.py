"""Image-axis scaling probe: histogram-vs-sort crossover past 32k images.

Serial-crystallography runs carry 10^5-10^6 images (SURVEY.md §5.7); the
image-scale gradient is a duplicate-index scatter-add of a 10M-obs
cotangent into a T-image table. Two order-independent formulations exist
(ops/plan_gather.py):

- factored one-hot MXU histogram: cost ~ K * (T/W + W) with W ~ sqrt(T) —
  grows with sqrt(T);
- stable key-sort + chunked segment-sum: ~flat in T (sort-dominated).

This probe measures both at 10M obs over T in {20k, 50k, 100k, 200k} and
prints the measured crossover; MAX_HIST_TABLE in plan_gather.py encodes
the resulting dispatch policy. (Forward gathers at these T fall back to
the XLA take — the table no longer fits the windowed kernel's VMEM cap —
so the backward is the axis that scales.)

Usage: python benchmarks/image_axis_probe.py [n_obs]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

ITERS = 30


def scan_time(fn, *args, iters=ITERS):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(args):
        def step(carry, i):
            return carry + fn(carry, *args), ()
        carry, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(iters))
        return carry

    float(run(args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(args))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main(n_obs=10_000_000):
    import jax
    import jax.numpy as jnp

    from careless_tpu.ops import plan_gather as pg

    rng = np.random.default_rng(0)
    ct = jax.device_put(rng.normal(size=n_obs).astype(np.float32))

    print(f"backend={jax.default_backend()} n_obs={n_obs}")
    print(f"{'T':>8} {'hist ms':>9} {'sort ms':>9} {'winner':>7}")
    for t_img in (20_000, 50_000, 100_000, 200_000):
        ids = rng.integers(0, t_img, n_obs).astype(np.int32)

        # (a) factored one-hot histogram (force-enabled)
        ids2d = jax.device_put(pg._pad_ids2d(ids))

        def hist(carry, ct, ids2d):
            return jnp.sum(pg._onehot_histogram(ct * (1 + carry * 1e-30),
                                                ids2d, t_img))
        h_ms = scan_time(hist, ct, ids2d)

        # (b) stable key-sort + chunked segment-sum (hist disabled)
        plan = pg.make_gather_plan(ids, t_img)
        plan = pg.GatherPlan(
            perm=plan.perm, starts=plan.starts, ends=plan.ends,
            ids2d=plan.ids2d, bases=plan.bases, bnd=plan.bnd,
            sort_keys=plan.sort_keys, window=0, hist=False, mxu=False)
        plan = jax.device_put(plan)

        def srt(carry, ct, plan):
            return jnp.sum(pg.segment_sum_by_plan(ct * (1 + carry * 1e-30),
                                                  plan))
        s_ms = scan_time(srt, ct, plan)
        print(f"{t_img:>8} {h_ms:>9.2f} {s_ms:>9.2f} "
              f"{'hist' if h_ms < s_ms else 'sort':>7}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000)
