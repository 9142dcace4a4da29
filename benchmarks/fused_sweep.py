"""Fused-likelihood-kernel decision sweep (VERDICT r4 Weak #2 / ask #7).

After the round-4 head fold, the XLA likelihood chain beat the fused
Pallas kernel at every measured 1M-obs mc=1 config, and `auto` now picks
XLA. This sweep covers the configurations never measured head-to-head
post-fold — mc_samples > 1, the sharded per-shard path, small N — to
either find the kernel a niche or justify its deprecation.

Usage: python benchmarks/fused_sweep.py
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    from bench import bench_scan, build_problem

    print(f"backend={jax.default_backend()}")
    print(f"{'config':<38} {'xla':>8} {'fused':>8} {'winner':>7}")

    def row(name, n_obs, n_refl, steps, chunk, mc=1, likelihood="normal",
            sharded=False):
        out = {}
        for fused in (False, True):
            model, p, t, i = build_problem(n_obs, n_refl, fused=fused,
                                           likelihood=likelihood,
                                           plans=not sharded)
            if mc > 1:
                from dataclasses import replace
                model = replace(model, mc_samples=mc)
                p = model.init(jax.random.PRNGKey(0), i,
                               (np.asarray(model.prior.mean()),
                                np.asarray(model.prior.stddev())))
                from careless_tpu.models.merging.variational import Trainer
                t = Trainer(model)
            mesh = None
            if sharded:
                from careless_tpu.parallel.shard import \
                    shard_inputs_over_mesh
                i, mesh = shard_inputs_over_mesh(
                    i, 1, n_refl=n_refl, n_images=2000, mlp_width=10)
            out[fused] = bench_scan(t, p, i, steps, chunk, mesh=mesh)
        w = "fused" if out[True] > out[False] else "xla"
        print(f"{name:<38} {out[False]:>8.1f} {out[True]:>8.1f} {w:>7}")

    row("1M mc=1 normal", 1_000_000, 50_000, 200, 100)
    row("1M mc=2 normal", 1_000_000, 50_000, 100, 50, mc=2)
    row("1M mc=4 normal", 1_000_000, 50_000, 60, 30, mc=4)
    row("1M mc=1 ev11", 1_000_000, 50_000, 200, 100, likelihood="ev11")
    row("100k mc=1 normal", 100_000, 5_000, 400, 200)
    row("100k mc=4 normal", 100_000, 5_000, 200, 100, mc=4)
    row("1M mc=1 sharded-1dev", 1_000_000, 50_000, 100, 50, sharded=True)


if __name__ == "__main__":
    main()
