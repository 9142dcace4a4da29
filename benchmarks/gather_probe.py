"""Probe: MXU one-hot gather vs XLA dynamic take (the Laue refl gather).

The Laue group-contiguous layout cannot be refl-sorted, so its z_f gather
misses the windowed kernel and falls back to XLA's element-serialized take
(~6.7 ms per 1M on v5e). Candidate replacement: the forward twin of the
one-hot histogram backward — factor id = hi*128 + lo, gather table rows by
hi with one (K, t_rows) @ (t_rows, 128) matmul per tile, then select lane lo
with a VPU one-hot reduce. Order-independent; cost ~ N * t_rows MXU issue.

Also probes sort-based permutation application (lax.sort_key_val) as an
alternative primitive, and the histogram backward at t_rows=391 (above the
MAX_HIST_TABLE cap it is currently gated by).

Usage: python benchmarks/gather_probe.py [n_obs] [n_refl]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

ITERS = 100
BLOCK = 8192
LANES = 128


def scan_time(make_body, *args, iters=ITERS):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(args):
        def step(carry, i):
            out = make_body(carry, i, *args)
            return out, ()
        carry, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(iters))
        return carry

    float(run(args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(args))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def onehot_gather(table, ids2d, t_rows, precision):
    """out[k] = table[ids[k]] via per-tile MXU matmul + VPU lane select."""
    import jax
    import jax.numpy as jnp

    total = t_rows * LANES
    table2d = jnp.concatenate(
        [table, jnp.zeros(total - table.shape[0], table.dtype)]
    ).reshape(t_rows, LANES)
    hi_iota = jnp.arange(t_rows, dtype=ids2d.dtype)
    lo_iota = jnp.arange(LANES, dtype=ids2d.dtype)
    tiles = ids2d.reshape(-1, BLOCK)

    def body(c, idx):
        hi = idx // LANES
        lo = idx % LANES
        a = (hi[:, None] == hi_iota[None, :]).astype(jnp.float32)
        rows = jnp.dot(a, table2d, preferred_element_type=jnp.float32,
                       precision=precision)
        out = jnp.sum(rows * (lo[:, None] == lo_iota[None, :]), axis=1)
        return c, out

    _, outs = jax.lax.scan(body, 0.0, tiles)
    return outs.reshape(-1)


def main(n_obs=1_000_000, n_refl=50_000):
    import jax
    import jax.numpy as jnp

    from careless_tpu.ops.plan_gather import _onehot_histogram

    rng = np.random.default_rng(0)
    ids = rng.integers(0, n_refl, n_obs).astype(np.int32)
    rows = -(-n_obs // BLOCK) * (BLOCK // LANES)
    ids_pad = np.zeros(rows * LANES, np.int32)
    ids_pad[:n_obs] = ids
    ids2d = jax.device_put(ids_pad.reshape(rows, LANES))
    ids_dev = jax.device_put(ids)
    table = jax.device_put(
        rng.normal(size=n_refl).astype(np.float32))
    ct = jax.device_put(rng.normal(size=n_obs).astype(np.float32))
    t_rows = -(-n_refl // LANES)

    print(f"backend={jax.default_backend()} n_obs={n_obs} n_refl={n_refl} "
          f"t_rows={t_rows}")

    # --- correctness ------------------------------------------------------
    exact = np.asarray(table)[ids]
    for prec in ("highest", "high", "default"):
        got = np.asarray(jax.jit(
            lambda t: onehot_gather(t, ids2d, t_rows, prec))(table))[:n_obs]
        err = np.max(np.abs(got - exact) / (np.abs(exact) + 1e-9))
        print(f"onehot_gather {prec:8s}: max rel err {err:.3e}")

    # --- forward timings --------------------------------------------------
    def take(c, i, table, ids_dev):
        return c + jnp.sum(jnp.take(table + c * 1e-30, ids_dev))

    print(f"XLA take fwd            : {scan_time(take, table, ids_dev):8.3f} ms")

    for prec in ("highest", "high", "default"):
        def oh(c, i, table, ids2d, prec=prec):
            return c + jnp.sum(onehot_gather(table + c * 1e-30, ids2d,
                                             t_rows, prec))
        print(f"onehot gather {prec:8s}  : {scan_time(oh, table, ids2d):8.3f} ms")

    # --- histogram backward at this table size ----------------------------
    def hist(c, i, ct, ids2d):
        return c + jnp.sum(_onehot_histogram(ct + c * 1e-30, ids2d, n_refl))

    print(f"onehot histogram (bwd)  : {scan_time(hist, ct, ids2d):8.3f} ms")
    # correctness of the histogram at this size
    got = np.asarray(jax.jit(
        lambda v: _onehot_histogram(v, ids2d, n_refl))(ct))
    want = np.zeros(n_refl, np.float64)
    np.add.at(want, ids, np.asarray(ct, np.float64))
    err = np.max(np.abs(got - want) / (np.abs(want) + 1e-6))
    print(f"onehot histogram err    : {err:.3e}")

    # --- sort-based permutation application -------------------------------
    perm = jax.device_put(np.argsort(ids, kind="stable").astype(np.int32))

    def sortperm(c, i, perm, ct):
        _, v = jax.lax.sort_key_val(perm, ct + c * 1e-30)
        return c + jnp.sum(v)

    print(f"sort_key_val (1M permute): {scan_time(sortperm, perm, ct):8.3f} ms")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    main(n, t)
