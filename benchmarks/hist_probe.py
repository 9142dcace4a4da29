"""Histogram-backward variants probe: where do 0.9 ms go at 1M obs?

Variants of the factored hi/lo one-hot histogram (plan_gather.
_onehot_histogram): matmul precision (HIGHEST = multi-pass bf16 expansion
vs an exact 2-pass hi/lo value split vs DEFAULT), and scan unroll.

Usage: python benchmarks/hist_probe.py
"""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

ITERS = 200
LANES = 128
BLOCK = 8192


def main(n_obs=1_000_000, n_images=2000):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    ids = np.sort(rng.integers(0, n_images, n_obs)).astype(np.int32)
    rng.shuffle(ids)
    rows = -(-n_obs // LANES)
    rows_pad = -(-rows // (BLOCK // LANES)) * (BLOCK // LANES)
    flat = np.zeros(rows_pad * LANES, np.int32)
    flat[:n_obs] = ids
    ids2d = jax.device_put(flat.reshape(rows_pad, LANES))
    ct = jax.device_put(rng.normal(size=n_obs).astype(np.float32))
    t_rows = -(-n_images // LANES)

    def hist(ct, ids2d, precision, unroll, split=False):
        total = ids2d.size
        ct = jnp.concatenate([ct, jnp.zeros(total - ct.shape[0], ct.dtype)])
        v = ct.reshape(-1, BLOCK)
        ii = ids2d.reshape(-1, BLOCK)
        hi_iota = jnp.arange(t_rows, dtype=jnp.int32)
        lo_iota = jnp.arange(LANES, dtype=jnp.int32)

        def body(acc, args):
            vv, idx = args
            hi = idx // LANES
            lo = idx % LANES
            b = (lo[:, None] == lo_iota[None, :]).astype(jnp.float32)
            if split:
                # exact 2-pass value split: vv = hi16 + lo16 with both
                # halves exactly representable in bf16; b is exact in bf16
                v_hi = (vv.astype(jnp.bfloat16)).astype(jnp.float32)
                v_lo = vv - v_hi
                a_hi = v_hi[None, :] * (hi[None, :] == hi_iota[:, None])
                a_lo = v_lo[None, :] * (hi[None, :] == hi_iota[:, None])
                d = (jnp.dot(a_hi.astype(jnp.bfloat16),
                             b.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
                     + jnp.dot(a_lo.astype(jnp.bfloat16),
                               b.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32))
            else:
                a = vv[None, :] * (hi[None, :] == hi_iota[:, None])
                d = jnp.dot(a, b, preferred_element_type=jnp.float32,
                            precision=precision)
            return acc + d, ()

        out, _ = jax.lax.scan(body, jnp.zeros((t_rows, LANES), jnp.float32),
                              (v, ii), unroll=unroll)
        return out.reshape(-1)[:n_images]

    def timed(fn):
        @jax.jit
        def run(args):
            ct, ids2d = args

            def step(c, i):
                return c + fn(ct + c * 1e-30, ids2d)[0], ()
            c, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(ITERS))
            return c
        float(run((ct, ids2d)))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run((ct, ids2d)))
            best = min(best, time.perf_counter() - t0)
        return best / ITERS * 1e3

    import jax.lax as lax
    ref = np.zeros(n_images, np.float64)
    np.add.at(ref, ids, np.asarray(ct, np.float64))

    for name, fn in [
        ("HIGHEST unroll=8", partial(hist, precision=jax.lax.Precision.HIGHEST,
                                     unroll=8)),
        ("HIGHEST unroll=1", partial(hist, precision=jax.lax.Precision.HIGHEST,
                                     unroll=1)),
        ("HIGH    unroll=8", partial(hist, precision=jax.lax.Precision.HIGH,
                                     unroll=8)),
        ("DEFAULT unroll=8", partial(hist, precision=None, unroll=8)),
        ("2-pass  unroll=8", partial(hist, precision=None, unroll=8,
                                     split=True)),
    ]:
        t = timed(fn)
        out = np.asarray(jax.jit(fn)(ct, ids2d), np.float64)
        err = np.max(np.abs(out - ref) / (np.abs(ref) + 1e-6))
        print(f"{name}: {t:7.3f} ms   max rel err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
