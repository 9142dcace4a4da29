"""Probe Pallas/Mosaic capabilities needed by the fused ELBO kernel:
1. dynamic vector gather from a VMEM-resident table
2. in-kernel PRNG (prng_random_bits) + Box-Muller normals
3. accumulation into a shared output across sequential grid steps
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_gather():
    n_refl, n, bn = 1000, 4096, 512

    def kernel(table_ref, idx_ref, out_ref):
        idx = idx_ref[:]
        out_ref[:] = table_ref[idx]

    table = jnp.arange(n_refl, dtype=jnp.float32) * 2.0
    idx = jnp.asarray(np.random.default_rng(0).integers(0, n_refl, n), jnp.int32)
    out = pl.pallas_call(
        kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full table each block
            pl.BlockSpec((bn,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
    )(table, idx)
    expected = np.asarray(table)[np.asarray(idx)]
    ok = np.allclose(np.asarray(out), expected)
    print(f"gather 1d: {'OK' if ok else 'MISMATCH'}")
    return ok


def probe_gather_2d():
    """Gather with 2D-shaped table/idx (TPU-friendlier layout)."""
    n_refl, n, bn = 1024, 4096, 512

    def kernel(table_ref, idx_ref, out_ref):
        idx = idx_ref[:]                      # (bn//128, 128) int32
        out_ref[:] = table_ref[0, idx]

    table = (jnp.arange(n_refl, dtype=jnp.float32) * 2.0).reshape(1, n_refl)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, n_refl, (n // 128, 128)),
                      jnp.int32)
    out = pl.pallas_call(
        kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((bn // 128, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn // 128, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // 128, 128), jnp.float32),
    )(table, idx)
    expected = np.asarray(table)[0][np.asarray(idx)]
    ok = np.allclose(np.asarray(out), expected)
    print(f"gather 2d: {'OK' if ok else 'MISMATCH'}")
    return ok


def probe_rng():
    def kernel(seed_ref, out_ref):
        pltpu.prng_seed(seed_ref[0])
        shape = out_ref.shape
        b1 = pltpu.prng_random_bits(shape)
        b2 = pltpu.prng_random_bits(shape)
        u1 = (b1 >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
        u2 = (b2 >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
        u1 = jnp.maximum(u1, 1e-7)
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        theta = 2.0 * np.pi * u2
        out_ref[:] = r * jnp.cos(theta)

    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    )(jnp.array([1234], jnp.int32))
    arr = np.asarray(out)
    m, s = arr.mean(), arr.std()
    ok = abs(m) < 0.05 and abs(s - 1.0) < 0.05 and np.isfinite(arr).all()
    print(f"rng+box-muller: mean={m:.4f} std={s:.4f} {'OK' if ok else 'BAD'}")
    return ok


def probe_accumulate():
    n, bn = 4096, 512

    def kernel(x_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[0, 0] = 0.0

        out_ref[0, 0] += jnp.sum(x_ref[:])

    x = jnp.arange(n, dtype=jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(n // bn,),
        in_specs=[pl.BlockSpec((bn,), lambda i: (i,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(x)
    ok = np.isclose(float(out[0, 0]), float(x.sum()), rtol=1e-6)
    print(f"grid accumulate: {'OK' if ok else 'BAD'} ({float(out[0,0])} vs {float(x.sum())})")
    return ok


def probe_scatter_add():
    """dz_f accumulation: scatter-add into a VMEM table across a block."""
    n_refl, n, bn = 1024, 4096, 512

    def kernel(idx_ref, val_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        idx = idx_ref[:]
        out_ref[0, idx] += val_ref[:]

    idx = jnp.asarray(np.random.default_rng(0).integers(0, n_refl, (n // 128, 128)), jnp.int32)
    val = jnp.asarray(np.random.default_rng(1).normal(size=(n // 128, 128)), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_refl), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_refl), jnp.float32),
    )(idx, val)
    expected = np.zeros(n_refl, np.float32)
    np.add.at(expected, np.asarray(idx).ravel(), np.asarray(val).ravel())
    ok = np.allclose(np.asarray(out)[0], expected, rtol=1e-4, atol=1e-4)
    print(f"scatter-add: {'OK' if ok else 'BAD'} maxdiff="
          f"{np.abs(np.asarray(out)[0]-expected).max():.2e}")
    return ok


if __name__ == "__main__":
    for probe in (probe_gather, probe_gather_2d, probe_rng, probe_accumulate,
                  probe_scatter_add):
        try:
            probe()
        except Exception as e:
            print(f"{probe.__name__}: FAILED — {type(e).__name__}: "
                  f"{str(e)[:300]}")
