"""Fused Pallas kernel for the ELBO likelihood term (the hot inner loop).

Covers the per-observation chain of SURVEY.md §3.2 in one VMEM-resident pass
(mono data, Normal likelihood, 1 MC sample — the production default path):

    eps   ~ N(0,1)                      (in-kernel TPU PRNG, Box-Muller)
    z     = a * loc + |a| * scale * eps (a = image scale, gathered by XLA)
    ipred = z * F^2                     (F = posterior sample, gathered by XLA)
    ll    = logNormal(ipred; iobs, sig)
    out   = sum(mask * ll)

plus a custom VJP whose backward kernel recomputes the forward (same PRNG
seed -> identical eps) and emits per-observation dloc, dscale, da, dF.

The two table lookups (z_f by refl_id, image scale by image_id) happen in
XLA *outside* the custom_vjp boundary: Mosaic's in-kernel gather only
supports same-shape take_along_axis (jax/_src/pallas/mosaic/lowering.py
_gather_lowering_rule), and hoisting them means JAX's autodiff transposes
them into duplicate-safe scatter-adds for free. The kernel removes the
separate (N,)-sized noise generation and the materialization of every
elementwise intermediate of forward AND backward.

Layout: all per-observation arrays are reshaped to (R, 128) with observation
o at (o // 128, o % 128); R is padded to a multiple of BLOCK_ROWS so each
grid step sees an aligned (BLOCK_ROWS, 128) tile.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_ROWS = 64  # 64 x 128 = 8192 observations per grid step


def _interpret() -> bool:
    """Run in interpreter mode off-TPU (tests on the CPU mesh)."""
    return jax.default_backend() != "tpu"
_LOG_2PI = float(np.log(2.0 * np.pi))
_TWO_PI = float(2.0 * np.pi)


def _normal_from_bits(shape):
    """Box-Muller standard normals from the in-kernel PRNG.

    prng_random_bits yields SIGNED int32; a plain `>> 8` sign-extends and
    folds half the mass onto the log() clamp (eps |7.4| spikes — the
    round-1 bug caught by the TPU statistics test). Mask to the low 23
    bits instead: always non-negative under signed arithmetic.
    """
    b1 = pltpu.prng_random_bits(shape)
    b2 = pltpu.prng_random_bits(shape)
    u1 = (b1 & 0x7FFFFF).astype(jnp.float32) * (1.0 / (1 << 23))
    u2 = (b2 & 0x7FFFFF).astype(jnp.float32) * (1.0 / (1 << 23))
    u1 = jnp.maximum(u1, 1e-12)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


def prng_normal_probe(seed: int, n_rows: int = 4096):
    """Sample standard normals from the in-kernel PRNG path (the exact
    `_normal_from_bits` chain the production kernel uses) for statistical
    validation OUTSIDE the hardware-gated test suite — bench.py runs this
    on the real chip and records the moments into BENCH_r{N}.json
    (VERDICT round-2 Weak #6: the round-1 sign-extension bug site needs a
    gate that is visible in artifacts). TPU only."""
    def kernel(seed_ref, out_ref):
        i = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + i)
        out_ref[:] = _normal_from_bits(out_ref.shape)

    out = pl.pallas_call(
        kernel,
        grid=(n_rows // BLOCK_ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
        interpret=_interpret(),
    )(jnp.asarray([seed], jnp.int32))
    return out.reshape(-1)


def prng_normal(seed, n: int):
    """(n,) standard normals from the in-kernel TPU PRNG — ~10x cheaper
    than XLA threefry at 1M samples (0.159 ms measured, laue_breakdown).
    Statistically gated by prng_normal_probe (same bit chain) in every
    BENCH artifact. seed may be a traced int32 scalar; TPU only."""
    rows = -(-n // LANES)
    rows = -(-rows // BLOCK_ROWS) * BLOCK_ROWS
    return prng_normal_probe(seed, rows)[:n]


def _common(seed_ref, i, noise_ref, loc_ref, scale_ref, a_ref, f_ref,
            iobs_ref, sig_ref):
    """Recompute the forward chain for one block; shared by fwd and bwd."""
    if noise_ref is None:
        pltpu.prng_seed(seed_ref[0] + i)
        eps = _normal_from_bits(loc_ref.shape)
    else:
        eps = noise_ref[:]
    a = a_ref[:]
    z = a * loc_ref[:] + jnp.abs(a) * scale_ref[:] * eps
    F = f_ref[:]
    ipred = z * F * F
    sig = sig_ref[:]
    iobs = iobs_ref[:]
    return eps, a, z, F, ipred, sig, iobs


_SQRT2 = float(np.sqrt(2.0))

EV11_KINDS = ("normal_ev11", "studentt_ev11")
FUSED_KINDS = ("normal", "studentt", "laplace") + EV11_KINDS


def _effective_scale(kind, ev, sig, ipred):
    """(s, sp, u): the likelihood's scale. Plain kinds use sig directly;
    Ev11 kinds apply the SCALA/Aimless correction with trainable scalars
    (reference mono.py:39-59): s = Sdfac * sqrt(sig^2 + SdB*softplus(I) +
    Sdadd*softplus(I)^2) evaluated at I = ipred."""
    if kind not in EV11_KINDS:
        return sig, None, None
    sdfac, sdadd, sdb = ev
    sp = jnp.logaddexp(0.0, ipred)  # softplus
    u = sig * sig + sdb * sp + sdadd * sp * sp
    return sdfac * jnp.sqrt(u), sp, u


def _pointwise_ll(kind, dof, ev, iobs, sig, ipred):
    """Per-observation log-likelihood — the only likelihood-specific lines
    of the kernel (SURVEY.md §3.2)."""
    s, _, _ = _effective_scale(kind, ev, sig, ipred)
    r = (iobs - ipred) / s
    if kind in ("normal", "normal_ev11"):
        return -0.5 * r * r - jnp.log(s) - 0.5 * _LOG_2PI
    if kind in ("studentt", "studentt_ev11"):
        import math
        const = (math.lgamma((dof + 1.0) / 2.0) - math.lgamma(dof / 2.0)
                 - 0.5 * math.log(dof * math.pi))
        return (const - jnp.log(s)
                - 0.5 * (dof + 1.0) * jnp.log1p(r * r / dof))
    if kind == "laplace":
        # reference Laplace uses scale sig/sqrt(2) (mono.py:20-23)
        return -jnp.log(_SQRT2 * s) - _SQRT2 * jnp.abs(r)
    raise ValueError(f"unsupported fused likelihood kind: {kind}")


def _pointwise_grads(kind, dof, ev, iobs, sig, ipred):
    """(d ll/d ipred, (d ll/d sdfac, sdadd, sdb) or None) per observation.

    With s depending on ipred (Ev11), d ll/d ipred picks up an extra
    (dll/ds)(ds/dipred) term; the scalar grads are (dll/ds)(ds/dtheta)."""
    s, sp, u = _effective_scale(kind, ev, sig, ipred)
    r = (iobs - ipred) / s
    if kind in ("normal", "normal_ev11"):
        base = r / s
        dll_ds_times_s = r * r - 1.0          # s * dll/ds
    elif kind in ("studentt", "studentt_ev11"):
        base = (dof + 1.0) * r / ((dof + r * r) * s)
        dll_ds_times_s = (dof + 1.0) * r * r / (dof + r * r) - 1.0
    elif kind == "laplace":
        return jnp.sign(r) * _SQRT2 / s, None
    else:
        raise ValueError(f"unsupported fused likelihood kind: {kind}")
    if kind not in EV11_KINDS:
        return base, None
    sdfac, sdadd, sdb = ev
    # ds/dipred = sdfac^2 * (sdb + 2 sdadd sp) * sigmoid(ipred) / (2 s)
    sigm = 1.0 / (1.0 + jnp.exp(-ipred))
    ds_dip = sdfac * sdfac * (sdb + 2.0 * sdadd * sp) * sigm / (2.0 * s)
    dip = base + dll_ds_times_s * ds_dip / s
    d_sdfac = dll_ds_times_s / sdfac
    half_fac = sdfac * sdfac / (2.0 * s * s)
    d_sdadd = dll_ds_times_s * half_fac * sp * sp
    d_sdb = dll_ds_times_s * half_fac * sp
    return dip, (d_sdfac, d_sdadd, d_sdb)


def _make_fwd_kernel(with_noise: bool, kind: str, dof: float):
    """Input refs arrive before output refs, so the optional noise input
    must be bound before out_ref."""

    def kernel(seed_ref, loc_ref, scale_ref, a_ref, f_ref, iobs_ref, sig_ref,
               mask_ref, ev_ref, *rest):
        noise_ref, out_ref = (rest if with_noise else (None, rest[0]))
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[0, 0] = 0.0

        _, _, _, _, ipred, sig, iobs = _common(
            seed_ref, i, noise_ref, loc_ref, scale_ref, a_ref, f_ref,
            iobs_ref, sig_ref)
        ev = (ev_ref[0], ev_ref[1], ev_ref[2])
        ll = _pointwise_ll(kind, dof, ev, iobs, sig, ipred)
        out_ref[0, 0] += jnp.sum(mask_ref[:] * ll)

    return kernel


def _make_bwd_kernel(with_noise: bool, kind: str, dof: float):
    """Emits per-observation gradient contributions; the duplicate-index
    scatter-adds into the z_f / image-scale tables are the autodiff
    transpose of the XLA gathers in `fused_likelihood_sum`. Ev11 scalar
    grads accumulate in SMEM across the (sequential) grid."""

    def kernel(seed_ref, loc_ref, scale_ref, a_ref, f_ref, iobs_ref, sig_ref,
               mask_ref, ev_ref, *rest):
        if with_noise:
            noise_ref = rest[0]
            rest = rest[1:]
        else:
            noise_ref = None
        dloc_ref, dscale_ref, da_ref, df_ref, dev_ref = rest

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dev_ref[0, 0] = 0.0
            dev_ref[0, 1] = 0.0
            dev_ref[0, 2] = 0.0

        eps, a, z, F, ipred, sig, iobs = _common(
            seed_ref, i, noise_ref, loc_ref, scale_ref, a_ref, f_ref,
            iobs_ref, sig_ref)
        ev = (ev_ref[0], ev_ref[1], ev_ref[2])
        dip, dev = _pointwise_grads(kind, dof, ev, iobs, sig, ipred)
        mask = mask_ref[:]
        # d ll_sum / d ipred
        g = mask * dip
        dz = g * F * F
        dloc_ref[:] = dz * a
        dscale_ref[:] = dz * jnp.abs(a) * eps
        df_ref[:] = g * z * 2.0 * F
        da_ref[:] = dz * loc_ref[:] + jnp.sign(a) * scale_ref[:] * eps * dz
        if dev is not None:
            dev_ref[0, 0] += jnp.sum(mask * dev[0])
            dev_ref[0, 1] += jnp.sum(mask * dev[1])
            dev_ref[0, 2] += jnp.sum(mask * dev[2])

    return kernel


def _to_lanes(x, rows, fill=0.0):
    """(N,) -> (rows, 128), padded with `fill`."""
    n = x.shape[0]
    total = rows * LANES
    x = jnp.concatenate([x, jnp.full((total - n,), fill, x.dtype)])
    return x.reshape(rows, LANES)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_ll(static, seed, loc, scale, a, f, iobs, sig, mask, ev, noise):
    return _fused_ll_fwd(static, seed, loc, scale, a, f, iobs, sig, mask,
                         ev, noise)[0]


def _specs(static, with_noise):
    n_rows = static[0]
    grid = (n_rows // BLOCK_ROWS,)
    blk = lambda: pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # seed
        blk(), blk(),                            # loc, scale
        blk(), blk(),                            # a, F (pre-gathered)
        blk(), blk(), blk(),                     # iobs, sig, mask
        pl.BlockSpec(memory_space=pltpu.SMEM),   # ev11 scalars (3,)
    ]
    if with_noise:
        in_specs.append(blk())
    return grid, in_specs, blk


def _fused_ll_fwd(static, seed, loc, scale, a, f, iobs, sig, mask, ev,
                  noise):
    _, kind, dof = static
    grid, in_specs, blk = _specs(static, noise is not None)
    args = [seed, loc, scale, a, f, iobs, sig, mask, ev]
    if noise is not None:
        args.append(noise)
    out = pl.pallas_call(
        _make_fwd_kernel(noise is not None, kind, dof),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=_interpret(),
    )(*args)
    res = (seed, loc, scale, a, f, iobs, sig, mask, ev, noise)
    return out[0, 0], res


def _fused_ll_bwd(static, res, ct):
    (seed, loc, scale, a, f, iobs, sig, mask, ev, noise) = res
    n_rows, kind, dof = static
    grid, in_specs, blk = _specs(static, noise is not None)
    args = [seed, loc, scale, a, f, iobs, sig, mask, ev]
    if noise is not None:
        args.append(noise)
    dloc, dscale, da, df, dev = pl.pallas_call(
        _make_bwd_kernel(noise is not None, kind, dof),
        grid=grid,
        in_specs=in_specs,
        out_specs=(blk(), blk(), blk(), blk(),
                   pl.BlockSpec((1, 3), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)),
        out_shape=(
            *(jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32)
              for _ in range(4)),
            jax.ShapeDtypeStruct((1, 3), jnp.float32),
        ),
        interpret=_interpret(),
    )(*args)
    zero = lambda x: None if x is None else jnp.zeros_like(x)
    return (None, ct * dloc, ct * dscale, ct * da, ct * df, None, None,
            None, ct * dev[0], zero(noise))


_fused_ll.defvjp(_fused_ll_fwd, _fused_ll_bwd)


def fused_likelihood_sum(loc, scale, image_scales, z_f, refl_id, image_id,
                         iobs, sig, mask=None, *, seed,
                         noise: Optional[jax.Array] = None,
                         refl_plan=None, image_plan=None,
                         kind: str = "normal", dof: float = 0.0,
                         ev11=None):
    """sum over observations of mask * log p(z*F^2; iobs, sig) with
    z = a*loc + |a|*scale*eps. Differentiable w.r.t. loc, scale,
    image_scales, z_f (and the Ev11 scalars when given).

    kind/dof select the pointwise likelihood: 'normal' (reference
    NormalLikelihood), 'laplace' (mono.py:20-23), 'studentt' with `dof`
    degrees of freedom (mono.py:25-37), or the Ev11 error-model variants
    'normal_ev11'/'studentt_ev11' (mono.py:39-73) — the only
    likelihood-specific lines (_pointwise_ll/_pointwise_grads).

    ev11: (sdfac, sdadd, sdb) POST-softplus scalars for the Ev11 kinds
    (passed through SMEM; their gradients accumulate in-kernel and flow
    back through the caller's softplus).

    noise: optional externally-supplied standard normals (N,) — used by the
    parity tests; production uses the in-kernel PRNG seeded by `seed` (the
    same eps is regenerated in the backward pass).
    """
    n = loc.shape[0]
    n_rows = -(-n // (BLOCK_ROWS * LANES)) * BLOCK_ROWS
    to_lanes = lambda x, fill=0.0: _to_lanes(jnp.asarray(x), n_rows, fill)

    mask_arr = jnp.ones(n, jnp.float32) if mask is None else mask
    # XLA-side table gathers (autodiff transposes these into the
    # duplicate-safe scatter-adds the backward pass needs; with a static
    # GatherPlan the transpose is the fast sorted-segment form)
    from .plan_gather import plan_gather
    a_obs = plan_gather(image_scales, image_id, image_plan)
    f_obs = plan_gather(z_f, refl_id, refl_plan)

    if kind in EV11_KINDS:
        if ev11 is None:
            raise ValueError(f"kind={kind} requires ev11 scalars")
        ev_arr = jnp.stack([jnp.asarray(v, jnp.float32) for v in ev11])
    else:
        ev_arr = jnp.zeros(3, jnp.float32)

    static = (int(n_rows), str(kind), float(dof))
    seed_arr = jnp.asarray([seed], jnp.int32).reshape(1)
    out = _fused_ll(
        static, seed_arr,
        to_lanes(loc), to_lanes(scale), to_lanes(a_obs, 1.0),
        to_lanes(f_obs, 1.0), to_lanes(iobs), to_lanes(sig, 1.0),
        to_lanes(mask_arr, 0.0), ev_arr,
        None if noise is None else to_lanes(noise))
    return out
