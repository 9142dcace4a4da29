"""Run-aligned Laue convolution (ops/conv_runs.py): the gather-free
training-path ll sum must equal the group-layout convolved form exactly —
losses AND gradients, with and without a shard mask, including the Ev11
trainable-parameter gradients that flow through the padding-row tail."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from careless_tpu.models.base import Inputs
from careless_tpu.models.likelihoods import laue as laue_lik
from careless_tpu.ops.conv_runs import (ConvRunPlan, conv_start_sums,
                                        make_conv_run_plan)


def make_laue_inputs(rng, n_obs=300, n_refl=40, with_mask=False):
    sizes = rng.integers(1, 5, n_obs)
    hid = np.repeat(np.arange(len(sizes)), sizes)[:n_obs].astype(np.int32)
    n_groups = int(hid[-1]) + 1
    iobs_g = np.abs(rng.normal(2.0, 1.0, n_groups)).astype(np.float32)
    iobs = np.concatenate([iobs_g,
                           np.ones(n_obs - n_groups, np.float32)])
    sig = np.concatenate([
        (0.1 + rng.random(n_groups)).astype(np.float32),
        np.ones(n_obs - n_groups, np.float32)])
    mask = None
    if with_mask:
        mask = np.ones(n_obs, np.float32)
        mask[rng.random(n_obs) < 0.3] = 0.0  # arbitrary group-row mask
    return Inputs.from_arrays(
        rng.integers(0, n_refl, n_obs), rng.integers(0, 5, n_obs),
        np.zeros(n_obs), rng.normal(size=(n_obs, 4)), iobs, sig,
        wavelength=np.ones(n_obs), harmonic_id=hid, mask=mask), n_refl


def test_conv_start_sums_matches_scatter(rng):
    inputs, _ = make_laue_inputs(rng)
    plan = make_conv_run_plan(inputs.harmonic_id, inputs.intensities,
                              inputs.uncertainties)
    assert plan is not None
    v = rng.normal(size=inputs.n_obs).astype(np.float32)
    conv = np.asarray(conv_start_sums(jnp.asarray(v), plan))
    hid = np.asarray(inputs.harmonic_id)
    expect = np.zeros(inputs.n_obs, np.float64)
    np.add.at(expect, hid, v.astype(np.float64))
    starts = np.r_[True, hid[1:] != hid[:-1]]
    np.testing.assert_allclose(conv[starts], expect[hid[starts]],
                               rtol=1e-5, atol=1e-5)


def test_unsorted_or_long_runs_rejected(rng):
    hid = np.array([1, 0, 0], np.int32)  # unsorted
    assert make_conv_run_plan(hid, np.ones(3), np.ones(3)) is None
    hid = np.zeros(40, np.int32)  # one run of 40 > MAX_RUN
    assert make_conv_run_plan(hid, np.ones(40), np.ones(40)) is None


@pytest.mark.parametrize("lik_cls,kwargs", [
    (laue_lik.NormalLikelihood, {}),
    (laue_lik.StudentTLikelihood, {"dof": 16.0}),
    (laue_lik.NormalEv11Likelihood, {}),
])
@pytest.mark.parametrize("with_mask", [False, True])
def test_masked_ll_sum_matches_group_layout(lik_cls, kwargs, with_mask):
    # local generator: the two paths differ only by f32 association order,
    # right at tolerance; a shared fixture makes the draw order-dependent
    rng = np.random.default_rng(17)
    inputs, n_refl = make_laue_inputs(rng, with_mask=with_mask)
    planned = inputs.with_plans(n_refl, 5)
    assert planned.plans.harmonic_run is not None
    lik_factory = lik_cls(**kwargs)
    params = lik_factory.init()

    ipred = rng.normal(size=(2, inputs.n_obs)).astype(np.float32) ** 2

    def run_ll(p, use_run):
        ins = planned if use_run else planned._replace(
            plans=planned.plans._replace(harmonic_run=None))
        lik = lik_factory.build(p, ins)
        return lik.masked_ll_sum(jnp.asarray(ipred), ins.mask)

    a = float(run_ll(params, True))
    b = float(run_ll(params, False))
    np.testing.assert_allclose(a, b, rtol=2e-5)

    if params:  # Ev11: trainable-parameter grads incl. the padding tail
        ga = jax.grad(lambda p: run_ll(p, True))(params)
        gb = jax.grad(lambda p: run_ll(p, False))(params)
        for k in ga:
            np.testing.assert_allclose(np.asarray(ga[k]), np.asarray(gb[k]),
                                       rtol=2e-4, atol=1e-6, err_msg=k)

    # gradient w.r.t. ipred
    def run_ll_v(v, use_run):
        ins = planned if use_run else planned._replace(
            plans=planned.plans._replace(harmonic_run=None))
        lik = lik_factory.build(params, ins)
        return lik.masked_ll_sum(v, ins.mask)

    ga = np.asarray(jax.grad(
        lambda v: run_ll_v(v, True))(jnp.asarray(ipred)))
    gb = np.asarray(jax.grad(
        lambda v: run_ll_v(v, False))(jnp.asarray(ipred)))
    np.testing.assert_allclose(ga, gb, rtol=5e-4, atol=1e-4)
