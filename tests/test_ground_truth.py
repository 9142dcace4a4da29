"""Merging-correctness tests: the framework must RECOVER known structure
factors, not merely run (VERDICT round-1 Missing #1).

Strategy (the reference has no such test; its own evidence of correctness is
the converged-artifact pipeline, /root/reference/tests/gen_test_data.py):
simulate observations from known F with known per-observation scales, train
the full variational model to convergence, and assert the surrogate
posterior covers the ground truth within its own reported uncertainty.
"""
import jax
import numpy as np
import pytest

from careless_tpu.models.base import Inputs
from careless_tpu.models.likelihoods.mono import NormalLikelihood
from careless_tpu.models.merging.surrogate import TruncatedNormalPosterior
from careless_tpu.models.merging.variational import (Trainer,
                                                     VariationalMergingModel)
from careless_tpu.models.priors.wilson import WilsonPrior
from careless_tpu.models.scaling.nn import MLPScaler


def simulate(rng, n_refl=120, redundancy=60, d_meta=4, scale_amp=0.4):
    """Observations from known F_true and a smooth metadata-driven scale.

    The model can only identify Sigma * F^2 jointly; the overall scale is
    pinned by the Wilson prior, so F_true is drawn FROM that prior
    (acentric Wilson with Sigma=1) to make recovery well-posed.
    """
    n_obs = n_refl * redundancy
    f_true = np.sqrt(rng.exponential(1.0, n_refl)).astype(np.float32)
    refl_id = np.repeat(np.arange(n_refl), redundancy)
    rng.shuffle(refl_id)
    image_id = rng.integers(0, 30, n_obs)
    metadata = rng.normal(size=(n_obs, d_meta)).astype(np.float32)
    scale_true = np.exp(scale_amp * np.sin(metadata[:, 0])
                        + 0.5 * scale_amp * metadata[:, 1])
    sig = np.full(n_obs, 0.05, np.float32)
    iobs = (scale_true * f_true[refl_id] ** 2
            + sig * rng.normal(size=n_obs)).astype(np.float32)
    inputs = Inputs.from_arrays(refl_id, image_id, np.zeros(n_obs),
                                metadata, iobs, sig)
    return inputs, f_true, scale_true


def build(inputs, n_refl, seed=0, mc_samples=1):
    centric = np.zeros(n_refl, bool)
    prior = WilsonPrior(centric, np.ones(n_refl, np.float32))
    posterior = TruncatedNormalPosterior(
        low=(1e-32 * np.ones(n_refl)).astype(np.float32))
    scaler = MLPScaler(6, 8)
    model = VariationalMergingModel(posterior, prior, NormalLikelihood(),
                                    scaler, mc_samples=mc_samples)
    params = model.init(jax.random.PRNGKey(seed), inputs,
                        (np.asarray(prior.mean()),
                         np.asarray(prior.stddev())))
    return model, params


@pytest.mark.slow
def test_posterior_recovers_known_structure_factors(rng):
    inputs, f_true, scale_true = simulate(rng)
    n_refl = len(f_true)
    model, params = build(inputs, n_refl)
    trainer = Trainer(model, learning_rate=3e-3)
    params, history = trainer.train(params, jax.random.PRNGKey(7), inputs,
                                    steps=4000, progress=False,
                                    chunk_size=500)
    assert np.isfinite(history["loss"]).all()

    q = model.posterior.distribution(params["posterior"])
    f_est = np.asarray(q.mean())
    f_std = np.asarray(q.stddev())

    # 1. rank/linear agreement: merged F tracks the ground truth
    cc = np.corrcoef(f_est, f_true)[0, 1]
    assert cc > 0.98, cc

    # 2. calibration UP TO THE GAUGE: only Sigma*F^2 is identifiable, so a
    #    single global factor g may separate f_est from f_true (the Wilson
    #    prior pins it only weakly). After removing g, the truth must lie
    #    within the posterior's own reported uncertainty.
    g = np.median(f_true / f_est)
    z = (g * f_est - f_true) / np.maximum(g * f_std, 1e-6)
    assert np.median(np.abs(z)) < 3.0, np.median(np.abs(z))
    assert np.quantile(np.abs(z), 0.95) < 10.0, np.quantile(np.abs(z), 0.95)

    # 3. the learned scales track the simulated scales up to one global
    #    factor (the Sigma/F^2 gauge freedom)
    s_mean, _ = model.scale_mean_stddev(params, inputs)
    s_mean = np.asarray(s_mean)
    cc_s = np.corrcoef(s_mean, scale_true)[0, 1]
    assert cc_s > 0.95, cc_s

    # 4. the identifiable quantity Sigma*F^2 matches the noiseless signal
    ipred = s_mean * f_est[np.asarray(inputs.refl_id)] ** 2
    signal = scale_true * f_true[np.asarray(inputs.refl_id)] ** 2
    rel = np.abs(ipred - signal) / np.maximum(signal, 1e-3)
    assert np.median(rel) < 0.05, np.median(rel)


@pytest.mark.slow
def test_bf16_mlp_recovers_same_posterior(rng):
    """--mlp-dtype=bfloat16 (bf16 trunk matmuls, f32 accumulation) must
    converge to the same posterior as float32 within MC error — the quality
    gate for shipping bf16 as a production option."""
    inputs, f_true, _ = simulate(rng, n_refl=60, redundancy=40)
    n_refl = len(f_true)
    results = []
    for dtype in ("float32", "bfloat16"):
        centric = np.zeros(n_refl, bool)
        prior = WilsonPrior(centric, np.ones(n_refl, np.float32))
        posterior = TruncatedNormalPosterior(
            low=(1e-32 * np.ones(n_refl)).astype(np.float32))
        scaler = MLPScaler(6, 8, mlp_dtype=dtype)
        model = VariationalMergingModel(posterior, prior,
                                        NormalLikelihood(), scaler)
        params = model.init(jax.random.PRNGKey(0), inputs,
                            (np.asarray(prior.mean()),
                             np.asarray(prior.stddev())))
        trainer = Trainer(model, learning_rate=3e-3)
        params, history = trainer.train(params, jax.random.PRNGKey(11),
                                        inputs, steps=2500, progress=False,
                                        chunk_size=500)
        assert np.isfinite(history["loss"]).all()
        q = model.posterior.distribution(params["posterior"])
        results.append(np.asarray(q.mean()))
    cc = np.corrcoef(results[0], results[1])[0, 1]
    assert cc > 0.995, cc
    g = np.median(results[1] / results[0])
    rel = np.abs(g * results[0] - results[1]) / np.maximum(results[1], 1e-3)
    assert np.median(rel) < 0.05, np.median(rel)
    # and both recover the ground truth
    cc_true = np.corrcoef(results[1], f_true)[0, 1]
    assert cc_true > 0.97, cc_true


@pytest.mark.slow
def test_recovery_is_mc_sample_consistent(rng):
    """mc_samples > 1 converges to the same posterior (within MC error)."""
    inputs, f_true, _ = simulate(rng, n_refl=60, redundancy=40)
    n_refl = len(f_true)
    results = []
    for mc in (1, 4):
        model, params = build(inputs, n_refl, mc_samples=mc)
        trainer = Trainer(model, learning_rate=3e-3)
        params, _ = trainer.train(params, jax.random.PRNGKey(11), inputs,
                                  steps=2500, progress=False, chunk_size=500)
        q = model.posterior.distribution(params["posterior"])
        results.append(np.asarray(q.mean()))
    cc = np.corrcoef(results[0], results[1])[0, 1]
    assert cc > 0.995, cc
    # remove the per-run global gauge factor before comparing amplitudes
    g = np.median(results[1] / results[0])
    rel = np.abs(g * results[0] - results[1]) / np.maximum(results[1], 1e-3)
    assert np.median(rel) < 0.05, np.median(rel)
