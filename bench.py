"""Benchmark: ELBO training throughput of the variational merging model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: a serial-crystallography-scale synthetic mono merge (100k
observations, 10k unique reflections, reference-default 20x10 MLP scaler,
1 MC sample) — the same shape of problem as BASELINE.json config 5.

vs_baseline compares against a faithful re-creation of the reference's
execution model measured on the SAME device: one jitted train step per host
call with per-step metric transfer (the reference's python loop,
/root/reference/careless/models/merging/variational.py:255-270 — TFP itself
is not installed here, so the reference cannot run directly). Our number is
the scan-chunked trainer. Same model math, same optimizer, same device —
the ratio isolates the framework's architectural win.
"""
import json
import sys
import time

import numpy as np


def build_problem(n_obs=100_000, n_refl=10_000, n_images=200, d_meta=10,
                  seed=0):
    import jax

    from careless_tpu.models.base import Inputs
    from careless_tpu.models.likelihoods.mono import NormalLikelihood
    from careless_tpu.models.merging.surrogate import TruncatedNormalPosterior
    from careless_tpu.models.merging.variational import (Trainer,
                                                         VariationalMergingModel)
    from careless_tpu.models.priors.wilson import WilsonPrior
    from careless_tpu.models.scaling.image import HybridImageScaler, ImageScaler
    from careless_tpu.models.scaling.nn import MLPScaler

    rng = np.random.default_rng(seed)
    refl_id = rng.integers(0, n_refl, n_obs)
    image_id = rng.integers(0, n_images, n_obs)
    metadata = rng.normal(size=(n_obs, d_meta)).astype(np.float32)
    f_true = np.abs(rng.normal(1.0, 0.5, n_refl)) + 0.05
    scale_true = np.exp(0.2 * metadata[:, 0])
    iobs = scale_true * f_true[refl_id] ** 2
    iobs = iobs + 0.1 * np.sqrt(np.abs(iobs)) * rng.normal(size=n_obs)
    sig = np.full(n_obs, 0.1, np.float32)
    inputs = Inputs.from_arrays(refl_id, image_id, np.zeros(n_obs), metadata,
                                iobs, sig).with_plans(n_refl, n_images)

    centric = rng.random(n_refl) < 0.2
    prior = WilsonPrior(centric, np.ones(n_refl, np.float32))
    posterior = TruncatedNormalPosterior(
        low=(1e-32 * ~centric).astype(np.float32))
    mlp = MLPScaler(20, 10)  # reference defaults (args/scaling.py:21-31)
    scaler = HybridImageScaler(mlp, ImageScaler(n_images))
    model = VariationalMergingModel(posterior, prior, NormalLikelihood(),
                                    scaler, mc_samples=1)
    params = model.init(jax.random.PRNGKey(seed), inputs,
                        (np.asarray(prior.mean()), np.asarray(prior.stddev())))
    trainer = Trainer(model)
    return model, params, trainer, inputs


def bench_ours(trainer, params, inputs, steps=1500, chunk=250):
    """scan-chunked trainer (the careless-tpu architecture)."""
    import jax

    opt = trainer.optimizer()
    opt_state = opt.init(params)
    step = trainer.make_step()

    @jax.jit
    def run_chunk(params, opt_state, keys, inputs):
        (params, opt_state), metrics = jax.lax.scan(
            lambda c, k: step(c, k, inputs), (params, opt_state), keys)
        return params, opt_state, metrics

    key = jax.random.PRNGKey(0)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(np.arange(chunk))
    # warmup/compile
    p, o, m = run_chunk(params, opt_state, keys, inputs)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    done = 0
    while done < steps:
        p, o, m = run_chunk(p, o, keys, inputs)
        done += chunk
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    return steps / dt


def bench_reference_style(trainer, params, inputs, steps=150):
    """Reference execution model: one step per host call, per-step metric
    readback (float() on every metric, like the tqdm postfix loop)."""
    import jax

    opt = trainer.optimizer()
    opt_state = opt.init(params)
    step = trainer.make_step()

    @jax.jit
    def one(params, opt_state, key, inputs):
        return step((params, opt_state), key, inputs)

    key = jax.random.PRNGKey(0)
    (p, o), m = one(params, opt_state, jax.random.fold_in(key, 0), inputs)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for i in range(steps):
        (p, o), m = one(p, o, jax.random.fold_in(key, i), inputs)
        _ = [float(x) for x in np.asarray(m)]  # per-step host sync
    dt = time.perf_counter() - t0
    return steps / dt


def main():
    quick = "--quick" in sys.argv
    n_obs = 20_000 if quick else 100_000
    steps = 500 if quick else 1500
    ref_steps = 50 if quick else 150

    model, params, trainer, inputs = build_problem(n_obs=n_obs)
    ours = bench_ours(trainer, params, inputs, steps=steps)
    ref = bench_reference_style(trainer, params, inputs, steps=ref_steps)
    print(json.dumps({
        "metric": "elbo_steps_per_s_100k_obs",
        "value": round(ours, 2),
        "unit": "steps/s",
        "vs_baseline": round(ours / ref, 2),
    }))


if __name__ == "__main__":
    main()
