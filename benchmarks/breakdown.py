"""Component-level timing of the ELBO step on the current backend.

Identifies the hot spots that the Pallas fused kernel must target
(SURVEY.md §3.2: sample -> gather -> scale -> log-prob -> reduce).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, n=50):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main(n_obs=100_000):
    import jax
    import jax.numpy as jnp

    from bench import build_problem

    model, params, trainer, inputs = build_problem(n_obs=n_obs)
    key = jax.random.PRNGKey(0)
    inputs_dev = jax.device_put(inputs)

    @jax.jit
    def full_step(params, key, inputs):
        return jax.value_and_grad(model.elbo, has_aux=True)(params, key, inputs)

    @jax.jit
    def fwd_only(params, key, inputs):
        return model.elbo(params, key, inputs)[0]

    @jax.jit
    def scaler_fwd(params, inputs):
        d = model.scaler.apply(params["scaler"], inputs)
        return d.loc.sum() + d.scale.sum()

    @jax.jit
    def posterior_sample(params, key):
        q = model.posterior.distribution(params["posterior"])
        return q.sample(key, (1,)).sum()

    @jax.jit
    def gather_and_ll(params, key, inputs):
        q = model.posterior.distribution(params["posterior"])
        z_f = q.sample(key, (1,))
        ipred = jnp.square(z_f[:, inputs.refl_id])
        lik = model.likelihood.build({}, inputs)
        return lik.log_prob(ipred).sum()

    @jax.jit
    def kl_only(params, key):
        q = model.posterior.distribution(params["posterior"])
        z = q.sample(key, (1,))
        return (q.log_prob(z) - model.prior.log_prob(z)).sum()

    print(f"devices: {jax.devices()}")
    print(f"n_obs={n_obs}")
    print(f"full step (fwd+bwd+adam-less): {timeit(full_step, params, key, inputs_dev):8.3f} ms")
    print(f"forward only                 : {timeit(fwd_only, params, key, inputs_dev):8.3f} ms")
    print(f"  scaler MLP fwd             : {timeit(scaler_fwd, params, inputs_dev):8.3f} ms")
    print(f"  posterior sample           : {timeit(posterior_sample, params, key):8.3f} ms")
    print(f"  gather+loglik              : {timeit(gather_and_ll, params, key, inputs_dev):8.3f} ms")
    print(f"  KL                         : {timeit(kl_only, params, key):8.3f} ms")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    main(n)
