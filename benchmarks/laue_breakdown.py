"""In-scan differential timing of the Laue (poly) ELBO step's components.

Same method/pitfalls as breakdown_scan.py (see PERF_NOTES.md).

Usage: python benchmarks/laue_breakdown.py [n_obs]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

ITERS = 200


def scan_time(make_body, *args, iters=ITERS):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(args):
        def step(carry, i):
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            out = make_body(carry, key, *args)
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


def main(n_obs=1_000_000):
    import jax
    import jax.numpy as jnp

    from bench import build_problem
    from careless_tpu.ops.plan_gather import plan_convolve, plan_gather

    n_refl = n_obs // 20
    model, params, trainer, inputs = build_problem(
        n_obs=n_obs, n_refl=n_refl, laue=True)
    inputs = jax.device_put(inputs)
    params = jax.device_put(params)
    opt = trainer.optimizer()
    opt_state = jax.device_put(opt.init(params))
    step = trainer.make_step()
    plans = inputs.plans

    print(f"backend={jax.default_backend()} n_obs={n_obs} n_refl={n_refl} "
          f"refl plan={type(plans.refl).__name__}")

    @jax.jit
    def run_chunk(params, opt_state, n):
        def body(c, i):
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            (p, o), m = step(c, key, inputs)
            return (p, o), m[0]
        (p, o), losses = jax.lax.scan(body, (params, opt_state),
                                      jnp.arange(ITERS))
        return p, o, losses[-1]

    p0, o0, l0 = run_chunk(params, opt_state, ITERS)
    float(l0)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        p1, o1, l1 = run_chunk(params, opt_state, ITERS)
        float(l1)
        best = min(best, time.perf_counter() - t0)
    print(f"full train step                 : {best / ITERS * 1e3:8.3f} ms")

    def _use_all(g):
        return sum(jnp.sum(x) for x in jax.tree.leaves(g))

    def _perturb(params, carry):
        p = jax.tree.map(lambda x: x, params)
        w0 = p["scaler"]["mlp"]["layers"][0]["w"]
        p["scaler"]["mlp"]["layers"][0]["w"] = w0 + carry * 1e-30
        return p

    def vg(carry, key, params, inputs):
        (loss, m), g = jax.value_and_grad(model.elbo, has_aux=True)(
            _perturb(params, carry), key, inputs)
        return carry + loss + _use_all(g)

    print(f"elbo value_and_grad             : {scan_time(vg, params, inputs):8.3f} ms")

    def trunk(carry, key, params, inputs):
        def f(p):
            d = model.scaler.mlp.apply(p["scaler"]["mlp"], inputs)
            return jnp.sum(d.loc * carry) + jnp.sum(d.scale)
        v, g = jax.value_and_grad(f)(_perturb(params, carry))
        return v + _use_all(g)

    print(f"scaler trunk fwd+bwd            : {scan_time(trunk, params, inputs):8.3f} ms")

    z_f = jax.device_put(np.abs(np.random.default_rng(1).normal(
        size=n_refl)).astype(np.float32))

    def refl(carry, key, z_f, inputs):
        def f(zf):
            return jnp.sum(plan_gather(zf + carry, inputs.refl_id,
                                       plans.refl))
        v, g = jax.value_and_grad(f)(z_f)
        return v + _use_all(g)

    print(f"refl gather fwd+bwd (mxu+sort)  : {scan_time(refl, z_f, inputs):8.3f} ms")

    def refl_fwd(carry, key, z_f, inputs):
        return carry + jnp.sum(plan_gather(z_f + carry, inputs.refl_id,
                                           plans.refl))

    print(f"refl gather fwd only            : {scan_time(refl_fwd, z_f, inputs):8.3f} ms")

    v_obs = jax.device_put(np.random.default_rng(2).normal(
        size=n_obs).astype(np.float32))
    scale = jnp.abs(v_obs) + 0.5

    def conv(carry, key, v_obs, inputs):
        def f(v):
            return jnp.sum(plan_convolve(v + carry, inputs.harmonic_id,
                                         plans.harmonic) * scale)
        v, g = jax.value_and_grad(f)(v_obs)
        return v + _use_all(g)

    print(f"harmonic convolve fwd+bwd       : {scan_time(conv, v_obs, inputs):8.3f} ms")

    img = jnp.ones(2000, jnp.float32)

    def image(carry, key, img, inputs):
        def f(im):
            return jnp.sum(plan_gather(im + carry, inputs.image_id,
                                       plans.image))
        v, g = jax.value_and_grad(f)(img)
        return v + _use_all(g)

    print(f"image gather fwd+bwd            : {scan_time(image, img, inputs):8.3f} ms")

    def sample(carry, key, inputs):
        eps = jax.random.normal(key, (n_obs,), jnp.float32)
        return carry + jnp.sum(eps) * 1e-30 + eps[0]

    print(f"z_scale noise (XLA threefry)    : {scan_time(sample, inputs):8.3f} ms")

    # pointwise chain fwd+bwd (no gathers/convolve): normal log-prob
    loc = v_obs

    def pointwise(carry, key, loc, scale, inputs):
        def f(args):
            lo, sc = args
            ipred = (lo + carry) * sc
            r = (inputs.intensities - ipred) / inputs.uncertainties
            ll = -0.5 * r * r - jnp.log(inputs.uncertainties)
            return jnp.sum(ll)
        v, g = jax.value_and_grad(f)((loc, scale))
        return v + _use_all(g)

    print(f"pointwise ll fwd+bwd            : {scan_time(pointwise, loc, scale, inputs):8.3f} ms")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    main(n)
