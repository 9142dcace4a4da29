"""In-scan differential timing of the fused ELBO step's components.

Per-dispatch host timing through the axon tunnel is meaningless (~5 ms
dispatch jitter, see PERF_NOTES.md), so every number here is measured as
(time of a lax.scan over ITERS iterations) / ITERS inside ONE jit dispatch.
Per-iteration key folding + a carried perturbation keep XLA from hoisting
the body out of the loop.

Usage: python benchmarks/breakdown_scan.py [n_obs]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

ITERS = 200


def scan_time(make_body, *args, iters=ITERS):
    """Time one jitted lax.scan of `iters` calls to body(carry, key)."""
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

    # float() readback is the only reliable sync through the axon tunnel
    # (block_until_ready has been observed returning before remote
    # completion on scalar results); ~5 ms D2H amortizes over iters
    float(run(args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(args))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3  # ms per iteration


def main(n_obs=1_000_000):
    import jax
    import jax.numpy as jnp

    from bench import build_problem
    from careless_tpu.ops.fused_elbo import fused_likelihood_sum
    from careless_tpu.ops.plan_gather import plan_gather

    n_refl = n_obs // 20
    model, params, trainer, inputs = build_problem(
        n_obs=n_obs, n_refl=n_refl, fused=True)
    inputs = jax.device_put(inputs)
    params = jax.device_put(params)
    opt = trainer.optimizer()
    opt_state = jax.device_put(opt.init(params))
    step = trainer.make_step()
    plans = inputs.plans
    n_images = 2000

    print(f"backend={jax.default_backend()} n_obs={n_obs} n_refl={n_refl}")

    # --- full train step (fwd+bwd+adam) ------------------------------------
    # carry (params, opt_state) through the scan like the real trainer, so
    # the backward + optimizer cannot be dead-coded away
    import time as _t

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
        t0 = _t.perf_counter()
        p1, o1, l1 = run_chunk(params, opt_state, ITERS)
        float(l1)
        best = min(best, _t.perf_counter() - t0)
    t_full = best / ITERS * 1e3
    print(f"full train step                 : {t_full:8.3f} ms")

    def _use_all(g):
        """Sum of every grad leaf — nothing can be dead-coded away."""
        return sum(jnp.sum(x) for x in jax.tree.leaves(g))

    def _perturb(params, carry):
        """Vary one trunk weight per iteration so param-only forward
        computations cannot be hoisted out of the timing loop."""
        import copy
        p = jax.tree.map(lambda x: x, params)
        w0 = p["scaler"]["mlp"]["layers"][0]["w"]
        p["scaler"]["mlp"]["layers"][0]["w"] = w0 + carry * 1e-30
        return p

    # --- elbo value_and_grad only (no optimizer) ---------------------------
    def vg(carry, key, params, inputs):
        (loss, m), g = jax.value_and_grad(model.elbo, has_aux=True)(
            _perturb(params, carry), key, inputs)
        return carry + loss + _use_all(g)

    t_vg = scan_time(vg, params, inputs)
    print(f"elbo value_and_grad             : {t_vg:8.3f} ms")

    def fwd(carry, key, params, inputs):
        loss, m = model.elbo(_perturb(params, carry), key, inputs)
        return carry + loss

    t_fwd = scan_time(fwd, params, inputs)
    print(f"elbo forward only               : {t_fwd:8.3f} ms")

    # --- trunk fwd+bwd ------------------------------------------------------
    def trunk(carry, key, params, inputs):
        def f(p):
            d = model.scaler.mlp.apply(p["scaler"]["mlp"], inputs)
            return jnp.sum(d.loc * carry) + jnp.sum(d.scale)
        v, g = jax.value_and_grad(f)(_perturb(params, carry))
        return v + _use_all(g)

    t_trunk = scan_time(trunk, params, inputs)
    print(f"scaler trunk fwd+bwd            : {t_trunk:8.3f} ms")

    def trunk_fwd(carry, key, params, inputs):
        d = model.scaler.mlp.apply(
            _perturb(params, carry)["scaler"]["mlp"], inputs)
        return carry + jnp.sum(d.loc) + jnp.sum(d.scale)

    t_trunk_f = scan_time(trunk_fwd, params, inputs)
    print(f"scaler trunk fwd only           : {t_trunk_f:8.3f} ms")

    # --- fused kernel + gathers fwd+bwd ------------------------------------
    key0 = jax.random.PRNGKey(1)
    loc = jax.device_put(np.random.default_rng(0).normal(
        size=n_obs).astype(np.float32))
    scale = jnp.abs(loc) + 0.1
    z_f = jax.device_put(np.abs(np.random.default_rng(1).normal(
        size=n_refl)).astype(np.float32))
    img = jnp.ones(n_images, jnp.float32)

    def kern(carry, key, loc, scale, z_f, img, inputs):
        seed = jax.random.randint(key, (), 0, 2**31 - 1)

        def f(args):
            lo, sc, zf, im = args
            return fused_likelihood_sum(
                lo + carry, sc, im, zf, inputs.refl_id, inputs.image_id,
                inputs.intensities, inputs.uncertainties, inputs.mask,
                seed=seed, refl_plan=plans.refl, image_plan=plans.image)
        v, g = jax.value_and_grad(f)((loc, scale, z_f, img))
        return v + _use_all(g)

    t_kern = scan_time(kern, loc, scale, z_f, img, inputs)
    print(f"fused kernel+gathers fwd+bwd    : {t_kern:8.3f} ms")

    # --- refl gather fwd+bwd (windowed fwd + segment-sum bwd) ---------------
    def refl(carry, key, z_f, inputs):
        def f(zf):
            return jnp.sum(plan_gather(zf + carry, inputs.refl_id,
                                       plans.refl))
        v, g = jax.value_and_grad(f)(z_f)
        return v + _use_all(g)

    t_refl = scan_time(refl, z_f, inputs)
    print(f"refl gather fwd+bwd (planned)   : {t_refl:8.3f} ms")

    def refl_fwd(carry, key, z_f, inputs):
        return carry + jnp.sum(plan_gather(z_f + carry, inputs.refl_id,
                                           plans.refl))

    t_refl_f = scan_time(refl_fwd, z_f, inputs)
    print(f"refl gather fwd only (planned)  : {t_refl_f:8.3f} ms")

    # --- image gather fwd+bwd (histogram bwd) -------------------------------
    def image(carry, key, img, inputs):
        def f(im):
            return jnp.sum(plan_gather(im + carry, inputs.image_id,
                                       plans.image))
        v, g = jax.value_and_grad(f)(img)
        return v + _use_all(g)

    t_img = scan_time(image, img, inputs)
    print(f"image gather fwd+bwd (hist bwd) : {t_img:8.3f} ms")

    def image_fwd(carry, key, img, inputs):
        return carry + jnp.sum(plan_gather(img + carry, inputs.image_id,
                                           plans.image))

    t_img_f = scan_time(image_fwd, img, inputs)
    print(f"image gather fwd only           : {t_img_f:8.3f} ms")

    # --- KL + posterior sample ----------------------------------------------
    def klpart(carry, key, params):
        def f(p):
            q = model.posterior.distribution(p["posterior"])
            z = q.sample(key, (1,))
            kl = q.log_prob(z) - model.prior.log_prob(z)
            return jnp.sum(kl) + carry * 0
        v, g = jax.value_and_grad(f)(params)
        return v + _use_all(g)

    t_kl = scan_time(klpart, params)
    print(f"posterior sample + KL fwd+bwd   : {t_kl:8.3f} ms")

    # --- adam/opt overhead ---------------------------------------------------
    def adam(carry, key, params, opt_state):
        from jax.flatten_util import ravel_pytree
        flat, unravel = ravel_pytree(params)
        g = jax.tree.map(lambda x: x * 0 + carry, params)
        up, o2 = opt.update(g, opt_state, params)
        p2 = jax.tree.map(lambda a, b: a + b, params, up)
        return carry + ravel_pytree(p2)[0][0]

    t_adam = scan_time(adam, params, opt_state)
    print(f"optimizer update                : {t_adam:8.3f} ms")

    known = t_trunk + t_kern + t_kl + t_adam
    print(f"sum of parts (trunk+kern+kl+opt): {known:8.3f} ms "
          f"(kern includes refl {t_refl:.2f} + image {t_img:.2f})")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    main(n)
