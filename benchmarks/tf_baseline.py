"""Measured TF-stack baseline: the reference's hot loop in raw TensorFlow.

The reference (rs-station/careless) runs on TF/TFP. TFP (and gemmi/rs)
still do not import in this environment, but `tensorflow` itself now does —
so the one previously-unmeasurable row in BASELINE.md ("reference (to be
measured): TBD") can be bounded by re-implementing the reference's per-step
computation in raw TF and timing it on this host's CPU:

- 20-layer x width-10 MLP scaler (reference args/scaling.py:21-31,
  io/manager.py:446-448), relu, loc/softplus-scale heads;
- truncated-normal surrogate posterior sampled by inverse-CDF with
  tf.math.ndtri (what TFP's TruncatedNormal.sample lowers to) + its
  log_prob (reference models/merging/surrogate.py via TFP);
- Wilson prior log_prob (HalfNormal centric / Weibull-2 acentric,
  reference models/priors/wilson.py);
- per-image scales gathered by image_id, normal likelihood, MC KL;
- one jitted (tf.function) step per host call with per-step metric
  readback and NaN-grad zeroing + Adam(1e-3, beta2=0.99, eps=1e-7) —
  the reference's execution model (variational.py:185-270).

For calibration the same workload is also run through careless-tpu's
scan-chunked trainer on the SAME host CPU (JAX CPU backend, XLA paths, no
TPU kernels): `python benchmarks/tf_baseline.py --jax-cpu`.

Usage:  python benchmarks/tf_baseline.py [n_obs] [steps]
        python benchmarks/tf_baseline.py --jax-cpu [n_obs] [steps]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_LAYERS, WIDTH, D_META = 20, 10, 10
N_IMAGES = 2000


def make_data(n_obs, n_refl, seed=0):
    rng = np.random.default_rng(seed)
    refl_id = rng.integers(0, n_refl, n_obs).astype(np.int32)
    image_id = rng.integers(0, N_IMAGES, n_obs).astype(np.int32)
    metadata = rng.normal(size=(n_obs, D_META)).astype(np.float32)
    f_true = (np.abs(rng.normal(1.0, 0.5, n_refl)) + 0.05).astype(np.float32)
    iobs = np.exp(0.2 * metadata[:, 0]) * f_true[refl_id] ** 2
    iobs = (iobs + 0.1 * np.sqrt(np.abs(iobs))
            * rng.normal(size=n_obs)).astype(np.float32)
    sig = np.full(n_obs, 0.1, np.float32)
    centric = (rng.random(n_refl) < 0.2)
    return refl_id, image_id, metadata, iobs, sig, centric, f_true


def run_tf(n_obs, steps):
    import tensorflow as tf

    n_refl = n_obs // 20
    refl_id, image_id, metadata, iobs, sig, centric, f_true = \
        make_data(n_obs, n_refl)

    rng = np.random.default_rng(1)
    ws, bs = [], []
    d_in = D_META
    for _ in range(N_LAYERS):
        lim = np.sqrt(6.0 / (d_in + WIDTH))
        ws.append(tf.Variable(
            rng.uniform(-lim, lim, (d_in, WIDTH)).astype(np.float32)))
        bs.append(tf.Variable(np.zeros(WIDTH, np.float32)))
        d_in = WIDTH
    w_head = tf.Variable(np.zeros((WIDTH, 2), np.float32))
    b_head = tf.Variable(np.array([0.0, -1.0] , np.float32)
                         * np.ones(2, np.float32))
    img_raw = tf.Variable(np.zeros(N_IMAGES, np.float32))
    # posterior raw params (exp bijector), identity-ish init like the
    # reference's prior-moment init
    q_loc_raw = tf.Variable(np.log(np.maximum(f_true, 1e-3)))
    q_scale_raw = tf.Variable(np.full(n_refl, -2.0, np.float32))
    low = (1e-32 * ~centric).astype(np.float32)

    params = ws + bs + [w_head, b_head, img_raw, q_loc_raw, q_scale_raw]
    opt = tf.keras.optimizers.Adam(1e-3, beta_1=0.9, beta_2=0.99,
                                   epsilon=1e-7)

    meta_t = tf.constant(metadata)
    refl_t = tf.constant(refl_id)
    img_t = tf.constant(image_id)
    iobs_t = tf.constant(iobs)
    sig_t = tf.constant(sig)
    centric_t = tf.constant(centric)
    eps_t = tf.constant(np.ones(n_refl, np.float32))
    low_t = tf.constant(low)
    root2 = np.float32(np.sqrt(2.0))
    log2pi = np.float32(np.log(2.0 * np.pi))

    def ndtr(x):
        return 0.5 * tf.math.erfc(-x / root2)

    @tf.function(jit_compile=False)
    def step(seed):
        u = tf.random.stateless_uniform((n_refl,), seed, 1e-6, 1.0 - 1e-6)
        eps_row = tf.random.stateless_normal((n_obs,), seed + 7)
        with tf.GradientTape() as tape:
            q_loc = tf.exp(q_loc_raw)
            q_scale = tf.exp(q_scale_raw) + 1e-7
            # truncated-normal inverse-CDF sample (TFP's sampler core)
            alpha = (low_t - q_loc) / q_scale
            ca = ndtr(alpha)
            z = q_loc + q_scale * tf.math.ndtri(ca + u * (1.0 - ca))
            # q.log_prob under truncation
            xi = (z - q_loc) / q_scale
            log_qz = (-0.5 * xi * xi - 0.5 * log2pi - tf.math.log(q_scale)
                      - tf.math.log(1.0 - ca + 1e-20))
            # Wilson prior: HalfNormal (centric) / Weibull k=2 (acentric)
            hn = (0.5 * log2pi * 0.0 - z * z / (2.0 * eps_t)
                  + np.float32(np.log(np.sqrt(2.0 / np.pi)))
                  - 0.5 * tf.math.log(eps_t))
            wb = (tf.math.log(2.0 * z / eps_t + 1e-20) - z * z / eps_t)
            log_pz = tf.where(centric_t, hn, wb)
            kl = tf.reduce_sum(log_qz - log_pz)

            x = meta_t
            for w, b in zip(ws, bs):
                x = tf.nn.relu(tf.matmul(x, w) + b)
            head = tf.matmul(x, w_head) + b_head
            s_loc = head[:, 0]
            s_scale = tf.math.softplus(head[:, 1]) + 1e-6
            sigma = ((s_loc + s_scale * eps_row)
                     * tf.exp(tf.gather(img_raw, img_t)))
            zf = tf.gather(z, refl_t)
            ipred = sigma * zf * zf
            r = (ipred - iobs_t) / sig_t
            ll = tf.reduce_sum(-0.5 * r * r - 0.5 * log2pi
                               - tf.math.log(sig_t))
            loss = -ll + kl
        grads = tape.gradient(loss, params)
        grads = [tf.where(tf.math.is_finite(g), g, tf.zeros_like(g))
                 for g in grads]
        gnorm = tf.sqrt(sum(tf.reduce_sum(g * g) for g in grads))
        opt.apply_gradients(zip(grads, params))
        return loss, ll, kl, gnorm

    # warmup/trace
    out = step(tf.constant([0, 0], tf.int32))
    _ = [float(x) for x in out]
    t0 = time.perf_counter()
    for i in range(steps):
        out = step(tf.constant([0, i + 1], tf.int32))
        _ = [float(x) for x in out]   # per-step metric readback
    dt = time.perf_counter() - t0
    return steps / dt


def run_jax_cpu(n_obs, steps):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from bench import bench_scan, build_problem
    _, p, t, i = build_problem(n_obs, n_obs // 20, plans=False)
    return bench_scan(t, p, i, steps, max(steps // 4, 5))


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_obs = int(argv[0]) if argv else 1_000_000
    steps = int(argv[1]) if len(argv) > 1 else 20
    if "--jax-cpu" in sys.argv:
        v = run_jax_cpu(n_obs, steps)
        print(f"careless-tpu JAX-CPU scan trainer: {v:.3f} steps/s "
              f"({n_obs} obs)")
    else:
        v = run_tf(n_obs, steps)
        print(f"raw-TF reference-style loop: {v:.3f} steps/s ({n_obs} obs)")


if __name__ == "__main__":
    main()
