"""Worker for the 2-process jax.distributed CPU test (run as __main__ by
test_distributed.py, once per process) and problem definition shared with
the in-test single-process reference.

Each process sees 2 virtual CPU devices, so the global mesh has 4 devices
over 2 hosts. Each host materializes ONLY its observation slice
(parallel/distributed.py host-sharded loading), assembles global arrays,
and runs the same deterministic training steps; process 0 dumps the final
params + per-step metrics for comparison against a single-process run.
"""
import sys

import numpy as np

N_OBS = 512
N_REFL = 64
N_IMAGES = 8
D_META = 3
STEPS = 5


def make_problem():
    """Deterministic synthetic mono problem (host-side numpy)."""
    rng = np.random.default_rng(42)
    refl_id = rng.integers(0, N_REFL, N_OBS).astype(np.int32)
    image_id = rng.integers(0, N_IMAGES, N_OBS).astype(np.int32)
    metadata = rng.normal(size=(N_OBS, D_META)).astype(np.float32)
    f_true = (np.abs(rng.normal(1.5, 0.6, N_REFL)) + 0.1).astype(np.float32)
    iobs = (f_true[refl_id] ** 2
            + 0.1 * rng.normal(size=N_OBS)).astype(np.float32)
    sig = np.full(N_OBS, 0.3, np.float32)
    return dict(refl_id=refl_id, image_id=image_id,
                file_id=np.zeros(N_OBS, np.int32), metadata=metadata,
                intensities=iobs, uncertainties=sig,
                mask=np.ones(N_OBS, np.float32))


def build_model_and_trainer(inputs):
    import jax

    from careless_tpu.models.likelihoods.mono import NormalLikelihood
    from careless_tpu.models.merging.surrogate import TruncatedNormalPosterior
    from careless_tpu.models.merging.variational import (
        Trainer, VariationalMergingModel)
    from careless_tpu.models.priors.wilson import WilsonPrior
    from careless_tpu.models.scaling.nn import MLPScaler

    centric = np.zeros(N_REFL, bool)
    prior = WilsonPrior(centric, np.ones(N_REFL, np.float32))
    posterior = TruncatedNormalPosterior(
        low=(1e-32 * np.ones(N_REFL)).astype(np.float32))
    model = VariationalMergingModel(posterior, prior, NormalLikelihood(),
                                    MLPScaler(3, 4), mc_samples=1)
    params = model.init(jax.random.PRNGKey(0), inputs,
                        (np.asarray(prior.mean()),
                         np.asarray(prior.stddev())))
    return model, params, Trainer(model)


def run_steps(trainer, params, inputs):
    """STEPS deterministic optimization steps; returns (params, metrics)."""
    import jax

    opt = trainer.optimizer()
    opt_state = opt.init(params)
    step = trainer.make_step()

    @jax.jit
    def run(params, opt_state, keys, inputs):
        (params, opt_state), metrics = jax.lax.scan(
            lambda c, k: step(c, k, inputs), (params, opt_state), keys)
        return params, metrics

    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(3), i))(
        np.arange(STEPS))
    return run(params, opt_state, keys, inputs)


def main(coordinator, process_id, out_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=2, process_id=process_id)
    assert jax.process_count() == 2
    assert jax.device_count() == 4  # 2 hosts x 2 virtual devices

    from careless_tpu.models.base import Inputs
    from careless_tpu.parallel.distributed import (
        global_mesh, host_observation_slice, shard_host_local)

    cols = make_problem()
    mesh = global_mesh()
    sl = host_observation_slice(N_OBS)

    def put(x):
        return shard_host_local(mesh, np.asarray(x)[sl], N_OBS)

    inputs = Inputs(
        refl_id=put(cols["refl_id"]), image_id=put(cols["image_id"]),
        file_id=put(cols["file_id"]), metadata=put(cols["metadata"]),
        intensities=put(cols["intensities"]),
        uncertainties=put(cols["uncertainties"]),
        mask=put(cols["mask"]))

    host_inputs = Inputs(**{k: np.asarray(v) for k, v in cols.items()})
    _, params, trainer = build_model_and_trainer(host_inputs)
    params, metrics = run_steps(trainer, params, inputs)

    if process_id == 0:
        # params/metrics are fully replicated global arrays, so the local
        # copy is the global value
        flat = {f"p{i}": np.asarray(x)
                for i, x in enumerate(jax.tree.leaves(params))}
        np.savez(out_path, metrics=np.asarray(metrics), **flat)
    # all processes must reach shutdown together
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), sys.argv[3])
