"""CLI driver: end-to-end merge run.

Reference behavior: /root/reference/careless/careless.py — format inputs,
optional test split, build model, train, write merged MTZs + history +
weights + predictions, optional half-dataset crossvalidation.

TPU-native additions: data-parallel observation sharding over a device mesh
(--num-devices), scan-chunked training, npz checkpoints.
"""
from __future__ import annotations

import numpy as np


def main(argv=None):
    from . import __version__
    print(f"careless-tpu version {__version__}")
    from .parser import parser
    args = parser.parse_args(argv)
    run_careless(args)


def run_careless(parser):
    import jax

    from .io.formatter import LaueFormatter, MonoFormatter
    from .io.manager import DataManager
    from .utils.checkpoint import load_params, save_params
    from .xtal import write_mtz

    if parser.type == "poly":
        df = LaueFormatter.from_parser(parser)
    elif parser.type == "mono":
        df = MonoFormatter.from_parser(parser)
    elif parser.type == "devices":
        print("#############################################")
        print("# JAX can access the following devices      #")
        print("#############################################")
        for dev in jax.devices():
            print(f" - {dev.platform}: {dev}")
        return

    inputs, rac = df.format_files(parser.reflection_files)
    dm = DataManager(inputs, rac, parser=parser)

    if parser.test_fraction is not None:
        train, test = dm.split_data_by_refl(parser.test_fraction)
    else:
        train, test = dm.inputs, None

    model, params, trainer = dm.build_model()

    if parser.scale_file is not None:
        params["scaler"] = load_params(parser.scale_file, params["scaler"])
    if parser.structure_factor_file is not None:
        params["posterior"] = load_params(parser.structure_factor_file,
                                          params["posterior"])

    train_dev, mesh = _shard_inputs(train, parser.num_devices,
                                    n_refl=dm.n_refl, n_images=dm.n_images,
                                    mlp_width=dm.mlp_width,
                                    shard_axis=getattr(parser, "shard_axis",
                                                       "obs"))

    key = jax.random.PRNGKey(parser.seed)
    progress = not parser.disable_progress_bar
    from contextlib import nullcontext
    profile_ctx = (jax.profiler.trace(parser.profile_dir)
                   if getattr(parser, "profile_dir", None) else nullcontext())
    with profile_ctx:
        params, history = trainer.train(
            params, key, train_dev, parser.iterations,
            validation_data=test,
            validation_frequency=parser.validation_frequency,
            progress=progress,
            message="Training",
            chunk_size=parser.steps_per_compile,
            mesh=mesh,
            checkpoint_path=(parser.output_base + "_checkpoint"
                             if parser.checkpoint_every else None),
            checkpoint_frequency=parser.checkpoint_every,
            resume_from=parser.resume_from,
        )

    posterior_dist = model.posterior.distribution(params["posterior"])
    for i, ds in enumerate(dm.get_results(posterior_dist, inputs=train)):
        write_mtz(ds, parser.output_base + f"_{i}.mtz")

    import pandas as pd
    pd.DataFrame(history).to_csv(parser.output_base + "_history.csv",
                                 index_label="step")

    save_params(parser.output_base + "_structure_factor", params["posterior"])
    save_params(parser.output_base + "_scale", params["scaler"])
    if parser.save_data_manager:
        dm.to_pickle(parser.output_base + "_data_manager.pickle")

    if test is not None:
        for file_id, (ds_train, ds_test) in enumerate(zip(
                dm.get_predictions(model, params, train, test_value=0),
                dm.get_predictions(model, params, test, test_value=1))):
            merged = _concat_predictions(ds_train, ds_test)
            write_mtz(merged, parser.output_base + f"_predictions_{file_id}.mtz")
    else:
        for file_id, ds_train in enumerate(
                dm.get_predictions(model, params, train, test_value=0)):
            write_mtz(ds_train, parser.output_base + f"_predictions_{file_id}.mtz")

    if parser.merge_half_datasets:
        run_half_dataset_crossvalidation(dm, params, parser, progress)

    if parser.embed:
        try:
            from IPython import embed
            embed(colors="Linux")
        except ImportError:
            pass


def run_half_dataset_crossvalidation(dm, trained_params, parser, progress):
    """Half-dataset merging with the scaling model frozen
    (reference careless.py:102-128).

    TPU-native: the 2 x repeats half-trainings are embarrassingly parallel
    (SURVEY.md §5.8), so the default 'parallel' mode trains all of them in
    one vmapped computation (sharded over the mesh with --num-devices);
    'serial' reproduces the reference's loop (same RNG, same results)."""
    if getattr(parser, "xval_mode", "parallel") != "serial":
        return _run_xval_parallel(dm, trained_params, parser, progress)
    return _run_xval_serial(dm, trained_params, parser, progress)


def _run_xval_parallel(dm, trained_params, parser, progress):
    import jax

    from .parallel.xval import make_half_keys, stack_halves, train_halves
    from .xtal import write_mtz

    halves = []
    for _ in range(parser.half_dataset_repeats):
        halves.extend(dm.split_data_by_image())

    model, params, trainer = dm.build_model()
    params["scaler"] = trained_params["scaler"]
    trainer = type(trainer)(**{**trainer.__dict__, "freeze": ("scaler",)})
    # same row order as the serial path's _shard_inputs — including the
    # Laue CHAIN order (sorted_by_harmonic(n_refl)) — because per-row MC
    # noise is assigned by row index; a layout mismatch would silently
    # break parallel == serial (round-5 review finding)
    stacked = stack_halves([
        h.sorted_by_harmonic(dm.n_refl) if h.is_laue
        else h.sorted_by_refl()
        for h in halves])
    half_keys = make_half_keys(parser.seed, parser.half_dataset_repeats)
    trained = train_halves(
        trainer, params, half_keys, stacked, parser.iterations,
        chunk_size=parser.steps_per_compile,
        num_devices=parser.num_devices, progress=progress,
        message=f"Merging {len(halves)} halves in parallel")

    xval_data = [None] * len(dm.asu_collection)
    for k, half in enumerate(halves):
        repeat, half_id = divmod(k, 2)
        params_k = jax.tree.map(lambda x: x[k], trained)
        posterior_dist = model.posterior.distribution(params_k["posterior"])
        for file_id, ds in enumerate(dm.get_results(posterior_dist,
                                                    inputs=half)):
            ds["repeat"] = np.int32(repeat)
            ds["half"] = np.int32(half_id)
            ds.mtz_dtypes.update({"repeat": "I", "half": "I"})
            if xval_data[file_id] is None:
                xval_data[file_id] = ds
            else:
                xval_data[file_id] = _concat_predictions(
                    xval_data[file_id], ds)
    for file_id, ds in enumerate(xval_data):
        write_mtz(ds, parser.output_base + f"_xval_{file_id}.mtz")


def _run_xval_serial(dm, trained_params, parser, progress):
    import jax

    from .xtal import write_mtz

    xval_data = [None] * len(dm.asu_collection)
    for repeat in range(parser.half_dataset_repeats):
        for half_id, half in enumerate(dm.split_data_by_image()):
            model, params, trainer = dm.build_model()
            params["scaler"] = trained_params["scaler"]
            trainer = type(trainer)(**{
                **trainer.__dict__, "freeze": ("scaler",)})
            # plans must be sized to the GLOBAL tables: the half lacks some
            # image ids but the frozen scaler's table is full-sized
            half_dev, half_mesh = _shard_inputs(half, parser.num_devices,
                                                n_refl=dm.n_refl,
                                                n_images=dm.n_images,
                                                mlp_width=dm.mlp_width)
            key = jax.random.PRNGKey(parser.seed + 7919 * (2 * repeat + half_id + 1))
            params, _ = trainer.train(
                params, key, half_dev, parser.iterations,
                message=f"Merging repeat {repeat + 1} half {half_id + 1}",
                progress=progress,
                chunk_size=parser.steps_per_compile,
                mesh=half_mesh,
            )
            posterior_dist = model.posterior.distribution(params["posterior"])
            for file_id, ds in enumerate(
                    dm.get_results(posterior_dist, inputs=half)):
                ds["repeat"] = np.int32(repeat)
                ds["half"] = np.int32(half_id)
                ds.mtz_dtypes.update({"repeat": "I", "half": "I"})
                if xval_data[file_id] is None:
                    xval_data[file_id] = ds
                else:
                    xval_data[file_id] = _concat_predictions(
                        xval_data[file_id], ds)
    for file_id, ds in enumerate(xval_data):
        write_mtz(ds, parser.output_base + f"_xval_{file_id}.mtz")


def _concat_predictions(a, b):
    import pandas as pd

    from .xtal.dataset import DataSet
    cols = [c for c in a.columns if c in b.columns]
    out = DataSet(pd.concat([a[cols], b[cols]], ignore_index=True),
                  cell=a.cell, spacegroup=a.spacegroup,
                  mtz_dtypes=dict(a.mtz_dtypes))
    return out


def _shard_inputs(inputs, num_devices: int, n_refl=None, n_images=None,
                  mlp_width=None, shard_axis="obs"):
    """Shard per-observation arrays over a 1-D device mesh ('obs' axis);
    parameters stay replicated so refl_id gathers remain device-local and
    XLA psums the gradients over ICI (SURVEY.md §5.8).

    On the single-device path, attach static gather-transpose plans
    (ops/plan_gather.py) so the z_f / image-scale gradient scatters take
    the fast sorted-segment form. n_refl/n_images are the GLOBAL table
    sizes (DataManager.n_refl/n_images), never subset-derived."""
    if not num_devices or num_devices <= 1:
        if n_refl is not None and n_images is not None and inputs.plans is None:
            if not inputs.is_laue:
                # sorted rows give the z_f gather tight kernel windows and
                # an identity backward permute; the ELBO sum is order-free
                inputs = inputs.sorted_by_refl()
            else:
                # chain layout: group-contiguous rows (unpermuted
                # segment-sum convolution) ordered so the refl gather gets
                # the windowed kernel in both directions
                # (ops/chain_layout.py)
                inputs = inputs.sorted_by_harmonic(n_refl)
            inputs = inputs.with_plans(n_refl, n_images,
                                       mlp_width=mlp_width)
        return inputs, None
    if shard_axis == "mc":
        # MC-sample-axis sharding: observations (and their single-device
        # plans) replicated on every chip, the sample axis split by the
        # mc-mesh step (variational.elbo_mc_sharded)
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.shard import make_mesh
        inputs, _ = _shard_inputs(inputs, 0, n_refl=n_refl,
                                  n_images=n_images, mlp_width=mlp_width)
        mesh = make_mesh(num_devices, axis_name="mc")
        repl = NamedSharding(mesh, P())
        inputs = jax.tree.map(
            lambda x: None if x is None else jax.device_put(x, repl),
            inputs, is_leaf=lambda x: x is None)
        return inputs, mesh
    from .parallel.shard import shard_inputs_over_mesh
    return shard_inputs_over_mesh(inputs, num_devices, n_refl=n_refl,
                                  n_images=n_images, mlp_width=mlp_width)


if __name__ == "__main__":
    main()
