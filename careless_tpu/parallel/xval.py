"""Parallel half-dataset crossvalidation.

The reference runs the 2 x repeats half-dataset merges as a serial python
loop (/root/reference/careless/careless.py:102-128), multiplying wall-clock
by 2 x repeats. The halves are embarrassingly parallel: the scaling model is
frozen, each half trains only its own (small) surrogate posterior, and no
state is shared between halves (SURVEY.md §5.8).

TPU-native design: stack the K = 2 x repeats half-inputs along a leading
axis (padded to a common length with mask=0 rows), stack K independent
parameter pytrees, and vmap the entire scan-chunked training loop over the
leading axis — one XLA computation trains every half at once. With
--num-devices the leading axis is sharded over the mesh, so each device
trains K/D halves with ZERO cross-device communication.

RNG per half matches the serial path exactly (PRNGKey(seed + 7919 * k),
fold_in(step)), so the trained posteriors are equal to the serial loop's up
to float reduction order (regression-tested in tests/parallel/test_xval.py).
"""
from __future__ import annotations

from dataclasses import replace as dc_replace
from functools import partial
from typing import Optional, Sequence

import numpy as np

from ..models.base import Inputs


def stack_halves(halves: Sequence[Inputs]) -> Inputs:
    """Stack K half-inputs into one Inputs of leading axis K, padding each
    to the longest half. Padding rows carry mask=0 and (for Laue) fresh
    singleton harmonic groups past the real rows, so they contribute
    exactly zero to loss and gradients."""
    width = max(h.n_obs for h in halves)
    laue = halves[0].is_laue

    def pad1(x, n, value):
        x = np.asarray(x)
        pad = width - n
        if pad == 0:
            return x
        return np.concatenate(
            [x, np.full((pad,) + x.shape[1:], value, dtype=x.dtype)])

    fields = {name: [] for name in
              ("refl_id", "image_id", "file_id", "metadata", "intensities",
               "uncertainties", "wavelength", "harmonic_id", "mask")}
    for h in halves:
        n = h.n_obs
        mask = (np.asarray(h.mask) if h.mask is not None
                else np.ones(n, np.float32))
        fields["refl_id"].append(pad1(h.refl_id, n, 0))
        fields["image_id"].append(pad1(h.image_id, n, 0))
        fields["file_id"].append(pad1(h.file_id, n, 0))
        fields["metadata"].append(pad1(h.metadata, n, 0.0))
        fields["intensities"].append(pad1(h.intensities, n, 1.0))
        fields["uncertainties"].append(pad1(h.uncertainties, n, 1.0))
        fields["mask"].append(pad1(mask, n, 0.0))
        if laue:
            fields["wavelength"].append(pad1(h.wavelength, n, 1.0))
            # padding rows scatter into themselves (fresh groups past the
            # real rows; real group ids are < n)
            hid = np.asarray(h.harmonic_id)
            fields["harmonic_id"].append(np.concatenate(
                [hid, np.arange(n, width, dtype=hid.dtype)]))
        else:
            fields["wavelength"].append(None)
            fields["harmonic_id"].append(None)

    def stack(vals):
        if vals[0] is None:
            return None
        return np.stack(vals)

    return Inputs(**{name: stack(vals) for name, vals in fields.items()},
                  plans=None)


def _unfused_model(model):
    """vmap-safe model variant: plain XLA paths only (the stacked halves
    carry no gather plans, and the Pallas kernels are not batched)."""
    from ..models.scaling.image import HybridImageScaler, NeuralImageScaler
    from ..models.scaling.nn import MLPScaler

    scaler = model.scaler
    if isinstance(scaler, MLPScaler):
        scaler = dc_replace(scaler, fused=False)
    elif isinstance(scaler, (HybridImageScaler, NeuralImageScaler)):
        scaler = dc_replace(scaler, mlp=dc_replace(scaler.mlp, fused=False))
    return dc_replace(model, scaler=scaler, fused_kernel=False)


def make_half_keys(seed: int, repeats: int):
    """Stacked per-half base PRNG keys matching the serial loop's
    PRNGKey(seed + 7919 * (2 * repeat + half_id + 1)) (main.py)."""
    import jax
    import jax.numpy as jnp

    return jnp.stack([
        jax.random.PRNGKey(seed + 7919 * (2 * repeat + half_id + 1))
        for repeat in range(repeats) for half_id in range(2)])


def train_halves(trainer, params: dict, half_keys, stacked: Inputs,
                 steps: int, chunk_size: int = 100,
                 num_devices: int = 0, progress: bool = True,
                 message: Optional[str] = None) -> dict:
    """Train K independent copies of the model, one per leading-axis slice
    of `stacked`, starting every copy from the same `params`. Returns the
    stacked trained parameter pytree (leading axis K).

    half_keys: (K,) stacked PRNG key array — per-half base keys; per-step
    keys are fold_in(base, step), exactly like Trainer.train.
    """
    import jax
    import jax.numpy as jnp

    trainer = dc_replace(trainer, model=_unfused_model(trainer.model))
    k_halves = half_keys.shape[0]
    opt = trainer.optimizer()
    step = trainer.make_step()

    params = jax.tree.map(
        lambda x: jnp.broadcast_to(jnp.asarray(x),
                                   (k_halves,) + jnp.shape(x)),
        params)
    sharding = None
    if num_devices and num_devices > 1 and k_halves % num_devices == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from .shard import make_mesh
        # each device trains K/D halves; no collectives are needed, the
        # leading axis partitions every array and the step is elementwise
        # over it
        sharding = NamedSharding(make_mesh(num_devices, axis_name="halves"),
                                 P("halves"))

    def place_leaf(x):
        if x is None:
            return None
        if sharding is not None:
            return jax.device_put(x, sharding)
        return x if isinstance(x, jax.Array) else jax.device_put(x)

    def place(tree):
        return jax.tree.map(place_leaf, tree, is_leaf=lambda x: x is None)

    params = place(params)
    stacked = place(stacked)
    half_keys = place(half_keys)
    opt_state = jax.vmap(opt.init)(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def run_chunk(params, opt_state, keys, inputs):
        def one(p, o, ks, inp):
            (p, o), metrics = jax.lax.scan(
                lambda c, k: step(c, k, inp), (p, o), ks)
            return (p, o), metrics

        (params, opt_state), metrics = jax.vmap(one)(
            params, opt_state, keys, inputs)
        return params, opt_state, metrics

    from tqdm import tqdm
    bar = tqdm(total=steps, desc=message, disable=not progress)
    done = 0
    gn_idx = trainer.metric_keys.index("Grad Norm")
    bad_halves = set()
    while done < steps:
        n = min(chunk_size, steps - done)
        keys = jax.vmap(lambda kb: jax.vmap(
            lambda i: jax.random.fold_in(kb, i))(
                jnp.arange(done, done + n)))(half_keys)
        if sharding is not None:
            keys = jax.device_put(keys, sharding)
        params, opt_state, metrics = run_chunk(params, opt_state, keys,
                                               stacked)
        gn = np.asarray(metrics[:, :, gn_idx])
        bad_halves.update(np.where(~np.isfinite(gn).all(axis=1))[0].tolist())
        done += n
        bar.update(n)
    bar.close()
    if bad_halves:
        print("Encountered numerical issues in crossvalidation half(s) "
              f"{sorted(bad_halves)} (NaN grads were zeroed; those halves "
              "may be degraded)")
    return params
