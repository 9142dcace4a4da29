"""Data-parallel observation sharding over a 1-D device mesh.

The TPU-native scale-out layer the reference lacks entirely (SURVEY.md §2.0:
"Parallelism strategies in the reference: NONE"). Design per §5.8 and the
BASELINE.json north star:

- the packed Inputs arrays are sharded along the observation (N) axis;
- posterior/scaler parameters are small and stay replicated, so the
  `gather(z_F, refl_id)` in the ELBO is device-local;
- the loss reductions make gradients a sum over shards — XLA SPMD inserts
  the psum over ICI automatically when the jitted step sees sharded inputs
  and replicated params;
- Laue harmonic groups must never straddle a shard boundary (the scatter-add
  in the convolved likelihood is shard-local), so Laue padding is inserted
  at group boundaries;
- padding rows carry mask=0 and contribute exactly zero to the likelihood.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.base import Inputs


def make_mesh(num_devices: int, devices=None, axis_name: str = "obs") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if num_devices > len(devices):
        raise ValueError(
            f"requested {num_devices} devices but only {len(devices)} available")
    return Mesh(np.array(devices[:num_devices]), (axis_name,))


def pad_inputs_to_multiple(inputs: Inputs, multiple: int) -> Inputs:
    """Pad per-observation arrays so N % multiple == 0.

    Padding rows: refl_id 0, image_id 0, intensities/uncertainties 1 (the
    Laue padding convention, reference formatter.py:639-640), own fresh
    harmonic groups, and mask 0.
    """
    n = inputs.n_obs
    pad = (-n) % multiple
    mask = inputs.mask if inputs.mask is not None else np.ones(n, np.float32)
    if pad == 0 and inputs.mask is not None:
        return inputs
    if pad == 0:
        return inputs._replace(mask=np.asarray(mask, np.float32))

    def pad1(x, value):
        return np.concatenate([
            np.asarray(x), np.full((pad,) + np.shape(x)[1:], value,
                                   dtype=np.asarray(x).dtype)])

    harmonic_id = inputs.harmonic_id
    if harmonic_id is not None:
        hid = np.asarray(harmonic_id)
        # fresh singleton groups for padding rows
        harmonic_id = np.concatenate([
            hid, hid.max() + 1 + np.arange(pad, dtype=hid.dtype)])

    return Inputs(
        refl_id=pad1(inputs.refl_id, 0),
        image_id=pad1(inputs.image_id, 0),
        file_id=pad1(inputs.file_id, 0),
        metadata=pad1(inputs.metadata, 0.0),
        intensities=pad1(inputs.intensities, 1.0),
        uncertainties=pad1(inputs.uncertainties, 1.0),
        wavelength=(None if inputs.wavelength is None
                    else pad1(inputs.wavelength, 1.0)),
        harmonic_id=harmonic_id,
        mask=pad1(mask, 0.0),
    )


def _laue_group_aligned_order(inputs: Inputs, num_shards: int) -> Inputs:
    """Reorder observations so harmonic groups are contiguous, then pad each
    shard to a group boundary. Keeps the scatter-add shard-local.

    The group-compressed intensities (first n_groups rows) must be repacked
    to the new group numbering, exactly like the reference's Laue splitter
    (manager.py:299-343).
    """
    hid = np.asarray(inputs.harmonic_id)
    order = np.argsort(hid, kind="stable")
    n = len(hid)
    # group sizes in sorted order
    sorted_hid = hid[order]
    uniq, first_idx, counts = np.unique(sorted_hid, return_index=True,
                                        return_counts=True)
    iobs = np.asarray(inputs.intensities)[: len(uniq)]
    sig = np.asarray(inputs.uncertainties)[: len(uniq)]

    # assign whole groups round-robin-by-size to shards (greedy balance on
    # row counts, preserving order within shard)
    target = int(np.ceil(n / num_shards))
    shard_rows = [[] for _ in range(num_shards)]
    shard_groups = [[] for _ in range(num_shards)]
    s = 0
    for gi in range(len(uniq)):
        rows = order[first_idx[gi]: first_idx[gi] + counts[gi]]
        if len(shard_rows[s]) + len(rows) > target and s < num_shards - 1 \
           and len(shard_rows[s]) > 0:
            s += 1
        shard_rows[s].extend(rows.tolist())
        shard_groups[s].append(gi)

    width = max(max(len(r) for r in shard_rows),
                max(len(g) for g in shard_groups))

    def build(field, padvalue, dtype):
        out = np.full((num_shards, width) + np.shape(field)[1:], padvalue,
                      dtype=dtype)
        for si, rows in enumerate(shard_rows):
            out[si, : len(rows)] = np.asarray(field)[rows]
        return out.reshape((num_shards * width,) + np.shape(field)[1:])

    new = {
        "refl_id": build(inputs.refl_id, 0, np.int32),
        "image_id": build(inputs.image_id, 0, np.int32),
        "file_id": build(inputs.file_id, 0, np.int32),
        "metadata": build(inputs.metadata, 0.0, np.float32),
        "wavelength": build(inputs.wavelength, 1.0, np.float32),
    }
    # For the convolved likelihood, log-probs live on harmonic-GROUP rows:
    # mask marks the real group rows of each shard (everything else —
    # including the self-scatter rows of padding observations — is zeroed,
    # so no gradient leaks through padding).
    mask = np.zeros((num_shards, width), np.float32)
    for si, groups in enumerate(shard_groups):
        mask[si, : len(groups)] = 1.0
    new["mask"] = mask.reshape(-1)
    # per-shard local harmonic ids offset by shard start so groups stay
    # unique globally but land in their shard's row range
    hid_new = np.zeros((num_shards, width), np.int32)
    intens = np.ones((num_shards, width), np.float32)
    sigma = np.ones((num_shards, width), np.float32)
    for si, (rows, groups) in enumerate(zip(shard_rows, shard_groups)):
        local = {g: j for j, g in enumerate(groups)}
        hid_new[si, : len(rows)] = [
            si * width + local[hid[r]] for r in rows]
        # padding rows scatter into themselves
        for j in range(len(rows), width):
            hid_new[si, j] = si * width + j
        for j, g in enumerate(groups):
            intens[si, j] = iobs[g]
            sigma[si, j] = sig[g]
    return Inputs(
        refl_id=new["refl_id"],
        image_id=new["image_id"],
        file_id=new["file_id"],
        metadata=new["metadata"],
        intensities=intens.reshape(-1),
        uncertainties=sigma.reshape(-1),
        wavelength=new["wavelength"],
        harmonic_id=hid_new.reshape(-1),
        mask=new["mask"],
    )


def shard_inputs_over_mesh(inputs: Inputs, num_devices: int, devices=None
                           ) -> Tuple[Inputs, Mesh]:
    """Place the packed inputs on an 'obs'-sharded mesh; returns the
    device-resident Inputs and the mesh."""
    mesh = make_mesh(num_devices, devices)
    # gather plans are global-index derived data; they do not survive
    # padding/resharding (the sharded path uses the XLA scatter transpose)
    inputs = inputs._replace(plans=None)
    if inputs.is_laue:
        inputs = _laue_group_aligned_order(inputs, num_devices)
    else:
        inputs = pad_inputs_to_multiple(inputs, num_devices)
    sharding = NamedSharding(mesh, P("obs"))

    def put(x):
        if x is None:
            return None
        return jax.device_put(np.asarray(x), sharding)

    return Inputs(*[put(x) for x in inputs]), mesh
