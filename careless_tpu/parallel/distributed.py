"""Multi-host initialization and cross-host training helpers.

The reference has no distributed execution at all (SURVEY.md §2.0/§5.8);
this is new TPU-native capability. On a multi-host TPU slice each host runs
the same program: call `initialize()` once at startup, build the global mesh
over all devices, shard this host's observation block, and train — XLA SPMD
moves the psums over ICI/DCN.

The numerical-failure guard is multi-host aware: the grad-norm finiteness
flag is computed from the globally psum'd gradients (the same values on
every host), so all hosts agree on early termination without extra
communication (SURVEY.md §5.3).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with TPU auto-detection.

    On Cloud TPU pods all arguments are discovered from the metadata server;
    pass them explicitly for manual clusters.
    """
    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # single-process environment — nothing to do
        pass


def global_mesh(axis_name: str = "obs") -> Mesh:
    """1-D data-parallel mesh over every device in the job (all hosts)."""
    return Mesh(np.array(jax.devices()), (axis_name,))


def host_observation_slice(n_obs: int,
                           process_id: Optional[int] = None,
                           process_count: Optional[int] = None) -> slice:
    """The contiguous observation range this host should load.

    Observations are split evenly over processes; each host materializes only
    its slice, and `jax.make_array_from_process_local_data` assembles the
    globally-sharded array. process_id/process_count default to this
    process's jax.distributed identity.
    """
    p = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if process_count is None else process_count
    per = -(-n_obs // n)
    return slice(min(p * per, n_obs), min((p + 1) * per, n_obs))


def shard_host_local(mesh: Mesh, host_local: np.ndarray, n_global: int):
    """Assemble a globally sharded array from per-host blocks."""
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    global_shape = (n_global,) + host_local.shape[1:]
    return jax.make_array_from_process_local_data(sharding, host_local,
                                                  global_shape)
