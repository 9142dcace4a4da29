"""2-process jax.distributed CPU test (VERDICT round-1 Missing #4).

Launches two real OS processes, each with 2 virtual CPU devices, forming a
4-device global mesh over 2 "hosts". Each host loads only its observation
slice (parallel/distributed.py) and trains; the result must equal a
single-process full-batch run of the identical problem (shard-invariance:
SURVEY.md §4 "N-device result == 1-device result").
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def two_process_result(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dist") / "proc0.npz")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, WORKER, coord, str(pid), out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=420)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    return np.load(out)


def _single_process_reference():
    import jax

    from tests.parallel import _dist_worker as w
    from careless_tpu.models.base import Inputs

    cols = w.make_problem()
    inputs = Inputs(**{k: np.asarray(v) for k, v in cols.items()})
    _, params, trainer = w.build_model_and_trainer(inputs)
    params, metrics = w.run_steps(trainer, params, inputs)
    return params, np.asarray(metrics)


def test_two_process_training_matches_single_process(two_process_result):
    import jax

    params_1p, metrics_1p = _single_process_reference()
    metrics_2p = two_process_result["metrics"]

    # per-step loss/NLL/KL/grad-norm agree to f32 reduction-order tolerance
    np.testing.assert_allclose(metrics_2p, metrics_1p, rtol=2e-4, atol=1e-4)

    leaves_1p = jax.tree.leaves(params_1p)
    for i, a in enumerate(leaves_1p):
        b = two_process_result[f"p{i}"]
        np.testing.assert_allclose(np.asarray(a), b, rtol=5e-4, atol=1e-5,
                                   err_msg=f"param leaf {i}")


def test_host_observation_slices_partition():
    """The per-host slices cover [0, n) exactly once for any host count."""
    from careless_tpu.parallel.distributed import host_observation_slice

    for n_obs in (7, 8, 513):
        for n_proc in (1, 2, 3, 8):
            rows = []
            for p in range(n_proc):
                sl = host_observation_slice(n_obs, p, n_proc)
                rows.extend(range(*sl.indices(n_obs)))
            assert rows == list(range(n_obs)), (n_obs, n_proc)
