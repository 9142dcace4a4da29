"""Parallel half-dataset crossvalidation: the vmapped stacked training must
reproduce the serial per-half loop (same RNG per half -> same posteriors up
to float reduction order), and the CLI-level parallel mode must produce
xval outputs equal to serial mode."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from careless_tpu.models.base import Inputs
from careless_tpu.parallel.xval import (make_half_keys, stack_halves,
                                        train_halves)

from tests.models.test_variational import make_model, synthetic_inputs
from careless_tpu.models.likelihoods import laue as laue_lik
from careless_tpu.models.likelihoods import mono as mono_lik
from careless_tpu.models.merging.variational import Trainer


def _subset(inputs, idx, laue=False):
    if not laue:
        return inputs.select(idx)
    # Laue: renumber groups + repack intensities like the manager splitter
    hid = np.asarray(inputs.harmonic_id)
    uni, inv = np.unique(hid[idx], return_inverse=True)
    n_rows = int(np.sum(idx))

    def repack(v):
        v = np.asarray(v)[uni]
        return np.pad(v, (0, n_rows - len(v)), constant_values=1.0)

    return Inputs.from_arrays(
        refl_id=np.asarray(inputs.refl_id)[idx],
        image_id=np.asarray(inputs.image_id)[idx],
        file_id=np.asarray(inputs.file_id)[idx],
        metadata=np.asarray(inputs.metadata)[idx],
        intensities=repack(inputs.intensities),
        uncertainties=repack(inputs.uncertainties),
        wavelength=np.asarray(inputs.wavelength)[idx],
        harmonic_id=inv,
    )


@pytest.mark.parametrize("laue", [False, True], ids=["mono", "laue"])
def test_train_halves_matches_serial_training(laue, rng):
    """K stacked halves trained by train_halves == K serial Trainer.train
    runs with the same per-half keys."""
    inputs, n_refl, n_images = synthetic_inputs(rng, n_obs=240, laue=laue)
    lik = (laue_lik.NormalLikelihood() if laue
           else mono_lik.NormalLikelihood())
    model, params = make_model(inputs, n_refl, n_images, lik, "hybrid")
    trainer = Trainer(model, freeze=("scaler",))

    if laue:
        # split on harmonic-group boundaries (groups are consecutive pairs)
        group_sel = np.random.default_rng(0).random(120) < 0.5
        sel = np.repeat(group_sel, 2)
    else:
        sel = np.random.default_rng(0).random(240) < 0.5
    halves = [_subset(inputs, sel, laue), _subset(inputs, ~sel, laue)]

    steps = 25
    half_keys = make_half_keys(seed=11, repeats=1)
    stacked = stack_halves(halves)
    trained = train_halves(trainer, params, half_keys, stacked, steps,
                           chunk_size=10, progress=False)

    for k, half in enumerate(halves):
        key = jax.random.PRNGKey(11 + 7919 * (k + 1))
        p_serial, _ = trainer.train(params, key, half, steps,
                                    progress=False, chunk_size=10)
        got = jax.tree.map(lambda x: np.asarray(x[k]), trained)
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(got),
                jax.tree_util.tree_leaves_with_path(p_serial)):
            np.testing.assert_allclose(
                a, np.asarray(b), rtol=5e-4, atol=5e-4,
                err_msg=f"half {k} {path}")


def test_stack_halves_mask_and_padding(rng):
    inputs, _, _ = synthetic_inputs(rng, n_obs=100)
    halves = [inputs.select(np.arange(100) < 60),
              inputs.select(np.arange(100) >= 60)]
    stacked = stack_halves(halves)
    assert stacked.refl_id.shape == (2, 60)
    np.testing.assert_array_equal(np.asarray(stacked.mask[0]), np.ones(60))
    m1 = np.asarray(stacked.mask[1])
    np.testing.assert_array_equal(m1[:40], np.ones(40))
    np.testing.assert_array_equal(m1[40:], np.zeros(20))
    # padded sigma is 1 (log-prob finite on masked rows)
    assert (np.asarray(stacked.uncertainties[1])[40:] == 1.0).all()


@pytest.mark.slow
def test_cli_parallel_xval_equals_serial(tmp_path, pyp_off_mtz):
    """End-to-end: --xval-mode parallel and serial write equal xval MTZs."""
    from careless_tpu.main import main
    from careless_tpu.xtal.mtz import read_mtz

    outs = {}
    for mode in ("parallel", "serial"):
        out = str(tmp_path / mode / "out")
        (tmp_path / mode).mkdir()
        main(["mono", "dHKL,image_id", pyp_off_mtz, out,
              "--iterations=30", "--merge-half-datasets",
              "--half-dataset-repeats=2", "--disable-progress-bar",
              f"--xval-mode={mode}"])
        outs[mode] = read_mtz(out + "_xval_0.mtz")
    a, b = outs["parallel"], outs["serial"]
    assert len(a) == len(b)
    np.testing.assert_array_equal(a[["H", "K", "L", "repeat", "half"]],
                                  b[["H", "K", "L", "repeat", "half"]])
    np.testing.assert_allclose(a["F"], b["F"], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(a["SigF"], b["SigF"], rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_cli_parallel_xval_equals_serial_poly(tmp_path, pyp_off_mtz):
    """Laue end-to-end: parallel and serial xval must agree — both must
    use the CHAIN row order (round-5 regression: the parallel path kept
    the legacy harmonic sort while the serial path moved to chain order,
    silently training the halves on different per-row MC noise)."""
    from careless_tpu.main import main
    from careless_tpu.xtal.mtz import read_mtz

    outs = {}
    for mode in ("parallel", "serial"):
        out = str(tmp_path / mode / "out")
        (tmp_path / mode).mkdir()
        main(["poly", "dHKL,image_id", pyp_off_mtz, out,
              "--iterations=30", "--merge-half-datasets",
              "--half-dataset-repeats=1", "--disable-progress-bar",
              f"--xval-mode={mode}"])
        outs[mode] = read_mtz(out + "_xval_0.mtz")
    a, b = outs["parallel"], outs["serial"]
    assert len(a) == len(b)
    np.testing.assert_array_equal(a[["H", "K", "L", "repeat", "half"]],
                                  b[["H", "K", "L", "repeat", "half"]])
    np.testing.assert_allclose(a["F"], b["F"], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(a["SigF"], b["SigF"], rtol=1e-3, atol=1e-3)
