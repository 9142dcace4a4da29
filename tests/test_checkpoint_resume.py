"""Mid-run checkpoint/resume (--checkpoint-every / --resume-from): a run
interrupted at step k and resumed must reproduce the uninterrupted run
exactly — parameters, optimizer state, and history (per-step PRNG keys are
folded from the absolute step index)."""
import numpy as np
import pytest

import jax

from tests.models.test_variational import make_model, synthetic_inputs
from careless_tpu.models.likelihoods.mono import NormalLikelihood


def test_resume_reproduces_uninterrupted_run(tmp_path, rng):
    inputs, n_refl, n_images = synthetic_inputs(rng, n_obs=200)
    model, params = make_model(inputs, n_refl, n_images, NormalLikelihood())
    from careless_tpu.models.merging.variational import Trainer
    trainer = Trainer(model)
    key = jax.random.PRNGKey(3)

    full, hist_full = trainer.train(params, key, inputs, 30,
                                    progress=False, chunk_size=10)

    ckpt = str(tmp_path / "ck")
    trainer.train(params, key, inputs, 10, progress=False, chunk_size=10,
                  checkpoint_path=ckpt, checkpoint_frequency=10)
    resumed, hist_res = trainer.train(
        params, key, inputs, 30, progress=False, chunk_size=10,
        resume_from=ckpt)

    for (k, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(full),
            jax.tree_util.tree_leaves_with_path(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(k))
    for k in hist_full:
        np.testing.assert_allclose(hist_res[k], hist_full[k], rtol=1e-6,
                                   err_msg=k)
    assert len(hist_res["loss"]) == 30


def test_cli_checkpoint_resume(tmp_path, pyp_off_mtz):
    """End-to-end: --checkpoint-every writes the artifact; --resume-from
    continues to the requested iteration count."""
    from careless_tpu.main import main
    out = str(tmp_path / "out")
    main(["mono", "dHKL,image_id", pyp_off_mtz, out,
          "--iterations=10", "--checkpoint-every=5",
          "--steps-per-compile=5", "--disable-progress-bar"])
    import os
    assert os.path.exists(out + "_checkpoint.npz")
    out2 = str(tmp_path / "out2")
    main(["mono", "dHKL,image_id", pyp_off_mtz, out2,
          "--iterations=15", "--steps-per-compile=5",
          f"--resume-from={out}_checkpoint",
          "--disable-progress-bar"])
    import pandas as pd
    hist = pd.read_csv(out2 + "_history.csv")
    assert len(hist) == 15


def test_resume_with_different_metric_set(tmp_path, pyp_off_mtz):
    """Checkpoint written WITH validation, resumed WITHOUT (and the
    reverse): history keys must stay rectangular so the history CSV can be
    written (restored-only keys are dropped, missing prefixes NaN-pad)."""
    from careless_tpu.main import main
    out = str(tmp_path / "a")
    main(["mono", "dHKL,image_id", pyp_off_mtz, out,
          "--iterations=10", "--checkpoint-every=5", "--test-fraction=0.1",
          "--steps-per-compile=5", "--disable-progress-bar"])
    out2 = str(tmp_path / "b")
    main(["mono", "dHKL,image_id", pyp_off_mtz, out2,
          "--iterations=15", "--steps-per-compile=5",
          f"--resume-from={out}_checkpoint", "--disable-progress-bar"])
    import pandas as pd
    hist = pd.read_csv(out2 + "_history.csv")
    assert len(hist) == 15
