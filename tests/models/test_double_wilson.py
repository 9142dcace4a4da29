"""Double-Wilson prior tests (reference tests cover validity + r-range
errors; /root/reference/tests/test_cli.py:92-110)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from careless_tpu.io.asu import ReciprocalASU, ReciprocalASUCollection
from careless_tpu.models.priors.double_wilson import (DoubleWilsonPrior,
                                                      parse_parents)
from careless_tpu.models.priors.wilson import WilsonPrior
from careless_tpu.xtal import SpaceGroup, UnitCell


@pytest.fixture(scope="module")
def rac():
    cell = UnitCell(30, 30, 40)
    sg = SpaceGroup.from_name("P 21 21 21")
    asus = [ReciprocalASU(cell, sg, 5.0, False) for _ in range(2)]
    return ReciprocalASUCollection(asus)


def test_root_matches_wilson(rac):
    dw = DoubleWilsonPrior.from_asu_collection(rac, [None, 0], [0.0, 0.9])
    wilson = WilsonPrior(np.asarray(rac.centric),
                         np.asarray(rac.multiplicity, np.float32))
    z = np.abs(np.random.default_rng(0).normal(1.0, 0.3, rac.n_refl)
               ).astype(np.float32)
    lp = np.asarray(dw.log_prob(z))
    lp_w = np.asarray(wilson.log_prob(z))
    n0 = len(rac.reciprocal_asus[0])
    np.testing.assert_allclose(lp[:n0], lp_w[:n0], rtol=1e-5)
    # child with r=0.9 differs from plain Wilson
    assert not np.allclose(lp[n0:], lp_w[n0:])


def test_child_r_zero_behaves_like_independent(rac):
    """With r=0, the child's RiceWoolfson reduces toward independence of the
    parent z values."""
    dw = DoubleWilsonPrior.from_asu_collection(rac, [None, 0], [0.0, 0.0])
    rng = np.random.default_rng(1)
    z1 = np.abs(rng.normal(1, 0.3, rac.n_refl)).astype(np.float32)
    z2 = z1.copy()
    n0 = len(rac.reciprocal_asus[0])
    z2[:n0] = np.abs(rng.normal(1, 0.3, n0))  # perturb parents only
    lp1 = np.asarray(dw.log_prob(z1))[n0:]
    lp2 = np.asarray(dw.log_prob(z2))[n0:]
    np.testing.assert_allclose(lp1, lp2, rtol=1e-5)


def test_child_gradient_couples_parent(rac):
    dw = DoubleWilsonPrior.from_asu_collection(rac, [None, 0], [0.0, 0.9])
    n0 = len(rac.reciprocal_asus[0])

    def child_logprob_sum(z):
        return jnp.sum(dw.log_prob(z)[n0:])

    z = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (rac.n_refl,))) + 0.5
    g = jax.grad(child_logprob_sum)(z)
    # gradients flow into the parent block through the coupling
    assert np.abs(np.asarray(g[:n0])).sum() > 0


def test_trainable_r(rac):
    dw = DoubleWilsonPrior.from_asu_collection(rac, [None, 0], [0.5, 0.5],
                                               optimize_r=True)
    params = dw.init()
    assert "r_raw" in params
    dist = dw.build(params)
    np.testing.assert_allclose(np.asarray(dist.r), [0.5, 0.5], rtol=1e-5)
    m = dist.metrics()
    assert set(m) == {"rDW_0", "rDW_1"}
    z = jnp.ones(rac.n_refl) * 1.3

    def loss(p):
        return -jnp.sum(dw.build(p).log_prob(z))

    g = jax.grad(loss)(params)
    assert np.isfinite(np.asarray(g["r_raw"])).all()
    assert np.abs(np.asarray(g["r_raw"])[1]) > 0  # child r has gradient


def test_reindexing_ops(rac):
    dw = DoubleWilsonPrior.from_asu_collection(
        rac, [None, 0], [0.0, 0.8], reindexing_ops=["x,y,z", "x,y,z"])
    n0 = len(rac.reciprocal_asus[0])
    # identity reindexing: child i maps to parent i (same cell/sg/dmin)
    np.testing.assert_array_equal(
        np.asarray(dw.reflids[n0:]), np.arange(n0))


def test_parse_parents():
    assert parse_parents("None,0") == [None, 0]
    assert parse_parents("None,None,1") == [None, None, 1]


def test_missing_parents_masked():
    cell = UnitCell(30, 30, 40)
    sg = SpaceGroup.from_name("P 21 21 21")
    parent = ReciprocalASU(cell, sg, 6.0, False)   # lower resolution parent
    child = ReciprocalASU(cell, sg, 5.0, False)    # child has extra refls
    rac = ReciprocalASUCollection([parent, child])
    dw = DoubleWilsonPrior.from_asu_collection(rac, [None, 0], [0.0, 0.9])
    n0 = len(parent)
    absent = np.asarray(dw.absent)[n0:]
    assert absent.any()  # high-res child refls lack a parent
    z = np.abs(np.random.default_rng(3).normal(1, 0.3, rac.n_refl)).astype(np.float32)
    lp = np.asarray(dw.log_prob(z))
    assert np.isfinite(lp).all()


def test_cli_double_wilson(tmp_path):
    from careless_tpu.main import main
    from careless_tpu.xtal import read_mtz
    data = "/root/reference/tests/data"
    out = str(tmp_path / "dw")
    main(["mono", "dHKL,image_id", f"{data}/pyp_off.mtz",
          f"{data}/pyp_2ms.mtz", out, "--iterations=10", "--separate-files",
          "--double-wilson-parents=None,0", "--double-wilson-r=0.,0.9",
          "--optimize-double-wilson-r", "--disable-progress-bar"])
    assert read_mtz(out + "_1.mtz") is not None
    import pandas as pd
    h = pd.read_csv(out + "_history.csv")
    assert "rDW_1" in h.columns


def test_cli_double_wilson_bad_r(tmp_path):
    from careless_tpu.main import main
    data = "/root/reference/tests/data"
    with pytest.raises(ValueError, match="allowed range"):
        main(["mono", "dHKL,image_id", f"{data}/pyp_off.mtz",
              f"{data}/pyp_2ms.mtz", str(tmp_path / "dw"), "--iterations=5",
              "--separate-files", "--double-wilson-parents=None,0",
              "--double-wilson-r=0.,1.5", "--disable-progress-bar"])
