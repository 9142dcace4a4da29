"""Stats CLI tests: run full argparse -> analysis on generated artifacts,
assert csv/png outputs and row counts (reference tests/stats/test_cc.py)."""
import os

import numpy as np
import pandas as pd
import pytest

from tests.gen_test_data import generate


@pytest.fixture(scope="session")
def artifacts(tmp_path_factory):
    outdir = tmp_path_factory.mktemp("careless_out")
    base = generate(str(outdir))
    return base


def _xvals(base):
    return [f"{base}_xval_0.mtz", f"{base}_xval_1.mtz"]


def _preds(base):
    return [f"{base}_predictions_0.mtz", f"{base}_predictions_1.mtz"]


@pytest.mark.parametrize("method", ["pearson", "spearman", "weighted"])
@pytest.mark.parametrize("overall", [False, True])
def test_cchalf(artifacts, tmp_path, method, overall):
    from careless_tpu.stats.cchalf import ArgumentParser, run_analysis
    csv = str(tmp_path / "cchalf.csv")
    png = str(tmp_path / "cchalf.png")
    bins = 3
    argv = _xvals(artifacts) + ["-m", method, "-b", str(bins),
                                "-o", csv, "-i", png]
    if overall:
        argv.append("--overall")
    result = run_analysis(ArgumentParser().parse_args(argv))
    assert os.path.exists(csv) and os.path.exists(png)
    n_files = 1 if overall else 2
    # bins x repeats x files, minus groups empty on this tiny dataset
    assert 0 < len(result) <= bins * 3 * n_files
    assert set(np.unique(result["repeat"])) == {0, 1, 2}
    # singleton groups on this tiny dataset yield NaN CCs, like the reference
    assert np.isfinite(result["CChalf"]).any()


def test_cchalf_structure_factors(artifacts, tmp_path):
    from careless_tpu.stats.cchalf import ArgumentParser, run_analysis
    argv = _xvals(artifacts) + ["-b", "3", "--use-structure-factors",
                                "-o", str(tmp_path / "c.csv")]
    result = run_analysis(ArgumentParser().parse_args(argv))
    assert 0 < len(result) <= 3 * 3 * 2


def test_ccanom(artifacts, tmp_path):
    from careless_tpu.stats.ccanom import ArgumentParser, run_analysis
    csv = str(tmp_path / "ccanom.csv")
    argv = _xvals(artifacts) + ["-b", "2", "-o", csv]
    result = run_analysis(ArgumentParser().parse_args(argv))
    assert os.path.exists(csv)
    assert "CCanom" in result.columns
    assert len(result) > 0


@pytest.mark.parametrize("overall", [False, True])
def test_ccpred(artifacts, tmp_path, overall):
    from careless_tpu.stats.ccpred import ArgumentParser, run_analysis
    csv = str(tmp_path / "ccpred.csv")
    argv = _preds(artifacts) + ["-b", "3", "-o", csv]
    if overall:
        argv.append("--overall")
    result = run_analysis(ArgumentParser().parse_args(argv))
    assert set(result["test"]) == {"Train", "Test"}
    assert np.isfinite(result["CCpred"]).all()


def test_image_cc(artifacts, tmp_path):
    from careless_tpu.stats.image_cc import ArgumentParser, run_analysis
    csv = str(tmp_path / "image_cc.csv")
    result = run_analysis(ArgumentParser().parse_args(
        _preds(artifacts) + ["-o", csv]))
    assert os.path.exists(csv)
    assert (result["BATCH"] >= 1).all()


def test_filter_by_image_cc(artifacts, tmp_path):
    from careless_tpu.stats.filter_by_image_cc import (ArgumentParser,
                                                       run_analysis)
    from careless_tpu.xtal import read_mtz
    data = ["/root/reference/tests/data/pyp_off.mtz",
            "/root/reference/tests/data/pyp_2ms.mtz"]
    out_base = str(tmp_path / "filtered")
    outs = run_analysis(ArgumentParser().parse_args(
        _preds(artifacts) + data + ["-c", "-1.0", "-o", out_base]))
    for out, src in zip(outs, data):
        assert os.path.exists(out)
        assert len(read_mtz(out)) == len(read_mtz(src))


def test_isigi(artifacts, tmp_path):
    from careless_tpu.stats.isigi import ArgumentParser, run_analysis
    csv = str(tmp_path / "isigi.csv")
    result = run_analysis(ArgumentParser().parse_args(
        [f"{artifacts}_predictions_0.mtz", "-b", "3", "-o", csv]))
    assert os.path.exists(csv)
    assert len(result) == 3


def test_rsplit(artifacts, tmp_path):
    from careless_tpu.stats.rsplit import ArgumentParser, run_analysis
    result = run_analysis(ArgumentParser().parse_args(
        _xvals(artifacts) + ["-b", "2", "-o", str(tmp_path / "r.csv")]))
    assert "Rsplit" in result.columns
    assert np.isfinite(result["Rsplit"]).all()


def test_completeness(artifacts, tmp_path):
    from careless_tpu.stats.completeness import ArgumentParser, run_analysis
    result = run_analysis(ArgumentParser().parse_args(
        [f"{artifacts}_0.mtz", "-b", "3", "-o", str(tmp_path / "c.csv")]))
    assert result.iloc[0]["Resolution Range (Å)"] == "overall"
    assert ((result["all"] >= 0) & (result["all"] <= 1)).all()


def test_prior_b(data_dir, capsys):
    from careless_tpu.stats.prior_b import ArgumentParser, run_analysis
    fit = run_analysis(ArgumentParser().parse_args(
        [f"{data_dir}/pyp_off.mtz", "-b", "5"]))
    assert np.isfinite(fit.slope)
    out = capsys.readouterr().out
    assert "Wilson b-factor" in out


def test_rescale(artifacts, tmp_path):
    from careless_tpu.stats.rescale import ArgumentParser, run_analysis
    from careless_tpu.xtal import read_mtz
    out = str(tmp_path / "rescaled.mtz")
    run_analysis(ArgumentParser().parse_args(
        [f"{artifacts}_0.mtz", out, "-b", "10.0"]))
    ds0 = read_mtz(f"{artifacts}_0.mtz").compute_dHKL()
    ds1 = read_mtz(out)
    factor = np.exp(-0.25 * 10.0 / np.square(ds0["dHKL"].to_numpy(np.float64)))
    # reference applies to F even in anomalous files if present
    key = "F" if "F" in ds0.columns else None
    if key:
        np.testing.assert_allclose(
            ds1[key].to_numpy(np.float64),
            ds0[key].to_numpy(np.float64) * factor, rtol=1e-4)


def test_plot_history(artifacts, tmp_path):
    from careless_tpu.stats.history import ArgumentParser, run_analysis
    png = str(tmp_path / "history.png")
    run_analysis(ArgumentParser().parse_args(
        [f"{artifacts}_history.csv", "-o", png]))
    assert os.path.exists(png)
