"""Generate careless-tpu output artifacts for downstream stats tests.

Mirrors the reference's two-stage test pipeline
(/root/reference/tests/gen_test_data.py:25-50): a full 10-iteration poly run
with half-dataset crossvalidation, anomalous output, and a test fraction
over the two pyp MTZs, producing merged/xval/predictions/history artifacts.
"""
import os
import sys

DATA = "/root/reference/tests/data"


def generate(outdir: str) -> str:
    from careless_tpu.main import main
    base = os.path.join(outdir, "pyp")
    main([
        "poly",
        "dHKL,image_id",
        f"{DATA}/pyp_off.mtz",
        f"{DATA}/pyp_2ms.mtz",
        base,
        "--iterations=10",
        "--merge-half-datasets",
        "--half-dataset-repeats=3",
        "--test-fraction=0.1",
        "--anomalous",
        "--separate-files",
        "--disable-progress-bar",
    ])
    return base


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "tests/data/output"
    os.makedirs(out, exist_ok=True)
    generate(out)
