"""Ship-shape check for the spark-submit --py-files deployment unit
(north rule: "ships as spark-submit --py-files modules").

Builds the deterministic package zip, then runs a REAL `spark-submit`
subprocess whose only access to the engine code is that zip (cwd is an
empty temp dir, PYTHONPATH scrubbed), driving the batch indexer over a
generated transcripts table and checking the three output tables land.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def test_pyfiles_zip_deterministic(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_pyfiles_zip import build_zip

    d1 = build_zip(str(tmp_path / "a.zip"))
    d2 = build_zip(str(tmp_path / "b.zip"))
    assert d1 == d2
    import zipfile

    names = zipfile.ZipFile(str(tmp_path / "a.zip")).namelist()
    assert "dataflow_opinion_analysis_spark/cli.py" in names
    assert all(n.endswith(".py") for n in names)


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_pyfiles_index(tmp_path):
    """End-to-end: zip + submit_cli.py is a complete deployment."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_pyfiles_zip import build_zip

    from dataflow_opinion_analysis_spark import datagen

    tin = str(tmp_path / "transcripts")
    datagen.write_transcripts_parquet(tin, n_convs=20, avg_turns=5, seed=7, n_files=2)

    app_dir = tmp_path / "app"
    app_dir.mkdir()
    zip_path = str(app_dir / "dataflow_opinion_analysis_spark.zip")
    build_zip(zip_path)
    shutil.copy(os.path.join(REPO, "scripts", "submit_cli.py"), app_dir)

    out = str(tmp_path / "warehouse")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_HOME")
    }
    # worker and driver python = this interpreter (pandas/pyarrow live here)
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--py-files", zip_path,
            str(app_dir / "submit_cli.py"),
            "--master", "local[2]",
            "index",
            "--input", tin,
            "--output", out,
        ],
        cwd=str(app_dir),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    for table in ("webresource", "document", "sentiment"):
        n = pq.read_table(os.path.join(out, table)).num_rows
        assert n > 0, f"{table} empty"
    # every conversation produced a webresource row set >= document rows
    n_wr = pq.read_table(os.path.join(out, "webresource")).num_rows
    n_doc = pq.read_table(os.path.join(out, "document")).num_rows
    assert n_wr >= n_doc
