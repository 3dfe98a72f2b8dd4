"""Deployment-shape test: the engine launches via ``spark-submit
--py-files`` (the north_rule's delivery mechanism) as a separate process
with the package shipped as a zip — no reliance on the driver cwd."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files(tmp_path):
    from pcrawler_spark.session import _package_zip

    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit not on PATH")
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable,
           "PYSPARK_DRIVER_PYTHON": sys.executable}
    state = tmp_path / "state"
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", _package_zip(),
            os.path.join(REPO, "scripts", "run_crawl.py"),
            "--synthetic", "30",
            "--state-dir", str(state),
            "--export", str(tmp_path / "export"),
        ],
        capture_output=True, text=True, timeout=540,
        cwd=str(tmp_path),  # NOT the repo: imports must come from --py-files
    )
    assert out.returncode == 0, out.stderr[-3000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["epochs_run"] >= 3
    assert summary["records_out"] > 0
    assert (state / "_commits").is_dir()
    assert any(f.endswith(".csv") for f in os.listdir(tmp_path / "export"))


def test_spark_submit_training_pipeline(tmp_path):
    """The training-data pipeline deploys the same way as the crawl: pure
    --py-files, no repo cwd."""
    from pcrawler_spark.session import _package_zip

    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit not on PATH")
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable,
           "PYSPARK_DRIVER_PYTHON": sys.executable}
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", _package_zip(),
            os.path.join(REPO, "scripts", "run_training.py"),
            "--docs", "/root/testdata/sf0.001/documents.parquet",
            "--out", str(tmp_path / "training_out"),
            "--quality-min", "0",
        ],
        capture_output=True, text=True, timeout=540, env=env,
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert 0 < summary["docs_out"] <= summary["docs_in"]
