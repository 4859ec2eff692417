"""The packaged form actually ships: `spark-submit --py-files dist/ocr_spark.zip`
runs the extraction job end-to-end in a fresh JVM, from a working directory
where the repo's `ocr_spark/` source tree is NOT importable — so every import
the job makes is served from the zip, which is what a real cluster's
executors see (north_rule: "ships as a spark-submit --py-files package").

Reference parity: the reference ships as a uvicorn service (`run_server.py`);
the Spark-native deployable unit is the --py-files package + job script.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyspark
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def _submit(args: list[str], cwd: str) -> dict:
    env = dict(
        os.environ,
        PYSPARK_PYTHON=sys.executable,
        PYSPARK_DRIVER_PYTHON=sys.executable,
    )
    # Drop repo-pointing PYTHONPATH entries so the zip is the only source
    # of ocr_spark, like an executor on a real cluster.
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        args, cwd=cwd, env=env, capture_output=True, text=True, timeout=600
    )
    assert out.returncode == 0, f"spark-submit failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}"
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no JSON summary line in stdout:\n{out.stdout[-2000:]}"
    return json.loads(lines[-1])


@pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "documents.parquet")),
    reason="testdata not present",
)
def test_spark_submit_pyfiles_package_runs_and_resumes(tmp_path):
    # Build the package fresh so the test covers today's source.
    zip_path = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "make_package.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    assert zip_path.endswith("ocr_spark.zip") and os.path.exists(zip_path)

    out_dir = str(tmp_path / "extract_out")
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[2]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        os.path.join(ROOT, "jobs", "extract_job.py"),
        "--input", os.path.join(SF_DIR, "documents.parquet"),
        "--output", out_dir,
        "--buckets", "4",
    ]
    # cwd = tmp_path: the repo's ocr_spark/ tree is not on any import path.
    summary = _submit(cmd, cwd=str(tmp_path))
    assert summary["buckets_total"] == 4
    assert summary["buckets_run"] == 4
    assert summary["rows"] > 0
    assert os.path.isdir(os.path.join(out_dir, "_manifest"))

    # Re-submit with the same --output: the manifest makes it a no-op resume
    # with identical totals (a killed job picks up at the last commit).
    summary2 = _submit(cmd, cwd=str(tmp_path))
    assert summary2["rows"] == summary["rows"]
    assert summary2["buckets_run"] == 0
    assert summary2["buckets_skipped"] == 4
