"""End-to-end test of the REAL ``spark-submit --py-files`` deployment
shape (north rule: "run via spark-submit --py-files"): zips the
package, launches the actual spark-submit binary in a clean working
directory (so ``import quanta_spark`` can only resolve from the zip),
and asserts the streaming job's printed result."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit binary not available"
)
def test_spark_submit_py_files_end_to_end(tmp_path):
    zip_path = shutil.make_archive(
        str(tmp_path / "quanta_spark_pkg"), "zip",
        root_dir=REPO, base_dir="quanta_spark",
    )
    job = os.path.join(REPO, "scripts", "submit_job.py")
    work = tmp_path / "work"
    work.mkdir()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)  # the zip must be the ONLY source
    }
    env["SPARK_SUBMIT_MASTER"] = "1"  # get_spark: master comes from CLI
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            job, str(work),
        ],
        cwd=str(tmp_path),  # NOT the repo: import must hit the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    marker = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("SUBMIT_RESULT ")
    ]
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert marker, proc.stdout[-2000:]
    res = json.loads(marker[-1].removeprefix("SUBMIT_RESULT "))
    assert res["master"] == "local[4]"
    assert res["input_turns"] > 0
    assert 0 < res["session_rows"] <= res["input_turns"]
    assert 0 < res["distinct_convs"] <= 40
