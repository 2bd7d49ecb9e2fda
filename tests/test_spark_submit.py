"""The north-rule deployment path, for real: engine code shipped ONLY
via ``spark-submit --py-files pkg.zip`` (no repo on PYTHONPATH in the
driver process), exercising datagen + MOR ingest through run_job.py."""

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _submit(cwd, zip_path, *args):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--py-files", zip_path,
         os.path.join(REPO, "run_job.py"), *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=400,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no JSON line:\n{out.stdout[-1500:]}\n{out.stderr[-3000:]}"
    return json.loads(lines[-1])


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_py_files_lifecycle(tmpdir_path):
    zip_path = shutil.make_archive(
        os.path.join(tmpdir_path, "pkg"), "zip", REPO, "ds_floodexposure_monitoring_spark"
    )
    g = _submit(tmpdir_path, zip_path, "datagen", "--log-dir", "./log",
                "--events", "20000", "--shards", "2", "--seed", "7")
    assert g["events"] == 20000
    i = _submit(tmpdir_path, zip_path, "ingest", "--log-dir", "./log",
                "--table-dir", "./t", "--checkpoint-dir", "./ckpt",
                "--mode", "mor", "--batch-events", "8000", "--n-buckets", "8")
    assert i["batches"] >= 2 and i["final_rows"] > 0 and i["replayed_batches"] == 0
