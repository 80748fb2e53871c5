"""The north rule's deployment shape, literally: `spark-submit --py-files`
runs the flagship PIP job at two parallelism levels (the sandbox proxy for
two cluster sizes) with the engine shipped ONLY as a zip — and the output
hash is identical at both."""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _engine_zip(tmp: str) -> str:
    pkg = os.path.join(REPO, "osm_public_space_mapper_spark")
    zpath = os.path.join(tmp, "osm_public_space_mapper_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, os.path.dirname(pkg)))
    return zpath


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit binary")
def test_spark_submit_two_parallelism_levels():
    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        zpath = _engine_zip(tmp)
        for cores in (2, 8):
            env = dict(os.environ, PYSPARK_PYTHON=sys.executable,
                       PYSPARK_DRIVER_PYTHON=sys.executable)
            env.pop("PYTHONPATH", None)  # engine must come from --py-files only
            out = subprocess.run(
                [
                    SPARK_SUBMIT,
                    "--master", f"local[{cores}]",
                    "--conf", "spark.sql.shuffle.partitions=8",
                    "--conf", "spark.ui.enabled=false",
                    "--conf", "spark.driver.memory=6g",
                    "--py-files", zpath,
                    os.path.join(REPO, "scripts", "submit_pip_job.py"),
                    "--images", "200000",
                ],
                capture_output=True, text=True, timeout=900, env=env,
                cwd=tmp,  # NOT the repo root: imports must resolve via the zip
            )
            lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
            assert lines, f"no JSON from spark-submit at {cores} cores:\n{out.stdout[-1500:]}\n{out.stderr[-1500:]}"
            results[cores] = json.loads(lines[-1])
    assert results[2]["n_assigned"] == results[2]["n_images"] == 200000
    assert results[8]["n_assigned"] == 200000
    assert results[2]["output_hash"] == results[8]["output_hash"]
    assert results[2]["parallelism"] == 2 and results[8]["parallelism"] == 8
