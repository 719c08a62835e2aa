"""TRUE spark-submit deployment test (north_rule: "run via spark-submit
--py-files on a multi-executor cluster"): the package is zipped, jobs.py is
staged OUTSIDE the repo, and each stage runs in a fresh spark-submit JVM
whose only source of the engine is the ``--py-files`` zip — exactly how a
real cluster submission ships it. In-process CLI coverage lives in
test_jobs_cli.py; this pins the packaging/bootstrap path those tests
cannot see (fresh interpreter, no repo on sys.path, zip import)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pyspark
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "datastream_deltalake_connector_spark"


def _build_zip(dest: str) -> str:
    zpath = os.path.join(dest, "engine.zip")
    src = os.path.join(REPO, PKG)
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(src):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def _submit(tmp: str, zpath: str, jobs_py: str, *args: str) -> dict:
    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY package source
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env["SPARK_GRAFT_CPUS"] = "4"
    proc = subprocess.run(
        [
            spark_submit,
            "--master",
            "local[4]",
            "--py-files",
            zpath,
            jobs_py,
            *args,
        ],
        capture_output=True,
        text=True,
        cwd=tmp,
        env=env,
        timeout=300,
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stderr[-3000:]}"
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON result line in stdout:\n{proc.stdout[-2000:]}")


def test_spark_submit_py_files_lifecycle(spark, tmp_path):
    from datastream_deltalake_connector_spark.sources.generator import generate_images

    tmp = str(tmp_path)
    zpath = _build_zip(tmp)
    jobs_py = os.path.join(tmp, "jobs.py")  # staged away from the repo
    shutil.copyfile(os.path.join(REPO, PKG, "jobs.py"), jobs_py)

    base_pq = os.path.join(tmp, "base.parquet")
    generate_images(spark, 40, num_partitions=4).select(
        "*",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias(
            "datastream_metadata_source_timestamp"
        ),
        F.lit(0).cast("long").alias("datastream_metadata_change_seq"),
    ).write.parquet(base_pq)

    table = os.path.join(tmp, "warehouse", "images")
    assert _submit(tmp, zpath, jobs_py, "init", "--table", table)["version"] == 0
    out = _submit(
        tmp, zpath, jobs_py, "ingest", "--table", table, "--batch", base_pq,
        "--num-files", "4",
    )
    assert out["version"] == 1
    scan = _submit(tmp, zpath, jobs_py, "scan", "--table", table)
    assert scan["rows"] == 40 and scan["version"] == 1
