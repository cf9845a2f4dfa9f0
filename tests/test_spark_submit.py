"""True spark-submit --py-files launch (the north rule's deployment
mode): the gdal_spark package ships as a zip, the job runs from a
neutral cwd so ONLY the zip provides the library."""

from __future__ import annotations

import json
import os
import subprocess
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = "/root/testdata/sf0.001/documents.parquet"


def _build_zip(path: str) -> str:
    zpath = os.path.join(path, "gdal_spark.zip")
    pkg = os.path.join(REPO, "gdal_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_py_files(tmp_path):
    zpath = _build_zip(str(tmp_path))
    out = str(tmp_path / "dedup_out")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [
            "spark-submit", "--master", "local[2]",
            "--py-files", zpath,
            os.path.join(REPO, "jobs", "dedup_job.py"),
            "--documents", DOCS, "--output", out,
            "--master", "local[2]",
        ],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert {s["stage"] for s in m["stages"]} == {
        "exact", "jaccard", "clusters",
    }
    assert os.path.exists(os.path.join(out, "clusters"))
