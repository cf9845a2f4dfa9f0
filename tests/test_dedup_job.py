"""spark-submit dedup job (jobs/dedup_job.py): stage outputs, metrics,
resume semantics."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = "/root/testdata/sf0.001/documents.parquet"


def _run(out, extra=()):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "dedup_job.py"),
         "--documents", DOCS, "--output", out, "--master", "local[4]", *extra],
        capture_output=True, text=True, check=True,
    )
    return json.loads([ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1])


def test_job_stages_and_resume(tmp_path):
    out = str(tmp_path / "dedup")
    m = _run(out)
    stages = {s["stage"]: s for s in m["stages"]}
    assert set(stages) == {"exact", "jaccard", "clusters"}
    assert stages["clusters"]["rows"] == 500  # every doc gets an assignment
    for name in ("exact", "jaccard", "clusters", "_metrics"):
        assert os.path.exists(os.path.join(out, name))
    # resume: nothing recomputed
    m2 = _run(out, ["--resume"])
    assert all(s["resumed"] for s in m2["stages"])


def test_cluster_assignment_is_consistent(tmp_path, spark):
    out = str(tmp_path / "dedup2")
    _run(out)
    cl = spark.read.parquet(os.path.join(out, "clusters"))
    rows = cl.collect()
    comp = {r["doc_id"]: r["cluster_id"] for r in rows}
    # cluster ids are cluster minima and survivors flagged exactly there
    for r in rows:
        assert comp[r["cluster_id"]] == r["cluster_id"]
        assert r["survivor"] == (r["doc_id"] == r["cluster_id"])
