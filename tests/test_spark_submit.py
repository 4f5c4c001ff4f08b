"""Deployment-contract proof: the engine runs under real ``spark-submit
--py-files etl_spark.zip`` with the repo scrubbed from the import path.

The north rule deploys via ``spark-submit --py-files`` on a multi-executor
cluster. Everything else in the suite imports ``etl_spark`` from the working
tree; this test instead (a) builds the deterministic deploy zip with
``tools/make_pyfiles.py``, (b) launches the cluster entry point
``tools/submit_job.py`` through the REAL spark-submit binary with
``cwd=$TMP`` and an empty ``PYTHONPATH`` — so the only way ``etl_spark``
can resolve, on the driver or in executor Python workers, is the
``--py-files`` zip — and (c) checks the resulting lake table's final state
against the independent DuckDB oracle (row count AND full-image xxhash64
digest). A green run means the zip is a complete, self-contained deploy
artifact, not just that the code works in-repo.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or (
    os.path.join(os.environ["SPARK_HOME"], "bin", "spark-submit")
    if os.environ.get("SPARK_HOME")
    else None
)

pytestmark = pytest.mark.skipif(
    SPARK_SUBMIT is None or not os.path.exists(SPARK_SUBMIT),
    reason="spark-submit binary not on PATH/SPARK_HOME",
)


def test_pyfiles_zip_is_deterministic(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from make_pyfiles import build_zip
    finally:
        sys.path.pop(0)
    a = build_zip(str(tmp_path / "a.zip"))
    b = build_zip(str(tmp_path / "b.zip"))
    assert a["sha256"] == b["sha256"]
    assert a["files"] > 20  # the whole package went in, not a stub
    # importable from the zip root, zip on sys.path (what spark-submit does)
    probe = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, sys.argv[1]); "
            "import etl_spark.cdc.patch, etl_spark.lake.table; print('ok')",
            str(tmp_path / "a.zip"),
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env={**os.environ, "PYTHONPATH": ""},
        timeout=60,
    )
    assert probe.returncode == 0 and probe.stdout.strip() == "ok", probe.stderr


def test_spark_submit_replay_matches_oracle(spark, tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from make_pyfiles import build_zip
    finally:
        sys.path.pop(0)
    zip_path = str(tmp_path / "etl_spark.zip")
    build_zip(zip_path)
    feed = str(tmp_path / "feed")
    table = str(tmp_path / "lake")

    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # imports must come from --py-files, not the repo
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", zip_path,
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            os.path.join(REPO, "tools", "submit_job.py"),
            "--table", table,
            "--feed", feed,
            "--gen-events", "20000",
            "--segments", "3",
            "--buckets", "8",
            "--mode", "mor",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    # events_in counts redelivered duplicates too (dup_ratio re-emits), so
    # the replayed event count is >= the generator's n_events
    assert out["ok"] and out["batches"] == 3 and out["events"] >= 20000

    # independent DuckDB reduction of the very feed the job wrote
    from etl_spark.cdc.oracle import expected_final_state
    from etl_spark.schema import TRANSCRIPT_SCHEMA

    expected = expected_final_state(feed)
    assert out["final_rows"] == len(expected)
    exp_df = spark.createDataFrame(expected, schema=TRANSCRIPT_SCHEMA)
    d = exp_df.agg(
        F.sum(
            F.xxhash64("conv_id", "turn_idx", "role", "text", "tool", "ts")
            .cast("decimal(28,0)")
        ).alias("hsum"),
        F.expr(
            "bit_xor(xxhash64(conv_id, turn_idx, role, text, tool, ts))"
        ).alias("hxor"),
    ).first()
    assert out["state_hsum"] == str(d["hsum"])
    assert out["state_hxor"] == int(d["hxor"])
