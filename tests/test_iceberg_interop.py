"""Conditional proof that the engine's CDC semantics map onto REAL
Apache Iceberg (`CREATE TABLE ... USING iceberg` + `MERGE INTO`).

This container ships no Iceberg runtime jar (probe notes in
etl_spark/lake/backend.py: pyspark 4.1.2's jars/ has no iceberg
artifact, no ivy/maven cache, no network for spark.jars.packages), so
here the test SKIPS with that reason. Where a jar exists (set
ICEBERG_JAR or have iceberg-spark-runtime on pyspark's jars path), it
runs a fresh subprocess session with the Iceberg extensions and:

1. creates an Iceberg table for the transcript schema,
2. replays the same deterministic change feed twice —
   (a) through the native engine (LakeTable + apply_batch), and
   (b) through Iceberg: per batch, the engine's own in-batch LWW dedup
       (cdc.dedup.lww_dedup) then ONE `MERGE INTO` whose WHEN clauses
       encode ts/op_seq last-writer-wins and delete dominance,
3. asserts byte-identical final state (sorted rows) between the two.

That is exactly the LakeBackend seam contract: the engine above the
seam is unchanged; only the commit/MERGE substrate differs.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest


def _iceberg_jars() -> list[str]:
    import pyspark

    jars = glob.glob(
        os.path.join(os.path.dirname(pyspark.__file__), "jars", "*iceberg*spark*")
    )
    jars += glob.glob(os.path.expanduser("~/.ivy2/jars/*iceberg*spark*"))
    env = os.environ.get("ICEBERG_JAR")
    if env and os.path.exists(env):
        jars.append(env)
    return jars


_DRIVER = r"""
import os, sys
sys.path.insert(0, os.environ["REPO_ROOT"])
from pyspark.sql import SparkSession, functions as F

wh = os.environ["ICEBERG_WAREHOUSE"]
spark = (
    SparkSession.builder.master("local[4]")
    .appName("iceberg_interop")
    .config("spark.jars", os.environ["ICEBERG_JARS"])
    .config("spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
    .config("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.ice.type", "hadoop")
    .config("spark.sql.catalog.ice.warehouse", wh)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
from etl_spark.cdc import change_feed_df, write_feed, replay_feed
from etl_spark.cdc.dedup import lww_dedup
from etl_spark.lake import LakeTable
from etl_spark.schema import TRANSCRIPT_SCHEMA

work = os.environ["WORK_DIR"]
feed = os.path.join(work, "feed")
write_feed(change_feed_df(spark, n_events=8000, n_convs=120, max_turns=10,
                          seed=5, delete_ratio=0.06, dup_ratio=0.05,
                          ooo_ratio=0.1, n_batches=4), feed)

# (a) native engine replay
t = LakeTable.create(os.path.join(work, "lake"), TRANSCRIPT_SCHEMA, n_buckets=8)
replay_feed(spark, t, feed)
native = t.read(spark).select("conv_id", "turn_idx", "role", "text", "tool", "ts")

# (b) real Iceberg: bucket-partitioned table + per-batch LWW MERGE INTO
spark.sql("DROP TABLE IF EXISTS ice.db.transcripts")
spark.sql(
    "CREATE TABLE ice.db.transcripts ("
    " conv_id string, turn_idx int, role string, text string, tool string,"
    " ts timestamp, op_seq bigint)"
    " USING iceberg PARTITIONED BY (bucket(8, conv_id))"
)
for seg in sorted(os.listdir(feed)):
    d = os.path.join(feed, seg)
    if not os.path.isdir(d):
        continue
    batch = spark.read.parquet(d)
    deduped = lww_dedup(batch)  # the engine's own in-batch LWW reduction
    deduped.createOrReplaceTempView("src")
    spark.sql(
        "MERGE INTO ice.db.transcripts t USING src s"
        " ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx"
        " WHEN MATCHED AND (s.ts > t.ts OR (s.ts = t.ts AND s.op_seq > t.op_seq))"
        "   AND s.op = 'D' THEN DELETE"
        " WHEN MATCHED AND (s.ts > t.ts OR (s.ts = t.ts AND s.op_seq > t.op_seq))"
        "   THEN UPDATE SET t.role = s.role, t.text = s.text, t.tool = s.tool,"
        "       t.ts = s.ts, t.op_seq = s.op_seq"
        " WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT"
        "   (conv_id, turn_idx, role, text, tool, ts, op_seq)"
        "   VALUES (s.conv_id, s.turn_idx, s.role, s.text, s.tool, s.ts, s.op_seq)"
    )
ice = spark.table("ice.db.transcripts").select(
    "conv_id", "turn_idx", "role", "text", "tool", "ts")

cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
a = sorted(map(tuple, native.collect()))
b = sorted(map(tuple, ice.collect()))
print("ROWS", len(a), len(b))
print("MATCH", a == b)
"""


@pytest.mark.skipif(
    not _iceberg_jars(),
    reason=(
        "no Iceberg runtime jar in this container (pyspark jars/, ivy2 and "
        "ICEBERG_JAR all empty — see the probe notes in "
        "etl_spark/lake/backend.py); set ICEBERG_JAR to run"
    ),
)
def test_engine_state_equals_real_iceberg_merge(tmp_path):
    work = str(tmp_path / "w")
    os.makedirs(work)
    env = dict(
        os.environ,
        REPO_ROOT=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ICEBERG_JARS=",".join(_iceberg_jars()),
        ICEBERG_WAREHOUSE=str(tmp_path / "warehouse"),
        WORK_DIR=work,
    )
    script = tmp_path / "driver.py"
    script.write_text(_DRIVER)
    out = subprocess.run(
        [sys.executable, str(script)], env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert "MATCH True" in out.stdout, out.stdout + out.stderr
