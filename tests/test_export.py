"""Partitioned export sink (lake/export.py): dynamic partition overwrite
replaces only the partitions present in the incoming frame."""

import os

from pyspark.sql import functions as F

from etl_spark.lake.export import export_partitioned, read_export


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_export_layout_and_roundtrip(spark, tmpdir_path):
    out = os.path.join(tmpdir_path, "exp")
    docs = _docs(spark)
    export_partitioned(docs, out, ["lang"])
    # hive layout: one directory per lang
    langs = {r[0] for r in docs.select("lang").distinct().collect()}
    assert {d.split("=")[1] for d in os.listdir(out) if d.startswith("lang=")} == langs
    # bounded files per partition
    for d in os.listdir(out):
        if d.startswith("lang="):
            n = len([f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")])
            assert n == 1
    back = read_export(spark, out)
    assert back.count() == docs.count()
    # full content equality (lang comes back from the directory key)
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    a = {tuple(r) for r in back.select(*cols).collect()}
    b = {tuple(r) for r in docs.select(*cols).collect()}
    assert a == b


def test_dynamic_overwrite_replaces_only_incoming_partitions(spark, tmpdir_path):
    out = os.path.join(tmpdir_path, "exp")
    docs = _docs(spark)
    export_partitioned(docs, out, ["lang"])
    langs = sorted(r[0] for r in docs.select("lang").distinct().collect())
    target, keep = langs[0], langs[1:]

    # re-export ONE partition with modified content
    patch = docs.filter(F.col("lang") == target).withColumn(
        "text", F.concat(F.lit("v2:"), F.col("text"))
    )
    export_partitioned(patch, out, ["lang"])

    back = read_export(spark, out)
    # target partition fully replaced
    got_target = back.filter(F.col("lang") == target)
    assert got_target.count() == patch.count()
    assert got_target.filter(~F.col("text").startswith("v2:")).count() == 0
    # untouched partitions preserved exactly
    for lg in keep:
        a = {
            tuple(r)
            for r in back.filter(F.col("lang") == lg).select("doc_id", "text").collect()
        }
        b = {
            tuple(r)
            for r in docs.filter(F.col("lang") == lg).select("doc_id", "text").collect()
        }
        assert a == b


def test_static_overwrite_truncates(spark, tmpdir_path):
    out = os.path.join(tmpdir_path, "exp")
    docs = _docs(spark)
    export_partitioned(docs, out, ["lang"])
    langs = sorted(r[0] for r in docs.select("lang").distinct().collect())
    one = docs.filter(F.col("lang") == langs[0])
    export_partitioned(one, out, ["lang"], dynamic=False)
    back = read_export(spark, out)
    assert {r[0] for r in back.select("lang").distinct().collect()} == {langs[0]}


def test_multi_column_partitioning_and_pruning(spark, tmpdir_path):
    out = os.path.join(tmpdir_path, "exp")
    docs = _docs(spark)
    export_partitioned(docs, out, ["lang", "source"], files_per_partition=2)
    back = read_export(spark, out)
    assert back.count() == docs.count()
    # partition pruning: a lang+source filter reads only that directory
    sel = back.filter((F.col("lang") == "en") & (F.col("source") == "web"))
    plan = sel._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "lang" in m.group(1) and "source" in m.group(1)
    want = docs.filter((F.col("lang") == "en") & (F.col("source") == "web")).count()
    assert sel.count() == want
