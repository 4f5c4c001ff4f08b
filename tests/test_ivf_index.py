"""Persisted IVF serving index (ops/ivfserve.py): centroid assignment
happens at ingest and is stored cell-partitioned; the probe plan reads
ONLY the probed cells' files — the serving property the in-query IVF
variant (ops/simsearch.emb_ivf_topk) lacks at 100 TB."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_spark.ops.ivfserve import IvfIndex
from etl_spark.ops.simsearch import _cos, _dot, _quantized

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet"))


@pytest.fixture()
def idx(spark, tmpdir_path):
    i = IvfIndex(os.path.join(tmpdir_path, "ivf"))
    e = _emb(spark)
    i.train(spark, e)
    i.add(spark, e.filter(F.col("vec_id") % 2 == 0), seg_name="even")
    i.add(spark, e.filter(F.col("vec_id") % 2 == 1), seg_name="odd")
    return i


def test_probe_scans_only_probed_cells(spark, idx):
    """The serving claim, checked mechanically: the candidate scan's input
    files all live under probed-cell directories — no corpus-wide
    assignment stage, no unprobed cell touched."""
    probes = _emb(spark).filter(F.col("vec_id").isin(8, 9))
    out = idx.topk(spark, probes, k=3, n_probe=2)
    # probe cells: ≤ 2 probes × 2 cells
    pe = _quantized(probes)
    from etl_spark.ops.ivfserve import _kmeans_topn

    cells = {
        int(c)
        for r in pe.select(
            F.explode(_kmeans_topn(idx.centroids(), 2)).alias("c")
        ).collect()
        for c in [r["c"]]
    }
    allowed = {os.path.normpath(p) for p in idx.plan_cells(sorted(cells))}
    all_cells = {
        os.path.normpath(os.path.join(idx.path, seg, d))
        for seg in idx._meta()["segments"]
        for d in os.listdir(os.path.join(idx.path, seg))
        if d.startswith("cluster=")
    }
    assert allowed < all_cells, "probe set must prune cells to be a real test"
    scanned = {os.path.normpath(os.path.dirname(f.replace("file:", "")))
               for f in out.inputFiles() if f.endswith(".parquet")}
    # every scanned parquet comes from an allowed cell dir
    assert scanned and scanned <= allowed, (scanned, allowed)
    # the plan has no row_number-over-corpus assignment stage: candidates
    # enter pre-assigned (cell is a stored column)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # only the final top-k ranking window (WindowGroupLimit = Spark's
    # top-k pushdown under it), and no centroid-assignment expression
    # anywhere: candidates enter pre-assigned (cell is a stored column)
    assert plan.count("Window [") == 1
    assert "array_min" not in plan


def test_topk_matches_in_cell_exact_rerank(spark, idx):
    """Within probed cells the ranking is EXACT cosine: recompute the same
    candidate set by brute force over the stored rows and compare."""
    probes = _emb(spark).filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 16))
    got = {
        (r["q_id"], r["rank"]): r["cand_id"]
        for r in idx.topk(spark, probes, k=3, n_probe=1).collect()
    }
    # reference: assign all vectors via the same centroids (the stored
    # assignment), then rank within the probe's cell
    from etl_spark.ops.ivfserve import _kmeans_assign

    cents = idx.centroids()
    e = _quantized(_emb(spark)).withColumn("cell", _kmeans_assign(cents))
    probes_a = e.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 16)).select(
        F.col("vec_id").alias("q_id"), F.col("__q").alias("qv"),
        F.col("__nsq").alias("qn"), "cell",
    )
    cand = e.select(
        F.col("vec_id").alias("cand_id"), F.col("__q").alias("cv"),
        F.col("__nsq").alias("cn"), "cell",
    )
    from pyspark.sql import Window as W

    scored = (
        probes_a.join(cand, "cell")
        .filter(F.col("q_id") != F.col("cand_id"))
        .select("q_id", "cand_id", _cos(_dot("qv", "cv"), "qn", "cn").alias("c"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("c").desc(), F.col("cand_id"))
    want = {
        (r["q_id"], r["rank"]): r["cand_id"]
        for r in scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .collect()
    }
    assert got == want


def test_incremental_add_serves_new_vectors(spark, idx, tmpdir_path):
    """Vectors ingested AFTER the initial build are served without any
    rebuild — the index is append-only at ingest grade."""
    import pandas as pd

    base = _emb(spark).limit(1).toPandas()
    v = base.iloc[0]
    newrow = pd.DataFrame(
        [{"vec_id": 10_000_000, "embedding": list(v["embedding"]), "label": 0}]
    )
    n = idx.add(spark, spark.createDataFrame(newrow), seg_name="late")
    assert n == 1
    probes = _emb(spark).filter(F.col("vec_id") == int(v["vec_id"]))
    got = idx.topk(spark, probes, k=1, n_probe=1).collect()
    # the new vector is an exact copy of the probe → cosine 1.0 at rank 1
    assert got[0]["cand_id"] == 10_000_000
    assert abs(got[0]["cos"] - 1.0) < 1e-12


def test_add_is_idempotent_and_crash_safe(spark, idx):
    before = idx.n_vecs
    n = idx.add(spark, _emb(spark).limit(5), seg_name="even")  # redelivery
    assert n == 0 and idx.n_vecs == before


def test_retrain_refused_once_populated(spark, idx):
    with pytest.raises(ValueError, match="retrain"):
        idx.train(spark, _emb(spark))


def test_untrained_index_refuses_ingest(spark, tmpdir_path):
    i = IvfIndex(os.path.join(tmpdir_path, "fresh"))
    with pytest.raises(ValueError, match="untrained"):
        i.add(spark, _emb(spark))
