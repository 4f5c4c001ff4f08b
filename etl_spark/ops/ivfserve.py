"""Persisted IVF serving index — ANN top-k without touching the corpus.

``ops/simsearch.emb_ivf_topk`` demonstrates IVF *semantics* but re-assigns
every corpus vector to its centroid inside the query — a
scan-the-corpus-per-lookup pattern that cannot serve at 100 TB. This
module is the serving shape: centroid assignment happens ONCE, at ingest
(``add``), and is PERSISTED in cell-partitioned parquet segments; a query
assigns only its probes (a handful of rows against broadcast centroid
literals) and reads ONLY the probed cells' files — no corpus-wide stage
of any kind in the probe plan. Same segment-pointer durability protocol
as ``cdc/neardup.py``: a segment becomes visible only via the atomic
pointer swap, so a crashed ``add`` is invisible.

Layout::

    <path>/CURRENT                  {"segments": [...], "n_vecs": N,
                                     "cents": [[c, s[64], n], ...]}
    <path>/seg-*/cluster=<c>/*.parquet   (vec_id, cell, q, nsq)

Training (``train``) runs the same deterministic integer Lloyd iteration
as ``simsearch.emb_kmeans`` (shared assignment expression, shared oracle
math — round(x*1000) int quantization, g = nsq/n² − 2·dot/n, ties by
centroid id), so a DuckDB oracle can reproduce centroids, assignments,
and rankings bit-for-bit. Retraining is refused once segments exist:
stored assignments would silently mismatch new centroids (rebuild the
index instead — the Faiss contract).

Scale notes: ``add`` is one narrow map pass over the BATCH (broadcast
centroid literals, no shuffle) plus a cell-partitioned write. ``topk``
collects only the probe→cell map (bounded by n_probes × n_probe — metadata,
never row data), lists the matching cell DIRECTORIES from the segment
manifest, and hands Spark exactly those paths: the scan is pruned at file
level before the plan exists. Candidate scoring is broadcast(probes) ⋈
cells — the only distributed work is proportional to the probed cells.

Reference analog: the annotation/index sidecars the reference maintains
next to its archives so per-item lookups never rescan raw data
(/root/reference/etl/globals.go:309-323 routing + gardener's base_tables
join model, lifted to vector cells).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from etl_spark.lake.table import _atomic_write
from etl_spark.ops.simsearch import (
    EMB_DIM,
    KMEANS_ITERS,
    KMEANS_K,
    _cos,
    _dot,
    _kmeans_assign,
    _kmeans_g_structs,
    _quantized,
)

_PTR = "CURRENT"


def _kmeans_topn(cents: list[tuple[int, list[int], int]], n: int) -> F.Column:
    """Array of the ``n`` nearest centroid ids for the row's ``__q``,
    ordered by (g asc, c asc) — the multi-probe generalization of
    ``_kmeans_assign``, built from the SAME per-centroid struct array
    (simsearch._kmeans_g_structs) so the two can never diverge."""
    ordered = F.array_sort(_kmeans_g_structs(cents))
    return F.transform(F.slice(ordered, 1, n), lambda s: s["c"])


class IvfIndex:
    """Cell-partitioned persisted ANN index; see module docstring."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    # ------------------------------------------------------------- state
    def _meta(self) -> dict:
        p = os.path.join(self.path, _PTR)
        if not os.path.exists(p):
            return {"segments": [], "n_vecs": 0, "cents": None}
        with open(p) as f:
            return json.load(f)

    def _commit(self, m: dict) -> None:
        _atomic_write(os.path.join(self.path, _PTR), json.dumps(m))

    @property
    def n_vecs(self) -> int:
        return self._meta()["n_vecs"]

    def centroids(self) -> list[tuple[int, list[int], int]]:
        m = self._meta()
        if not m["cents"]:
            raise ValueError("index is untrained — call train() first")
        return [(int(c), [int(v) for v in s], int(n)) for c, s, n in m["cents"]]

    # ---------------------------------------------------------- training
    def train(
        self,
        spark: SparkSession,
        emb: DataFrame,
        k: int = KMEANS_K,
        iters: int = KMEANS_ITERS,
    ) -> list[tuple[int, list[int], int]]:
        """Deterministic integer Lloyd fit (init = the ``k`` lowest
        vec_ids, ``iters`` total assignment passes — the exact
        ``emb_kmeans`` procedure). Each update is ONE hash aggregate with
        64 per-dim sum buffers (k rows to the driver, never row data).
        Refused once segments exist: persisted assignments are bound to
        the centroids they were computed under."""
        m = self._meta()
        if m["segments"]:
            raise ValueError(
                "cannot retrain a populated index — stored cell assignments "
                "would mismatch the new centroids; build a fresh index"
            )
        e = _quantized(emb).select("vec_id", "__q")
        init = e.orderBy("vec_id").limit(k).collect()
        cents = sorted(
            (int(r["vec_id"]), [int(v) for v in r["__q"]], 1) for r in init
        )
        for _ in range(iters - 1):
            upd = (
                e.withColumn("__c", _kmeans_assign(cents))
                .groupBy("__c")
                .agg(
                    F.count("*").alias("n"),
                    *[
                        F.sum(F.element_at("__q", i + 1)).alias(f"s{i}")
                        for i in range(EMB_DIM)
                    ],
                )
                .collect()
            )
            by_c = {
                int(r["__c"]): (
                    [int(r[f"s{i}"]) for i in range(EMB_DIM)], int(r["n"])
                )
                for r in upd
            }
            cents = [
                (c, by_c[c][0], by_c[c][1]) if c in by_c else (c, s, n)
                for c, s, n in cents
            ]
        m["cents"] = [[c, s, n] for c, s, n in cents]
        self._commit(m)
        return cents

    # ------------------------------------------------------------ ingest
    def add(
        self, spark: SparkSession, emb: DataFrame, seg_name: str | None = None
    ) -> int:
        """Assign the batch to cells (broadcast centroid literals — one
        narrow map pass over the BATCH, no shuffle, no corpus read) and
        persist it as one cell-partitioned segment. Idempotent under a
        deterministic ``seg_name`` (redelivery finds the segment
        committed and skips). Returns vectors added."""
        import pyarrow.parquet as pq

        from etl_spark.cdc.neardup import _absorbed_contains

        cents = self.centroids()
        seg = f"seg-{seg_name}" if seg_name else f"seg-{uuid.uuid4().hex[:12]}"
        m = self._meta()
        # absorbed names count: a redelivered trigger whose segment was
        # since compacted away must still no-op (the deterministic-name
        # ledger survives compaction — bounded tail + immutable spill,
        # see ``compact`` and neardup's shared absorbed-ledger helpers)
        if seg in m["segments"] or _absorbed_contains(self.path, m, seg):
            return 0
        seg_dir = os.path.join(self.path, seg)
        rows = (
            _quantized(emb)
            .withColumn("cluster", _kmeans_assign(cents))
            .select(
                F.col("vec_id"),
                F.col("cluster"),
                # `cell` duplicates the partition value INSIDE the file so
                # probed-cell reads need no basePath partition discovery
                F.col("cluster").alias("cell"),
                F.col("__q").alias("q"),
                F.col("__nsq").alias("nsq"),
            )
        )
        rows.write.mode("overwrite").partitionBy("cluster").parquet(seg_dir)
        n = 0
        for root, _dirs, files in os.walk(seg_dir):
            for fn in files:
                if fn.endswith(".parquet"):
                    n += pq.read_metadata(os.path.join(root, fn)).num_rows
        m = self._meta()
        m["segments"].append(seg)
        m["n_vecs"] += n
        self._commit(m)
        return n

    # ------------------------------------------------------- maintenance
    def compact(
        self,
        spark: SparkSession,
        min_segments: int = 2,
        keep_last: int = 0,
        remove_absorbed: bool = True,
    ) -> dict | None:
        """Merge committed segments into ONE consolidated cell-partitioned
        segment behind the atomic pointer swap (the index analog of the
        table's ``compact_small_files`` / Iceberg rewrite_data_files).

        Every streaming ``add`` appends a segment, so without this verb a
        probe's driver-side ``plan_cells`` listing and its per-cell file
        fan-in grow O(triggers) forever. Compaction is a pure file merge
        (assignments are bound to the trained centroids, which never
        change after segments exist — retraining is refused), so probe
        results are identical before and after; the consolidated segment
        holds ONE file per cell (repartition by cluster → one task per
        cell writes it).

        The deterministic segment-name ledger survives in ``absorbed``
        (redelivered ``add``s still no-op). ``remove_absorbed`` deletes
        merged dirs after the swap — single writer, no in-flight probe
        plans older than the swap (run between triggers; pass False to
        sweep later). ``keep_last`` mirrors the neardup gate's contract
        but defaults to 0 here: the IVF probe has no own-segment
        exclusion, so absorbing every segment is safe.

        Returns {"absorbed": n, "segments": n_after, "files_before": n,
        "files_after": n} or None when below ``min_segments``."""
        import shutil

        from etl_spark.cdc.neardup import _merge_absorbed

        m = self._meta()
        live = list(m["segments"])
        absorbable = live[: max(0, len(live) - keep_last)]
        if len(absorbable) < min_segments:
            return None
        # sweep orphans from crashed earlier compactions (single-writer
        # contract: any seg-/compact- dir the pointer doesn't reference
        # is dead — a crashed write or an interrupted post-swap removal)
        for d in os.listdir(self.path):
            if (
                (d.startswith("seg-") or d.startswith("compact-"))
                and d not in live
                and os.path.isdir(os.path.join(self.path, d))
            ):
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
        comp = f"compact-{uuid.uuid4().hex[:12]}"
        comp_dir = os.path.join(self.path, comp)

        def _count_files(dirs: list[str]) -> int:
            n = 0
            for d in dirs:
                for _root, _sub, files in os.walk(d):
                    n += sum(1 for f in files if f.endswith(".parquet"))
            return n

        files_before = _count_files(
            [os.path.join(self.path, s) for s in absorbable]
        )
        # recursiveFileLookup skips partition discovery (multiple roots
        # conflict); the in-file ``cell`` duplicate is the cluster id
        (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(*[os.path.join(self.path, s) for s in absorbable])
            .withColumn("cluster", F.col("cell"))
            .repartition("cluster")
            .select("vec_id", "cluster", "cell", "q", "nsq")
            .write.mode("overwrite")
            .partitionBy("cluster")
            .parquet(comp_dir)
        )
        m2 = self._meta()
        old_spill = _merge_absorbed(self.path, m2, absorbable)
        m2["segments"] = [comp] + [
            s for s in m2["segments"] if s not in set(absorbable)
        ]
        self._commit(m2)
        if old_spill:
            try:
                os.remove(os.path.join(self.path, old_spill))
            except OSError:
                pass
        if remove_absorbed:
            for s in absorbable:
                shutil.rmtree(os.path.join(self.path, s), ignore_errors=True)
        return {
            "absorbed": len(absorbable),
            "segments": len(m2["segments"]),
            "files_before": files_before,
            "files_after": _count_files([comp_dir]),
        }

    # ------------------------------------------------------------- probe
    def plan_cells(self, cells: list[int]) -> list[str]:
        """Existing cell directories for the probed cells across committed
        segments — the file-level pruning the probe plan is built from."""
        out = []
        for seg in self._meta()["segments"]:
            for c in sorted(set(cells)):
                d = os.path.join(self.path, seg, f"cluster={c}")
                if os.path.isdir(d):
                    out.append(d)
        return out

    def topk(
        self,
        spark: SparkSession,
        probes: DataFrame,
        k: int = 3,
        n_probe: int = 1,
        exclude_self: bool = True,
    ) -> DataFrame:
        """Exact-cosine top-k per probe over the probed cells only.
        ``probes``: (vec_id, embedding). The probe→cell map is collected
        (bounded by |probes| × n_probe — a fixed probe set, never corpus
        rows); the candidate scan reads exactly ``plan_cells`` paths."""
        cents = self.centroids()
        pe = _quantized(probes).select(
            F.col("vec_id").alias("q_id"),
            F.col("__q").alias("qv"),
            F.col("__nsq").alias("qn"),
            F.explode(_kmeans_topn(cents, n_probe)).alias("cell"),
        )
        pe = pe.localCheckpoint(eager=True)  # assign probes exactly once
        probe_cells = [int(r["cell"]) for r in pe.select("cell").distinct().collect()]
        paths = self.plan_cells(probe_cells)
        if not paths:
            return pe.select("q_id").limit(0).select(
                "q_id",
                F.lit(None).cast("long").alias("cand_id"),
                F.lit(None).cast("int").alias("rank"),
                F.lit(None).cast("double").alias("cos"),
            )
        cand = spark.read.parquet(*paths).select(
            F.col("vec_id").alias("cand_id"),
            F.col("cell"),
            F.col("q").alias("cv"),
            F.col("nsq").alias("cn"),
        )
        scored = F.broadcast(pe).join(cand, "cell")
        if exclude_self:
            scored = scored.filter(F.col("q_id") != F.col("cand_id"))
        scored = scored.select(
            "q_id", "cand_id", _cos(_dot("qv", "cv"), "qn", "cn").alias("cos")
        )
        w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "cand_id", "rank", "cos")
        )
