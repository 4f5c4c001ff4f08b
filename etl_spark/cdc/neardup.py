"""Persisted near-duplicate index — the content-level seen-set.

The Bloom sidecar (etl_spark/cdc/bloom.py) answers "has this KEY been
written before?"; this module answers "has this CONTENT (or something
almost identical) been ingested before?" — the admission gate a
training-data pipeline runs on every arriving batch of documents/turn
texts before letting them into the corpus. Reference analog: gardener's
dedup of each incoming archive against base_tables lifted from
key-equality to content near-duplication
(/root/reference/schema/README.md:6-10).

Design (all sizes are per-BATCH, never per-corpus):

  * The index stores one row per document: its 64-hash MinHash signature
    plus the 32 LSH band keys (2 hashes/band, packed collision-free).
    Stored as parquet under the index dir; an atomic pointer file lists
    the committed segment files (same manifest discipline as LakeTable —
    a crashed append is invisible).
  * ``check_and_add(batch)``: signatures are computed for the BATCH only
    (one md5 per (doc, shingle), KM streams in codegen — see
    ops/textops._signatures). Candidates come from a band-key equi-join
    of batch bands against index bands (shuffle bounded by band buckets;
    the corpus is never re-hashed, never cross-joined). Near-dup score =
    fraction of agreeing minhashes — the unbiased Jaccard estimator —
    so the index never needs the original text or shingles.
  * In-batch duplicates are caught by the same join (batch is appended
    before probing would double-count; instead the batch probes the index
    AND itself with doc_a < doc_b).

Estimator note: with 64 hashes the estimate's std-dev at j=0.5 is
~sqrt(0.25/64) ≈ 0.06 — callers wanting exact Jaccard re-rank the
returned pairs against the source texts (ops.textops.doc_minhash_pairs
shows that pattern); the INDEX's job is the candidate gate.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_spark.lake.table import _atomic_write
from etl_spark.ops.textops import (
    MERSENNE_P,
    N_BANDS,
    N_MINHASH,
    _signatures,
    _with_shingles,
)

_PTR = "CURRENT"
_SIG_COLS = [f"s{i}" for i in range(N_MINHASH)]


class NearDupIndex:
    """Append-only MinHash/LSH index over ingested document content."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    # ------------------------------------------------------------- state
    def _meta(self) -> dict:
        p = os.path.join(self.path, _PTR)
        if not os.path.exists(p):
            return {"segments": [], "n_docs": 0,
                    "params": {"n_minhash": N_MINHASH, "n_bands": N_BANDS}}
        with open(p) as f:
            return json.loads(f.read())

    @property
    def n_docs(self) -> int:
        return self._meta()["n_docs"]

    def _read_index(self, spark: SparkSession) -> DataFrame | None:
        m = self._meta()
        if not m["segments"]:
            return None
        return spark.read.parquet(
            *[os.path.join(self.path, s) for s in m["segments"]]
        )

    # ------------------------------------------------------------ helpers
    @staticmethod
    def _sigs_of(batch: DataFrame) -> DataFrame:
        """(doc_id, text) → (doc_id, s0..s63), docs without signatures
        (fewer than 3 words) dropped — they cannot near-dup by shingles."""
        sigs = _signatures(_with_shingles(batch)).drop("__sh")
        return sigs.filter(F.col("s0").isNotNull())

    @staticmethod
    def _bands_of(sigs: DataFrame) -> DataFrame:
        return sigs.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("bi"),
                            (
                                F.col(f"s{2*j}") * MERSENNE_P + F.col(f"s{2*j+1}")
                            ).alias("bk"),
                        )
                        for j in range(N_BANDS)
                    ]
                )
            ).alias("b"),
        ).select("doc_id", "b.bi", "b.bk")

    @staticmethod
    def _est_jaccard(prefix_a: str, prefix_b: str) -> F.Column:
        matches = sum(
            F.when(
                F.col(f"{prefix_a}.s{i}") == F.col(f"{prefix_b}.s{i}"), 1
            ).otherwise(0)
            for i in range(N_MINHASH)
        )
        return (matches / F.lit(float(N_MINHASH))).alias("est_jaccard")

    # ------------------------------------------------------------- API
    def _dups_for_sigs(
        self, spark: SparkSession, sigs: DataFrame, threshold: float
    ) -> DataFrame:
        """Band-join + estimate for an already-materialized signature set
        (callers pass a parquet-backed frame so the signature stage runs
        exactly once per batch, not once per downstream join branch)."""
        nb = self._bands_of(sigs)
        idx = self._read_index(spark)
        parts = []
        if idx is not None:
            ib = self._bands_of(idx)
            cand = (
                nb.alias("x")
                .join(
                    ib.alias("y"),
                    (F.col("x.bi") == F.col("y.bi"))
                    & (F.col("x.bk") == F.col("y.bk")),
                )
                .select(
                    F.col("x.doc_id").alias("doc_id"),
                    F.col("y.doc_id").alias("dup_of"),
                )
                .distinct()
            )
            scored = (
                cand.join(sigs.alias("a"), cand.doc_id == F.col("a.doc_id"))
                .join(idx.alias("b"), cand.dup_of == F.col("b.doc_id"))
                .select(cand.doc_id, cand.dup_of, self._est_jaccard("a", "b"))
            )
            parts.append(scored)
        cand_in = (
            nb.alias("x")
            .join(
                nb.alias("y"),
                (F.col("x.bi") == F.col("y.bi"))
                & (F.col("x.bk") == F.col("y.bk"))
                & (F.col("x.doc_id") < F.col("y.doc_id")),
            )
            .select(
                F.col("x.doc_id").alias("doc_id"),
                F.col("y.doc_id").alias("dup_of"),
            )
            .distinct()
        )
        scored_in = (
            cand_in.join(sigs.alias("a"), cand_in.doc_id == F.col("a.doc_id"))
            .join(sigs.alias("b"), cand_in.dup_of == F.col("b.doc_id"))
            .select(cand_in.doc_id, cand_in.dup_of, self._est_jaccard("a", "b"))
        )
        parts.append(scored_in)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.filter(F.col("est_jaccard") >= threshold)

    def _write_segment(self, spark: SparkSession, batch: DataFrame) -> tuple[str, int]:
        """Materialize the batch signatures as an (uncommitted) segment;
        returns (segment name, row count). The ONE execution of the
        signature stage per batch — everything downstream reads it back."""
        import pyarrow.parquet as pq

        sigs = self._sigs_of(batch)
        seg = f"seg-{uuid.uuid4().hex[:12]}"
        sigs.select("doc_id", *_SIG_COLS).write.mode("overwrite").parquet(
            os.path.join(self.path, seg)
        )
        n = sum(
            pq.read_metadata(os.path.join(self.path, seg, f)).num_rows
            for f in os.listdir(os.path.join(self.path, seg))
            if f.endswith(".parquet")
        )
        return seg, n

    def _commit_segment(self, seg: str, n: int) -> None:
        m = self._meta()
        m["segments"].append(seg)
        m["n_docs"] += n
        _atomic_write(os.path.join(self.path, _PTR), json.dumps(m))

    def find_dups(
        self, spark: SparkSession, batch: DataFrame, threshold: float = 0.5
    ) -> DataFrame:
        """Near-dup pairs for an arriving batch of (doc_id, text) rows:
        batch-vs-index plus in-batch (doc_id < dup_of), scored by the
        signature-agreement Jaccard estimate. Returns
        (doc_id, dup_of, est_jaccard). Does NOT mutate the index (the
        probe's signature segment stays uncommitted and unreferenced)."""
        seg, _ = self._write_segment(spark, batch)
        sigs = spark.read.parquet(os.path.join(self.path, seg))
        return self._dups_for_sigs(spark, sigs, threshold)

    def add(self, spark: SparkSession, batch: DataFrame) -> int:
        """Append the batch's signatures to the index (atomic: the segment
        becomes visible only via the pointer swap). Returns docs added."""
        seg, n = self._write_segment(spark, batch)
        self._commit_segment(seg, n)
        return n

    def check_and_add(
        self, spark: SparkSession, batch: DataFrame, threshold: float = 0.5
    ) -> DataFrame:
        """The ingest-gate composition: return the batch's near-dup pairs
        (vs corpus and in-batch), then admit the batch to the index. The
        caller drops/flags `doc_id`s that appear in the result.

        One signature computation per batch (the segment write); the
        returned lazy plan reads only immutable parquet (the new segment +
        the index segments committed BEFORE this call), so it is unaffected
        by the commit below or by any later appends."""
        seg, n = self._write_segment(spark, batch)
        sigs = spark.read.parquet(os.path.join(self.path, seg))
        dups = self._dups_for_sigs(spark, sigs, threshold)
        self._commit_segment(seg, n)
        return dups


class EmbNearDupIndex:
    """Embedding-side admission gate: the same persisted-segment protocol
    as NearDupIndex, but content = vectors. Stores each admitted vector
    quantized (int64, round(x*1000) — the repo-wide determinism contract,
    see ops/simsearch.py) with its squared norm; candidates come from the
    high-recall random-hyperplane banding (4 bands × 2 bits, deterministic
    ±1 plane literals shared with the DuckDB oracle), scored by EXACT
    cosine from the stored vectors (unlike text, the index holds the full
    signal, so no estimator is needed). Per-batch cost: one quantize pass
    over the batch + band equi-joins; the corpus is never re-projected or
    cross-joined."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    _meta = NearDupIndex._meta
    _commit_segment = NearDupIndex._commit_segment

    @property
    def n_docs(self) -> int:
        return self._meta()["n_docs"]

    def _read_index(self, spark: SparkSession) -> DataFrame | None:
        m = self._meta()
        if not m["segments"]:
            return None
        return spark.read.parquet(
            *[os.path.join(self.path, s) for s in m["segments"]]
        )

    @staticmethod
    def _sigs_of(batch: DataFrame) -> DataFrame:
        """(vec_id, embedding float[]) → (vec_id, q, nsq)."""
        from etl_spark.ops.simsearch import _quantized

        return _quantized(batch).select(
            "vec_id", F.col("__q").alias("q"), F.col("__nsq").alias("nsq")
        )

    @staticmethod
    def _bands_of(sigs: DataFrame) -> DataFrame:
        from etl_spark.ops.simsearch import (
            NEARDUP_BANDS,
            NEARDUP_BITS,
            _band_cols_spark,
        )

        return sigs.withColumnRenamed("q", "__q").select(
            "vec_id",
            F.explode(_band_cols_spark(NEARDUP_BANDS, NEARDUP_BITS)).alias("bb"),
        ).select("vec_id", "bb.band", "bb.bucket")

    def _write_segment(self, spark: SparkSession, batch: DataFrame) -> tuple[str, int]:
        import pyarrow.parquet as pq

        seg = f"seg-{uuid.uuid4().hex[:12]}"
        self._sigs_of(batch).write.mode("overwrite").parquet(
            os.path.join(self.path, seg)
        )
        n = sum(
            pq.read_metadata(os.path.join(self.path, seg, f)).num_rows
            for f in os.listdir(os.path.join(self.path, seg))
            if f.endswith(".parquet")
        )
        return seg, n

    def _dups_for_sigs(
        self, spark: SparkSession, sigs: DataFrame, threshold: float
    ) -> DataFrame:
        from etl_spark.ops.simsearch import _cos, _dot

        def _score(cand: DataFrame, right: DataFrame) -> DataFrame:
            a = sigs.select(
                F.col("vec_id").alias("vec_id"), F.col("q").alias("qa"),
                F.col("nsq").alias("na"),
            )
            b = right.select(
                F.col("vec_id").alias("dup_of"), F.col("q").alias("qb"),
                F.col("nsq").alias("nb"),
            )
            cos = _cos(_dot("qa", "qb"), "na", "nb")
            return (
                cand.join(a, "vec_id").join(b, "dup_of")
                .select("vec_id", "dup_of", F.round(cos, 4).alias("cos4"))
            )

        nb = self._bands_of(sigs)
        idx = self._read_index(spark)
        parts = []
        if idx is not None:
            ib = self._bands_of(idx)
            cand = (
                nb.alias("x")
                .join(
                    ib.alias("y"),
                    (F.col("x.band") == F.col("y.band"))
                    & (F.col("x.bucket") == F.col("y.bucket")),
                )
                .select(
                    F.col("x.vec_id").alias("vec_id"),
                    F.col("y.vec_id").alias("dup_of"),
                )
                .distinct()
            )
            parts.append(_score(cand, idx))
        cand_in = (
            nb.alias("x")
            .join(
                nb.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.vec_id") < F.col("y.vec_id")),
            )
            .select(
                F.col("x.vec_id").alias("vec_id"),
                F.col("y.vec_id").alias("dup_of"),
            )
            .distinct()
        )
        parts.append(_score(cand_in, sigs))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.filter(F.col("cos4") >= threshold)

    def check_and_add(
        self, spark: SparkSession, batch: DataFrame, threshold: float
    ) -> DataFrame:
        """Gate + admit, same snapshot-isolation-by-immutability contract
        as NearDupIndex.check_and_add."""
        seg, n = self._write_segment(spark, batch)
        sigs = spark.read.parquet(os.path.join(self.path, seg))
        dups = self._dups_for_sigs(spark, sigs, threshold)
        self._commit_segment(seg, n)
        return dups
