"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded through Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the decode step is a
deterministic stub (hash-derived metadata) behind the same plumbing a real
decoder would use: explicit output schema, Arrow batch transfer, one
pandas batch per partition — swap ``_fake_decode_batch`` for a real
PIL/ffmpeg call and nothing else changes. ``decode_image_real`` marks the
gated real path.

The mm_decode_meta query is oracle-checked: the stub's arithmetic
(md5-derived width/height/format) is replicated in DuckDB SQL, proving the
Spark-side plumbing (schema, batching, UDF signature) delivers exactly the
declared transform.

A TRUE BinaryType decode — header-declared offsets over fixed-stride
little-endian records, the web100 snaplog shape — lives in
ops/binparse.py (``bin_snaplog_decode``), vectorized with numpy struct
views; this module keeps only the media-codec integration stub.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, digest string, width int, height int, "
    "frames int, fmt string"
)
_FORMATS = ["png", "jpg", "wav"]


def decode_image_real(payload: bytes) -> dict:
    """Real decode path — requires an image library absent from this
    container. Kept as the explicit integration point."""
    raise NotImplementedError(
        "image decode requires PIL/libvips; wire it in here — the Spark-side "
        "plumbing (mapInPandas batches, DECODE_SCHEMA) is already in place"
    )


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for a decoder: metadata derived from the
    payload hash. Vectorized over the Arrow batch (one python call per
    element only inside the hash map — a real decoder is per-item too)."""
    payload = pdf["payload"]
    digest = payload.map(lambda b: hashlib.md5(b).hexdigest())
    n_bytes = payload.map(len).astype("int64")
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].astype("int64"),
            "n_bytes": n_bytes,
            "digest": digest,
            "width": digest.map(lambda h: 64 + int(h[:6], 16) % 512).astype("int32"),
            "height": digest.map(lambda h: 64 + int(h[6:12], 16) % 512).astype("int32"),
            "frames": (1 + n_bytes % 16).astype("int32"),
            "fmt": digest.map(lambda h: _FORMATS[int(h[12:14], 16) % 3]),
        }
    )


def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text → binary payload column → mapInPandas decode stub →
    typed metadata. Partition-parallel; payload never leaves the executor."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode_batch(pdf)

    return docs.mapInPandas(gen, schema=DECODE_SCHEMA)


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: treat each document as a virtual media stream of
    16-char frames, emit every 4th frame's digest. The transform is pure
    expression (explode(sequence) + substring + md5 — whole-stage
    codegen, no Python in the row path); a REAL codec would slot in as a
    mapInPandas over the binary payload — that plumbing shape is
    exercised by mm_decode_meta and kept here as
    ``mm_frame_sample_udtf`` for reference."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    seq = F.sequence(
        F.lit(1), F.ceil(F.length("text") / F.lit(16.0)).cast("int"), F.lit(4)
    )
    ex = docs.select("doc_id", "text", F.explode(seq).alias("__p"))
    frame = F.substring(F.col("text"), (F.col("__p") - 1) * 16 + 1, F.lit(16))
    return ex.select(
        "doc_id",
        F.col("__p").cast("int").alias("frame_idx"),
        F.md5(frame).alias("frame_digest"),
    )


def mm_frame_sample_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-to-many Arrow UDTF shape a real video frame sampler uses
    (one input row → N frame rows, vectorized per batch). NOT the
    registered query — the registered plan above is pure expression; this
    stays as the integration template for an actual decoder, with the
    per-frame loop vectorized via pandas str slicing."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_frames = (pdf["text"].str.len() + 15) // 16
            reps = (n_frames + 3) // 4  # frames 1, 5, 9, ...
            idx = pdf.index.repeat(reps)
            frame_no = pd.Series(
                [p for r in reps for p in range(1, 4 * r, 4)], dtype="int32"
            )
            texts = pdf["text"].loc[idx].reset_index(drop=True)
            starts = (frame_no - 1) * 16
            frames = pd.Series(
                [t[s : s + 16] for t, s in zip(texts, starts)], dtype="object"
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].loc[idx].reset_index(drop=True).astype("int64"),
                    "frame_idx": frame_no,
                    "frame_digest": frames.map(
                        lambda f: hashlib.md5(f.encode()).hexdigest()
                    ),
                }
            )

    return docs.mapInPandas(
        gen, schema="doc_id long, frame_idx int, frame_digest string"
    )


MM_FRAME_SAMPLE_SQL = """
    SELECT doc_id, CAST(p AS INTEGER) AS frame_idx,
           md5(substr(text, (p - 1) * 16 + 1, 16)) AS frame_digest
    FROM documents,
         unnest(generate_series(1, CAST(ceil(length(text) / 16.0) AS BIGINT), 4)) AS t(p)
"""


MM_DECODE_META_SQL = """
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS digest,
           CAST(64 + ('0x' || substr(md5(text), 1, 6))::BIGINT % 512 AS INTEGER) AS width,
           CAST(64 + ('0x' || substr(md5(text), 7, 6))::BIGINT % 512 AS INTEGER) AS height,
           CAST(1 + strlen(text) % 16 AS INTEGER) AS frames,
           (['png','jpg','wav'])[CAST(('0x' || substr(md5(text), 13, 2))::BIGINT % 3 AS INTEGER) + 1] AS fmt
    FROM documents
"""


# --- resize planning ----------------------------------------------------------
# The stage between decode and feature extraction in an image/video
# pipeline: plan the letterboxed target geometry for each asset. Pure
# integer arithmetic over the decoded metadata (fit into TARGET x TARGET
# preserving aspect ratio; scale in basis points so the plan is exact and
# engine-portable) — the actual pixel resample would slot into the same
# mapInPandas plumbing as the decoder. Map-only Catalyst plan.

RESIZE_TARGET = 224


def mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = mm_decode_meta(spark, sf_dir).select("doc_id", "width", "height")
    w, h = F.col("width").cast("long"), F.col("height").cast("long")
    t = F.lit(RESIZE_TARGET).cast("long")
    # scale_bp = floor(10000 * t / max(w, h)): downscale the LONG side to
    # the target; never upscale past 10000 bp (1.0x)
    scale_bp = F.least(F.lit(10000).cast("long"), F.floor(F.lit(10000.0) * t / F.greatest(w, h)))
    out_w = F.floor(w * scale_bp / F.lit(10000.0)).cast("long")
    out_h = F.floor(h * scale_bp / F.lit(10000.0)).cast("long")
    return meta.select(
        "doc_id",
        "width",
        "height",
        scale_bp.alias("scale_bp"),
        out_w.alias("out_w"),
        out_h.alias("out_h"),
        F.floor((t - out_w) / F.lit(2.0)).alias("pad_x"),
        F.floor((t - out_h) / F.lit(2.0)).alias("pad_y"),
    )


MM_RESIZE_PLAN_SQL = f"""
    WITH meta AS ({MM_DECODE_META_SQL}),
    scaled AS (
        SELECT *,
               least(10000, CAST(floor(10000.0 * {RESIZE_TARGET} / greatest(width, height)) AS BIGINT)) AS scale_bp
        FROM meta
    ),
    sized AS (
        SELECT doc_id, width, height, scale_bp,
               CAST(floor(width * scale_bp / 10000.0) AS BIGINT) AS out_w,
               CAST(floor(height * scale_bp / 10000.0) AS BIGINT) AS out_h
        FROM scaled
    )
    -- NB: duckdb's // is NOT floor division on doubles, and its
    -- double->int CAST rounds — floor() explicitly, matching Spark
    SELECT doc_id, width, height, scale_bp, out_w, out_h,
           CAST(floor(({RESIZE_TARGET} - out_w) / 2.0) AS BIGINT) AS pad_x,
           CAST(floor(({RESIZE_TARGET} - out_h) / 2.0) AS BIGINT) AS pad_y
    FROM sized
"""


# --- audio chunking -----------------------------------------------------------
# The audio-pipeline analog of frame sampling: split each asset's sample
# stream into fixed-length windows with 50% overlap (the standard STFT /
# whisper-style chunk grid). One row per (asset, chunk) with the chunk's
# span and content digest. Pure expression — explode(sequence) +
# substring + md5 in whole-stage codegen, no Python in the row path; a
# real resampler/feature extractor slots into the same mapInPandas
# plumbing as the decoder (mm_decode_meta). Generator output is bounded:
# ~2 rows per hop-length of input, the same blowup discipline as the
# shingle explode in textops.

CHUNK_LEN = 400    # samples per chunk (bytes of the virtual stream)
CHUNK_HOP = 200    # hop = 50% overlap


def mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    n = F.length("text")
    seq = F.sequence(
        F.lit(0), F.ceil(n / F.lit(float(CHUNK_HOP))).cast("int") - 1
    )
    ex = docs.filter(n > 0).select("doc_id", "text", F.explode(seq).alias("__i"))
    start = F.col("__i") * CHUNK_HOP + 1
    chunk = F.substring(F.col("text"), start, F.lit(CHUNK_LEN))
    return ex.select(
        "doc_id",
        F.col("__i").cast("int").alias("chunk_idx"),
        start.cast("long").alias("start_pos"),
        F.length(chunk).cast("long").alias("chunk_len"),
        F.md5(chunk).alias("chunk_digest"),
    )


MM_AUDIO_CHUNKS_SQL = f"""
    SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
           CAST(i * {CHUNK_HOP} + 1 AS BIGINT) AS start_pos,
           CAST(strlen(substr(text, i * {CHUNK_HOP} + 1, {CHUNK_LEN})) AS BIGINT)
               AS chunk_len,
           md5(substr(text, i * {CHUNK_HOP} + 1, {CHUNK_LEN})) AS chunk_digest
    FROM documents,
         unnest(generate_series(
             0, CAST(ceil(strlen(text) / {CHUNK_HOP}.0) AS BIGINT) - 1, 1
         )) AS t(i)
    WHERE strlen(text) > 0
"""
