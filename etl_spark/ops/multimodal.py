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
    """Frame-sampling plumbing: treat each document as a virtual media
    stream of 16-char frames, emit every 4th frame's digest through a
    one-to-many mapInPandas (the UDTF shape a real video frame sampler
    uses: one input row → N frame rows, batch-wise in Arrow)."""
    import math

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digests = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n_frames = math.ceil(len(text) / 16)
                for p in range(1, n_frames + 1, 4):
                    frame = text[(p - 1) * 16 : (p - 1) * 16 + 16]
                    ids.append(doc_id)
                    idxs.append(p)
                    digests.append(hashlib.md5(frame.encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_digest": pd.Series(digests, dtype="object"),
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
