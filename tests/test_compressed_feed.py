"""S3/S4 substrate coverage: the same change feed replayed from (a)
gzip-compressed JSON-lines segments and (b) zstd-compressed parquet
segments must produce a final table state identical to the snappy-parquet
replay. The reference ingests gzip member files from tar archives
(/root/reference/storage/storage.go:77-121) and leaves codec choice to the
storage layer; here the codec is equally transparent to the apply path —
the scan decompresses, everything downstream is identical.
"""

import gzip
import os

import pandas as pd
import pytest

from etl_spark.cdc.apply import replay_feed
from etl_spark.cdc.gen import change_feed_df, write_feed
from etl_spark.lake.table import LakeTable
from etl_spark.schema import TRANSCRIPT_SCHEMA

GEN = dict(
    n_events=4000, n_convs=100, max_turns=10, seed=11,
    skew=2.0, delete_ratio=0.08, dup_ratio=0.06, ooo_ratio=0.15, n_batches=3,
)

ORDER = ["conv_id", "turn_idx"]


def _final_state(spark, tmpdir_path, sub: str, fmt: str, codec=None) -> pd.DataFrame:
    feed_dir = os.path.join(tmpdir_path, f"feed_{sub}")
    write_feed(change_feed_df(spark, **GEN), feed_dir, fmt=fmt, codec=codec,
               n_batches=GEN["n_batches"])
    t = LakeTable.create(
        os.path.join(tmpdir_path, f"lake_{sub}"), TRANSCRIPT_SCHEMA, n_buckets=8
    )
    stats = replay_feed(spark, t, feed_dir)
    assert len(stats) == GEN["n_batches"]
    return (
        t.read(spark).toPandas().sort_values(ORDER).reset_index(drop=True)
    )


def test_jsonl_gz_and_zstd_replay_match_snappy(spark, tmpdir_path):
    base = _final_state(spark, tmpdir_path, "snappy", "parquet")
    zstd = _final_state(spark, tmpdir_path, "zstd", "parquet", codec="zstd")
    jsonl = _final_state(spark, tmpdir_path, "jsonl", "jsonl")

    # the written segments really are what they claim to be
    seg0 = os.path.join(tmpdir_path, "feed_jsonl", "batch=00000")
    gz = [f for f in os.listdir(seg0) if f.endswith(".json.gz")]
    assert gz, os.listdir(seg0)
    with gzip.open(os.path.join(seg0, gz[0]), "rt") as fh:
        first = fh.readline()
    assert '"conv_id"' in first and '"op"' in first

    zseg0 = os.path.join(tmpdir_path, "feed_zstd", "batch=00000")
    assert any(".zstd." in f or f.endswith(".zstd.parquet")
               for f in os.listdir(zseg0)), os.listdir(zseg0)

    for name, got in (("zstd", zstd), ("jsonl_gz", jsonl)):
        assert len(got) == len(base), name
        for col in base.columns:
            g, w = got[col], base[col]
            if col == "ingest_ts":  # wall-clock system column, differs by run
                continue
            if str(g.dtype).startswith("datetime"):
                g = pd.to_datetime(g).dt.tz_localize(None)
                w = pd.to_datetime(w).dt.tz_localize(None)
            mism = (g.fillna("§") != w.fillna("§")) if g.dtype == object else (g != w)
            mism = mism & ~(g.isna() & w.isna())
            assert not mism.any(), f"{name}.{col}: {int(mism.sum())} mismatches"


def test_json_segments_never_infer_schema(spark, tmpdir_path):
    """A malformed JSON line lands as nulls under the explicit schema and is
    counted `failed` by validation — not silently inferred into a divergent
    schema (the reference's row-level error accounting,
    /root/reference/etl/etl.go:20-35)."""
    feed_dir = os.path.join(tmpdir_path, "feed_bad")
    seg = os.path.join(feed_dir, "batch=00000")
    os.makedirs(seg)
    good = (
        '{"op":"I","ts":"2024-01-01T00:00:00.000000Z","op_seq":1,'
        '"conv_id":"c1","turn_idx":0,"role":"user","text":"hi","tool":null,'
        '"source_file":"seg-00000"}'
    )
    bad = '{"op":"I","ts":"not-a-timestamp","op_seq":"x"}'
    with gzip.open(os.path.join(seg, "part-0.json.gz"), "wt") as fh:
        fh.write(good + "\n" + bad + "\n")
    t = LakeTable.create(os.path.join(tmpdir_path, "lake_bad"), TRANSCRIPT_SCHEMA,
                         n_buckets=4)
    stats = replay_feed(spark, t, feed_dir, fail_threshold=0.9)
    assert len(stats) == 1
    assert stats[0].events_in == 2
    assert stats[0].failed == 1
    assert stats[0].inserted == 1
