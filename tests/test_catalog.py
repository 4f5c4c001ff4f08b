"""LakeCatalog: namespace → table routing (SURVEY §2 K5)."""

import os

import pytest

from etl_spark.lake import LakeCatalog, LakeTable, TableNotFoundError
from etl_spark.schema import TRANSCRIPT_SCHEMA


def test_catalog_roundtrip(tmp_path, spark):
    cat = LakeCatalog(str(tmp_path / "lake"))
    cat.create_namespace("raw")
    t = cat.create_table("raw.transcripts", TRANSCRIPT_SCHEMA, n_buckets=4)
    assert isinstance(t, LakeTable)
    cat.create_table("raw.transcripts_v2", TRANSCRIPT_SCHEMA)
    cat.create_table("curated.transcripts", TRANSCRIPT_SCHEMA)

    assert cat.list_namespaces() == ["curated", "raw"]
    assert cat.list_tables() == [
        "curated.transcripts",
        "raw.transcripts",
        "raw.transcripts_v2",
    ]
    assert cat.list_tables("raw") == ["raw.transcripts", "raw.transcripts_v2"]

    # load routes to the same path; a real merge works through it
    t2 = cat.load_table("raw.transcripts")
    assert t2.path == t.path
    assert t2.n_buckets == 4

    with pytest.raises(FileExistsError):
        cat.create_table("raw.transcripts", TRANSCRIPT_SCHEMA)
    with pytest.raises(TableNotFoundError):
        cat.load_table("raw.nope")
    with pytest.raises(ValueError):
        cat.load_table("no_namespace")
    with pytest.raises(ValueError):
        cat.create_table("raw.bad-name", TRANSCRIPT_SCHEMA)

    same = cat.create_if_not_exists("raw.transcripts", TRANSCRIPT_SCHEMA)
    assert same.path == t.path

    cat.drop_table("raw.transcripts_v2", purge=True)
    assert cat.list_tables("raw") == ["raw.transcripts"]
    assert not os.path.exists(cat.table_path("raw.transcripts_v2"))


def test_catalog_apply_through_catalog(tmp_path, spark):
    """End-to-end: replay a feed into a catalog-resolved table."""
    from etl_spark.cdc import change_feed_df, write_feed, replay_feed

    cat = LakeCatalog(str(tmp_path / "lake"))
    table = cat.create_table("raw.transcripts", TRANSCRIPT_SCHEMA, n_buckets=4)
    feed = str(tmp_path / "feed")
    write_feed(
        change_feed_df(spark, n_events=2000, n_convs=50, max_turns=8, seed=3,
                       n_batches=2),
        feed, n_batches=2,
    )
    replay_feed(spark, table, feed)
    n = cat.load_table("raw.transcripts").read(spark).count()
    assert n > 0
