"""Persisted near-dup index (cdc/neardup.py): the content-level seen-set.

Batches are admitted one at a time; each arriving batch must be checked
against everything previously indexed WITHOUT re-hashing the corpus, and
the union of per-batch findings must equal a one-shot LSH pass over all
docs with the same parameters (restricted to pairs whose later doc flags
them — the gate's orientation)."""

import pytest

from etl_spark.cdc.neardup import NearDupIndex

BASE = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "completely unrelated text about spark shuffle partitions and joins"),
    (3, "a third document with its own distinct and unique set of words here"),
]
BATCH2 = [
    # near-dup of doc 1 (one word changed)
    (10, "the quick brown fox jumps over the lazy cat near the river bank"),
    # fresh content
    (11, "yet another novel document mentioning bloom filters and manifests"),
    # two in-batch near-dups of each other
    (12, "incremental view maintenance scopes work to the affected keys only"),
    (13, "incremental view maintenance scopes work to the affected keys too"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gate_finds_cross_batch_and_in_batch_dups(spark, tmpdir_path):
    idx = NearDupIndex(tmpdir_path + "/ndi")
    first = idx.check_and_add(spark, _df(spark, BASE))
    assert first.count() == 0  # distinct corpus seeds cleanly
    assert idx.n_docs == 3

    dups = idx.check_and_add(spark, _df(spark, BATCH2)).collect()
    pairs = {(r["doc_id"], r["dup_of"]) for r in dups}
    assert (10, 1) in pairs          # cross-batch: new doc vs corpus
    assert (12, 13) in pairs         # in-batch pair (doc_id < dup_of)
    assert all(r["est_jaccard"] >= 0.5 for r in dups)
    flagged = {r["doc_id"] for r in dups} | {r["dup_of"] for r in dups}
    assert 11 not in flagged and 2 not in flagged and 3 not in flagged
    assert idx.n_docs == 7


def test_check_does_not_mutate_and_add_is_atomic(spark, tmpdir_path):
    idx = NearDupIndex(tmpdir_path + "/ndi")
    idx.add(spark, _df(spark, BASE))
    n0 = idx.n_docs
    idx.find_dups(spark, _df(spark, BATCH2)).count()
    assert idx.n_docs == n0  # probe-only
    # a crashed append (segment written, pointer not swapped) is invisible:
    # simulate by writing a stray directory
    import os
    os.makedirs(tmpdir_path + "/ndi/seg-deadbeef", exist_ok=True)
    assert idx.n_docs == n0


def test_shingleless_docs_pass_the_gate(spark, tmpdir_path):
    """Docs under 3 words can't shingle — they are admitted (and not
    indexed) rather than erroring or blocking the batch."""
    idx = NearDupIndex(tmpdir_path + "/ndi")
    out = idx.check_and_add(spark, _df(spark, [(1, "hi"), (2, "hi")]))
    assert out.count() == 0
    assert idx.n_docs == 0


def test_emb_gate_cross_batch_and_in_batch(spark, tmpdir_path):
    """EmbNearDupIndex: a vector nearly parallel to an indexed one is
    flagged on arrival; orthogonal ones pass."""
    from etl_spark.cdc.neardup import EmbNearDupIndex

    def vec(*pattern):
        # 64-dim from an 8-dim pattern tiled
        return [float(pattern[i % len(pattern)]) for i in range(64)]

    b1 = spark.createDataFrame(
        [(1, vec(1, 0, 0, 0, 1, 0, 0, 0)), (2, vec(0, 1, 0, 0, 0, 1, 0, 0))],
        "vec_id long, embedding array<float>",
    )
    b2 = spark.createDataFrame(
        [
            (9, vec(1, 0.05, 0, 0, 1, 0.05, 0, 0)),   # ~parallel to 1
            (10, vec(0, 0, 1, 0, 0, 0, 1, 0)),        # orthogonal to all
            (11, vec(0, 0, 1, 0.01, 0, 0, 1, 0.01)),  # ~parallel to 10
        ],
        "vec_id long, embedding array<float>",
    )
    idx = EmbNearDupIndex(tmpdir_path + "/endi")
    assert idx.check_and_add(spark, b1, threshold=0.9).count() == 0
    assert idx.n_docs == 2
    dups = idx.check_and_add(spark, b2, threshold=0.9).collect()
    pairs = {(r["vec_id"], r["dup_of"]) for r in dups}
    assert (9, 1) in pairs and (10, 11) in pairs
    assert all(r["cos4"] >= 0.9 for r in dups)
    flagged = {x for p in pairs for x in p}
    assert 2 not in flagged
    assert idx.n_docs == 5
