"""Connected-components label propagation (duplicate-cluster
canonicalization) — transitivity, singleton, and convergence properties on
crafted edge lists, independent of the MinHash pair generator."""

from __future__ import annotations

from etl_spark.ops.textops import connected_components_labels


def _labels(spark, pair_rows):
    pairs = spark.createDataFrame(pair_rows, "doc_a long, doc_b long")
    out = connected_components_labels(pairs).collect()
    return {r["doc_id"]: r["label"] for r in out}


def test_transitive_chain_collapses_to_one_cluster(spark):
    # 1-2, 2-3, 3-4: a 4-node chain (diameter 3) must all label to 1
    got = _labels(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_components_keep_distinct_labels(spark):
    got = _labels(spark, [(10, 11), (20, 21), (21, 22)])
    assert got == {10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_edge_order_and_direction_are_irrelevant(spark):
    # same component presented with reversed/mixed edge direction
    got = _labels(spark, [(5, 3), (9, 5), (3, 7)])
    assert set(got.values()) == {3}
    assert got[3] == 3 and got[9] == 3


def test_empty_pairs_yield_no_labels(spark):
    got = _labels(spark, [])
    assert got == {}


def test_deep_chain_converges_within_budget(spark):
    # a 20-hop path: min-label propagation moves the min one hop per
    # step, so this needs ~19 steps — well inside the default 32 but deep
    # enough to prove convergence isn't an artifact of tiny diameters
    n = 20
    got = _labels(spark, [(i, i + 1) for i in range(1, n)])
    assert got == {i: 1 for i in range(1, n + 1)}


def test_step_budget_exhaustion_fails_loud(spark):
    # diameter > max_steps must raise, not silently return split
    # components (the 100 TB dup-graph safety property)
    import pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="max_steps"):
        connected_components_labels(pairs, max_steps=3)
