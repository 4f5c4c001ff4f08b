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
    # components (the 100 TB dup-graph safety property) — both algorithms
    import pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="max_steps"):
        connected_components_labels(pairs, max_steps=3, algorithm="propagate")
    with pytest.raises(RuntimeError, match="max_steps"):
        connected_components_labels(pairs, max_steps=1, algorithm="star")
    with pytest.raises(ValueError, match="unknown CC algorithm"):
        connected_components_labels(pairs, algorithm="bogus")


def test_star_converges_on_chain_far_beyond_step_budget(spark):
    """The O(log n) claim, mechanically: a 200-hop path (diameter 199,
    ~6x the default step budget) converges under large-star/small-star
    within the DEFAULT max_steps — where min-label propagation would
    exhaust — and labels every node with the component min."""
    import pytest

    n = 200
    rows = [(i, i + 1) for i in range(1, n)]
    pairs = spark.createDataFrame(rows, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["label"]
        for r in connected_components_labels(pairs, algorithm="star").collect()
    }
    assert got == {i: 1 for i in range(1, n + 1)}
    with pytest.raises(RuntimeError, match="max_steps"):
        connected_components_labels(pairs, algorithm="propagate")


def test_star_equals_propagate_on_random_graph(spark):
    """Cross-check the two algorithms on a deterministic pseudo-random
    graph (mixed component sizes, cycles, singleton-adjacent nodes)."""
    rows = []
    for i in range(400):
        a = (i * 7919) % 300
        b = (i * 104729 + 17) % 300
        if a != b:
            rows.append((a, b))
    pairs = spark.createDataFrame(rows, "doc_a long, doc_b long")
    star = {
        r["doc_id"]: r["label"]
        for r in connected_components_labels(pairs, algorithm="star").collect()
    }
    # the pseudo-random graph's largest component happens to have
    # diameter > 32, so give propagate the budget it needs — star used
    # the DEFAULT budget, which is the point of the comparison
    prop = {
        r["doc_id"]: r["label"]
        for r in connected_components_labels(
            pairs, max_steps=400, algorithm="propagate"
        ).collect()
    }
    assert star == prop and star


def test_auto_falls_back_to_star_on_deep_chain(spark):
    # default path: quick propagate exhausts on a 100-hop chain, star
    # finishes the job — callers never see the fallback
    n = 100
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["label"]
        for r in connected_components_labels(pairs).collect()
    }
    assert got == {i: 1 for i in range(1, n + 1)}
