"""Property-based test of the core CDC invariant: the final table state is
a pure function of the event SET — independent of arrival order, batch
grouping, and merge mode — and equals the brute-force LWW reduction
(group by key, keep max-(ts, op_seq), drop deletes).

Deliberately coarse timestamps (0-3 distinct values) force ts ties so the
op_seq tiebreaker is exercised on most runs; deletes interleave with
reinserts. Mirrors the reference's downstream dedup contract
(/root/reference/parser/parser.go:150-176) under adversarial orderings the
reference itself would panic on (/root/reference/parser/ndt.go:226-238).
"""

import datetime as dt
import uuid

from hypothesis import HealthCheck, given, settings, strategies as st

from etl_spark.cdc.apply import apply_batch
from etl_spark.lake.table import LakeTable
from etl_spark.schema import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA

BASE = dt.datetime(2024, 1, 1)

event_st = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.integers(min_value=0, max_value=3),      # coarse ts → frequent ties
    st.sampled_from(["c0", "c1", "c2"]),
    st.integers(min_value=0, max_value=2),      # turn_idx
    st.text(alphabet="abc", min_size=0, max_size=4),
)


def _rows(events):
    rows = []
    for op_seq, (op, ts_off, conv, turn, text) in enumerate(events):
        dead = op == "D"
        rows.append((
            op, BASE + dt.timedelta(seconds=ts_off), op_seq, conv, turn,
            None if dead else "user", None if dead else text, None,
            f"f{op_seq}",
        ))
    return rows


def _expected(rows):
    best = {}
    for op, ts, op_seq, conv, turn, role, text, tool, _src in rows:
        k = (conv, turn)
        if k not in best or (ts, op_seq) > (best[k][1], best[k][2]):
            best[k] = (op, ts, op_seq, role, text)
    return sorted(
        (k[0], k[1], v[3], v[4], v[1])
        for k, v in best.items() if v[0] != "D"
    )


def _replay(spark, path, rows, grouping, mode):
    t = LakeTable.create(path, TRANSCRIPT_SCHEMA, n_buckets=4)
    n_groups = max(grouping) + 1 if grouping else 1
    for g in range(n_groups):
        batch = [r for r, grp in zip(rows, grouping) if grp == g]
        if batch:
            apply_batch(
                spark, t, spark.createDataFrame(batch, CHANGE_SCHEMA),
                f"b{g}", mode=mode,
            )
    return sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["ts"])
        for r in t.read(spark).collect()
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(event_st, min_size=1, max_size=25),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_final_state_is_order_and_grouping_invariant(
    spark, tmpdir_path, events, seed
):
    rows = _rows(events)
    want = _expected(rows)

    # unique table dirs per example: the fixture tmpdir is shared across
    # hypothesis examples, and create() refuses to overwrite a table
    uniq = uuid.uuid4().hex
    # grouping A: sequential thirds, in order; mode cow
    ga = [min(i * 3 // max(1, len(rows)), 2) for i in range(len(rows))]
    got_a = _replay(spark, f"{tmpdir_path}/a{uniq}", rows, ga, "cow")
    # grouping B: hash-scattered batches over REVERSED rows; mode mor
    rev = list(reversed(rows))
    gb = [(seed + i * 2654435761) % 3 for i in range(len(rev))]
    got_b = _replay(spark, f"{tmpdir_path}/b{uniq}", rev, gb, "mor")

    assert got_a == want
    assert got_b == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(event_st, min_size=1, max_size=25),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_incremental_mv_equals_full_recompute(spark, tmpdir_path, events, seed):
    """MV property: after ANY sequence of batches (random grouping, MOR),
    refreshing the MV incrementally after EVERY commit leaves it equal to
    a from-scratch aggregation of the final state — updates, ts-tie
    op_seq winners, and full-conversation deletes included."""
    from etl_spark.lake.mv import ConvSummaryMV, conv_summary

    rows = _rows(events)
    uniq = uuid.uuid4().hex
    t = LakeTable.create(f"{tmpdir_path}/t{uniq}", TRANSCRIPT_SCHEMA, n_buckets=4)
    mv = ConvSummaryMV(f"{tmpdir_path}/mv{uniq}")
    grouping = [(seed + i * 2654435761) % 3 for i in range(len(rows))]
    for g in range(3):
        batch = [r for r, grp in zip(rows, grouping) if grp == g]
        if batch:
            apply_batch(
                spark, t, spark.createDataFrame(batch, CHANGE_SCHEMA),
                f"b{g}", mode="mor",
            )
            mv.refresh(spark, t)
    got = sorted(map(tuple, mv.read(spark).collect()))
    want = sorted(map(tuple, conv_summary(t.read(spark)).collect()))
    assert got == want
