"""Property-based test of the patch resolver: resolve_events equals a
brute-force Python fold for ANY event multiset — per-column last-setter-
wins with delete dominance, patches setting only their non-null columns,
full images setting everything (including to NULL).

Coarse timestamps force (ts, op_seq) ties onto the op_seq tiebreaker;
op mixes I/U/D/P with sparse patch payloads. The fold is deliberately the
naive O(n log n) per-key replay — maximally unlike the declarative
aggregation it checks."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st

from etl_spark.cdc.patch import resolve_events

BASE = dt.datetime(2024, 1, 1)

event_st = st.tuples(
    st.sampled_from(["I", "U", "D", "P", "P"]),  # patches over-weighted
    st.integers(min_value=0, max_value=3),       # coarse ts -> ties
    st.sampled_from(["c0", "c1"]),
    st.integers(min_value=0, max_value=1),
    st.one_of(st.none(), st.text(alphabet="ab", min_size=0, max_size=2)),  # role
    st.one_of(st.none(), st.text(alphabet="xy", min_size=0, max_size=2)),  # text
    st.one_of(st.none(), st.text(alphabet="pq", min_size=0, max_size=2)),  # tool
)


def _fold(rows):
    """Naive per-key replay in (ts, op_seq) order."""
    by_key: dict = {}
    for op, ts, seq, cid, turn, role, text, tool in sorted(
        rows, key=lambda r: (r[1], r[2])
    ):
        k = (cid, turn)
        if op == "D":
            by_key[k] = {"deleted": True, "ts": ts, "seq": seq,
                         "role": None, "text": None, "tool": None}
        elif op in ("I", "U"):
            by_key[k] = {"deleted": False, "ts": ts, "seq": seq,
                         "role": role, "text": text, "tool": tool}
        else:  # P: upsert-$set — creates the row if absent/deleted
            cur = by_key.get(k)
            if cur is None or cur["deleted"]:
                cur = {"deleted": False, "ts": ts, "seq": seq,
                       "role": None, "text": None, "tool": None}
            else:
                cur = dict(cur, ts=ts, seq=seq)
            for col, v in (("role", role), ("text", text), ("tool", tool)):
                if v is not None:
                    cur[col] = v
            by_key[k] = cur
    return {
        k: (v["role"], v["text"], v["tool"], v["ts"], v["seq"])
        for k, v in by_key.items()
        if not v["deleted"]
    }


@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(event_st, min_size=1, max_size=24))
def test_resolver_equals_sequential_fold(spark, events):
    # unique op_seq = list position; ts from the coarse bucket. The fold
    # replays in (ts, op_seq) order; the resolver sees ARBITRARY order —
    # equality proves the declarative form is the order-free semantics of
    # the sequential apply (the binlog contract).
    rows = [
        (op, BASE + dt.timedelta(seconds=tsb), i, cid, turn,
         (None if op in ("D",) else role),
         (None if op == "D" else text),
         (None if op == "D" else tool))
        for i, (op, tsb, cid, turn, role, text, tool) in enumerate(events)
    ]
    # full images always set all three columns (possibly to None); that IS
    # the contract. Patches keep their sparse payload. For I/U rows force
    # at least role non-null so "full image" and "all-null patch" differ
    # in the fold too.
    df = spark.createDataFrame(
        [
            (op, ts, seq, cid, turn, role, text, tool)
            for (op, ts, seq, cid, turn, role, text, tool) in rows
        ],
        "op string, ts timestamp, op_seq long, conv_id string, turn_idx int, "
        "role string, text string, tool string",
    )
    got = {
        (r["conv_id"], r["turn_idx"]):
            (r["role"], r["text"], r["tool"], r["ts"], r["op_seq"])
        for r in resolve_events(df, ["role", "text", "tool"])
            .filter("op = 'U'").collect()
    }
    fold_rows = [
        (op, ts, seq, cid, turn, role, text, tool)
        for (op, ts, seq, cid, turn, role, text, tool) in rows
    ]
    want = {
        k: (v[0], v[1], v[2], v[3], v[4])
        for k, v in _fold(
            [(op, ts, seq, cid, turn, role, text, tool)
             for (op, ts, seq, cid, turn, role, text, tool) in fold_rows]
        ).items()
    }
    assert got == want
