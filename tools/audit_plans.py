"""Scale-readiness plan audit: run every registry query at a small SF and
flag physical-plan shapes that do NOT survive a 100× scale-up:

  * CartesianProduct            — all-pairs, never acceptable
  * BroadcastNestedLoopJoin     — acceptable ONLY when the build side is a
                                  scalar/stats aggregate (a handful of rows
                                  by construction, e.g. a global (sum, n)
                                  pair); flagged otherwise
  * Exchange SinglePartition    — a global funnel; acceptable ONLY for
                                  final ORDER BY + LIMIT top-k heads or
                                  scalar aggregates, where the single
                                  partition receives k (or 1) rows per
                                  upstream partition, not the data

Each flag is either ALLOWED (with the per-query justification below) or
a FINDING. Exit code 1 on any finding — wired for CI use. Usage:

    python tools/audit_plans.py [sf_dir] [name ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

# query -> (flag -> justification). A flag hit without an entry here is a
# finding. Keep justifications honest: they state WHY the shape is O(small)
# at any SF, not that it is fast today.
ALLOW: dict[str, dict[str, str]] = {
    # scalar/stats broadcast: build side is an ungrouped aggregate (1 row)
    "customers_no_orders": {
        "BroadcastNestedLoopJoin": "build side is the global (sum,n) scalar aggregate — 1 row at any SF",
        "Exchange SinglePartition": "fan-in OF that scalar aggregate — 1 partial row per upstream partition",
    },
    "top_supplier": {
        "BroadcastNestedLoopJoin": "build side is the global max(rev) scalar — 1 row at any SF",
        "Exchange SinglePartition": "fan-in of the max(rev) scalar — 1 partial row per upstream partition",
    },
    # ungrouped final aggregates: the single partition receives one
    # partially-aggregated row per upstream partition, never the data
    "promo_revenue": {"Exchange SinglePartition": "ungrouped final aggregate — 1 partial row per partition"},
    "disjunctive_revenue": {"Exchange SinglePartition": "ungrouped final aggregate — 1 partial row per partition"},
    "user_activity_deciles": {
        "Exchange SinglePartition": "global ntile window over the ALREADY per-user-aggregated relation (1 row/user; decile boundaries switch to percentile ranks at extreme user cardinality — noted in the docstring)",
    },
    "doc_bm25_search": {
        "BroadcastNestedLoopJoin": "build side is the corpus-stats scalar aggregate (N, S, df0..df2) — 1 row at any SF",
        "Exchange SinglePartition": "fan-in of that scalar aggregate + the top-k head — O(1) rows per partition",
    },
    "important_parts": {
        "BroadcastNestedLoopJoin": "build side is the global sum(value) scalar aggregate — 1 row at any SF",
        "Exchange SinglePartition": "fan-in of that scalar aggregate — 1 partial row per upstream partition",
    },
    "filtered_revenue": {"Exchange SinglePartition": "ungrouped final aggregate — 1 partial row per partition"},
    "small_qty_revenue": {"Exchange SinglePartition": "ungrouped final aggregate — 1 partial row per partition"},
    # ANN probe joins: the BROADCAST side is the probe set — a fixed-size
    # query constant (vec_id < N_PROBES / one centroid-window of ids), so
    # the nested loop streams the corpus once against O(1) probes; the
    # non-equi condition (q_id != cand_id) is what forces BNLJ over BHJ
    "emb_cosine_topk": {
        "BroadcastNestedLoopJoin": "build side = fixed probe set (N_PROBES=8 ids, a query constant)",
        "Exchange SinglePartition": "top-k head over |probes|×k rows",
    },
    "emb_ivf_topk": {
        "BroadcastNestedLoopJoin": "build side = fixed probe set routed to its centroid buckets — O(probes) rows",
    },
    "emb_ivf_recall": {
        "BroadcastNestedLoopJoin": "build side = fixed probe window (N_CENTROIDS ids) for the exact-baseline leg",
    },
    "emb_sq_recall": {
        "BroadcastNestedLoopJoin": "build side = fixed probe set (N_PROBES ids) for the exact-baseline leg",
    },
    "emb_ivf_index_recall": {
        "BroadcastNestedLoopJoin": "build side = fixed probe window (8 ids) for the exact-baseline leg; the INDEX leg under audit is a cell equi-join over probed cells only",
    },
    "emb_sq_topk": {
        "BroadcastNestedLoopJoin": "build side = fixed probe set (N_PROBES=8 ids) against the 4-bit code table",
    },
    "doc_domain_mix": {
        "BroadcastNestedLoopJoin": "build side is the global quota scalar aggregate — |sources| rows (bounded enum)",
        "Exchange SinglePartition": "quota scalar aggregate — |sources| rows",
    },
    "doc_quality_funnel": {
        "Exchange SinglePartition": "final stage-count scalar aggregate — 4 rows (one per funnel stage)",
    },
    "events_distinct_sketch": {
        "Exchange SinglePartition": "sketch fan-in — k=256 minima per partition, fixed-size by construction",
    },
    "emb_kmeans": {
        "Exchange SinglePartition": "Lloyd centroid reduce — k×65 longs per iteration (MLlib treeAggregate shape)",
    },
    # final ORDER BY + LIMIT heads: single partition sees k rows per
    # upstream partition (TakeOrderedAndProject when Spark plans it, an
    # explicit global sort head otherwise)
    "top_orders_by_revenue": {"Exchange SinglePartition": "final top-k head (LIMIT 10)"},
    "returned_item_revenue": {"Exchange SinglePartition": "final top-k head (LIMIT 20)"},
    "shipping_priority": {"Exchange SinglePartition": "final top-k head (LIMIT 10)"},
    "large_volume_orders": {"Exchange SinglePartition": "final top-k head (LIMIT 100)"},
}

FLAG_RES = {
    "CartesianProduct": re.compile(r"CartesianProduct"),
    "BroadcastNestedLoopJoin": re.compile(r"BroadcastNestedLoopJoin"),
    "Exchange SinglePartition": re.compile(r"Exchange SinglePartition"),
}


def audit(plan: str) -> list[str]:
    final = plan.split("== Initial Plan ==")[0]
    return [name for name, rx in FLAG_RES.items() if rx.search(final)]


def main() -> int:
    from etl_spark.session import get_spark
    from etl_spark.queries import REGISTRY

    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1 and "/" in sys.argv[1]
        else "/root/testdata/sf0.01"
    )
    only = [a for a in sys.argv[1:] if "/" not in a]
    spark = get_spark()
    findings = 0
    for name, (fn, _sql) in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            df.collect()  # finalize AQE so the audited plan is the real one
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — report, keep auditing
            print(f"ERR  {name}: {e}")
            findings += 1
            continue
        hits = audit(plan)
        if not hits:
            print(f"ok   {name}")
            continue
        for h in hits:
            just = ALLOW.get(name, {}).get(h)
            if just:
                print(f"ok   {name}: {h} ALLOWED — {just}")
            else:
                print(f"FIND {name}: {h} — not allowlisted")
                findings += 1
    print(f"\n{findings} findings")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
