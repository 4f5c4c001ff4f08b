"""Partial-update (patch) CDC events — per-column last-writer-wins.

Real change feeds carry SPARSE updates (Debezium partial row images, Mongo
``$set``, application-level field patches): an event sets only the columns
it names and leaves the rest alone. The reference's analog is the
substitution chain that fills individual fields of an existing row from a
later-arriving source (meta-file conn-spec merged into snaplog rows,
/root/reference/parser/ndt_meta.go:75-110, SubstituteString fixups,
/root/reference/parser/ndt.go:634-714). This module lifts that to the CDC
contract:

  op = 'P'  — payload columns that are NULL mean "unchanged"; non-NULL
              columns are set. A patch on an absent/deleted key upserts a
              row holding just the patched fields (Mongo upsert-``$set``).
  I/U       — full-row images: set EVERY payload column (including to NULL).
  D         — delete dominance: kills every setter older than it; fields
              survive only from events newer than the newest delete.

Resolution is DECLARATIVE — no per-event fold, one hash aggregation:

  m_d      = max ord over D events                  (ord = (ts, op_seq))
  value_c  = value of the max-ord event among {I, U, P-with-c-set} that is
             newer than m_d  (full images "set NULL" and therefore beat
             older patches; patches only beat what they name)
  row exists iff any non-D event is newer than m_d; its (ts, op_seq) is
  the max non-D ord — so downstream whole-row LWW ordering stays correct.

Cross-batch correctness comes from the VIRTUAL-EVENT trick: the committed
table row (or tombstone) of each touched key joins the aggregation as one
more event — op 'U' (or 'D') at its stored (ts, op_seq). The single pass
then IS the merge: in-batch combine, read-modify-write against the base,
carry-through of untouched keys, and stale-patch skipping (a patch older
than the stored row loses per-column to the virtual full image) all fall
out of the same max() semantics. Scale shape: one key-hash exchange over
(batch ∪ touched-bucket rows) with map-side partial aggregation — the
same wiring as the COW merge join, with skew collapsed by the partials.

Cross-batch contract: the committed row is a FULL image at its winning
(ts, op_seq) — per-column provenance ords are deliberately not persisted
(no MERGE-based lake engine persists them). Within a batch, arbitrary
disorder resolves exactly; across batches, the binlog contract applies —
segments are contiguous chunks of a totally-ordered log, so a key's
events never ts-regress between segments. A patch that nevertheless
arrives OLDER than the committed row is stale-skipped whole-row (tested),
the same conservative answer Iceberg MERGE gives a late sparse update.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from etl_spark.schema import KEY_COLS

PATCH_OP = "P"


def _ord() -> Column:
    return F.struct(F.col("ts").alias("ts"), F.col("op_seq").alias("seq"))


def _sord(s: str) -> Column:
    """(ts, seq) of a packed setter struct, for comparisons against ords."""
    return F.struct(F.col(f"{s}.ts").alias("ts"), F.col(f"{s}.seq").alias("seq"))


def resolve_events(
    events: DataFrame,
    payload_cols: list[str],
    virtual_col: str | None = None,
    carry_cols: list[str] | None = None,
    patched_cols: set[str] | None = None,
    cluster_col: str | None = None,
) -> DataFrame:
    """One row per key: the per-column-LWW final state of ``events``.

    ``events`` columns: KEY_COLS + op + ts + op_seq + payload_cols
    (+ ``carry_cols`` provenance columns, + optional ``virtual_col``
    BOOLEAN marking committed-state rows).

    Output: KEY_COLS, op ('U' live / 'D' tombstone), ts, op_seq (both from
    the winning event — max non-D ord for live rows, max D ord for
    tombstones), payload_cols, ``carry_cols`` taken from that same winning
    event, and — when ``virtual_col`` is given — ``__disp`` with the
    whole-row merge's vocabulary (carried / inserted / updated / deleted /
    stale_skipped).

    ``patched_cols``: the set of payload columns that any patch event in
    ``events`` actually sets (None = unknown, treat all as patchable).
    Columns OUTSIDE the set can only be written by full-image events —
    which set every column from the same winning event — so they all
    share ONE packed aggregate (``__p_full``) instead of one buffer per
    column. A 50-column table whose batch patches 2 columns carries 3
    payload aggregation buffers instead of 50.

    ``cluster_col``: a column FUNCTIONAL IN THE KEY (e.g. the table
    bucket's shuffle slot) that the input is already hash-partitioned
    by. Added to the groupBy: HashPartitioning(cluster_col) satisfies
    the aggregate's ClusteredDistribution(cluster_col, *KEY_COLS), so
    Catalyst inserts NO exchange and the output keeps the bucket
    clustering — the downstream bucket-partitioned write needs no
    second exchange either (same one-shuffle shape as
    cdc/dedup.lww_dedup_clustered). Not included in the output.
    """
    carry_cols = carry_cols or []
    has_virtual = virtual_col is not None
    virt = F.col(virtual_col) if has_virtual else F.lit(False)
    is_d = F.col("op") == "D"
    is_full = F.col("op").isin("I", "U")
    patched = (
        list(payload_cols) if patched_cols is None
        else [c for c in payload_cols if c in patched_cols]
    )
    unpatched = [c for c in payload_cols if c not in set(patched)]

    def _packed(cols: list[Column]) -> Column:
        return F.struct(
            F.col("ts").alias("ts"), F.col("op_seq").alias("seq"), *cols
        )

    prov = [F.col(c).alias(c) for c in carry_cols]
    aggs = [
        F.max(F.when(is_d, _packed(prov))).alias("__p_d"),
        F.max(F.when(~is_d, _packed(prov))).alias("__p_nd"),
    ]
    for c in patched:
        setter = is_full | ((F.col("op") == PATCH_OP) & F.col(c).isNotNull())
        aggs.append(
            F.max(F.when(setter, _packed([F.col(c).alias("v")]))).alias(f"__s_{c}")
        )
    if unpatched:
        aggs.append(
            F.max(
                F.when(is_full, _packed([F.col(c).alias(f"v_{c}") for c in unpatched]))
            ).alias("__p_full")
        )
    if has_virtual:
        aggs += [
            F.max(F.when(virt, _ord())).alias("__t_ord"),
            F.max(F.when(~virt, F.lit(1)).otherwise(F.lit(0))).alias("__has_batch"),
        ]

    group_cols = ([cluster_col] if cluster_col else []) + list(KEY_COLS)
    g = events.groupBy(*group_cols).agg(*aggs)

    # (ts, seq) prefixes order the packed structs: max __p_* is the packed
    # image of the max-ord event (op_seq is unique, so provenance fields
    # never participate in the comparison)
    m_d, m_nd = _sord("__p_d"), _sord("__p_nd")
    m_d = F.when(F.col("__p_d").isNotNull(), m_d)
    m_nd = F.when(F.col("__p_nd").isNotNull(), m_nd)
    exists = m_nd.isNotNull() & (m_d.isNull() | (m_nd > m_d))
    g = g.withColumn("__exists", exists).withColumn(
        "__final", F.when(exists, F.col("__p_nd")).otherwise(F.col("__p_d"))
    )
    ex = F.col("__exists")

    out = [F.col(k) for k in KEY_COLS]
    out.append(F.when(ex, F.lit("U")).otherwise(F.lit("D")).alias("op"))
    out += [
        F.col("__final.ts").alias("ts"),
        F.col("__final.seq").alias("op_seq"),
    ]
    full_alive = (
        F.col("__p_full").isNotNull() & (m_d.isNull() | (_sord("__p_full") > m_d))
        if unpatched else None
    )
    for c in payload_cols:
        if c in set(patched):
            s = f"__s_{c}"
            alive = F.col(s).isNotNull() & (m_d.isNull() | (_sord(s) > m_d))
            out.append(F.when(ex & alive, F.col(f"{s}.v")).alias(c))
        else:
            out.append(F.when(ex & full_alive, F.col(f"__p_full.v_{c}")).alias(c))
    out += [F.col(f"__final.{c}").alias(c) for c in carry_cols]

    if has_virtual:
        t_ord = F.col("__t_ord")
        final_ord = F.struct(
            F.col("__final.ts").alias("ts"), F.col("__final.seq").alias("seq")
        )
        # unchanged ⇔ the winning ord IS the committed row's ord (any newer
        # batch event would have raised the winning ord past it)
        unchanged = t_ord.isNotNull() & final_ord.eqNullSafe(t_ord)
        disp = (
            F.when(F.col("__has_batch") == 0, F.lit("carried"))
            .when(unchanged, F.lit("stale_skipped"))
            .when(~ex, F.lit("deleted"))
            .when(t_ord.isNull(), F.lit("inserted"))
            .otherwise(F.lit("updated"))
        )
        out.append(disp.alias("__disp"))

    return g.select(*out)
