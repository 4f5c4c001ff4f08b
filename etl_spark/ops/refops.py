"""Reference dataflow operators re-expressed over the ``events`` table.

Each query mirrors one operator from SURVEY.md §2 (citations inline), as a
declarative DataFrame plan that Catalyst can push down / prune / codegen.

Determinism: measure sums use DECIMAL(18,2) exact arithmetic, then one cast
to DOUBLE; integer sums are cast to BIGINT on the DuckDB side (its sum()
returns HUGEINT); time math uses microsecond integers (unix_micros /
epoch_us), never second-truncated diffs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


# --- A1: last-element summary reduce (ndt7 "a" record,
#     /root/reference/parser/ndt7_result.go:156-189) -------------------------

def last_event_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: the payload of the latest event by (ts, event_id) plus the
    event count — one hash aggregate (map-side partial max_by), no sort."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("event_type", "value", "ts"),
                F.struct("ts", "event_id"),
            ).alias("__w"),
            F.count("*").alias("n_events"),
        )
        .select(
            "user_id",
            F.col("__w.event_type").alias("last_type"),
            F.col("__w.value").alias("last_value"),
            F.col("__w.ts").alias("last_ts"),
            "n_events",
        )
    )


LAST_EVENT_SUMMARY_SQL = """
    SELECT user_id, event_type AS last_type, value AS last_value,
           ts AS last_ts, n_events
    FROM (
        SELECT *,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_events
        FROM events
    ) WHERE rn = 1
"""


# --- O2/P3: snapshot thinning — every 10th element + always the last
#     (/root/reference/parser/tcpinfo.go:96-110) -----------------------------

def snapshot_thinning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wall = W.partitionBy("user_id")
    return (
        ev.select(
            "user_id", "event_id", "ts",
            F.row_number().over(w).alias("pos"),
            F.count("*").over(wall).alias("__cnt"),
        )
        .filter(((F.col("pos") - 1) % 10 == 0) | (F.col("pos") == F.col("__cnt")))
        .select("user_id", "event_id", "ts", "pos")
    )


SNAPSHOT_THINNING_SQL = """
    SELECT user_id, event_id, ts, pos
    FROM (
        SELECT user_id, event_id, ts,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos,
               count(*) OVER (PARTITION BY user_id) AS cnt
        FROM events
    ) WHERE (pos - 1) % 10 = 0 OR pos = cnt
"""


# --- A2/P7: per-timestamp group-merge of samples (switch parser,
#     /root/reference/parser/switch.go:121-171) ------------------------------

def minute_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.date_trunc("minute", "ts").alias("minute_ts"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.max("event_type").alias("max_type"),
        )
    )


MINUTE_ROLLUP_SQL = """
    SELECT date_trunc('minute', ts) AS minute_ts,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           max(event_type) AS max_type
    FROM events GROUP BY 1
"""


# --- A3: change-point detection over an ordered series
#     (/root/reference/web100/web100.go:590-616) -----------------------------

def changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changed = F.when(
        F.col("event_type") != F.lag("event_type").over(w), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        ev.select("user_id", changed.alias("__c"))
        .groupBy("user_id")
        .agg(F.sum("__c").alias("n_changes"))
    )


CHANGEPOINTS_SQL = """
    SELECT user_id, CAST(sum(c) AS BIGINT) AS n_changes
    FROM (
        SELECT user_id,
               CASE WHEN event_type <> lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) THEN 1 ELSE 0 END AS c
        FROM events
    ) GROUP BY user_id
"""


# --- P8: session grouping (ndt filename-timestamp sessions,
#     /root/reference/parser/ndt.go:210-309) — 30-min-gap sessionization -----

SESSION_GAP_US = 1_800_000_000  # 30 min in microseconds


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet timestamps load as TIMESTAMP_NTZ under Spark 4; exact µs gap
    # between ADJACENT events via timestampdiff (no epoch conversion —
    # matches DuckDB's epoch_us difference over naive timestamps)
    lagged = ev.select(
        "user_id", "ts", "event_id", F.lag("ts").over(w).alias("__lag_ts")
    )
    gap = F.expr("timestampdiff(MICROSECOND, __lag_ts, ts)")
    brk = F.when(
        F.col("__lag_ts").isNull() | (gap > SESSION_GAP_US), F.lit(1)
    ).otherwise(F.lit(0))
    sid = F.sum(brk).over(w.rowsBetween(W.unboundedPreceding, 0))
    return (
        lagged.select("user_id", sid.alias("__sid"))
        .groupBy("user_id")
        .agg(F.max("__sid").alias("n_sessions"), F.count("*").alias("n_events"))
    )


SESSIONIZE_SQL = f"""
    SELECT user_id, CAST(max(sid) AS BIGINT) AS n_sessions, count(*) AS n_events
    FROM (
        SELECT user_id, sum(brk) OVER (
            PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
        ) AS sid
        FROM (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
    ) GROUP BY user_id
"""


# --- A5: per-task error-rate budget (>10% failed ⇒ task error,
#     /root/reference/etl/etl.go:116-117) ------------------------------------

def error_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    n_err = F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), n_err.alias("n_err"))
        .filter(F.col("n_err") * 10 > F.col("n"))
        .select(
            "user_id", "n", "n_err",
            F.round(F.col("n_err").cast("double") / F.col("n"), 4).alias("err_rate"),
        )
    )


ERROR_BUDGET_SQL = """
    SELECT user_id, n, n_err, round(CAST(n_err AS DOUBLE) / n, 4) AS err_rate
    FROM (
        SELECT user_id, count(*) AS n,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_err
        FROM events GROUP BY user_id
    ) WHERE n_err * 10 > n
"""


# --- S6/R7: regex field extraction from semi-structured payloads
#     (path→metadata parsing, /root/reference/etl/globals.go:92-154) ---------

def props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    # '' on no match → try_cast → NULL (same as DuckDB TRY_CAST; plain cast
    # would throw under Spark 4's default ANSI mode)
    k_val = F.regexp_extract(F.col("props"), r"(\d+)", 1).try_cast("long")
    return (
        ev.select("event_type", k_val.alias("__k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("__k").alias("sum_k"),
            F.min("__k").alias("min_k"),
            F.max("__k").alias("max_k"),
        )
    )


PROPS_EXTRACT_SQL = """
    SELECT event_type, count(*) AS n,
           CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
    FROM (
        SELECT event_type,
               TRY_CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS k
        FROM events
    ) GROUP BY event_type
"""


# --- O1/O2: top-k per group with unique tie-break
#     (ordered emit + truncation, /root/reference/parser/switch.go:176-187,
#      parser/ndt.go:493-495) ------------------------------------------------

def top_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        ev.select("user_id", "event_id", "value", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
    )


TOP_EVENTS_PER_USER_SQL = """
    SELECT user_id, event_id, value, rk
    FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rk
        FROM events
    ) WHERE rk <= 3
"""


# --- S7: deterministic work sampling (process every Nth unit by key hash,
#     /root/reference/etl/globals.go:327-345) --------------------------------

def hash_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep events whose md5-derived hash ≡ 0 (mod 8), then aggregate —
    the debug-scale skipCount mode as a pushed-down filter."""
    ev = _events(spark, sf_dir)
    h = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    return (
        ev.filter(h % 8 == 0)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


HASH_SAMPLING_SQL = """
    SELECT event_type, count(*) AS n_sampled,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 8 = 0
    GROUP BY event_type
"""


# --- R5/R6: field masking + value-substitution coalesce chain
#     (/root/reference/parser/ndt7_result.go:90-102 nulling,
#      /root/reference/parser/ndt.go:634-714 SubstituteString) ---------------

def field_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    masked = F.when(
        F.col("event_type") == "error",
        F.regexp_replace(F.col("props"), r"[0-9]", "X"),
    ).otherwise(F.col("props"))
    resolved = F.coalesce(
        F.nullif(F.col("event_type"), F.lit("error")), F.lit("unknown")
    )
    return ev.select(
        "event_id",
        masked.alias("masked_props"),
        resolved.alias("resolved_type"),
    )


FIELD_MASKING_SQL = """
    SELECT event_id,
           CASE WHEN event_type = 'error'
                THEN regexp_replace(props, '[0-9]', 'X', 'g')
                ELSE props END AS masked_props,
           coalesce(nullif(event_type, 'error'), 'unknown') AS resolved_type
    FROM events
"""


# --- §2.8: JSON unmarshal with corrupt-record quarantine
#     (/root/reference/parser/pt.go:233-249 — unmarshal + jsonnet repair
#      fallback; ours: from_json PERMISSIVE, nulls counted, never thrown) ----

def json_props_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    parsed = ev.select(
        "event_type", F.from_json(F.col("props"), "k long").alias("__p")
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("__p.k")).alias("sum_k"),
        F.sum(
            F.when(F.col("__p").isNull() | F.col("__p.k").isNull(), 1).otherwise(0)
        ).alias("n_corrupt"),
    )


JSON_PROPS_PARSE_SQL = """
    SELECT event_type, count(*) AS n,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt
    FROM (
        SELECT event_type, TRY_CAST(props->>'$.k' AS BIGINT) AS k FROM events
    ) GROUP BY event_type
"""


# --- §1.1: synthetic UUID keys from natural keys (md5 of composed fields,
#     /root/reference/parser/parser.go:150-176) ------------------------------

def synthetic_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable dedup/join key when the source has no native UUID — the
    engine-wide convention behind (conv_id, turn_idx) keying."""
    ev = _events(spark, sf_dir)
    synth = F.md5(
        F.concat_ws(
            "-",
            F.col("user_id").cast("string"),
            F.col("event_type"),
            F.col("event_id").cast("string"),
        )
    )
    return ev.select("event_id", synth.alias("synth_id"))


SYNTHETIC_KEY_SQL = """
    SELECT event_id,
           md5(CAST(user_id AS VARCHAR) || '-' || event_type || '-'
               || CAST(event_id AS VARCHAR)) AS synth_id
    FROM events
"""


# --- P2: explode-by-direction (ndt5: one file → up to 2 rows, null sibling
#     filtered, /root/reference/parser/ndt5_result.go:67-149) ----------------

def explode_directions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    dirs = F.array(
        F.struct(
            F.lit("value").alias("direction"), F.col("value").alias("metric")
        ),
        F.when(
            F.length(F.col("props")) > 0,
            F.struct(
                F.lit("props_len").alias("direction"),
                F.length(F.col("props")).cast("double").alias("metric"),
            ),
        ),
    )
    return (
        ev.select("event_id", F.explode(dirs).alias("d"))
        .filter(F.col("d").isNotNull())
        .select(
            "event_id", F.col("d.direction").alias("direction"),
            F.col("d.metric").alias("metric"),
        )
    )


EXPLODE_DIRECTIONS_SQL = """
    SELECT event_id, 'value' AS direction, value AS metric FROM events
    UNION ALL
    SELECT event_id, 'props_len' AS direction, CAST(length(props) AS DOUBLE)
    FROM events WHERE length(props) > 0
"""


# --- P8/A3: delta encoding — emit only changed values vs previous snapshot,
#     constant deltas dropped, is_last tagged
#     (/root/reference/parser/ndt.go:389-450, web100/web100.go:569-588) ------

def delta_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wall = W.partitionBy("user_id")
    staged = ev.select(
        "user_id", "event_id", "value",
        F.lag("value").over(w).alias("__prev"),
        F.row_number().over(w).alias("__rn"),
        F.count("*").over(wall).alias("__cnt"),
    )
    return (
        staged.filter(
            F.col("__prev").isNull()
            | (F.col("value") != F.col("__prev"))
            | (F.col("__rn") == F.col("__cnt"))
        )
        .select(
            "user_id", "event_id",
            (F.col("value") - F.col("__prev")).alias("delta"),
            (F.col("__rn") == F.col("__cnt")).alias("is_last"),
        )
    )


DELTA_ENCODING_SQL = """
    SELECT user_id, event_id, value - prev AS delta, rn = cnt AS is_last
    FROM (
        SELECT user_id, event_id, value,
               lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id) AS cnt
        FROM events
    ) WHERE prev IS NULL OR value <> prev OR rn = cnt
"""


# --- P7/A2/O1: per-group sample merge with ordered emit (switch parser
#     timestampToRow + sort-before-emit,
#     /root/reference/parser/switch.go:121-182) ------------------------------

def grouped_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    ordered_types = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda x: x["event_type"],
        ),
        ",",
    )
    return (
        ev.groupBy("user_id", F.date_trunc("minute", "ts").alias("minute_ts"))
        .agg(
            F.count("*").alias("n_samples"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            ordered_types.alias("type_seq"),
        )
    )


GROUPED_SAMPLES_SQL = """
    SELECT user_id, date_trunc('minute', ts) AS minute_ts,
           count(*) AS n_samples,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           string_agg(event_type, ',' ORDER BY ts, event_id) AS type_seq
    FROM events GROUP BY 1, 2
"""


# --- J3: broadcast canonicalization-map join (tcp-kis old→canonical name
#     mapping, /root/reference/web100/web100.go:92-105, parser/ss.go:79-90) --

_CANON_MAP = [
    ("click", "engage"), ("view", "engage"),
    ("signup", "convert"), ("purchase", "convert"), ("error", "fault"),
]


def canonical_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiny dimension broadcast to every executor — the scale-path for
    lookup joins (no shuffle of the fact side; verify with .explain:
    BroadcastHashJoin, fact scan stays in one codegen span)."""
    ev = _events(spark, sf_dir)
    lookup = spark.createDataFrame(_CANON_MAP, ["event_type", "canon"])
    return (
        ev.join(F.broadcast(lookup), "event_type", "left")
        .groupBy(F.coalesce(F.col("canon"), F.lit("unknown")).alias("canon"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


CANONICAL_BROADCAST_SQL = """
    SELECT coalesce(m.canon, 'unknown') AS canon, count(*) AS n,
           CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e
    LEFT JOIN (VALUES ('click','engage'),('view','engage'),('signup','convert'),
                      ('purchase','convert'),('error','fault')) AS m(event_type, canon)
      ON e.event_type = m.event_type
    GROUP BY 1
"""


# --- P4/P10: deeply nested JSON parse + hop-tree flatten (the reference's
#     biggest parser pattern: tracelb hop-tree → per-link rows,
#     /root/reference/parser/pt.go:181-319, schema Hop→Links→Probes at
#     /root/reference/schema/pt_schema.go:14-58) -----------------------------

_HOP_SCHEMA = (
    "hops array<struct<addr:string,"
    "links:array<struct<rtt:array<bigint>,probe:int>>>>"
)


def hop_tree_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip a deterministic Array(Struct(Array(Struct(Array)))) JSON
    payload through from_json, then flatten hop-tree → per-link rows with
    posexplode/explode + an array aggregate. The payload is BUILT from the
    event columns (concat), so the DuckDB oracle can state the flattened
    result directly — any loss in Spark's parse/flatten breaks the match.
    All generator+parse work is map-side; no shuffle anywhere."""
    ev = _events(spark, sf_dir)
    v = F.round(F.col("value") * 100).cast("long")
    uid = F.col("user_id").cast("string")
    payload = F.concat(
        F.lit('{"hops":[{"addr":"h0-'), uid,
        F.lit('","links":[{"rtt":['), v, F.lit(","), v + 1,
        F.lit('],"probe":1}]},{"addr":"h1-'), uid,
        F.lit('","links":[{"rtt":['), v + 2,
        F.lit('],"probe":2},{"rtt":[],"probe":3}]}]}'),
    )
    parsed = ev.select("event_id", F.from_json(payload, _HOP_SCHEMA).alias("__p"))
    hops = parsed.select(
        "event_id", F.posexplode(F.col("__p.hops")).alias("hop_idx", "hop")
    )
    links = hops.select(
        "event_id",
        "hop_idx",
        F.col("hop.addr").alias("addr"),
        F.explode("hop.links").alias("link"),
    )
    rtt_sum = F.aggregate(
        F.col("link.rtt"), F.lit(0).cast("long"), lambda a, x: a + x
    )
    return links.select(
        "event_id",
        "hop_idx",
        "addr",
        F.col("link.probe").alias("probe"),
        F.size("link.rtt").alias("n_rtt"),
        rtt_sum.alias("rtt_sum"),
    )


HOP_TREE_FLATTEN_SQL = """
    WITH e AS (
        SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT) AS v
        FROM events
    )
    SELECT event_id, hop_idx, addr, probe, n_rtt, rtt_sum FROM (
        SELECT event_id, 0 AS hop_idx, 'h0-' || CAST(user_id AS VARCHAR) AS addr,
               1 AS probe, 2 AS n_rtt, v + v + 1 AS rtt_sum FROM e
        UNION ALL
        SELECT event_id, 1, 'h1-' || CAST(user_id AS VARCHAR), 2, 1, v + 2 FROM e
        UNION ALL
        SELECT event_id, 1, 'h1-' || CAST(user_id AS VARCHAR), 3, 0, CAST(0 AS BIGINT) FROM e
    )
"""


# --- J1: two-feed in-batch session join (meta file ⋈ snaplog by session
#     key, /root/reference/parser/ndt.go:295-301,571-582) --------------------

def meta_snaplog_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two event feeds carved from the same archive batch — a per-user
    'meta' record (earliest signup) joined to the 'snaplog' stream
    (purchases) on the session key. Both sides shuffle once on user_id
    (co-partitioned equi-join); the meta side is pre-aggregated to one
    row per key BEFORE the join, so the join input is |users|, not
    |events| — the same shrink-the-small-side shape the reference applies
    when it parses the meta file once per archive."""
    ev = _events(spark, sf_dir)
    meta = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("__m"))
        .select(
            "user_id",
            F.col("__m.ts").alias("signup_ts"),
            F.col("__m.event_id").alias("signup_event_id"),
        )
    )
    snap = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    # TIMESTAMP_NTZ: exact µs delta via timestampdiff (see sessionize)
    delta_us = F.expr("timestampdiff(MICROSECOND, signup_ts, ts)")
    return snap.join(meta, "user_id").select(
        "user_id",
        "event_id",
        "signup_event_id",
        delta_us.alias("us_since_signup"),
        F.col("value").cast("decimal(18,2)").cast("double").alias("amount"),
    )


META_SNAPLOG_JOIN_SQL = """
    WITH meta AS (
        SELECT user_id, ts AS signup_ts, event_id AS signup_event_id FROM (
            SELECT user_id, ts, event_id,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM events WHERE event_type = 'signup'
        ) WHERE rn = 1
    )
    SELECT s.user_id, s.event_id, m.signup_event_id,
           epoch_us(s.ts) - epoch_us(m.signup_ts) AS us_since_signup,
           CAST(CAST(s.value AS DECIMAL(18,2)) AS DOUBLE) AS amount
    FROM events s JOIN meta m ON s.user_id = m.user_id
    WHERE s.event_type = 'purchase'
"""


# --- P5: cross-row lookahead discard (the pollution buffer: a buffered row
#     is dropped when the NEXT row in file order invalidates it,
#     /root/reference/parser/pt.go:630-669) ----------------------------------

def lookahead_discard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead() over per-user file order — the Spark analog of the
    reference's one-element buffer: emit each row only after seeing its
    successor; a 'view' immediately followed by an 'error' in the same
    user stream is polluted and discarded. One window shuffle on
    user_id; no state beyond the frame."""
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("event_type").over(w)
    # coalesce: the stream's LAST row has no successor (NULL lead) and must
    # be kept — a bare `= 'error'` comparison would go three-valued NULL
    # and silently drop it
    out = ev.withColumn("next_type", nxt).filter(
        ~(
            (F.col("event_type") == "view")
            & (F.coalesce(F.col("next_type"), F.lit("")) == "error")
        )
    )
    return out.select("user_id", "event_id", "event_type", "next_type")


LOOKAHEAD_DISCARD_SQL = """
    SELECT user_id, event_id, event_type, next_type FROM (
        SELECT user_id, event_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ) WHERE NOT (event_type = 'view' AND coalesce(next_type, '') = 'error')
"""


# --- grouped-map session repair (applyInPandas — the sanctioned per-group
#     escape hatch, SURVEY §2.10; reference: per-session snaplog repair
#     loop, /root/reference/parser/ndt.go:210-309) ---------------------------

def session_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user stream repair as a GROUPED-MAP: each user's events arrive
    as one pandas DataFrame (Arrow batch), are re-ordered by (ts,
    event_id), renumbered 0..n-1, and annotated with the value delta to
    the previous event — the imperative per-group shape a real session
    repairer (gap fill, resequencing) needs when window functions can't
    express it. Vectorized inside the group (pandas ops, no Python row
    loop); ONE shuffle on the group key, same as the window formulation
    the oracle uses. At 100 TB the group key (user) is the unit of
    parallelism — hot users are the skew risk, the same tradeoff the
    window formulation has."""
    import pandas as pd

    ev = _events(spark, sf_dir).select("user_id", "event_id", "ts", "value")

    def repair(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort").reset_index(
            drop=True
        )
        out = pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "seq": pd.Series(range(len(pdf)), dtype="int32"),
                "value_delta": (
                    (pdf["value"] - pdf["value"].shift(1)).round(4).astype("float64")
                ),
            }
        )
        return out

    return ev.groupBy("user_id").applyInPandas(
        repair, schema="user_id long, event_id long, seq int, value_delta double"
    )


SESSION_REPAIR_SQL = """
    SELECT user_id, event_id,
           CAST(row_number() OVER w - 1 AS INTEGER) AS seq,
           round(value - lag(value) OVER w, 4) AS value_delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --- §2.8 unbase64 archive-filename decode (reference: DecodeFilename,
#     /root/reference/etl/globals.go:377-394 — archive names carry
#     base64-encoded metadata that the task parser decodes then splits) ----

def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def archive_path_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the reference's encoded-filename convention: build the
    archive path whose last segment is base64(lang|doc_id), then recover
    the fields by unbase64 + split — pure codegen expressions (base64 /
    regexp_extract / unbase64 / split), no UDF, fully pushdown-friendly."""
    docs = _documents(spark, sf_dir)
    payload = F.concat(F.col("lang"), F.lit("|"), F.col("doc_id").cast("string"))
    path = F.concat(
        F.col("source"), F.lit("/"),
        F.base64(payload.cast("binary")), F.lit(".jsonl.gz"),
    )
    with_path = docs.select("doc_id", "lang", path.alias("archive_path"))
    token = F.regexp_extract(F.col("archive_path"), r"/([^/]+)\.jsonl\.gz$", 1)
    decoded = F.unbase64(token).cast("string")
    return with_path.select(
        "doc_id",
        "archive_path",
        F.split(decoded, r"\|").getItem(0).alias("dec_lang"),
        F.split(decoded, r"\|").getItem(1).cast("long").alias("dec_doc_id"),
        (F.split(decoded, r"\|").getItem(0) == F.col("lang")).alias("round_trip_ok"),
    )


ARCHIVE_PATH_DECODE_SQL = r"""
    WITH p AS (
        SELECT doc_id, lang,
               source || '/' || base64(encode(lang || '|' || CAST(doc_id AS VARCHAR)))
                      || '.jsonl.gz' AS archive_path
        FROM documents
    ), d AS (
        SELECT *,
               decode(from_base64(regexp_extract(archive_path, '/([^/]+)\.jsonl\.gz$', 1))) AS dec
        FROM p
    )
    SELECT doc_id, archive_path,
           string_split(dec, '|')[1] AS dec_lang,
           CAST(string_split(dec, '|')[2] AS BIGINT) AS dec_doc_id,
           string_split(dec, '|')[1] = lang AS round_trip_ok
    FROM d
"""


# --- grouping-sets rollup (multi-level aggregate in ONE pass) ----------------
# ROLLUP(event_type, day) computes per-(type, day), per-type, and grand
# totals in a single hash aggregate with map-side partials — one shuffle
# instead of three for the three levels (the reference materializes its
# daily and all-time counters as separate passes over the metrics stream,
# /root/reference/metrics/metrics.go). grp disambiguates the NULL-key
# levels (Spark grouping_id == DuckDB GROUPING bitmask, highest bit =
# first column). Day is emitted as a yyyy-MM-dd STRING so both engines
# agree on the type exactly.

def type_day_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    return ev.rollup(F.col("event_type"), day).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        F.grouping_id().cast("int").alias("grp"),
    )


TYPE_DAY_ROLLUP_SQL = """
    SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           CAST(GROUPING(event_type, strftime(ts, '%Y-%m-%d')) AS INTEGER) AS grp
    FROM events
    GROUP BY ROLLUP(event_type, strftime(ts, '%Y-%m-%d'))
"""


# --- deterministic stratified sampling ---------------------------------------
# Fixed-size uniform sample PER STRATUM (event_type), deterministic across
# engines and runs: rank rows inside each stratum by a hash of the row key
# and keep the first K. One shuffle on the stratum key; the per-partition
# sort is bounded by the stratum size. At 100 TB strata are huge — the
# same plan holds because Spark's window sort spills, but the cheaper
# production variant is a two-phase top-k (partial per-partition top-K,
# then merge), identical in shape to top_events_per_user.

SAMPLE_K = 50


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    h = F.md5(F.col("event_id").cast("string"))
    w = W.partitionBy("event_type").orderBy(h.asc(), F.col("event_id").asc())
    return (
        ev.withColumn("samp_rank", F.row_number().over(w))
        .filter(F.col("samp_rank") <= SAMPLE_K)
        .select("event_id", "event_type", "samp_rank")
    )


STRATIFIED_SAMPLE_SQL = f"""
    SELECT event_id, event_type, samp_rank FROM (
        SELECT event_id, event_type,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
               ) AS samp_rank
        FROM events
    ) WHERE samp_rank <= {SAMPLE_K}
"""


# --- as-of join (trades ⋈ latest quote at-or-before; kdb aj / Flink temporal
#     join / DuckDB ASOF JOIN). Reference analog: the meta-file conn-spec
#     joined onto each snaplog row as the LATEST metadata at-or-before the
#     test (/root/reference/parser/ndt_meta.go:75-110). ----------------------
# Spark has no ASOF JOIN operator; the naive formulation is a range join
# (t.ts >= q.ts) + per-row max — a cross-join explosion per key. The
# scalable composition is UNION-TAG + WINDOW: interleave both streams on
# (key, ts), carry the last non-null quote value forward with one running
# window, keep the trade rows. ONE hash exchange on the key + an
# in-partition sort — the same cost as a groupBy, independent of how many
# quotes precede each trade. Quotes sort before trades at equal ts, so
# the join is at-or-before (>=), matching DuckDB ASOF semantics.

def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    # even event_ids form the quote stream, odd ones the trade stream;
    # quotes dedup to one per (user, ts) via max event_id (ASOF JOIN is
    # undefined under duplicate timestamps — both engines dedup the same)
    quotes = (
        ev.filter(F.col("event_id") % 2 == 0)
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("q_value"))
    )
    trades = ev.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "user_id", "ts", "event_type"
    )
    null_s = F.lit(None).cast("string")
    u = quotes.select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.col("q_value"),
        F.lit(None).cast("long").alias("event_id"),
        null_s.alias("event_type"),
        F.col("ts").alias("q_ts"),
    ).unionByName(
        trades.select(
            "user_id",
            "ts",
            F.lit(1).alias("side"),
            F.lit(None).cast("double").alias("q_value"),
            "event_id",
            "event_type",
            F.lit(None).cast(dict(ev.dtypes)["ts"]).alias("q_ts"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = u.select(
        "user_id",
        "ts",
        "side",
        "event_id",
        "event_type",
        F.last("q_value", ignorenulls=True).over(w).alias("last_quote"),
        F.last("q_ts", ignorenulls=True).over(w).alias("last_q_ts"),
    )
    # parquet loads ts as TIMESTAMP_NTZ; the session tz is pinned UTC, so
    # the NTZ->TZ cast is a pure reinterpretation and the µs diff is exact
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    age_us = us("ts") - us("last_q_ts")
    return carried.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "last_quote",
        F.floor(age_us / F.lit(1000000.0)).cast("long").alias("quote_age_sec"),
    )


EVENTS_ASOF_JOIN_SQL = """
    WITH quotes AS (
        SELECT user_id, ts, arg_max(value, event_id) AS q_value
        FROM events WHERE event_id % 2 = 0 GROUP BY user_id, ts
    ),
    trades AS (
        SELECT event_id, user_id, ts, event_type
        FROM events WHERE event_id % 2 = 1
    )
    SELECT t.event_id, t.user_id, t.ts, t.event_type,
           q.q_value AS last_quote,
           CAST(floor((epoch_us(t.ts) - epoch_us(q.ts)) / 1000000.0) AS BIGINT)
               AS quote_age_sec
    FROM trades t
    ASOF LEFT JOIN quotes q ON t.user_id = q.user_id AND t.ts >= q.ts
"""


# --- range join (point-in-interval) via slot bucketing -----------------------
# The second classic join Spark lacks a native operator for: events joined
# to the time WINDOWS that contain them. The naive formulation
# (t.ts BETWEEN w.start AND w.end) is a broadcast-nested-loop or cartesian
# — O(events × windows). The scalable composition quantizes time into
# fixed slots the size of the window span: every window overlaps ≤ 2
# slots (exploded), every event lands in exactly 1, and the join becomes
# an EQUI-join on (event_type, slot) + an interval filter — shuffle
# bounded by slot-bucket sizes, AQE-splittable. Reference analog: joining
# rows to their annotation window (/root/reference/parser/annotation.go).

RANGE_WIN_MIN = 10         # window length = slot length, minutes
RANGE_WIN_EVERY = 97       # every 97th event opens an incident window


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    slot_us = RANGE_WIN_MIN * 60 * 1_000_000
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    wins = ev.filter(F.col("event_id") % RANGE_WIN_EVERY == 0).select(
        F.col("event_id").alias("win_id"),
        F.col("event_type"),
        us(F.col("ts")).alias("w_start_us"),
        (us(F.col("ts")) + slot_us).alias("w_end_us"),
    )
    # [start, end) spans at most 2 slots when the span equals the slot size
    wins_slotted = wins.select(
        "win_id",
        "event_type",
        "w_start_us",
        "w_end_us",
        F.explode(
            F.sequence(
                F.floor(F.col("w_start_us") / slot_us),
                F.floor((F.col("w_end_us") - 1) / slot_us),
            )
        ).alias("slot"),
    )
    pts = ev.select(
        "event_id",
        "event_type",
        "value",
        us(F.col("ts")).alias("ts_us"),
        F.floor(us(F.col("ts")) / slot_us).alias("slot"),
    )
    hits = wins_slotted.join(pts, ["event_type", "slot"]).filter(
        (F.col("ts_us") >= F.col("w_start_us")) & (F.col("ts_us") < F.col("w_end_us"))
    )
    return hits.groupBy("win_id", "event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


EVENTS_RANGE_JOIN_SQL = f"""
    WITH wins AS (
        SELECT event_id AS win_id, event_type,
               ts AS w_start, ts + INTERVAL {RANGE_WIN_MIN} MINUTE AS w_end
        FROM events WHERE event_id % {RANGE_WIN_EVERY} = 0
    )
    SELECT w.win_id, w.event_type,
           count(*) AS n_events,
           round(sum(e.value), 4) AS sum_value
    FROM wins w JOIN events e
      ON e.event_type = w.event_type
     AND e.ts >= w.w_start AND e.ts < w.w_end
    GROUP BY w.win_id, w.event_type
"""


# --- theta-style distinct sketch ----------------------------------------------
# Sketch-based COUNT(DISTINCT) for 100 TB group-bys: hash every key to a
# uniform 60-bit value, keep only hashes under a fixed threshold
# (sample_frac of the hash space), and scale the kept-distinct count back
# up — the theta/KMV sketch idea with a FIXED theta, which makes it a
# pure filter + small exact distinct: per group the shuffle carries only
# ~frac of the distinct keys (here 1/16; at 10^10 keys per group that is
# the difference between a spilling exact distinct and an in-memory one).
# Unlike HLL++ (approx_count_distinct), whose register layout differs
# per engine, this construction is deterministic given the shared md5 —
# the DuckDB oracle reproduces the estimate EXACTLY, so the sketch's
# estimate (not just its error bound) is oracle-checked. Reference
# analog: hash-mod work sampling (/root/reference/etl/globals.go
# DoesBatchContain-style routing).

SKETCH_BITS = 60
SKETCH_FRAC = 16          # keep hashes in the lowest 1/16 of the space
SKETCH_T = (1 << SKETCH_BITS) // SKETCH_FRAC


def events_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    h = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
               ).cast("long")
    kept = ev.select("event_type", h.alias("__h")).filter(F.col("__h") < SKETCH_T)
    return kept.groupBy("event_type").agg(
        F.countDistinct("__h").alias("kept_distinct"),
        (F.countDistinct("__h") * SKETCH_FRAC).cast("long").alias("est_distinct"),
    )


EVENTS_DISTINCT_SKETCH_SQL = f"""
    SELECT event_type,
           count(DISTINCT h) AS kept_distinct,
           CAST(count(DISTINCT h) * {SKETCH_FRAC} AS BIGINT) AS est_distinct
    FROM (
        SELECT event_type,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        FROM events
    )
    WHERE h < {SKETCH_T}
    GROUP BY event_type
"""


# --- OLAP: exact discrete percentiles per group -------------------------------
# Exact p50/p90/p99 of `value` per event type — percentile_disc semantics
# (pick the ceil(p*n)-th element of the sorted multiset, NO interpolation),
# computed with one sort-window pass + one hash agg. Discrete quantiles
# return ORIGINAL doubles, so both engines agree bitwise; interpolating
# quantiles (percentile_cont / Spark `percentile`) mix engine-specific
# float expressions and are deliberately avoided. The rank threshold is
# integer math ((p*100*n + 99) div 100), never float ceil. At 100 TB the
# window sorts within event_type partitions (5 types here → salt or
# pre-bucket by (type, value-range) for truly hot types; the shuffle is
# one exchange on the partition key either way). Reference analog: the
# web100 snapshot summaries pick ordinal elements of ordered series
# (/root/reference/web100/web100.go:590-616), not interpolated ones.

def event_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("event_type", "event_id", "value")
    w = W.partitionBy("event_type").orderBy(F.col("value").asc(), F.col("event_id").asc())
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(W.partitionBy("event_type")).alias("n"),
    )

    def pick(p: int) -> F.Column:
        return F.min(
            F.when(
                F.col("rn") == F.expr(f"({p} * n + 99) div 100"), F.col("value")
            )
        )

    return ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        pick(50).alias("p50"),
        pick(90).alias("p90"),
        pick(99).alias("p99"),
    )


EVENT_PERCENTILES_SQL = """
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value ASC, event_id ASC) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    )
    SELECT event_type, max(n) AS n,
           min(CASE WHEN rn = (50 * n + 99) // 100 THEN value END) AS p50,
           min(CASE WHEN rn = (90 * n + 99) // 100 THEN value END) AS p90,
           min(CASE WHEN rn = (99 * n + 99) // 100 THEN value END) AS p99
    FROM ranked GROUP BY event_type
"""


# --- OLAP: ROLLUP grouping sets ------------------------------------------------
# One scan computing the (type, day), (type), () aggregation lattice with
# map-side partials — the Spark `rollup` relational operator (Catalyst
# Expand node: each input row fans out once per grouping set BEFORE the
# exchange, so the shuffle still carries partially-aggregated rows; at
# 100 TB that is 3× map output for 3 grouping sets, not 3 scans).
# grouping() flags disambiguate the NULL-key subtotal rows from genuine
# NULL group values.

def type_day_rollup_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).withColumn("day", F.to_date("ts"))
    return (
        ev.rollup("event_type", "day")
        .agg(
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("day").cast("int").alias("g_day"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
            F.coalesce(F.col("day").cast("string"), F.lit("<all>")).alias("day"),
            "g_type",
            "g_day",
            "n_events",
            "sum_value",
        )
    )


TYPE_DAY_ROLLUP_SETS_SQL = """
    SELECT coalesce(event_type, '<all>') AS event_type,
           coalesce(CAST(CAST(ts_day AS DATE) AS VARCHAR), '<all>') AS day,
           CAST(GROUPING(event_type) AS INTEGER) AS g_type,
           CAST(GROUPING(ts_day) AS INTEGER) AS g_day,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM (SELECT event_type, CAST(ts AS DATE) AS ts_day, value FROM events)
    GROUP BY ROLLUP (event_type, ts_day)
"""


# --- OLAP: pivot (conditional aggregation) -------------------------------------
# Wide per-user activity matrix: `pivot` over the closed event-type set.
# Spark's pivot IS conditional aggregation after Catalyst lowers it (one
# hash agg, no join, no extra shuffle vs the plain groupBy) — the pivot
# column list is declared explicitly, because at 100 TB an undeclared
# pivot first runs a distinct scan just to learn the columns. The oracle
# spells out the same CASE WHEN lowering in ANSI SQL.

PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def user_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    dec = F.col("value").cast("decimal(18,2)")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", PIVOT_TYPES)
        .agg(F.sum(dec))
    )
    return out.select(
        "user_id",
        *[
            F.coalesce(F.col(t).cast("double"), F.lit(0.0)).alias(f"sum_{t}")
            for t in PIVOT_TYPES
        ],
    )


USER_TYPE_PIVOT_SQL = "SELECT user_id, " + ", ".join(
    f"CAST(coalesce(sum(CASE WHEN event_type = '{t}' "
    f"THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS sum_{t}"
    for t in PIVOT_TYPES
) + " FROM events GROUP BY user_id"


# --- set operators: EXCEPT / INTERSECT -----------------------------------------
# Buyer/error user-set algebra: purchasers who never erred (EXCEPT) and
# purchasers who also signed up (INTERSECT), tagged and unioned. Spark
# lowers both to aggregate/join shapes with distinct semantics — one
# exchange per side on user_id, no row-by-row anti logic. The tag column
# keeps the two sets distinguishable through the driver's sorted-hash
# compare.

def user_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)

    def days(t: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == t)
            .select("user_id", F.to_date("ts").cast("string").alias("day"))
        )

    # (user, day) granularity so both sets discriminate at every SF; EXCEPT
    # DISTINCT semantics: distinct left input, then the left-anti lowering
    # of exceptAll — one exchange per side
    clean = days("purchase").distinct().exceptAll(days("error").distinct())
    both = days("purchase").intersect(days("signup"))
    return clean.withColumn("tag", F.lit("buy_day_no_error")).unionByName(
        both.withColumn("tag", F.lit("buy_and_signup_day"))
    )


USER_SET_OPS_SQL = """
    WITH d AS (SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                      event_type FROM events)
    SELECT user_id, day, 'buy_day_no_error' AS tag FROM (
        SELECT user_id, day FROM d WHERE event_type = 'purchase'
        EXCEPT
        SELECT user_id, day FROM d WHERE event_type = 'error'
    )
    UNION ALL
    SELECT user_id, day, 'buy_and_signup_day' AS tag FROM (
        SELECT user_id, day FROM d WHERE event_type = 'purchase'
        INTERSECT
        SELECT user_id, day FROM d WHERE event_type = 'signup'
    )
"""


# --- RANGE-frame trailing window -------------------------------------------------
# Per-user trailing 1-hour activity (sum + count), a RANGE BETWEEN frame
# keyed on event time — the frame boundary is a VALUE offset (3600s), not
# a row count, so ties and gaps are handled by time, the way rate limits
# and rolling SLOs are defined. Spark requires a numeric ordering column
# for range frames → epoch seconds; the sum is exact DECIMAL. One
# exchange on user_id, sort within partition, single pass.

def events_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    sec = F.unix_timestamp("ts")
    w = (
        W.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum("v").over(w).cast("double").alias("trailing_sum"),
        F.count("*").over(w).alias("trailing_n"),
    )


EVENTS_TRAILING_WINDOW_SQL = """
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trailing_sum,
           count(*) OVER w AS trailing_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch(CAST(ts AS TIMESTAMP))
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


# --- ordered conversion funnel ---------------------------------------------------
# signup → purchase ordering per user: one conditional aggregate computes
# each user's first signup and first purchase timestamps (min_by-free —
# plain FILTERed mins, map-side combinable), the funnel stage is decided
# by comparing them, and a final rollup counts users per stage. One scan,
# two hash aggregates, no window, no self-join — the shape that survives
# 10^10 events (the naive formulation self-joins events on user_id).
# Tie-break: a purchase at the exact signup instant counts as converted
# (>=), and both engines compare identical µs integers.

def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", us)).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("t_purchase"),
    )
    stage = (
        F.when(F.col("t_signup").isNull(), F.lit("no_signup"))
        .when(F.col("t_purchase").isNull(), F.lit("signup_only"))
        .when(F.col("t_purchase") >= F.col("t_signup"), F.lit("converted"))
        .otherwise(F.lit("purchase_first"))
    )
    return (
        per_user.select(stage.alias("stage"))
        .groupBy("stage")
        .agg(F.count("*").alias("n_users"))
    )


EVENTS_FUNNEL_SQL = """
    SELECT stage, count(*) AS n_users FROM (
        SELECT CASE WHEN t_signup IS NULL THEN 'no_signup'
                    WHEN t_purchase IS NULL THEN 'signup_only'
                    WHEN t_purchase >= t_signup THEN 'converted'
                    ELSE 'purchase_first' END AS stage
        FROM (
            SELECT user_id,
                   min(CASE WHEN event_type = 'signup'
                            THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_signup,
                   min(CASE WHEN event_type = 'purchase'
                            THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_purchase
            FROM events GROUP BY user_id
        )
    ) GROUP BY stage
"""


# --- cohort retention matrix ------------------------------------------------------
# Users cohorted by first-activity day; retention cell (cohort_day,
# day_offset) counts distinct users of that cohort active offset days
# later. Two aggregates: first-day per user (hash agg), then the
# (cohort, offset) distinct count — the user×day dedup happens in the
# same aggregate via count(DISTINCT user_id). The cohort join is on
# user_id (AQE: broadcast while the user dimension fits, shuffle after).
# Day math is DATEDIFF on DATE values — integer-exact in both engines.

def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "user_id", F.to_date("ts").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


EVENTS_RETENTION_SQL = """
    WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
    first AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id)
    SELECT CAST(cohort_day AS VARCHAR) AS cohort_day,
           CAST(datediff('day', cohort_day, day) AS INTEGER) AS day_offset,
           count(DISTINCT d.user_id) AS n_active
    FROM d JOIN first ON d.user_id = first.user_id
    GROUP BY 1, 2
"""


# --- event-type transition bigrams (Markov edge counts) --------------------------
# Per-user event-path bigrams: lag(event_type) over the unique total order
# (ts, event_id) within each user, then one hash agg over the
# (prev, cur) pairs. The window shuffles ONCE on user_id (the same key
# the sessionize/funnel family already uses — at 100 TB a pre-bucketed
# events table makes this exchange-free), the bigram agg is map-side
# partial. Top-k with a full (n DESC, prev, cur) tie-break.
# Reference analog: per-connection state-transition counting in the
# snapshot parsers (/root/reference/parser/tcpinfo.go:193-197 applies
# per-snapshot deltas in file order — the same lag-over-ordered-stream
# shape).

TRANSITION_TOP = 20


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("cur_type"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "prev_type", "cur_type")
        .limit(TRANSITION_TOP)
    )


EVENT_TRANSITIONS_SQL = f"""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS cur_type, count(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    ORDER BY n DESC, prev_type, cur_type LIMIT {TRANSITION_TOP}
"""


# --- user activity deciles (ntile over per-user volume) ----------------------------
# Two-level rollup: per-user event counts, ntile(10) over the
# DETERMINISTIC total order (count DESC, user_id — ties broken by the
# unique key, so both engines assign identical tiles), then per-decile
# user count, event sum, and count bounds. Plan: one user_id exchange for
# the count, one single-partition window for the ntile — acceptable
# because its input is ALREADY one row per user (|users| << |events|;
# at extreme user cardinality the same decile boundaries come from
# percentile ranks instead). Final agg is 10 rows.


def user_activity_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    w = W.orderBy(F.col("n_events").desc(), "user_id")
    return (
        per_user.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("n_events").alias("sum_events"),
            F.min("n_events").alias("min_events"),
            F.max("n_events").alias("max_events"),
        )
        .orderBy("decile")
    )


USER_ACTIVITY_DECILES_SQL = """
    WITH per_user AS (
        SELECT user_id, count(*) AS n_events FROM events GROUP BY 1
    ),
    tiled AS (
        SELECT n_events,
               ntile(10) OVER (ORDER BY n_events DESC, user_id) AS decile
        FROM per_user
    )
    SELECT decile, count(*) AS n_users,
           CAST(sum(n_events) AS BIGINT) AS sum_events,
           min(n_events) AS min_events, max(n_events) AS max_events
    FROM tiled
    GROUP BY decile ORDER BY decile
"""


# --- OLAP: CUBE lattice ---------------------------------------------------
# Full 2^2 grouping lattice over (event_type, day) in ONE scan: Catalyst
# lowers cube() to an Expand node (4 copies of each input row tagged with
# its grouping-set id) feeding a single hash aggregate — no union of four
# scans, no re-read. At 100 TB the Expand multiplies shuffle volume by the
# lattice size, so wide cubes want a pre-aggregation on the finest set
# first (here the day grain is already coarse). Same decimal-exact sums
# and grouping() flags as the ROLLUP variant.

def type_day_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).withColumn("day", F.to_date("ts"))
    return (
        ev.cube("event_type", "day")
        .agg(
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("day").cast("int").alias("g_day"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
            F.coalesce(F.col("day").cast("string"), F.lit("<all>")).alias("day"),
            "g_type",
            "g_day",
            "n_events",
            "sum_value",
        )
    )


TYPE_DAY_CUBE_SQL = """
    SELECT coalesce(event_type, '<all>') AS event_type,
           coalesce(CAST(CAST(ts_day AS DATE) AS VARCHAR), '<all>') AS day,
           CAST(GROUPING(event_type) AS INTEGER) AS g_type,
           CAST(GROUPING(ts_day) AS INTEGER) AS g_day,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM (SELECT event_type, CAST(ts AS DATE) AS ts_day, value FROM events)
    GROUP BY CUBE (event_type, ts_day)
"""


# --- time series: calendar gap fill + forward fill -----------------------
# Per-user daily activity with missing days materialized (n_events = 0)
# and the last known daily value carried forward — the classic
# time-series densification that monitoring/feature pipelines need before
# any rolling computation. Shape matters at 100 TB: NO calendar join. A
# lead() window finds each row's next active day and sequence()+explode
# emits the gap days from the anchor row itself, so the whole operator is
# one window over the (user, day) pre-aggregate plus a generator — the
# naive span-table LEFT JOIN would shuffle users x days rows twice.
# Reference analog: snapshot series are delta-encoded against the
# previous sample the same way (/root/reference/parser/disco.go:75-86).

def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).withColumn("day", F.to_date("ts"))
    daily = ev.groupBy("user_id", "day").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v"),
    )
    w = W.partitionBy("user_id").orderBy("day")
    with_next = daily.withColumn("next_day", F.lead("day").over(w))
    cal = with_next.select(
        "user_id",
        "day",
        "n",
        "v",
        F.explode(
            F.sequence(
                F.col("day"),
                F.coalesce(F.date_sub(F.col("next_day"), 1), F.col("day")),
            )
        ).alias("cal_day"),
    )
    return cal.select(
        "user_id",
        F.col("cal_day").cast("string").alias("day"),
        F.when(F.col("cal_day") == F.col("day"), F.col("n"))
        .otherwise(F.lit(0)).alias("n_events"),
        F.col("v").alias("carried_value"),
        (F.col("cal_day") != F.col("day")).alias("is_gap"),
    )


EVENTS_GAP_FILL_SQL = """
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    ),
    nxt AS (
        SELECT *, lead(d) OVER (PARTITION BY user_id ORDER BY d) AS nd
        FROM daily
    )
    SELECT user_id,
           CAST(CAST(cal AS DATE) AS VARCHAR) AS day,
           CASE WHEN CAST(cal AS DATE) = d THEN n ELSE 0 END AS n_events,
           v AS carried_value,
           CAST(cal AS DATE) <> d AS is_gap
    FROM nxt,
         unnest(generate_series(
             CAST(d AS TIMESTAMP),
             CAST(coalesce(nd - INTERVAL 1 DAY, d) AS TIMESTAMP),
             INTERVAL 1 DAY)) AS t(cal)
"""


# --- sketch: count-min heavy hitters --------------------------------------
# Find high-frequency users without a per-user exact aggregate: a
# 3x64 count-min sketch (three md5-derived hash rows) built in one
# groupBy over (row, bucket) — the sketch is 192 cells regardless of
# cardinality, so it broadcasts everywhere and merges associatively
# (streaming/partition-parallel by construction). Estimates are
# min-over-rows, never under the true count; candidates at or above the
# threshold are then verified with their exact counts (the standard
# CMS + exact re-check pattern). Deterministic md5 bucketing keeps the
# estimate exactly reproducible across engines, like the theta-style
# distinct sketch above. At 100 TB the exact per-user groupBy here
# would be replaced by re-checking ONLY the candidate set; both stages
# of that plan are already in this query (the filter is on est_count).

CMS_D, CMS_W, HH_THRESHOLD = 3, 64, 50


def _cms_bucket(i_col: F.Column, key_col: F.Column) -> F.Column:
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", i_col, key_col)), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(CMS_W))


def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("user_id")
    rows = ev.withColumn("i", F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])))
    cms = (
        rows.withColumn("bucket", _cms_bucket(F.col("i"), F.col("user_id")))
        .groupBy("i", "bucket")
        .agg(F.count("*").alias("c"))
    )
    users = ev.groupBy("user_id").agg(F.count("*").alias("true_count"))
    probes = users.withColumn(
        "i", F.explode(F.array(*[F.lit(i) for i in range(CMS_D)]))
    ).withColumn("bucket", _cms_bucket(F.col("i"), F.col("user_id")))
    return (
        probes.join(F.broadcast(cms), ["i", "bucket"])
        .groupBy("user_id", "true_count")
        .agg(F.min("c").alias("est_count"))
        .filter(F.col("est_count") >= HH_THRESHOLD)
        .select("user_id", "est_count", "true_count")
    )


EVENTS_HEAVY_HITTERS_SQL = f"""
    WITH rows AS (
        SELECT user_id, i
        FROM events, range({CMS_D}) AS t(i)
    ),
    cms AS (
        SELECT i,
               ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % {CMS_W} AS bucket,
               count(*) AS c
        FROM rows GROUP BY 1, 2
    ),
    users AS (
        SELECT user_id, count(*) AS true_count FROM events GROUP BY 1
    ),
    probes AS (
        SELECT u.user_id, u.true_count, t.i,
               ('0x' || substr(md5(CAST(t.i AS VARCHAR) || ':' || CAST(u.user_id AS VARCHAR)), 1, 15))::BIGINT % {CMS_W} AS bucket
        FROM users u, range({CMS_D}) AS t(i)
    )
    SELECT p.user_id, min(c.c) AS est_count, p.true_count
    FROM probes p JOIN cms c ON p.i = c.i AND p.bucket = c.bucket
    GROUP BY p.user_id, p.true_count
    HAVING min(c.c) >= {HH_THRESHOLD}
"""


# --- streaming-native session windows, run in batch ------------------------
# The SAME gap-sessionization as `sessionize`, but through Spark's native
# session_window() operator — the streaming-capable formulation (state
# store merges partial sessions per trigger; in batch Catalyst lowers it
# to one aggregate over merged intervals, no window-function sort pass).
# Semantics difference worth pinning: session_window treats the window as
# [start, last_event + gap) and an event landing EXACTLY at the close
# boundary starts a NEW session (strict <), while the lag() formulation
# in `sessionize` merges on equality (break only when gap > G). The
# oracle below replicates the native operator's strict semantics
# (break when gap >= G). Reference analog: the same snapshot-gap session
# grouping mapped in SURVEY §2.3 P8.

def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    sess = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes")
    ).agg(F.count("*").alias("n"))
    return sess.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n").alias("n_events"),
        F.max("n").alias("max_session_events"),
    )


EVENTS_SESSION_WINDOW_SQL = f"""
    WITH brks AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            >= {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sids AS (
        SELECT user_id,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM brks
    ),
    sess AS (
        SELECT user_id, sid, count(*) AS n FROM sids GROUP BY 1, 2
    )
    SELECT user_id, count(*) AS n_sessions,
           CAST(sum(n) AS BIGINT) AS n_events,
           max(n) AS max_session_events
    FROM sess GROUP BY user_id
"""


# --- semi-structured: VARIANT extraction -----------------------------------
# Spark 4's VARIANT type for schema-on-read JSON: parse once with
# parse_json (binary variant encoding, no per-access string re-parse),
# extract typed paths with variant_get. At 100 TB this is the right
# shape for ragged payloads — the variant column prunes/pushes like any
# other, and repeated path extraction is O(paths), not O(re-parses).
# The reference stores raw JSON strings and re-parses per query
# (/root/reference/parser/annotation.go) — variant is the Spark-native
# upgrade of the same passthrough pattern.

def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.sum("k").alias("k_sum"),
        )
    )


PROPS_VARIANT_STATS_SQL = """
    SELECT event_type,
           count(k) AS n_with_k,
           min(k) AS k_min,
           max(k) AS k_max,
           CAST(sum(k) AS BIGINT) AS k_sum
    FROM (
        SELECT event_type,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k
        FROM events
    )
    GROUP BY event_type
"""
