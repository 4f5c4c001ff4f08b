#!/usr/bin/env python
"""Composition stress: the full production surface enabled AT ONCE.

One streaming drain at >=16M events with, simultaneously:
  * CHECK constraint (policy=drop) enforced per micro-batch,
  * dead-letter quarantine capturing the dropped/failed rows,
  * materialized-view maintenance (ConvSummaryMV) per trigger,
  * content near-dup admission gate (persisted MinHash index),
  * default MOR delta compaction (run_stream's auto policy),
vs a plain-MOR control drain of the SAME feed on the same session.

Prints one JSON line: events/sec for both runs, the composed/plain
ratio, and state sanity (final rows, MV rows, quarantined rows, index
docs, max files/bucket). The point is the RATIO: composition must cost
a bounded constant factor, not a pathology that grows with state.

Usage: python tools/bench_stress.py [--events 16000000] [--segments 16]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=16_000_000)
    ap.add_argument("--segments", type=int, default=16)
    ap.add_argument("--cores", type=int, default=0)
    ap.add_argument("--mv-every", type=int, default=1,
                    help="MV refresh cadence for the composed run")
    ap.add_argument(
        "--workdir", default="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_spark.cdc.gen import change_feed_df, write_feed
    from etl_spark.cdc.stream import run_stream
    from etl_spark.lake.mv import ConvSummaryMV
    from etl_spark.lake.table import LakeTable
    from etl_spark.schema import TRANSCRIPT_SCHEMA
    from etl_spark.session import get_spark

    work = os.path.join(args.workdir or "/tmp", f"etl_stress_{os.getpid()}")
    os.makedirs(work, exist_ok=True)
    cores = args.cores or (os.cpu_count() or 8)
    spark = get_spark(
        cores=cores,
        app_name="bench_stress",
        extra_conf={
            "spark.local.dir": os.path.join(work, "local"),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    try:
        feed = os.path.join(work, "feed")
        # realistic prose-shaped text for the near-dup gate: 24 hash-
        # derived words per event, mostly unique; ~2% of events draw from
        # 97 shared content streams (true cross-key duplicates the gate
        # must catch). The generator's own text is a single x-padded
        # token — degenerate for shingling (every doc near-dups every
        # other), which is a skew TEST, not a throughput baseline.
        seed = (
            F.when(
                F.pmod(F.col("op_seq"), F.lit(50)) == 0,
                F.pmod(F.col("op_seq"), F.lit(97)),
            )
            .otherwise(F.col("op_seq"))
            .cast("string")
        )
        words = [
            F.substring(F.md5(F.concat_ws("-", seed, F.lit(str(i)))), 1, 8)
            for i in range(24)
        ]
        df = change_feed_df(
            spark, n_events=args.events, n_convs=max(2000, args.events // 90),
            max_turns=40, seed=11, skew=2.0, dup_ratio=0.05, ooo_ratio=0.10,
            n_batches=args.segments,
        ).withColumn("text", F.concat_ws(" ", *words))
        t0 = time.time()
        write_feed(df, feed)
        gen_sec = round(time.time() - t0, 1)

        # warmup: identical code paths at small scale (codegen/JIT)
        warm_feed = os.path.join(work, "wfeed")
        write_feed(
            change_feed_df(spark, n_events=100_000, n_convs=1000, max_turns=12,
                           seed=3, n_batches=2)
            .withColumn("text", F.concat_ws(" ", *words)),
            warm_feed,
        )
        for tag in ("wp", "wc"):
            wt = LakeTable.create(
                os.path.join(work, f"lake_{tag}"), TRANSCRIPT_SCHEMA, n_buckets=16
            )
            kw = {}
            if tag == "wc":
                wt.add_constraint(spark, "no-system", "role <> 'system'",
                                  policy="drop")
                kw = dict(
                    mv_path=os.path.join(work, f"mv_{tag}"),
                    quarantine_dir=os.path.join(work, f"q_{tag}"),
                    neardup_index_path=os.path.join(work, f"ndi_{tag}"),
                    fail_threshold=0.9,
                )
            run_stream(spark, wt, warm_feed, os.path.join(work, f"ckpt_{tag}"),
                       available_now=True, mode="mor", **kw)

        # one trigger ≈ one binlog segment (the production trigger-cap
        # shape); an unbounded available-now trigger would swallow the
        # whole feed as a single giant batch and thrash executor memory
        seg0 = next(
            d for d in sorted(os.listdir(feed))
            if os.path.isdir(os.path.join(feed, d))
        )
        files_per_seg = len(os.listdir(os.path.join(feed, seg0)))

        # per-trigger walls + phase attribution: the "bounded constant
        # factor" claim is really a FLATNESS claim — per-batch wall must
        # not grow with index/table age. Wrap the phase entry points.
        import etl_spark.cdc.stream as stream_mod
        from etl_spark.cdc import apply as apply_mod
        from etl_spark.lake.mv import ConvSummaryMV

        phases: dict[str, list[float]] = {}

        def timed(name, fn):
            def wrap(*a, **k):
                t0 = time.time()
                try:
                    return fn(*a, **k)
                finally:
                    phases.setdefault(name, []).append(
                        round(time.time() - t0, 2)
                    )
            return wrap

        orig = (stream_mod._neardup_gate, stream_mod.apply_batch,
                ConvSummaryMV.refresh)
        stream_mod._neardup_gate = timed("gate", orig[0])
        stream_mod.apply_batch = timed("apply", orig[1])
        ConvSummaryMV.refresh = timed("mv", orig[2])

        # ---- run A: plain MOR drain
        ta = LakeTable.create(os.path.join(work, "lake_a"), TRANSCRIPT_SCHEMA,
                              n_buckets=64)
        t0 = time.time()
        run_stream(spark, ta, feed, os.path.join(work, "ckpt_a"),
                   available_now=True, mode="mor",
                   max_files_per_trigger=files_per_seg)
        plain_sec = time.time() - t0
        plain_eps = args.events / plain_sec
        plain_walls = list(phases.get("apply", []))
        phases.clear()

        # ---- run C: same drain with a CONCURRENT maintenance thread —
        # the optimistic-concurrency deployment shape (streaming driver +
        # independent table service racing one lake path). The stream's
        # append commits rebase over maintenance rewrites; maintenance
        # recomputes when the stream invalidates its reads. Cost of the
        # race and convergence to the single-writer state are both
        # reported (state checksum vs run A).
        import threading

        from etl_spark.lake.table import CommitConflictError

        tc = LakeTable.create(os.path.join(work, "lake_c"), TRANSCRIPT_SCHEMA,
                              n_buckets=64)
        stop_ev = threading.Event()
        maint = {"commits": 0, "conflicts": 0}

        def maintenance():
            # INCREMENTAL slices (max_buckets): a full-table resolve can
            # never win the commit race against a hot stream — a bounded
            # slice finishes inside the trigger interval and lands
            h = LakeTable(tc.path)
            while not stop_ev.is_set():
                try:
                    if h.resolve_deltas(spark, max_buckets=8):
                        maint["commits"] += 1
                except CommitConflictError:
                    maint["conflicts"] += 1
                except Exception:
                    pass  # table mid-create / transient — next round
                stop_ev.wait(2.0)

        th = threading.Thread(target=maintenance, daemon=True)
        th.start()
        t0 = time.time()
        run_stream(spark, tc, feed, os.path.join(work, "ckpt_c"),
                   available_now=True, mode="mor",
                   max_files_per_trigger=files_per_seg)
        occ_sec = time.time() - t0
        stop_ev.set()
        th.join(timeout=300)
        occ_eps = args.events / occ_sec
        occ_walls = list(phases.get("apply", []))
        phases.clear()

        def state_sum(t):
            df = t.read(spark)
            h = F.xxhash64(*[F.col(c) for c in df.columns])
            # decimal accumulator: a long sum of 64-bit hashes overflows
            r = df.select(h.alias("h")).agg(
                F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            ).first()
            return (str(r["s"]), r["n"])

        state_equal = state_sum(ta) == state_sum(tc)

        # ---- run B: everything on
        tb = LakeTable.create(os.path.join(work, "lake_b"), TRANSCRIPT_SCHEMA,
                              n_buckets=64)
        tb.add_constraint(spark, "no-system", "role <> 'system'", policy="drop")
        qdir = os.path.join(work, "q_b")
        t0 = time.time()
        run_stream(
            spark, tb, feed, os.path.join(work, "ckpt_b"),
            available_now=True, mode="mor",
            max_files_per_trigger=files_per_seg,
            mv_path=os.path.join(work, "mv_b"),
            mv_refresh_every=args.mv_every,
            quarantine_dir=qdir,
            neardup_index_path=os.path.join(work, "ndi_b"),
            fail_threshold=0.9,  # the drop-policy constraint consumes budget
        )
        comp_sec = time.time() - t0
        comp_eps = args.events / comp_sec

        from etl_spark.cdc.neardup import NearDupIndex

        m = tb.manifest()
        quarantined = (
            spark.read.parquet(os.path.join(qdir, "*")).count()
            if os.path.isdir(qdir) and os.listdir(qdir) else 0
        )
        out = {
            "metric": "composition_stress",
            "events": args.events,
            "mv_every": args.mv_every,
            "gen_sec": gen_sec,
            "plain_events_per_sec": round(plain_eps),
            "composed_events_per_sec": round(comp_eps),
            "composed_over_plain": round(comp_eps / plain_eps, 3),
            "plain_sec": round(plain_sec, 1),
            "composed_sec": round(comp_sec, 1),
            "final_rows_plain": ta.read(spark).count(),
            "final_rows_composed": tb.read(spark).count(),
            "mv_rows": ConvSummaryMV(os.path.join(work, "mv_b")).read(spark).count(),
            "quarantined_rows": quarantined,
            "neardup_index_docs": NearDupIndex(os.path.join(work, "ndi_b")).n_docs,
            "max_files_per_bucket": max(
                (len(fl) for fl in m.files.values()), default=0
            ),
            "plain_apply_walls": plain_walls,
            "composed_phase_walls": {k: v for k, v in phases.items()},
            "occ_events_per_sec": round(occ_eps),
            "occ_over_plain": round(occ_eps / plain_eps, 3),
            "occ_apply_walls": occ_walls,
            "occ_maintenance_commits": maint["commits"],
            "occ_maintenance_conflicts": maint["conflicts"],
            "occ_state_equals_plain": state_equal,
        }
        print(json.dumps(out))
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
