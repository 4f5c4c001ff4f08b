"""Cluster entry point for ``spark-submit --py-files etl_spark.zip``.

    spark-submit --master <cluster> --py-files dist/etl_spark.zip \
        tools/submit_job.py --table /lake/transcripts --feed /feeds/day1 \
        [--gen-events 200000] [--mode mor] [--buckets 32]

This file is the deployment-shaped analog of the reference's worker main
(/root/reference/cmd/etl_worker/etl_worker.go:266-323): a thin driver that
wires config to the engine and runs the apply loop. It deliberately imports
``etl_spark`` ONLY — when launched via spark-submit the package must resolve
from the ``--py-files`` zip (driver and executor Python workers alike), so a
green run of this script IS the proof that the deploy artifact is complete:
no test helpers, no repo-relative paths, no PYTHONPATH assumptions.

It does NOT build its own SparkSession master: spark-submit owns
deployment shape (``--master local[8]`` / ``yarn`` / ``k8s://...``), the job
only names the app and the configs that are deployment-independent. With
``--gen-events N`` it first writes a deterministic seeded feed (so a smoke
run needs no pre-existing data); then it batch-replays the feed into the
lake table (resumable, exactly-once by segment) and prints ONE JSON line:
per-batch dispositions, final live-row count, and an order-insensitive
state digest (sum/bit_xor of xxhash64 over every live row's full image) a
harness can compare across deployments without collecting rows.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="submit_job")
    ap.add_argument("--table", required=True)
    ap.add_argument("--feed", required=True)
    ap.add_argument("--gen-events", type=int, default=0)
    ap.add_argument("--gen-convs", type=int, default=0)
    ap.add_argument("--segments", type=int, default=4)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--mode", choices=["mor", "cow"], default="mor")
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args(argv)

    # `etl_spark` must come from --py-files; import inside main so a
    # missing zip fails with the import error, not at module load of argparse
    from pyspark.sql import SparkSession, functions as F

    from etl_spark.cdc.apply import replay_feed
    from etl_spark.cdc.gen import change_feed_df, write_feed
    from etl_spark.lake.table import LakeTable
    from etl_spark.schema import TRANSCRIPT_SCHEMA

    spark = (
        SparkSession.builder.appName("etl-spark-cdc-apply")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.time()
    gen_sec = 0.0
    if args.gen_events:
        g0 = time.time()
        feed = change_feed_df(
            spark,
            n_events=args.gen_events,
            n_convs=args.gen_convs or max(64, args.gen_events // 16),
            seed=args.seed,
            n_batches=args.segments,
        )
        write_feed(feed, args.feed, n_batches=args.segments)
        gen_sec = time.time() - g0

    table = LakeTable.create_if_not_exists(
        args.table, TRANSCRIPT_SCHEMA, n_buckets=args.buckets
    )
    stats = replay_feed(spark, table, args.feed, mode=args.mode)

    live = table.read(spark)
    digest = live.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64("conv_id", "turn_idx", "role", "text", "tool", "ts")
            .cast("decimal(28,0)")
        ).alias("hsum"),
        F.expr(
            "bit_xor(xxhash64(conv_id, turn_idx, role, text, tool, ts))"
        ).alias("hxor"),
    ).first()
    events = sum(s.events_in for s in stats)
    wall = time.time() - t0 - gen_sec
    print(
        json.dumps(
            {
                "ok": True,
                "mode": args.mode,
                "batches": len(stats),
                "events": events,
                "events_per_sec": round(events / max(wall, 1e-9), 1),
                "final_rows": int(digest["n"]),
                "state_hsum": str(digest["hsum"]),
                "state_hxor": int(digest["hxor"] or 0),
                "applied": sum(s.inserted + s.updated + s.deleted for s in stats),
                "dup_dropped": sum(s.dup_dropped for s in stats),
                "failed": sum(s.failed for s in stats),
                "wall_sec": round(wall, 2),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
