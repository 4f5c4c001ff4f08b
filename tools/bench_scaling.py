#!/usr/bin/env python
"""N vs 4N scaling evidence (north rule: throughput scaling efficiency
>= 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so the same job runs at two
parallelism levels — local[N] and local[4N] — in FRESH processes (a Spark
local session is a singleton per JVM) over the SAME pre-generated feed.
Efficiency = (rate_4N / rate_N) / 4 = (T_N / T_4N) / 4.

Each level runs `reps` times, INTERLEAVED (N, 4N, N, 4N, ...), and the MIN
wall (max rate) per level is used: this VM suffers heavy, bursty hypervisor
CPU steal (measured up to ~35% of all cycles), so back-to-back interleaving
plus best-of-k is the only way to sample both levels under comparable host
conditions. Each child also reports the steal fraction observed during its
own run (from /proc/stat) so results can be judged for contamination.

Usage:
    python tools/bench_scaling.py [--events 2000000] [--n 8] [--reps 2]
    python tools/bench_scaling.py --child FEED_DIR CORES   (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _cpu_sample() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def child(feed_dir: str, cores: int) -> None:
    from etl_spark.cdc.apply import replay_feed
    from etl_spark.lake.table import LakeTable
    from etl_spark.schema import TRANSCRIPT_SCHEMA
    from etl_spark.session import get_spark

    spark = get_spark(cores=cores, app_name=f"scaling_{cores}")
    work = tempfile.mkdtemp(prefix=f"scaling_lake_{cores}_")
    try:
        table = LakeTable.create(os.path.join(work, "lake"), TRANSCRIPT_SCHEMA, n_buckets=64)
        # warmup: touch the feed so JVM/codegen/file-listing costs are paid,
        # and prime the Python workers (pandas/pyarrow import once per core —
        # ~20-30s of cold-start otherwise billed to the first micro-batch)
        spark.read.parquet(f"{feed_dir}/*").count()

        def _noop(it):
            yield from it

        spark.range(cores * 4, numPartitions=cores * 4).mapInPandas(
            _noop, schema="id long"
        ).count()
        s0, t0j = _cpu_sample()
        t0 = time.time()
        stats = replay_feed(spark, table, feed_dir)
        wall = time.time() - t0
        s1, t1j = _cpu_sample()
        steal_frac = (s1 - s0) / max(1, t1j - t0j)
        events = sum(s.events_in for s in stats)
        print(
            json.dumps(
                {
                    "cores": cores,
                    "apply_sec": round(wall, 2),
                    "events": events,
                    "events_per_sec": round(events / wall, 1),
                    "batch_walls": [round(s.wall_sec, 2) for s in stats],
                    "host_steal_frac": round(steal_frac, 3),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--segments", type=int, default=4)
    ap.add_argument("--n", type=int, default=8, help="base parallelism N (4N is derived)")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--text-len", type=int, default=240,
                    help="max payload text length (bigger → compute-dominated)")
    ap.add_argument("--child", nargs=2, metavar=("FEED_DIR", "CORES"))
    args = ap.parse_args()

    if args.child:
        child(args.child[0], int(args.child[1]))
        return

    work = tempfile.mkdtemp(prefix="etl_spark_scaling_")
    feed_dir = os.path.join(work, "feed")
    try:
        # generate ONE feed (parallelism of this step is irrelevant)
        from etl_spark.cdc.gen import change_feed_df, write_feed
        from etl_spark.session import get_spark

        spark = get_spark(app_name="scaling_gen")
        feed = change_feed_df(
            spark,
            n_events=args.events,
            n_convs=max(1000, args.events // 100),
            max_turns=32,
            seed=42,
            skew=2.0,
            n_batches=args.segments,
            text_len=args.text_len,
        )
        write_feed(feed, feed_dir, n_batches=args.segments)
        spark.stop()

        results: dict[int, list[dict]] = {args.n: [], 4 * args.n: []}
        # interleave levels so both sample comparable host-contention windows
        for _rep in range(args.reps):
            for cores in (args.n, 4 * args.n):
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--child", feed_dir, str(cores)],
                    capture_output=True,
                    text=True,
                    cwd=REPO,
                    check=True,
                )
                line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
                r = json.loads(line)
                results[cores].append(r)
                print(f"  local[{cores}] rep: {r['apply_sec']}s "
                      f"({r['events_per_sec']} ev/s, steal={r['host_steal_frac']})",
                      file=sys.stderr)

        best = {c: max(rs, key=lambda r: r["events_per_sec"]) for c, rs in results.items()}
        n, n4 = args.n, 4 * args.n
        eff = (best[n4]["events_per_sec"] / best[n]["events_per_sec"]) / 4.0
        print(
            json.dumps(
                {
                    "events": args.events,
                    "segments": args.segments,
                    "text_len": args.text_len,
                    "n": n,
                    "rate_n": best[n]["events_per_sec"],
                    "wall_n": best[n]["apply_sec"],
                    "rate_4n": best[n4]["events_per_sec"],
                    "wall_4n": best[n4]["apply_sec"],
                    "scaling_efficiency": round(eff, 3),
                    "all_runs": {str(c): rs for c, rs in results.items()},
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
