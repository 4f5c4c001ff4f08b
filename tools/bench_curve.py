#!/usr/bin/env python
"""Three-point scaling curve (1 / 2 / 4 executors) — the SHAPE evidence
that strengthens the pair-based N-vs-4N measurements against host-weather
criticism: a single clean window sampled at three cluster sizes shows
whether efficiency decays smoothly (engine property) or jumps around
(host property).

Reuses tools/bench_scaling.py's child protocol (fresh process per level,
pinned cores, per-leg steal + engine-CPU accounting). Levels interleave
within each rep so all three sample comparable host windows; best-of-k
per level. Prints one JSON line.

Usage: python tools/bench_curve.py [--events 8000000] [--reps 2]
       [--exec-cores 2] [--levels 1,2,4]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCALING = os.path.join(REPO, "tools", "bench_scaling.py")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=8_000_000)
    ap.add_argument("--segments", type=int, default=4)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--exec-cores", type=int, default=2)
    ap.add_argument("--levels", default="1,2,4")
    ap.add_argument("--mode", default="mor")
    ap.add_argument("--pin", action=argparse.BooleanOptionalAction,
                    default=True, help="taskset-pin children (--no-pin to disable)")
    ap.add_argument(
        "--workdir", default="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    from tools.bench_scaling import _wait_jvm_drain  # type: ignore

    work = tempfile.mkdtemp(prefix="etl_spark_curve_", dir=args.workdir)
    feed_dir = os.path.join(work, "feed")
    try:
        from etl_spark.cdc.gen import change_feed_df, write_feed
        from etl_spark.session import get_spark

        spark = get_spark(app_name="curve_gen")
        feed = change_feed_df(
            spark, n_events=args.events,
            n_convs=max(1000, args.events // 100), max_turns=32, seed=42,
            skew=2.0, n_batches=args.segments, text_len=240,
        )
        n_files = max(32, 4 * max(levels) * args.exec_cores)
        write_feed(feed, feed_dir, n_batches=args.segments,
                   files_per_segment=n_files)
        spark.stop()
        # kill the gen JVM outright (see bench_scaling.py for the measured
        # orphaned-JVM contamination this prevents)
        try:
            from pyspark import SparkContext

            SparkContext._gateway.shutdown()  # type: ignore[union-attr]
            SparkContext._gateway = None
            SparkContext._jvm = None
        except Exception:
            pass
        import signal

        me = os.getpid()
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            try:
                with open(f"/proc/{d}/stat") as f:
                    s = f.read()
                comm = s[s.index("(") + 1:s.rindex(")")]
                ppid = int(s[s.rindex(")") + 2:].split()[1])
                if comm == "java" and ppid == me:
                    os.kill(int(d), signal.SIGKILL)
            except (OSError, ValueError):
                continue
        _wait_jvm_drain()

        specs = [f"x{n}c{args.exec_cores}" for n in levels]
        results: dict[str, list[dict]] = {sp: [] for sp in specs}
        for _rep in range(args.reps):
            for n, sp in zip(levels, specs):
                _wait_jvm_drain()
                budget = n * args.exec_cores + 2
                cmd = [sys.executable, SCALING, "--child", feed_dir, sp,
                       args.mode]
                if args.pin:
                    cmd = ["taskset", "-c", f"0-{budget - 1}"] + cmd
                out = subprocess.run(cmd, capture_output=True, text=True,
                                     cwd=REPO, check=True)
                line = [l for l in out.stdout.splitlines()
                        if l.startswith("{")][-1]
                r = json.loads(line)
                results[sp].append(r)
                print(f"  {sp}: {r['apply_sec']}s ({r['events_per_sec']} "
                      f"ev/s, steal={r['host_steal_frac']})", file=sys.stderr)
        best = {sp: max(rs, key=lambda r: r["events_per_sec"])
                for sp, rs in results.items()}
        base = best[specs[0]]["events_per_sec"]
        curve = []
        for n, sp in zip(levels, specs):
            b = best[sp]
            curve.append({
                "executors": n,
                "cores": n * args.exec_cores,
                "events_per_sec": b["events_per_sec"],
                "speedup": round(b["events_per_sec"] / base, 3),
                "efficiency_vs_1": round(
                    b["events_per_sec"] / base / n, 3
                ),
                "steal": b["host_steal_frac"],
                "events_per_cpu_sec": b.get("events_per_cpu_sec"),
            })
        print(json.dumps({
            "metric": "scaling_curve",
            "events": args.events,
            "exec_cores": args.exec_cores,
            "mode": args.mode,
            "reps": args.reps,
            "curve": curve,
            "all_runs": {sp: [
                {"events_per_sec": r["events_per_sec"],
                 "steal": r["host_steal_frac"]} for r in rs
            ] for sp, rs in results.items()},
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
