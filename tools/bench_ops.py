"""Parameterized per-operator bench runner (r6 — consolidates the 27
one-shot ``bench_sf1_ops*.py`` scripts into one tool keyed by query
name; BENCH/R5OPS.md and BENCH/SF1.md remain the results ledgers).

Times ``__spark_entry__.queries()[name]`` at one or more scales:

  python tools/bench_ops.py dwell_cells cell_density            # sf0.1
  python tools/bench_ops.py --sf1 batch_dedup colocation        # + 10x
  python tools/bench_ops.py --events --sf1 traj_cells           # 10x
      # events replica too (trajectory/session ops need it)
  python tools/bench_ops.py --reps 3 --md "wave label" ...      # append
      # the ledgers with a labelled section

Prints one JSON line per run. The 10x dataset is materialized once in
/tmp by tools/bench_sf1.py (points tables) and the events replica by
the ``--events`` flag (disjoint user universes per copy, per-copy
value perturbation — see the original ops script docstrings)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import argparse
import json
import os
import time

import bench
import bench_sf1


def _time(fn, spark, sf_dir, runs):
    out = []
    count = None
    for _ in range(runs):
        t0 = time.monotonic()
        count = fn(spark, sf_dir).count()
        out.append(round(time.monotonic() - t0, 3))
    return out, count


def materialize_events(spark) -> None:
    """10 event-table copies with user_id/event_id offsets (disjoint
    user universes per copy) and a per-copy value perturbation so the
    derived coordinates shift per copy instead of stacking identical
    geometries."""
    from pyspark.sql import functions as F
    done = os.path.join(bench_sf1.DST, "_DONE_EVENTS")
    if os.path.exists(done):
        return
    base = spark.read.parquet(f"{bench_sf1.SRC_SF}/events.parquet")
    offs = {c: base.agg(F.max(c)).collect()[0][0] + 1
            for c in ("event_id", "user_id")}
    parts = []
    for i in range(bench_sf1.COPIES):
        d = base
        for c in ("event_id", "user_id"):
            d = d.withColumn(c, F.col(c) + (i * offs[c]))
        if i > 0:
            d = d.withColumn("value", F.col("value") + (i * 7.77))
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(64).write.mode("overwrite") \
        .parquet(os.path.join(bench_sf1.DST, "events.parquet"))
    open(done, "w").close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ops", nargs="+", help="queries() names to time")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf1", action="store_true",
                    help="also time at the 10x /tmp dataset")
    ap.add_argument("--events", action="store_true",
                    help="materialize the 10x events replica first")
    ap.add_argument("--md", default="",
                    help="append BENCH ledgers with this section label")
    args = ap.parse_args()

    spark = bench.build_session(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry
    qs = entry.queries()
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    res01 = {}
    for name in args.ops:
        runs, n = _time(qs[name], spark, sf01, args.reps)
        res01[name] = {"warm": runs[0], "hot": min(runs), "rows": n}
    out = {"sf0.1": res01}

    if args.sf1:
        bench_sf1.materialize(spark)
        if args.events:
            materialize_events(spark)
        res1 = {}
        for name in args.ops:
            runs, n = _time(qs[name], spark, bench_sf1.DST, args.reps)
            res1[name] = {"min": min(runs), "max": max(runs),
                          "runs": sorted(runs), "rows": n}
        out["sf1"] = res1

    if args.md:
        with open("/root/repo/BENCH/R5OPS.md", "a") as f:
            f.write(f"\n## {args.md} (sf0.1, local[32], warm + hot)\n\n"
                    "| query | result rows | warm s | hot s |\n"
                    "|---|---|---|---|\n")
            for n, t in res01.items():
                f.write(f"| {n} | {t['rows']:,} | {t['warm']} "
                        f"| {t['hot']} |\n")
        if args.sf1:
            with open("/root/repo/BENCH/SF1.md", "a") as f:
                f.write(f"\n## {args.md} at sf1 "
                        f"({bench_sf1.COPIES}x {bench_sf1.SRC_SF})\n\n"
                        "| query | result rows | min s | max s |\n"
                        "|---|---|---|---|\n")
                for n, t in out["sf1"].items():
                    f.write(f"| {n} | {t['rows']:,} | {t['min']} "
                            f"| {t['max']} |\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
