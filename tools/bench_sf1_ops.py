"""10x points for the round-5 training/geo operators (the bench_sf1
recipe, extended with an events replica — the base tool only scales
the headline-suite tables).

Events scaling: 10 copies with user_id/event_id offsets (disjoint user
universes per copy — trajectories and sessions stay realistic) and a
per-copy value perturbation so the derived coordinates shift per copy
instead of stacking 10 identical geometries.

Appends BENCH/SF1.md and prints one JSON line.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import json
import os
import time

import bench
import bench_sf1

DST = bench_sf1.DST
COPIES = bench_sf1.COPIES
SRC_SF = bench_sf1.SRC_SF

OPS = ["batch_dedup", "source_overlap", "link_rank",
       "traj_cells", "colocation"]


def materialize_events(spark) -> None:
    from pyspark.sql import functions as F
    done = os.path.join(DST, "_DONE_EVENTS")
    if os.path.exists(done):
        return
    base = spark.read.parquet(f"{SRC_SF}/events.parquet")
    offs = {c: base.agg(F.max(c)).collect()[0][0] + 1
            for c in ("event_id", "user_id")}
    parts = []
    for i in range(COPIES):
        d = base
        for c in ("event_id", "user_id"):
            d = d.withColumn(c, F.col(c) + (i * offs[c]))
        if i > 0:
            d = d.withColumn("value", F.col("value") + (i * 7.77))
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite") \
        .parquet(f"{DST}/events.parquet")
    open(done, "w").close()
    print(f"materialized events x{COPIES}")


def main() -> None:
    spark = bench.build_session(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    bench_sf1.materialize(spark)
    materialize_events(spark)
    import __spark_entry__ as entry
    qs = entry.queries()
    timings, counts = {}, {}
    for name in OPS:
        qs[name](spark, DST).count()   # untimed warmup
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            counts[name] = qs[name](spark, DST).count()
            runs.append(round(time.monotonic() - t0, 3))
        runs.sort()
        timings[name] = {"min": runs[0], "max": runs[-1], "runs": runs}
    out = {"sf": 1.0, "base": SRC_SF, "copies": COPIES,
           "queries": {n: t["min"] for n, t in timings.items()},
           "spreads": timings, "counts": counts}
    with open("/root/repo/BENCH/SF1.md", "a") as f:
        f.write(f"\n## r5 training/geo operators at sf1 "
                f"({COPIES}x {SRC_SF}, incl. events replica)\n\n")
        f.write("| query | min s | max s | result rows |\n"
                "|---|---|---|---|\n")
        for n, t in timings.items():
            f.write(f"| {n} | {t['min']} | {t['max']} | "
                    f"{counts[n]} |\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
