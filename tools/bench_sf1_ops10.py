"""Scale evidence for the session-8 operator wave (r5.33-r5.35
additions with driver-catalog rows): warm+hot at sf0.1 and 10x
points at sf1 (bench_sf1_ops3 recipe). The interesting 10x stories:
the typed blocked pair join under colocation mining (coloc_pi), the
PBSM segment-crossing join whose OUTPUT grows ~quadratically with
point density (path_crossings — the 10x point measures emission
throughput), the two-blocked-join Knox statistic, and the
sum(df^2)-bound gram machinery (containment). kcore / colloc_lift /
bounded_paths are aggregate- or vocabulary-sized past their first
shuffle and should scale near-linearly.

Appends BENCH/SF1.md and prints one JSON line. Run from the repo
root (executor Python workers must import geospark — the ops8
worker-path gotcha).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import json
import os

import bench
import bench_sf1
import bench_sf1_ops
from bench_sf1_ops3 import _time

OPS = ("coloc_pi", "kcore", "colloc_lift", "knox", "containment",
       "bounded_paths", "path_crossings")


def main() -> None:
    spark = bench.build_session(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    bench_sf1.materialize(spark)
    bench_sf1_ops.materialize_events(spark)
    import __spark_entry__ as entry
    qs = entry.queries()

    res1 = {}
    for name in OPS:
        runs, n = _time(qs[name], spark, bench_sf1.DST, 3)
        res1[name] = {"min": min(runs), "max": max(runs),
                      "runs": sorted(runs), "rows": n}

    with open("/root/repo/BENCH/SF1.md", "a") as f:
        f.write("\n## session-8 operators (r5.33-r5.35) at sf1 "
                f"({bench_sf1.COPIES}x {bench_sf1.SRC_SF})\n\n")
        f.write("| query | min s | max s | result rows |\n"
                "|---|---|---|---|\n")
        for n, t in res1.items():
            f.write(f"| {n} | {t['min']} | {t['max']} "
                    f"| {t['rows']:,} |\n")
    print(json.dumps({"sf1": res1}))
    spark.stop()


if __name__ == "__main__":
    main()
