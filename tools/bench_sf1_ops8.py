"""Scale evidence for hull_nation + z_ranges: warm+hot at sf0.1 and
10x points at sf1 (bench_sf1_ops3 recipe). hull_nation is the
two-phase mapInPandas/applyInPandas hull (shuffle = partial-hull
vertices only); z_ranges is a bounded explode + per-rect window.

Appends BENCH/R5OPS.md + BENCH/SF1.md and prints one JSON line.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import json
import os

import bench
import bench_sf1
import bench_sf1_ops
from bench_sf1_ops3 import SF01, _time

OPS = ("hull_nation", "z_ranges")


def main() -> None:
    spark = bench.build_session(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    bench_sf1.materialize(spark)
    bench_sf1_ops.materialize_events(spark)
    import __spark_entry__ as entry
    qs = entry.queries()

    res01, res1 = {}, {}
    for name in OPS:
        runs, n = _time(qs[name], spark, SF01, 2)
        res01[name] = {"warm": runs[0], "hot": runs[-1], "rows": n}
        runs, n = _time(qs[name], spark, bench_sf1.DST, 3)
        res1[name] = {"min": min(runs), "max": max(runs),
                      "runs": sorted(runs), "rows": n}

    with open("/root/repo/BENCH/R5OPS.md", "a") as f:
        f.write("\n## r5.26b operators (sf0.1, local[32], "
                "warm + hot)\n\n")
        f.write("| query | result rows | warm s | hot s |\n"
                "|---|---|---|---|\n")
        for n, t in res01.items():
            f.write(f"| {n} | {t['rows']:,} | {t['warm']} "
                    f"| {t['hot']} |\n")
    with open("/root/repo/BENCH/SF1.md", "a") as f:
        f.write("\n## r5.26b operators at sf1 "
                f"({bench_sf1.COPIES}x {bench_sf1.SRC_SF})\n\n")
        f.write("| query | min s | max s | result rows |\n"
                "|---|---|---|---|\n")
        for n, t in res1.items():
            f.write(f"| {n} | {t['min']} | {t['max']} "
                    f"| {t['rows']:,} |\n")
    print(json.dumps({"sf01": res01, "sf1": res1}))
    spark.stop()


if __name__ == "__main__":
    main()
