"""Scale evidence for the session-14 wave-11 operators (r5.45):
warm+hot at sf0.1 and 10x points at sf1 (bench_sf1_ops3 recipe). The 10x
stories: dwell_cells is one user-keyed lead window + a cell agg (the
sessionize envelope); cell_density is one cell shuffle + a
2^res-row literal broadcast.

Appends BENCH/R5OPS.md (sf0.1) and BENCH/SF1.md (sf1) and prints one
JSON line. Run from the repo root (executor Python workers must
import geospark — the ops8 worker-path gotcha).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import json
import os

import bench
import bench_sf1
from bench_sf1_ops3 import _time

OPS = ("dwell_cells", "cell_density")

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = bench.build_session(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry
    qs = entry.queries()

    res01 = {}
    for name in OPS:
        runs, n = _time(qs[name], spark, SF01, 2)
        res01[name] = {"warm": runs[0], "hot": runs[-1], "rows": n}

    bench_sf1.materialize(spark)
    res1 = {}
    for name in OPS:
        runs, n = _time(qs[name], spark, bench_sf1.DST, 2)
        res1[name] = {"warm": runs[0], "hot": runs[-1], "rows": n}

    with open("/root/repo/BENCH/R5OPS.md", "a") as f:
        f.write("\n## r5.45 wave-11 operators (sf0.1, local[32], "
                "warm + hot)\n\n")
        f.write("| query | result rows | warm s | hot s |\n"
                "|---|---|---|---|\n")
        for n, t in res01.items():
            f.write(f"| {n} | {t['rows']:,} | {t['warm']} "
                    f"| {t['hot']} |\n")
    with open("/root/repo/BENCH/SF1.md", "a") as f:
        f.write("\n## session-14 wave-11 operators (r5.45) at sf1 "
                f"({bench_sf1.COPIES}x {bench_sf1.SRC_SF})\n\n")
        f.write("| query | result rows | warm s | hot s |\n"
                "|---|---|---|---|\n")
        for n, t in res1.items():
            f.write(f"| {n} | {t['rows']:,} | {t['warm']} "
                    f"| {t['hot']} |\n")
    print(json.dumps({"sf0.1": res01, "sf1": res1}))
    spark.stop()


if __name__ == "__main__":
    main()
