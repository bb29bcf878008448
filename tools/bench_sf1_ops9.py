"""Scale evidence for the session-7 operator waves (r5.27-r5.30
additions with driver-catalog rows): warm+hot at sf0.1 and 10x points
at sf1 (bench_sf1_ops3 recipe). The interesting 10x stories: the
integer-lattice blocked self-joins (pair_counts / nn_radius), the
τ-bucket contact join (contact_graph), and the broadcast-LM doc join
(lm_novelty); the rest are aggregate-sized outputs that should stay
near-flat.

nation.parquet is a DIMENSION table (the voronoi seed set): sf1
copies it unchanged — 10x the points contend for the same 25 seeds,
which is exactly the production shape.

Appends BENCH/SF1.md and prints one JSON line. Run from the repo
root (executor Python workers must import geospark — the ops8
worker-path gotcha).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import json
import os
import shutil

import bench
import bench_sf1
import bench_sf1_ops
from bench_sf1_ops3 import SF01, _time

OPS = ("pair_counts", "nn_radius", "contact_graph", "gyration",
       "path_motifs", "revisit_hist", "voronoi_counts", "cell_fano",
       "cell_gini", "type_transitions", "lm_novelty", "vocab_growth")


def materialize_nation() -> None:
    dst = os.path.join(bench_sf1.DST, "nation.parquet")
    if not os.path.exists(dst):
        shutil.copytree(
            os.path.join(bench_sf1.SRC_SF, "nation.parquet"), dst)


def main() -> None:
    spark = bench.build_session(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    bench_sf1.materialize(spark)
    bench_sf1_ops.materialize_events(spark)
    materialize_nation()
    import __spark_entry__ as entry
    qs = entry.queries()

    res1 = {}
    for name in OPS:
        runs, n = _time(qs[name], spark, bench_sf1.DST, 3)
        res1[name] = {"min": min(runs), "max": max(runs),
                      "runs": sorted(runs), "rows": n}

    with open("/root/repo/BENCH/SF1.md", "a") as f:
        f.write("\n## session-7 operators (r5.27-r5.30) at sf1 "
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
