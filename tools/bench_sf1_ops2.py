"""10x points for the round-5.21 operators (kNN graph, freshness
decay, interval-overlap join) — the bench_sf1 recipe over the same
replicated tables (documents/embeddings/supplier from bench_sf1,
events from bench_sf1_ops).

knn_graph runs with its SCALE-PATH parameters (n_bits=12 -> 4096
buckets/table instead of the sf0.01 catalog's 64): the operator's
contract is that selectivity scales with n_bits as n grows, so the
10x point must exercise that knob — at 50k vectors the sf0.01 config
would put ~800 correlated vectors in each bucket and measure the
cap, not the graph.

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
import bench_sf1_ops

DST = bench_sf1.DST


def _knn_graph_scale(spark, sf_dir):
    from geospark.operators.similarity import knn_graph
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return knn_graph(e, k=5, n_bits=12, n_tables=4)


def main() -> None:
    spark = bench.build_session(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    bench_sf1.materialize(spark)
    bench_sf1_ops.materialize_events(spark)
    import __spark_entry__ as entry
    qs = entry.queries()
    ops = {
        "knn_graph (n_bits=12)": _knn_graph_scale,
        "freshness": qs["freshness"],
        "interval_overlap": qs["interval_overlap"],
        "peak_sessions": qs["peak_sessions"],
        "robots_gate": qs["robots_gate"],
    }
    timings, counts = {}, {}
    for name, fn in ops.items():
        fn(spark, DST).count()   # untimed warmup
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            counts[name] = fn(spark, DST).count()
            runs.append(round(time.monotonic() - t0, 3))
        runs.sort()
        timings[name] = {"min": runs[0], "max": runs[-1], "runs": runs}
    out = {"sf": 1.0, "base": bench_sf1.SRC_SF,
           "copies": bench_sf1.COPIES,
           "queries": {n: t["min"] for n, t in timings.items()},
           "spreads": timings, "counts": counts}
    with open("/root/repo/BENCH/SF1.md", "a") as f:
        f.write("\n## r5.21 operators at sf1 "
                f"({bench_sf1.COPIES}x {bench_sf1.SRC_SF})\n\n")
        f.write("| query | min s | max s | result rows |\n"
                "|---|---|---|---|\n")
        for n, t in timings.items():
            f.write(f"| {n} | {t['min']} | {t['max']} | "
                    f"{counts[n]} |\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
