"""10x bench point (r3 VERDICT item 8): materialize an sf1-scale
replica of the sf0.1 driver tables once (untimed) and run the headline
bench queries on it, so planning-dominated timings (ann, knn) separate
from scan-dominated ones (pip, cell_counts, minhash) before the next
optimization pass.

Scaling recipe: 10 copies of each sf0.1 table with deterministic key
offsets and value perturbations — keys stay unique, derived lat/lon
distributions shift per copy (not 10 identical stacks), documents get
per-copy text tags (planted near-dup families — the realistic web
shape), embeddings get per-copy epsilon shifts.

Appends BENCH/SF1.md and prints one JSON line.
"""

from __future__ import annotations

import sys
sys.path.insert(0, "/root/repo")

import json
import os
import time

SRC_SF = os.environ.get("SPARK_GRAFT_SF1_BASE", "/root/testdata/sf0.1")
DST = "/tmp/geospark_sf1"
COPIES = 10


def materialize(spark) -> str:
    from pyspark.sql import functions as F
    os.makedirs(DST, exist_ok=True)

    def key_max(df, col):
        return df.agg(F.max(col)).collect()[0][0] + 1

    specs = {
        # table: (key columns to offset, perturb fn or None)
        "lineitem": (["l_orderkey"], lambda df, i: df
                     .withColumn("l_partkey",
                                 F.col("l_partkey") + (i * 13))
                     .withColumn("l_extendedprice",
                                 F.col("l_extendedprice") + (i * 17.77))),
        "customer": (["c_custkey"], lambda df, i: df
                     .withColumn("c_acctbal",
                                 F.col("c_acctbal") + (i * 23.39))),
        "supplier": (["s_suppkey"], lambda df, i: df
                     .withColumn("s_acctbal",
                                 F.col("s_acctbal") + (i * 31.17))),
        "part": (["p_partkey"], None),
        "documents": (["doc_id"], lambda df, i: df
                      .withColumn("text", F.concat(
                          F.lit(f"c{i} "), F.col("text"),
                          F.lit(f" v{i}")))),
        "embeddings": (["vec_id"], lambda df, i: df
                       .withColumn("embedding", F.transform(
                           "embedding",
                           lambda x, j: x + F.lit(float(i) * 1e-3)
                           * ((j % 7).cast("float") - 3.0)))),
        # session-12 additions: events (hll_cells' 10x distinct-user
        # point) and orders (bloom_probe's 10x build side)
        "events": (["event_id", "user_id"], lambda df, i: df
                   .withColumn("value",
                               F.col("value") + (i * 11.13))),
        "orders": (["o_orderkey", "o_custkey"], None),
    }
    for table, (keys, perturb) in specs.items():
        if os.path.exists(os.path.join(DST, f"{table}.parquet",
                                       "_SUCCESS")):
            continue
        base = spark.read.parquet(f"{SRC_SF}/{table}.parquet")
        offs = {k: key_max(base, k) for k in keys}
        parts = []
        for i in range(COPIES):
            d = base
            for k in keys:
                d = d.withColumn(k, F.col(k) + (i * offs[k]))
            if perturb is not None and i > 0:
                d = perturb(d, i)
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite") \
            .parquet(f"{DST}/{table}.parquet")
        print(f"materialized {table} x{COPIES}")
    open(os.path.join(DST, "_DONE"), "w").close()
    return DST


def main() -> None:
    import bench
    # pages_pipeline's 10x point: 1.5M synth pages instead of the sf0.1
    # default 150k (synthesis is untimed setup, cached per size)
    os.environ.setdefault("SPARK_GRAFT_BENCH_PAGES", "1500000")
    spark = bench.build_session(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    materialize(spark)
    qs = bench.bench_queries(spark, DST)
    # all NINE headline queries (r5 closes the r4 gap: poly_join,
    # distance_join, pages_pipeline had no 10x point)
    names = ["pip_lineitem", "pip_many_boxes", "cell_counts_lineitem",
             "knn", "minhash_docs", "ann_topk",
             "poly_join", "distance_join", "pages_pipeline"]
    qs = {n: qs[n] for n in names}
    for fn in qs.values():  # untimed warmup
        fn()
    timings, counts = {}, {}
    for name, fn in qs.items():
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            counts[name] = fn()
            runs.append(round(time.monotonic() - t0, 3))
        runs.sort()
        timings[name] = {"min": runs[0], "max": runs[-1], "runs": runs}
    out = {"sf": 1.0, "base": SRC_SF, "copies": COPIES,
           "queries": {n: t["min"] for n, t in timings.items()},
           "spreads": timings, "counts": counts}
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/SF1.md", "a") as f:
        f.write(f"\n## sf1 run ({COPIES}x {SRC_SF})\n\n")
        f.write("| query | min s | max s | result rows |\n|---|---|---|---|\n")
        for n, t in timings.items():
            f.write(f"| {n} | {t['min']} | {t['max']} | {counts[n]} |\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
