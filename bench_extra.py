"""Round-6 measurement harness. ``bench.py`` is FROZEN for driver
measurement; everything exploratory lives here (guide §1):

  * per-query isolation with the same timing methodology as bench.py
    (reuses bench.build_session / bench.bench_queries verbatim);
  * ``--explain`` dumps .explain("formatted") for each headline query
    to plans/r06/<query>_<tag>.txt (judge-checkable plan evidence);
  * ``--ui`` enables the Spark UI for stage-level inspection;
  * ``--queries a,b`` restricts to a subset so one query is measured
    without the others' JVM warmup noise.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
      --queries knn,pip_many_boxes --reps 3
  python bench_extra.py --explain before   # plan dump only, no timing
"""

from __future__ import annotations

import argparse
import json
import os
import time

import bench


def headline_dfs(spark, sf_dir):
    """name -> zero-arg callable returning the RESULT DataFrame of each
    headline query (pre-action), mirroring bench.bench_queries exactly —
    used for plan capture; bench_queries stays the timing source."""
    from geospark import queries as q
    from geospark.functions.cells import cell_encode
    from geospark.operators.dedup import minhash_pairs
    from geospark.operators.joins import (distance_join as dj,
                                          spatial_join,
                                          spatial_join_polygons)

    def pip_lineitem():
        pts = bench._lineitem_points(spark, sf_dir)
        out = spatial_join(pts, q.fixed_zones_df(spark), res=8)
        return out.groupBy("zone_id").count()

    def cell_counts_lineitem():
        pts = bench._lineitem_points(spark, sf_dir)
        return (pts.withColumn("cell", cell_encode("lat", "lon", 10))
                .groupBy("cell").count())

    def knn():
        return q.q_knn(spark, sf_dir)

    def minhash_docs():
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return minhash_pairs(d)

    def ann_topk():
        return q.q_ann_topk(spark, sf_dir)

    def pip_many_boxes():
        src = f"/tmp/geospark_bench_boxes_{sf_dir.replace('/', '_')}"
        if not os.path.exists(os.path.join(src, "_SUCCESS")):
            q._part_box_polys(spark, sf_dir).repartition(8) \
                .write.mode("overwrite").parquet(src)
        boxes = spark.read.parquet(src)
        pts = bench._lineitem_points(spark, sf_dir)
        out = spatial_join(pts, boxes, res=8, poly_id_col="box_id",
                           distributed=True)
        return out.groupBy("box_id").count()

    def poly_join():
        tag = sf_dir.replace('/', '_')
        lsrc = f"/tmp/geospark_bench_suppboxes_{tag}"
        rsrc = f"/tmp/geospark_bench_boxes_{tag}"
        if not os.path.exists(os.path.join(lsrc, "_SUCCESS")):
            q._supp_box_polys(spark, sf_dir).repartition(8) \
                .write.mode("overwrite").parquet(lsrc)
        if not os.path.exists(os.path.join(rsrc, "_SUCCESS")):
            q._part_box_polys(spark, sf_dir).repartition(8) \
                .write.mode("overwrite").parquet(rsrc)
        return spatial_join_polygons(
            spark.read.parquet(lsrc), spark.read.parquet(rsrc),
            res=6, l_id="supp_box_id", r_id="box_id")

    def distance_join():
        qq = q._supp_queries(spark, sf_dir)
        pts = bench._lineitem_points(spark, sf_dir)
        return dj(qq, pts, 2.0, res=6, l_lat="q_lat", l_lon="q_lon")

    def pages_pipeline():
        from geospark.operators.extract import extract_pages
        from geospark.operators.tiles import tile_counts
        src = bench._pages_src(spark)
        geo = extract_pages(spark.read.parquet(src))
        return tile_counts(geo, 8, extra_keys=["lang"])

    return {
        "pip_lineitem": pip_lineitem,
        "pip_many_boxes": pip_many_boxes,
        "cell_counts_lineitem": cell_counts_lineitem,
        "knn": knn,
        "minhash_docs": minhash_docs,
        "ann_topk": ann_topk,
        "poly_join": poly_join,
        "distance_join": distance_join,
        "pages_pipeline": pages_pipeline,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="",
                    help="comma-separated subset (default: all)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default="",
                    help="tag: dump plans/r06/<q>_<tag>.txt and exit")
    ap.add_argument("--ui", action="store_true")
    ap.add_argument("--noop", action="store_true",
                    help="time with the noop sink instead of the "
                         "bench's count() action")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if args.ui:
        os.environ.pop("SPARK_GRAFT_NO_UI", None)
    spark = bench.build_session(cpus) if not args.ui else (
        __import__("geospark.conf", fromlist=["apply_tuned"]).apply_tuned(
            __import__("pyspark.sql", fromlist=["SparkSession"])
            .SparkSession.builder.master(f"local[{cpus}]"))
        .appName("geospark-bench-extra")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.files.maxPartitionBytes", "16777216")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    sel = [s for s in args.queries.split(",") if s]

    if args.explain:
        os.makedirs("plans/r06", exist_ok=True)
        for name, fn in headline_dfs(spark, sf_dir).items():
            if sel and name not in sel:
                continue
            df = fn()
            path = f"plans/r06/{name}_{args.explain}.txt"
            with open(path, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print("wrote", path)
        spark.stop()
        return

    qs = bench.bench_queries(spark, sf_dir)
    if args.noop:
        dfs = headline_dfs(spark, sf_dir)

        def noop_run(name):
            df = dfs[name]()
            df.write.format("noop").mode("overwrite").save()
            return -1
    timings = {}
    for name, fn in qs.items():
        if sel and name not in sel:
            continue
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        if args.noop:
            noop_run(name)
        else:
            fn()
        runs = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name}:rep{i}")
            t0 = time.monotonic()
            noop_run(name) if args.noop else fn()
            runs.append(round(time.monotonic() - t0, 3))
        runs.sort()
        timings[name] = {"min": runs[0], "all": runs}
        print(name, json.dumps(timings[name]), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "timings": timings}))
    if args.ui:
        input("UI at http://localhost:4040 — press enter to exit")
    spark.stop()


if __name__ == "__main__":
    main()
