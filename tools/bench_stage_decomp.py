"""Fine-grained decomposition of the PIP-join+agg stage (r5).

The r4 story ("shared-host memory saturation past ~8 threads") is
re-tested here by splitting the stage into nested sub-variants over the
same pre-materialized geotags:

  scanagg  — scan + cell_encode + groupBy(cell,lang).count (no join)
  joinonly — + broadcast cover join (no ray-cast refine; wrong answer,
             measures join cost)
  full     — spatial_join + tile_counts (the real stage)

plus a per-run phase split (plan_s = driver-side analysis+physical
planning, exec_s = first action) so an Amdahl serial term shows up as
a constant across parallelism levels.

Usage: python tools/bench_stage_decomp.py [variant ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROWS = int(os.environ.get("SPARK_GRAFT_SCALE_ROWS", "6000000"))
GEO = f"/tmp/geospark_scale_geo_{ROWS}"
LEVELS = [int(x) for x in
          os.environ.get("SPARK_GRAFT_STAGE_LEVELS", "2,8").split(",")]

_WORKER = r"""
import json, sys, time
variant, cpus, geo_src = sys.argv[1], int(sys.argv[2]), sys.argv[3]
from pyspark.sql import SparkSession, functions as F
from geospark.conf import apply_tuned
spark = (apply_tuned(SparkSession.builder.master(f"local[{cpus}]"))
     .appName(f"geospark-decomp-{variant}-{cpus}")
     .config("spark.sql.shuffle.partitions", str(cpus))
     .config("spark.ui.enabled", "false")
     .config("spark.ui.showConsoleProgress", "false")
     .config("spark.sql.files.maxPartitionBytes", "16777216")
     .config("spark.driver.memory", "32g")
     .config("spark.driver.extraJavaOptions",
             "-Xms32g -XX:+AlwaysPreTouch")
     .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from geospark.functions.cells import cell_encode
from geospark.operators.joins import spatial_join
from geospark.operators.tiles import tile_counts
from geospark.sources.synth import zones_df

def build():
    geo = spark.read.parquet(geo_src)
    if variant == "scanagg":
        return (geo.withColumn("cell", cell_encode("lat", "lon", 8))
                .groupBy("cell", "lang").count())
    if variant == "joinonly":
        # broadcast cover join + agg with a trivial refine (keep _full
        # only): counts are wrong on boundary cells — isolates the
        # join's own cost vs the ray-cast expression
        from geospark.operators.joins import polygon_cover
        polys = [(r["zone_id"], r["geom_wkb"]) for r in
                 zones_df(spark).select("zone_id", "geom_wkb").collect()]
        cover, _rings = polygon_cover(polys, 8)
        cover_df = spark.createDataFrame(
            [(int(p), int(c), bool(f)) for p, c, f in cover],
            schema="zone_id long, _cell long, _full boolean")
        pts = geo.withColumn("_cell", cell_encode("lat", "lon", 8))
        pip = (pts.join(F.broadcast(cover_df), "_cell")
               .filter(F.col("_full")).drop("_cell", "_full"))
        return tile_counts(pip, 8, extra_keys=["zone_id", "lang"])
    if variant == "full":
        pip = spatial_join(geo, zones_df(spark), res=8)
        return tile_counts(pip, 8, extra_keys=["zone_id", "lang"])
    raise ValueError(variant)

# warmup (untimed, full build+run)
n0 = build().count()
plans, execs = [], []
for _ in range(4):
    t0 = time.monotonic()
    df = build()
    df._jdf.queryExecution().executedPlan()   # analysis+optim+physical
    t1 = time.monotonic()
    n = df.count()                            # codegen + execution
    t2 = time.monotonic()
    plans.append(t1 - t0); execs.append(t2 - t1)
assert n == n0
i = execs.index(min(execs))
print(json.dumps({"variant": variant, "cpus": cpus,
                  "plan_s": round(plans[i], 3),
                  "exec_s": round(execs[i], 3),
                  "wall": round(plans[i] + execs[i], 3),
                  "execs": [round(w, 2) for w in execs],
                  "plans": [round(w, 2) for w in plans],
                  "n_rows": n}))
spark.stop()
"""


def main() -> None:
    variants = sys.argv[1:] or ["scanagg", "joinonly", "full"]
    results = []
    for variant in variants:
        for cpus in LEVELS:
            out = subprocess.run(
                [sys.executable, "-c", _WORKER, variant, str(cpus), GEO],
                capture_output=True, text=True, cwd="/root/repo",
                timeout=1800)
            lines = [ln for ln in out.stdout.splitlines()
                     if ln.startswith("{")]
            if not lines:
                raise RuntimeError(f"{variant}@{cpus} failed:\n"
                                   f"{out.stderr[-3000:]}")
            r = json.loads(lines[-1])
            results.append(r)
            print(json.dumps(r))
    for variant in variants:
        vs = {r["cpus"]: r for r in results if r["variant"] == variant}
        if len(LEVELS) == 2 and all(n in vs for n in LEVELS):
            a, b = LEVELS
            eff = (vs[a]["wall"] / vs[b]["wall"]) / (b / a)
            eff_x = (vs[a]["exec_s"] / vs[b]["exec_s"]) / (b / a)
            print(json.dumps({"variant": variant,
                              f"eff_{a}to{b}_wall": round(eff, 3),
                              f"eff_{a}to{b}_exec": round(eff_x, 3)}))


if __name__ == "__main__":
    main()
