"""Isolated PIP-join+agg stage scaling experiment (r5).

The r4 decomposition pinned the flagship's raw 2->8 efficiency at
~0.68: scan+extract scales at 0.98, the PIP join + tile agg stage at
0.56 (invariant to split count and GC — shared-host memory traffic).
This harness measures stage VARIANTS over the same pre-materialized
geotags at two parallelism levels so the rewrite's effect on both the
wall and the ratio is visible before it goes into the flagship:

  current — spatial_join (broadcast cover, single-pass
            `_full OR ray_cast` filter) + tile_counts
  preagg  — pip_tile_counts (aggregate pushdown: partial counts below
            the join; ray-cast only on boundary-cell points)

Usage: python tools/bench_stage_pip.py [variant ...]
Prints one JSON line per (variant, cpus).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROWS = int(os.environ.get("SPARK_GRAFT_SCALE_ROWS", "6000000"))
PAGES = f"/tmp/geospark_scale_pages_{ROWS}"
GEO = f"/tmp/geospark_scale_geo_{ROWS}"
LEVELS = [int(x) for x in
          os.environ.get("SPARK_GRAFT_STAGE_LEVELS", "2,8").split(",")]

_WORKER = r"""
import json, sys, time
variant, cpus, geo_src = sys.argv[1], int(sys.argv[2]), sys.argv[3]
extra_conf = json.loads(sys.argv[4]) if len(sys.argv) > 4 else {}
from pyspark.sql import SparkSession
from geospark.conf import apply_tuned
b = (apply_tuned(SparkSession.builder.master(f"local[{cpus}]"))
     .appName(f"geospark-stage-{variant}-{cpus}")
     .config("spark.sql.shuffle.partitions", str(cpus))
     .config("spark.ui.enabled", "false")
     .config("spark.ui.showConsoleProgress", "false")
     .config("spark.sql.files.maxPartitionBytes", "16777216")
     .config("spark.driver.memory", "32g")
     .config("spark.driver.extraJavaOptions",
             "-Xms32g -XX:+AlwaysPreTouch"))
for k, v in extra_conf.items():
    b = b.config(k, v)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from geospark.operators.joins import spatial_join, pip_tile_counts
from geospark.operators.tiles import tile_counts
from geospark.sources.synth import zones_df

def run():
    geo = spark.read.parquet(geo_src)
    if variant == "current":
        pip = spatial_join(geo, zones_df(spark), res=8)
        return tile_counts(pip, 8, extra_keys=["zone_id", "lang"]).count()
    if variant == "preagg":
        return pip_tile_counts(geo, zones_df(spark), res=8,
                               extra_keys=["lang"]).count()
    raise ValueError(variant)

n0 = run()  # untimed warmup
walls = []
for _ in range(4):
    t0 = time.monotonic()
    n = run()
    walls.append(time.monotonic() - t0)
assert n == n0
print(json.dumps({"variant": variant, "cpus": cpus,
                  "wall": round(min(walls), 3),
                  "walls": [round(w, 2) for w in walls],
                  "n_tiles": n}))
spark.stop()
"""

_MATERIALIZE = r"""
import sys
pages, geo, rows = sys.argv[1], sys.argv[2], int(sys.argv[3])
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[32]")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.driver.memory", "32g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import os
if not os.path.exists(os.path.join(pages, "_SUCCESS")):
    from geospark.sources.synth import pages_df
    pages_df(spark, rows).repartition(128).write \
        .mode("overwrite").parquet(pages)
from geospark.operators.extract import extract_pages
extract_pages(spark.read.parquet(pages)).repartition(128) \
    .write.mode("overwrite").parquet(geo)
print("geotags materialized")
spark.stop()
"""


def main() -> None:
    variants = sys.argv[1:] or ["current", "preagg"]
    extra_conf = json.loads(os.environ.get("SPARK_GRAFT_STAGE_CONF", "{}"))
    if not os.path.exists(os.path.join(GEO, "_SUCCESS")):
        subprocess.run([sys.executable, "-c", _MATERIALIZE, PAGES, GEO,
                        str(ROWS)], cwd="/root/repo", check=True)
    results = []
    for variant in variants:
        for cpus in LEVELS:
            out = subprocess.run(
                [sys.executable, "-c", _WORKER, variant, str(cpus), GEO,
                 json.dumps(extra_conf)],
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
        vs = {r["cpus"]: r["wall"] for r in results
              if r["variant"] == variant}
        if len(LEVELS) == 2 and all(n in vs for n in LEVELS):
            a, b = LEVELS
            eff = (vs[a] / vs[b]) / (b / a)
            print(json.dumps({"variant": variant,
                              f"eff_{a}to{b}": round(eff, 3)}))


if __name__ == "__main__":
    main()
