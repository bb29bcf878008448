"""spark-submit entry: the EP-RULE flagship pipeline with checkpointed,
resumable stages (SURVEY.md §3 EP-RULE).

    spark-submit --py-files geospark.zip run_pipeline.py \
        --rows 100000 --out /tmp/geospark_run --res 8

Stages (each an Iceberg-shaped snapshot + lineage; rerun resumes):
    pages    synthesize/read the web-pages table
    geotags  html -> (url, warc_ts, lang, lat, lon, kind)
    pip      broadcast-then-refine point-in-polygon join vs zones
    tiles    per-zone per-cell aggregates
"""

from __future__ import annotations

import argparse
import json


def build_session(parallelism: int | None = None):
    from pyspark.sql import SparkSession

    from geospark.conf import apply_tuned
    b = (apply_tuned(SparkSession.builder.appName("geospark-pipeline"))
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.showConsoleProgress", "false"))
    if parallelism is not None:
        b = b.master(f"local[{parallelism}]")
    return b.getOrCreate()


def run(spark, out_dir: str, n_rows: int, res: int, force: bool = False):
    from geospark.operators.extract import extract_pages
    from geospark.operators.joins import spatial_join
    from geospark.operators.tiles import tile_counts
    from geospark.sources.checkpoint import CheckpointStore, Pipeline
    from geospark.sources.synth import pages_df, zones_df

    pipe = Pipeline(spark, CheckpointStore(out_dir))
    pages = pipe.stage("pages", lambda: pages_df(spark, n_rows),
                       force=force)
    geo = pipe.stage("geotags", lambda: extract_pages(pages))
    zones = zones_df(spark)
    pip = pipe.stage("pip", lambda: spatial_join(geo, zones, res=res))
    tiles = pipe.stage(
        "tiles",
        lambda: tile_counts(pip, res, extra_keys=["zone_id", "lang"]))
    return tiles, pipe.report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--out", default="/tmp/geospark_run")
    ap.add_argument("--res", type=int, default=8)
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--parallelism", type=int, default=None)
    args = ap.parse_args()
    spark = build_session(args.parallelism)
    spark.sparkContext.setLogLevel("WARN")
    tiles, report = run(spark, args.out, args.rows, args.res, args.force)
    print(json.dumps({"stages": report,
                      "tiles_rows": tiles.count()}, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
