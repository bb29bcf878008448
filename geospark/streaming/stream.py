"""Watermarked streaming ingest (SURVEY.md §2.2 streaming row):
readStream over the pages/events table dir -> event-time windowed
per-cell aggregates with late-data handling via watermark.

The batch and streaming paths share the same column expressions
(cell_encode is a plain Column), so streaming results converge to the
batch tile counts — asserted in tests via trigger(availableNow).
"""

from __future__ import annotations

from ..functions.cells import cell_encode


def stream_tile_counts(spark, src_dir: str, schema: str, *,
                       ts_col: str = "warc_ts", lat_col: str = "lat",
                       lon_col: str = "lon", res: int = 6,
                       watermark: str = "1 hour",
                       window: str = "10 minutes"):
    """Returns a streaming DataFrame of windowed per-cell counts."""
    from pyspark.sql import functions as F
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 8)
           .parquet(src_dir))
    return (src
            .withColumn("cell", cell_encode(lat_col, lon_col, res))
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window).alias("w"), "cell")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .select(F.col("w.start").alias("win_start"),
                    F.col("w.end").alias("win_end"), "cell", "n_docs"))


def run_available_now(stream_df, checkpoint_dir: str, out_table: str,
                      output_mode: str = "append"):
    """Drain everything currently in the source (test/batch-replay mode)
    into an in-memory sink; returns the query after completion.

    Mode semantics (both exercised in tests):
      append — production shape: a window row emits once, when the
        watermark passes its end; windows still open at stream end stay
        in state (not emitted), and data older than the watermark drops.
      update — emits every refinement; since counts are monotone, the
        max per key equals the exact batch result (the convergence
        check)."""
    q = (stream_df.writeStream
         .format("memory")
         .queryName(out_table)
         .outputMode(output_mode)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
