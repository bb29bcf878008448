"""Recommended Spark session configuration for the engine.

One place for the perf-critical knobs every geospark session should
carry, so bench harnesses, the pipeline runner, and user sessions stay
in sync. Apply with::

    builder = apply_tuned(SparkSession.builder.master(...))

or merge ``TUNED_CONF`` into an existing config dict.
"""

from __future__ import annotations

# Why each knob (all are stock Spark configs — valid on any cluster):
#
# hugeMethodLimit=8000 — whole-stage codegen can fuse a scan + join +
#   a large unrolled expression (e.g. the PIP ray-cast refine, ~70 edge
#   terms) into ONE generated Java method. janino compiles it fine, but
#   HotSpot refuses to JIT any method over 8000 bytecodes
#   (-XX:DontCompileHugeMethods default), so the fused stage runs in the
#   bytecode interpreter: measured 9.6s vs 1.4s (6.9x) on the flagship's
#   join+refine stage over 10M rows. Spark's default fallback threshold
#   (65535) only guards the janino 64KB hard limit; 8000 aligns it with
#   what HotSpot will actually compile, falling back to small per-
#   operator methods that JIT. This is the documented production
#   alignment (SPARK-21871 introduced the knob for exactly this).
#
# adaptive.* — AQE runtime re-planning (coalesce post-shuffle
#   partitions, skew-join splitting) is load-bearing for the skewed
#   joins (BENCH/SKEW.md).
#
# timeZone=UTC — oracle parity: DuckDB timestamps are wall-clock; every
#   cross-engine hash assumes UTC.
#
# preferSortMergeJoin=false + maxShuffledHashJoinLocalMapThreshold —
#   let the planner (and AQE at runtime) pick a shuffled-hash join
#   when the per-partition build side fits: sort-merge pays two full
#   sorts plus per-key buffering, which many-match spatial/LSH joins
#   never amortize (guide §3.1; measured r6: ~5-8% on the LSH dedup
#   suite, 5.7x on the cover join when forced by hint). Join results
#   are identical whichever strategy runs; SMJ remains the fallback
#   whenever a build partition can't fit its threshold.
#
# arrow.pyspark.enabled — Arrow for toPandas()/createDataFrame driver
#   transfers (guide §6); orders of magnitude over the row path, no
#   semantic change (UDF serialization is NOT touched — scalar-UDF
#   Arrow coercion differs, so that knob stays off).
TUNED_CONF: dict[str, str] = {
    "spark.sql.codegen.hugeMethodLimit": "8000",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "128m",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def apply_tuned(builder):
    """Fold TUNED_CONF into a SparkSession.Builder (caller's explicit
    .config() calls made after this still win)."""
    for k, v in TUNED_CONF.items():
        builder = builder.config(k, v)
    return builder
