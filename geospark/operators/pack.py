"""Sequence packing for LLM training-batch assembly: concatenate the
corpus in a deterministic order and chunk it into fixed token budgets
(the standard "pack and chunk" used to build pretraining batches).

The core primitive is a DISTRIBUTED PREFIX SUM. The naive Spark
spelling — ``SUM(n) OVER (ORDER BY id)`` with no PARTITION BY —
collapses the whole table into ONE partition (Catalyst plans a
SinglePartition exchange), which is a non-starter at 10^12 rows. The
scalable shape used here is the classic two-phase scan:

  1. range-repartition on the order key, cumsum WITHIN each partition
     (window partitioned by ``spark_partition_id()`` — parallel), and
  2. aggregate one total per partition (P rows, metadata-sized — P is
     the partition count, not the data), cumsum those on the driver,
     and broadcast-join the per-partition base offsets back.

The result is invariant to where the range boundaries land, because a
prefix sum only depends on the global order of the (unique) key.
"""

from __future__ import annotations

from ..materialize import materialize

# token definition shared with q_doc_tokens / its oracle (word-run
# tokens; case-sensitive class so no lower() pass is needed)
PACK_TOKEN_RX = "[A-Za-z0-9]+"


def prefix_sum(df, value_col: str, order_col: str, *,
               num_partitions: int | None = None,
               out_col: str = "prefix"):
    """EXCLUSIVE prefix sum of ``value_col`` over the global
    ``order_col`` order, computed with the two-phase scan above —
    never a single-partition window. ``order_col`` must be unique
    (add a tiebreak column upstream otherwise; range partitioning can
    split equal keys across partitions).

    Returns ``df``'s selected columns plus ``out_col``. Triggers one
    job for the per-partition totals (P rows to the driver — partition
    METADATA, not data; the frame is materialized first so the totals
    and the output read the same frozen rows).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    part = materialize(
        df.repartitionByRange(p, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id()))

    w = (Window.partitionBy("_pid").orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    local = part.withColumn(
        "_local", F.coalesce(F.sum(value_col).over(w), F.lit(0)))

    totals = part.groupBy("_pid").agg(
        F.sum(value_col).alias("_t")).collect()
    offsets, running = [], 0
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], running))
        running += row["_t"] or 0
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")

    return (local.join(F.broadcast(off_df), "_pid")
            .withColumn(out_col,
                        (F.col("_off") + F.col("_local")).cast("long"))
            .drop("_pid", "_local", "_off"))


def pack_sequences(df, *, budget: int = 512, id_col: str = "doc_id",
                   text_col: str = "text",
                   num_partitions: int | None = None):
    """Assign every document its place in the packed token stream:
    docs are concatenated in ``id_col`` order and chunked into
    ``budget``-token bins (documents may straddle a bin boundary —
    exactly how pretraining batches are packed).

    -> (doc_id, n_tokens, start_tok, bin_id, offset_in_bin), where
    ``start_tok`` is the doc's exclusive prefix sum of token counts,
    ``bin_id = start_tok div budget`` and ``offset_in_bin = start_tok
    % budget`` (integer arithmetic only — no float division that
    could round differently across engines).
    """
    from pyspark.sql import functions as F

    n_tok = (F.regexp_count(F.col(text_col), F.lit(PACK_TOKEN_RX))
             .cast("long"))
    base = df.select(F.col(id_col), n_tok.alias("n_tokens"))
    summed = prefix_sum(base, "n_tokens", id_col,
                        num_partitions=num_partitions,
                        out_col="start_tok")
    return summed.select(
        id_col, "n_tokens", "start_tok",
        F.expr(f"start_tok div {budget}").alias("bin_id"),
        (F.col("start_tok") % budget).alias("offset_in_bin"))


def pack_sequences_sql(budget: int = 512,
                       table: str = "documents") -> str:
    """DuckDB twin of pack_sequences (single-node window — the oracle
    does not need the two-phase scan, only the same arithmetic)."""
    return f"""
SELECT doc_id, n_tokens, start_tok,
       start_tok // {budget} AS bin_id,
       start_tok % {budget} AS offset_in_bin
FROM (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS start_tok
  FROM (SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{PACK_TOKEN_RX}'))
                    AS BIGINT) AS n_tokens
        FROM {table}))
"""
