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


def prefix_sum(df, value_col: str, order_col, *,
               group_cols=None, num_partitions: int | None = None,
               out_col: str = "prefix"):
    """EXCLUSIVE prefix sum of ``value_col`` over the global
    ``order_col`` order (a column name or a list of them), computed
    with the two-phase scan above — never a single-partition window.
    The combined order key must be unique (range partitioning can
    split equal keys across partitions).

    ``group_cols`` makes it a GROUPED prefix sum: an independent scan
    per group, still two-phase — the range partitioner keys on
    (groups, order) so a dominant group (English at 50% of a web
    corpus) spreads over many partitions instead of serializing into
    one window partition; the driver sees P x G offset rows (P =
    partitions, G = DISTINCT GROUPS — use for low-cardinality strata
    like language/domain, not per-user keys). Group columns must be
    non-null (null never equi-joins its offset back — coalesce
    upstream).

    Returns ``df``'s selected columns plus ``out_col``. Triggers one
    job for the per-partition totals (P x G rows to the driver —
    partition METADATA, not data; the frame is materialized first so
    the totals and the output read the same frozen rows).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType
    from pyspark.sql.window import Window

    ocols = [order_col] if isinstance(order_col, str) else list(order_col)
    gcols = list(group_cols or [])
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    part = materialize(
        df.repartitionByRange(p, *[F.col(c) for c in gcols + ocols])
        .withColumn("_pid", F.spark_partition_id()))

    w = (Window.partitionBy("_pid", *gcols).orderBy(*ocols)
         .rowsBetween(Window.unboundedPreceding, -1))
    local = part.withColumn(
        "_local", F.coalesce(F.sum(value_col).over(w), F.lit(0)))

    totals = part.groupBy("_pid", *gcols).agg(
        F.sum(value_col).alias("_t")).collect()
    # ascending pid IS the global (group, order) range order, so a
    # per-group running total over pids is that group's base offset
    offsets, running = [], {}
    for row in sorted(totals, key=lambda r: r["_pid"]):
        gkey = tuple(row[g] for g in gcols)
        offsets.append((row["_pid"], *gkey, running.get(gkey, 0)))
        running[gkey] = running.get(gkey, 0) + (row["_t"] or 0)
    off_schema = StructType(
        [part.schema["_pid"]] + [part.schema[g] for g in gcols]
        + [StructField("_off", LongType())])
    off_df = spark.createDataFrame(offsets, off_schema)

    return (local.join(F.broadcast(off_df), ["_pid"] + gcols)
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


def budget_sample(df, budgets: dict[str, int], *,
                  group_col: str = "lang", id_col: str = "doc_id",
                  text_col: str = "text", default_budget: int = 0,
                  num_partitions: int | None = None):
    """Token-budget corpus mixer: fill each group's target token
    budget greedily with whole documents in a deterministic
    pseudo-random order (the md5 priority used by every sampling
    operator here) — the curation step that turns "we want a 30%-en /
    10%-zh mix" into an actual document subset. A doc is kept iff it
    fits ENTIRELY in its group's remaining budget when its turn
    comes; groups absent from ``budgets`` get ``default_budget``.

    Built on the GROUPED two-phase prefix sum, so a dominant group
    never serializes into one window partition.
    -> (group, id, n_tokens, cum_tokens), all integer-exact."""
    from pyspark.sql import functions as F

    n_tok = (F.regexp_count(F.col(text_col), F.lit(PACK_TOKEN_RX))
             .cast("long"))
    prio = F.conv(F.substring(F.md5(F.col(id_col).cast("string")),
                              1, 15), 16, 10).cast("long")
    base = df.select(
        F.col(id_col),
        F.coalesce(F.col(group_col), F.lit("")).alias("_grp"),
        n_tok.alias("n_tokens"), prio.alias("_prio"))
    summed = prefix_sum(base, "n_tokens", ["_prio", id_col],
                        group_cols=["_grp"],
                        num_partitions=num_partitions,
                        out_col="_start")
    b = None
    for k, v in sorted(budgets.items()):
        cond = F.col("_grp") == k
        b = F.when(cond, v) if b is None else b.when(cond, v)
    b = (F.lit(int(default_budget)) if b is None
         else b.otherwise(int(default_budget))).cast("long")
    cum = F.col("_start") + F.col("n_tokens")
    return (summed.filter(cum <= b)
            .select(F.col("_grp").alias(group_col), id_col,
                    "n_tokens", cum.alias("cum_tokens")))


def budget_sample_sql(budgets: dict[str, int],
                      group_col: str = "lang",
                      default_budget: int = 0,
                      table: str = "documents") -> str:
    """DuckDB twin of budget_sample (single-node grouped window — the
    oracle needs only the same order, arithmetic, and budget CASE)."""
    h64 = ("CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) "
           "AS BIGINT)")
    case = " ".join(f"WHEN '{k}' THEN {int(v)}"
                    for k, v in sorted(budgets.items()))
    return f"""
WITH base AS (SELECT doc_id, COALESCE({group_col}, '') AS grp,
       CAST(len(regexp_extract_all(text, '{PACK_TOKEN_RX}'))
            AS BIGINT) AS n_tokens,
       {h64} AS prio FROM {table}),
s AS (SELECT doc_id, grp, n_tokens,
       CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY grp
            ORDER BY prio ASC, doc_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS start_tok FROM base)
SELECT grp AS {group_col}, doc_id, n_tokens,
       CAST(start_tok + n_tokens AS BIGINT) AS cum_tokens
FROM s
WHERE start_tok + n_tokens <=
      CASE grp {case} ELSE {int(default_budget)} END
"""


def apportion_budget(df, weight_col: str, key_col: str, budget: int, *,
                     num_partitions: int | None = None):
    """Largest-remainder (Hamilton) apportionment of an integer
    ``budget`` across keys proportional to ``weight_col`` — the crawl
    scheduler's shape: split tomorrow's N-page fetch budget across
    hosts by quality mass so that SUM(alloc) == budget EXACTLY (float
    proportional shares + rounding can be off by several units and
    drift per engine; every step here is BIGINT floor arithmetic).

    alloc(k) = (w_k * B) div W  plus +1 for the L keys with the
    largest remainder (w_k * B) mod W, ties by key asc, where
    L = B - SUM(floors).  The remainder rank rides prefix_sum (range
    partition + per-partition window) — never a single-partition
    global window, so the key universe can be 10^8 hosts.  Headroom:
    w_k * B must fit int64 — at web scale pre-scale weights (w div
    2^20) first; allocation only depends on weight RATIOS.

    Two scalar actions (total mass, floor sum) — aggregate metadata,
    not data. -> (key, weight, alloc)."""
    from pyspark.sql import functions as F
    w = df.select(F.col(key_col), F.col(weight_col).cast("long")
                  .alias("_w"))
    total = w.agg(F.sum("_w")).collect()[0][0]
    base = w.select(
        key_col, "_w",
        F.expr(f"(_w * {budget}) div {total}").alias("_q"),
        F.expr(f"(_w * {budget}) % {total}").alias("_rem"))
    leftover = budget - base.agg(F.sum("_q")).collect()[0][0]
    ranked = prefix_sum(
        base.withColumn("_one", F.lit(1))
        .withColumn("_negrem", -F.col("_rem")),
        "_one", ["_negrem", key_col], num_partitions=num_partitions)
    return ranked.select(
        key_col, F.col("_w").alias(weight_col),
        (F.col("_q") + F.when(F.col("prefix") < leftover, 1)
         .otherwise(0)).cast("long").alias("alloc"))


def apportion_budget_sql(weights_sql: str, budget: int, *,
                         key_col: str = "host",
                         weight_col: str = "weight") -> str:
    """DuckDB twin of apportion_budget over a subquery producing
    (key, weight) — same floor quotas, same (rem DESC, key ASC)
    largest-remainder rank."""
    return f"""
WITH w AS (SELECT {key_col}, CAST({weight_col} AS BIGINT) AS _w
           FROM ({weights_sql})),
t AS (SELECT SUM(_w) AS total FROM w),
b AS (SELECT {key_col}, _w, (_w * {budget}) // total AS q,
             (_w * {budget}) % total AS rem FROM w, t),
l AS (SELECT {budget} - SUM(q) AS leftover FROM b),
r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, {key_col} ASC)
             - 1 AS rk FROM b)
SELECT {key_col}, _w AS {weight_col},
       CAST(q + CASE WHEN rk < (SELECT leftover FROM l)
                THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM r
"""


# target mixture step table (ppm of total tokens) — ONE Python source
# feeding both engine builders; langs absent here get 0 (dropped)
MIX_TARGET_PPM = {"en": 500_000, "de": 150_000, "es": 150_000,
                  "fr": 100_000, "zh": 100_000}


def mixture_report(df, targets_ppm: dict[str, int] | None = None, *,
                   group_col: str = "lang", text_col: str = "text"):
    """Corpus-mixture report + reweighting factors — the data-mixing
    calculation before training: per group, its token mass, actual
    share, and the sampling factor that moves the mix to the target
    (factor = target_share / actual_share; >1e6 ppm means upsample).
    Shares and factors are INTEGER parts-per-million (floor) — a float
    share drifts per engine and a factor is only ever consumed as a
    sampling rate, where ppm resolution is plenty.

    Scale: one map-side-combined group agg (groups = languages, tiny)
    + one scalar action for the total. -> (group, n_tokens, share_ppm,
    factor_ppm)."""
    from pyspark.sql import functions as F
    targets = targets_ppm or MIX_TARGET_PPM
    g = df.groupBy(group_col).agg(
        F.sum(F.regexp_count(F.col(text_col), F.lit(PACK_TOKEN_RX)))
        .cast("long").alias("n_tokens"))
    total = g.agg(F.sum("n_tokens")).collect()[0][0]
    tgt = F.lit(0)
    for k, v in sorted(targets.items()):
        tgt = F.when(F.col(group_col) == k, F.lit(v)).otherwise(tgt)
    return g.select(
        group_col, "n_tokens",
        F.expr(f"(n_tokens * 1000000) div {total}").alias("share_ppm"),
        (tgt.cast("long") * F.lit(int(total)))
        .cast("long").alias("_t")
    ).select(group_col, "n_tokens", "share_ppm",
             F.expr("_t div n_tokens").alias("factor_ppm"))


def mixture_report_sql(targets_ppm: dict[str, int] | None = None, *,
                       group_col: str = "lang",
                       table: str = "documents") -> str:
    """DuckDB twin of mixture_report (same step table, same floors)."""
    targets = targets_ppm or MIX_TARGET_PPM
    case = " ".join(f"WHEN '{k}' THEN {int(v)}"
                    for k, v in sorted(targets.items()))
    return f"""
WITH g AS (SELECT {group_col},
           CAST(SUM(len(regexp_extract_all(text, '{PACK_TOKEN_RX}')))
                AS BIGINT) AS n_tokens
           FROM {table} GROUP BY 1),
t AS (SELECT SUM(n_tokens) AS total FROM g)
SELECT {group_col}, n_tokens,
       CAST((n_tokens * 1000000) // total AS BIGINT) AS share_ppm,
       CAST((CASE {group_col} {case} ELSE 0 END * total) // n_tokens
            AS BIGINT) AS factor_ppm
FROM g, t
"""


def pps_sample(df, k: int, *, id_col: str = "doc_id",
               text_col: str = "text",
               num_partitions: int | None = None):
    """Systematic probability-proportional-to-size sampling — the
    curation sampler where budget_sample is the curation FILLER:
    draw ~``k`` documents with inclusion probability proportional to
    token weight (long docs cost more to train on, so they deserve
    proportionally more sampling mass), via the classic systematic
    PPS rule on the md5-ordered weight line: doc i (exclusive prefix
    s_i, weight w_i) is hit once for every sampling-grid point
    j*W/k inside (s_i, s_i + w_i], i.e.

        n_hits = floor((s_i + w_i) k / W) - floor(s_i k / W)

    — exactly k hits in total (the grid has k points in (0, W]),
    deterministic, no RNG state: the md5 order is the engine-shared
    pseudo-random permutation every sampler here uses, so the draw
    is reproducible across engines and runs. Docs heavier than W/k
    can be hit more than once (emitted once with n_hits > 1 — the
    multiplicity IS the classic PPS-with-replacement-adjacent
    semantics; downstream repeats or upweights).

    Integer-exact: weights are BIGINT token counts; the cum*k
    products run in DECIMAL(38,0)/HUGEINT (W*k overflows BIGINT at
    planetary corpus size); both floors are nonnegative so div==//.

    Scale: rides prefix_sum's two-phase scan (never a
    single-partition window); W arrives as a 1-row broadcast scalar.
    -> (doc_id, n_tokens, n_hits) for hit docs only."""
    from pyspark.sql import functions as F
    n_tok = (F.regexp_count(F.col(text_col), F.lit(PACK_TOKEN_RX))
             .cast("long"))
    prio = F.conv(F.substring(F.md5(F.col(id_col).cast("string")),
                              1, 15), 16, 10).cast("long")
    base = df.select(F.col(id_col), n_tok.alias("n_tokens"),
                     prio.alias("_prio"))
    summed = prefix_sum(base, "n_tokens", ["_prio", id_col],
                        num_partitions=num_partitions,
                        out_col="_start")
    tot = summed.agg(F.sum("n_tokens").cast("long").alias("_w"))
    j = summed.crossJoin(F.broadcast(tot))
    hits = F.expr(
        f"CAST((CAST(_start AS DECIMAL(38,0)) + n_tokens) * {int(k)} "
        f"div _w - CAST(_start AS DECIMAL(38,0)) * {int(k)} div _w "
        f"AS BIGINT)")
    return (j.withColumn("n_hits", hits)
            .filter(F.col("n_hits") > 0)
            .select(id_col, "n_tokens", "n_hits"))


def pps_sample_sql(k: int, table: str = "documents") -> str:
    """DuckDB twin of pps_sample (single-node window — the oracle
    needs only the same order, weights, and floor arithmetic)."""
    h64 = ("CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, "
           "15)) AS BIGINT)")
    return f"""
WITH pps_base AS (SELECT doc_id,
    CAST(len(regexp_extract_all(text, '{PACK_TOKEN_RX}'))
         AS BIGINT) AS n_tokens,
    {h64} AS prio FROM {table}),
pps_s AS (SELECT doc_id, n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY prio ASC, doc_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS BIGINT) AS start_tok FROM pps_base),
pps_w AS (SELECT SUM(n_tokens) AS w FROM pps_base)
SELECT doc_id, n_tokens,
    CAST((CAST(start_tok AS HUGEINT) + n_tokens) * {int(k)} // w
         - CAST(start_tok AS HUGEINT) * {int(k)} // w AS BIGINT)
      AS n_hits
FROM pps_s, pps_w
WHERE (CAST(start_tok AS HUGEINT) + n_tokens) * {int(k)} // w
      - CAST(start_tok AS HUGEINT) * {int(k)} // w > 0
"""
