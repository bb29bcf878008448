"""Event-sequence analytics over the events table: N-step funnels.

The funnel question — of the users who did step 1, how many later did
step 2, then step 3... — is the canonical ordered-sequence aggregation
on an events table. Shape at scale: one filtered per-user MIN aggregate
per step plus one equi-join per step, all keyed by user_id (uniform);
no window over the full event stream, no UDF. Timestamps are compared
in exact integer microseconds from a fixed NTZ epoch (the sessionizer's
convention) so the DuckDB twin matches bit-for-bit.
"""

from __future__ import annotations

EPOCH = "2024-01-01 00:00:00"


def _us_expr(ts_col: str):
    from pyspark.sql import functions as F
    return F.expr(f"timestampdiff(MICROSECOND, "
                  f"TIMESTAMP_NTZ '{EPOCH}', {ts_col})")


def funnel_steps(events, steps: list[str], *, user_col: str = "user_id",
                 type_col: str = "event_type", ts_col: str = "ts"):
    """-> (user, t1..tn microsecond columns, stages, dur_s).

    t1 = user's earliest step-1 event; t_{i} = earliest step-i event
    STRICTLY AFTER t_{i-1} (nulls propagate once a step is missed).
    Only users who performed step 1 appear. ``stages`` counts completed
    steps; ``dur_s`` is first-to-last seconds for full completions."""
    from pyspark.sql import functions as F
    if not steps:
        raise ValueError("steps must be non-empty")
    us = _us_expr(ts_col)
    cur = (events.filter(F.col(type_col) == steps[0])
           .groupBy(user_col).agg(F.min(us).alias("t1")))
    for i, s in enumerate(steps[1:], start=2):
        ev = (events.filter(F.col(type_col) == s)
              .select(user_col, us.alias("_u")))
        nxt = (cur.select(user_col, F.col(f"t{i - 1}"))
               .join(ev, user_col)
               .filter(F.col("_u") > F.col(f"t{i - 1}"))
               .groupBy(user_col).agg(F.min("_u").alias(f"t{i}")))
        cur = cur.join(nxt, user_col, "left")
    n = len(steps)
    stages = F.lit(1)
    for i in range(2, n + 1):
        stages = stages + F.when(F.col(f"t{i}").isNotNull(), 1) \
            .otherwise(0)
    dur = F.when(F.col(f"t{n}").isNotNull(),
                 F.round((F.col(f"t{n}") - F.col("t1")) / 1e6, 3))
    return cur.select(user_col,
                      *[F.col(f"t{i}") for i in range(1, n + 1)],
                      stages.cast("int").alias("stages"),
                      dur.alias("dur_s"))


def funnel_steps_sql(steps: list[str], table: str = "events",
                     user_col: str = "user_id",
                     type_col: str = "event_type",
                     ts_col: str = "ts") -> str:
    """DuckDB twin of funnel_steps (identical join/min chain)."""
    us = f"datediff('microseconds', TIMESTAMP '{EPOCH}', {ts_col})"
    n = len(steps)
    ctes = [f"s1 AS (SELECT {user_col}, MIN({us}) AS t1 FROM {table} "
            f"WHERE {type_col} = '{steps[0]}' GROUP BY 1)"]
    for i, s in enumerate(steps[1:], start=2):
        ctes.append(
            f"s{i} AS (SELECT e.{user_col}, MIN({us.replace(ts_col, 'e.' + ts_col)}) AS t{i} "
            f"FROM {table} e JOIN s{i - 1} USING ({user_col}) "
            f"WHERE e.{type_col} = '{s}' "
            f"AND {us.replace(ts_col, 'e.' + ts_col)} > s{i - 1}.t{i - 1} "
            f"GROUP BY 1)")
    joins = "s1 " + " ".join(
        f"LEFT JOIN s{i} USING ({user_col})" for i in range(2, n + 1))
    stages = " + ".join(
        ["1"] + [f"CASE WHEN t{i} IS NOT NULL THEN 1 ELSE 0 END"
                 for i in range(2, n + 1)])
    tcols = ", ".join(f"t{i}" for i in range(1, n + 1))
    return (f"WITH {', '.join(ctes)} "
            f"SELECT {user_col}, {tcols}, "
            f"CAST({stages} AS INTEGER) AS stages, "
            f"CASE WHEN t{n} IS NOT NULL THEN "
            f"ROUND((t{n} - t1) / 1000000.0, 3) END AS dur_s "
            f"FROM {joins}")


def asof_join(left, right, *, on, payload, left_ts: str = "ts",
              right_ts: str = "ts", tie_col: str | None = None,
              tolerance_us: int | None = None, how: str = "inner"):
    """Backward as-of join: for each left row, the single right row
    with the greatest ``right_ts`` <= ``left_ts`` within the same
    ``on`` key (ties on the timestamp broken by the greatest
    ``tie_col``).  Spark has no ASOF JOIN operator; the naive
    emulation (range join + per-left-row max) explodes to O(left x
    right-per-key) pairs before pruning.  This is the scalable shape:
    tag both sides, union, ONE hash exchange on the key, and a
    running ``last(payload, ignorenulls)`` window carries the most
    recent right payload forward onto each left row — O(n log n) per
    key, no join node in the plan at all, skew bounded by per-key
    event volume exactly like sessionization.

    ``payload`` maps right-side column -> output name. Output = all
    left columns + the renamed payload columns + ``gap_us`` (left_ts
    - matched right_ts, integer microseconds; the timestamps
    themselves are compared as exact integer microseconds from the
    fixed NTZ epoch).  ``how='inner'`` drops unmatched left rows;
    ``'left'`` keeps them with NULL payload/gap.  ``tolerance_us``
    additionally drops (or NULLs, under ``'left'``) matches older
    than the tolerance."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    lcols = [c for c in left.columns if c not in keys]
    pay = dict(payload)
    rtypes = dict(right.dtypes)
    lus, rus = _us_expr(left_ts), _us_expr(right_ts)
    tie = (F.col(tie_col).cast("long") if tie_col
           else F.lit(0).cast("long"))
    probe = left.select(
        *keys, lus.alias("_aj_us"), F.lit(1).alias("_aj_tag"),
        F.lit(None).cast("long").alias("_aj_tie"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(rtypes[rc]).alias(f"_aj_{out}")
          for rc, out in pay.items()],
        F.lit(None).cast("long").alias("_aj_rts"))
    build = right.select(
        *keys, rus.alias("_aj_us"), F.lit(0).alias("_aj_tag"),
        tie.alias("_aj_tie"),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes
          if c in lcols],
        *[F.col(rc).alias(f"_aj_{out}") for rc, out in pay.items()],
        rus.alias("_aj_rts"))
    # equal timestamps: build (tag 0) sorts before probe (tag 1) ->
    # "at or before" semantics; among equal-ts builds, tie asc makes
    # last() pick the greatest tie_col deterministically
    w = (Window.partitionBy(*keys)
         .orderBy(F.col("_aj_us").asc(), F.col("_aj_tag").asc(),
                  F.col("_aj_tie").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = [F.last(f"_aj_{out}", ignorenulls=True).over(w)
               .alias(f"_c_{out}") for out in pay.values()]
    u = (probe.unionByName(build)
         .select("*", F.last("_aj_rts", ignorenulls=True).over(w)
                 .alias("_c_rts"), *carried)
         .filter(F.col("_aj_tag") == 1))
    gap = F.col("_aj_us") - F.col("_c_rts")
    ok = F.col("_c_rts").isNotNull()
    if tolerance_us is not None:
        ok = ok & (gap <= F.lit(int(tolerance_us)))
    if how == "inner":
        u = u.filter(ok)
        sel_gap = gap
        sel_pay = {out: F.col(f"_c_{out}") for out in pay.values()}
    else:
        sel_gap = F.when(ok, gap)
        sel_pay = {out: F.when(ok, F.col(f"_c_{out}"))
                   for out in pay.values()}
    return u.select(
        *keys, *lcols,
        *[c.alias(out) for out, c in sel_pay.items()],
        sel_gap.alias("gap_us"))


def asof_join_sql(left_type: str, right_type: str,
                  table: str = "events") -> str:
    """DuckDB twin of the catalog as-of query — deliberately a
    DIFFERENT algorithm (DuckDB's native ASOF JOIN operator, a
    per-key binary search) than the Spark union+window carry, so
    agreement checks the semantics rather than the implementation."""
    return f"""
WITH l AS (SELECT event_id, user_id, ts, value FROM {table}
           WHERE event_type = '{left_type}'),
     r AS (SELECT user_id, ts, event_id, value FROM {table}
           WHERE event_type = '{right_type}')
SELECT l.event_id, l.user_id, l.value,
       r.event_id AS m_event_id, r.value AS m_value,
       date_diff('microsecond', r.ts, l.ts) AS gap_us
FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def trajectory_stats(events, lat_col="lat", lon_col="lon", *,
                     user_col: str = "user_id", ts_col: str = "ts",
                     order_col: str = "event_id"):
    """Per-user trajectory rollup: order each user's events by
    (ts, order_col), measure consecutive-event great-circle legs,
    aggregate path length. The geo x event-stream staple (GPS traces,
    check-in streams). One per-user exchange carries BOTH the lag
    window and the aggregate — no join, no second shuffle.

    Each leg is rounded to integer meters BEFORE the sum: SUM over
    doubles is accumulation-order-dependent (Spark partial aggs vs
    any single-node engine), SUM over BIGINT legs is exact on every
    engine. -> (user, n_events, n_legs, total_m, max_leg_m)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from ..functions.geometry import haversine_m
    w = (Window.partitionBy(user_col)
         .orderBy(F.col(ts_col).asc(), F.col(order_col).asc()))
    plat, plon = F.lag(lat_col).over(w), F.lag(lon_col).over(w)
    leg = F.when(plat.isNotNull(),
                 F.round(haversine_m(plat, plon,
                                     F.col(lat_col), F.col(lon_col)),
                         0).cast("long"))
    return (events.withColumn("_leg_m", leg)
            .groupBy(user_col)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.count("_leg_m").alias("n_legs"),
                 F.coalesce(F.sum("_leg_m"), F.lit(0))
                 .alias("total_m"),
                 F.max("_leg_m").alias("max_leg_m")))


def trajectory_stats_sql(lat_sql: str, lon_sql: str,
                         table: str = "events",
                         user_col: str = "user_id",
                         ts_col: str = "ts",
                         order_col: str = "event_id") -> str:
    """DuckDB twin of trajectory_stats: identical lag window, the
    haversine_pairs transcendental-rounding policy, BIGINT legs."""
    hav = ("2.0 * 6371008.8 * ASIN(SQRT("
           "POWER(SIN(RADIANS(lat - plat) / 2), 2) + COS(RADIANS(plat)) "
           "* COS(RADIANS(lat)) * POWER(SIN(RADIANS(lon - plon) / 2), 2)"
           "))")
    return f"""
WITH pts AS (SELECT {user_col}, {ts_col}, {order_col},
             {lat_sql} AS lat, {lon_sql} AS lon FROM {table}),
lagged AS (SELECT {user_col}, lat, lon,
           LAG(lat) OVER w AS plat, LAG(lon) OVER w AS plon
           FROM pts
           WINDOW w AS (PARTITION BY {user_col}
                        ORDER BY {ts_col} ASC, {order_col} ASC)),
legs AS (SELECT {user_col},
         CASE WHEN plat IS NOT NULL THEN
           CAST(ROUND({hav}, 0) AS BIGINT) END AS leg_m
         FROM lagged)
SELECT {user_col}, COUNT(*) AS n_events, COUNT(leg_m) AS n_legs,
       CAST(COALESCE(SUM(leg_m), 0) AS BIGINT) AS total_m,
       MAX(leg_m) AS max_leg_m
FROM legs GROUP BY {user_col}
"""


def retention_cohorts(events, *, user_col: str = "user_id",
                      ts_col: str = "ts"):
    """Cohort retention matrix — for each signup-day cohort (a user's
    first active day), how many of its users were active again N days
    later. Day indices are exact integer microseconds-since-the-fixed-
    NTZ-epoch divided by 86_400_000_000 (the sessionizer's timestamp
    convention), so both engines bucket identically with no timezone
    or DATE-stringification surface.

    Scale: ONE user-keyed exchange carries the whole per-user
    reduction — collect_set(active day) is map-side combinable and its
    width is bounded by the observation window in DAYS, not by event
    volume; cohort (array_min) and the offsets (array transform) are
    computed array-side with no second window or join. The only other
    exchange carries (cohort_day, day_offset) aggregate rows. Each
    (user, offset) pair appears exactly once because days is a set, so
    COUNT(*) is exactly distinct users. -> (cohort_day, day_offset,
    n_users)."""
    from pyspark.sql import functions as F
    # integer `div`, not float `/`+cast: a double quotient can land an
    # ulp below a day boundary and truncate into the previous day
    day = F.expr(f"timestampdiff(MICROSECOND, "
                 f"TIMESTAMP_NTZ '{EPOCH}', {ts_col}) "
                 f"div 86400000000")
    per_user = (events
                .select(F.col(user_col).alias("_u"), day.alias("_day"))
                .groupBy("_u")
                .agg(F.collect_set("_day").alias("_days")))
    return (per_user
            .withColumn("cohort_day", F.array_min("_days"))
            .select("cohort_day",
                    F.explode(F.transform(
                        "_days",
                        lambda d: d - F.col("cohort_day")))
                    .alias("day_offset"))
            .groupBy("cohort_day", "day_offset")
            .agg(F.count(F.lit(1)).alias("n_users")))


def retention_sql(table: str = "events", user_col: str = "user_id",
                  ts_col: str = "ts") -> str:
    """DuckDB twin of retention_cohorts (distinct active days + window
    min; same integer-µs day bucketing)."""
    day = (f"datediff('microseconds', TIMESTAMP '{EPOCH}', {ts_col}) "
           f"// 86400000000")
    return (
        f"WITH d AS (SELECT DISTINCT {user_col} AS u, {day} AS day "
        f"FROM {table}), "
        f"c AS (SELECT u, day, MIN(day) OVER (PARTITION BY u) AS cohort "
        f"FROM d) "
        f"SELECT cohort AS cohort_day, day - cohort AS day_offset, "
        f"COUNT(*) AS n_users FROM c GROUP BY 1, 2")


def interval_join(events, intervals, *, ts_col: str = "us",
                  start_col: str = "start_us", end_col: str = "end_us",
                  bucket_us: int = 86_400_000_000):
    """Interval-containment join: event rows matched to every interval
    with ``start <= ts < end`` (half-open) — campaign attribution,
    maintenance-window tagging, session-overlap queries.  Spark plans
    a naive non-equi join as BroadcastNestedLoop (quadratic work, no
    shuffle partitioning); this is the standard range-join
    decomposition instead: intervals explode to every time BUCKET they
    overlap, events carry their single bucket, ONE bucket-keyed
    equi-join + a residual bound filter.  Each (event, interval) pair
    appears exactly once (an event owns one bucket), so no dedup pass.

    Scale: shuffle keyed by the bucket id — time-uniform by
    construction; a hot bucket (flash-sale hour) is an AQE skew case.
    Pick ``bucket_us`` near the median interval length: shorter
    buckets multiply the exploded interval rows, longer ones multiply
    the residual filter's false candidates.  Empty/inverted intervals
    produce no buckets (Spark's descending-sequence trap guarded)."""
    from pyspark.sql import functions as F
    b_ev = events.withColumn("_b", F.expr(f"{ts_col} div {bucket_us}"))
    span = (f"CASE WHEN {end_col} > {start_col} THEN "
            f"sequence({start_col} div {bucket_us}, "
            f"({end_col} - 1) div {bucket_us}) "
            f"ELSE array() END")
    b_iv = intervals.withColumn("_b", F.explode(F.expr(span)))
    return (b_ev.join(b_iv, "_b")
            .filter((F.col(ts_col) >= F.col(start_col))
                    & (F.col(ts_col) < F.col(end_col)))
            .drop("_b"))


def _bucket_span_expr(start_col: str, end_col: str,
                      bucket_us: int) -> str:
    """Every bucket a half-open [start, end) interval touches;
    empty/inverted intervals touch none (descending-sequence guard,
    same as interval_join)."""
    return (f"CASE WHEN {end_col} > {start_col} THEN "
            f"sequence({start_col} div {bucket_us}, "
            f"({end_col} - 1) div {bucket_us}) "
            f"ELSE array() END")


def overlap_join(left, right, *, l_start: str = "l_start_us",
                 l_end: str = "l_end_us",
                 r_start: str = "r_start_us",
                 r_end: str = "r_end_us",
                 bucket_us: int = 86_400_000_000):
    """Interval-OVERLAP join: every (left, right) pair of half-open
    intervals with a non-empty intersection, with the intersection
    duration attached as ``overlap_us`` — the period-intersection
    sibling of :func:`interval_join` (which matches a POINT to
    containing intervals). Powers exposure attribution (user activity
    span x campaign window), downtime blame, co-occurrence windows.

    Decomposition: BOTH sides explode to the buckets they span, the
    join is ONE bucket-keyed equi-join, and each overlapping pair is
    kept exactly once with no dedup shuffle: if two intervals overlap,
    the later-starting one's first bucket m = greatest of the two
    start buckets is spanned by both (the other side's end exceeds
    the later start by overlap > 0), so the pair is emitted only
    where ``_b = m``. Non-overlapping bucket-mates are dropped by the
    residual ``overlap_us > 0`` filter.

    Scale: the shuffle key is the time bucket — uniform for
    calendar-dense intervals; exploded row count is
    sum(ceil(len/bucket)) per side, so pick ``bucket_us`` near the
    median interval length. A hot bucket (everyone's intervals cross
    new-year) is an AQE skew case like interval_join's."""
    from pyspark.sql import functions as F
    lb = left.withColumn(
        "_b", F.explode(F.expr(_bucket_span_expr(l_start, l_end,
                                                 bucket_us))))
    rb = right.withColumn(
        "_b", F.explode(F.expr(_bucket_span_expr(r_start, r_end,
                                                 bucket_us))))
    first_shared = F.greatest(F.expr(f"{l_start} div {bucket_us}"),
                              F.expr(f"{r_start} div {bucket_us}"))
    overlap = (F.least(F.col(l_end), F.col(r_end))
               - F.greatest(F.col(l_start), F.col(r_start)))
    return (lb.join(rb, "_b")
            .filter(F.col("_b") == first_shared)
            .withColumn("overlap_us", overlap)
            .filter(F.col("overlap_us") > 0)
            .drop("_b"))


def overlap_join_sql(left_sql: str, right_sql: str, *,
                     l_start: str = "l_start_us",
                     l_end: str = "l_end_us",
                     r_start: str = "r_start_us",
                     r_end: str = "r_end_us",
                     bucket_us: int = 86_400_000_000) -> str:
    """DuckDB twin of :func:`overlap_join`: identical bucket
    decomposition (generate_series is inclusive like Spark's
    sequence), identical first-shared-bucket dedup, identical
    residual filter. Yields left.* , right.* , overlap_us."""
    return f"""
WITH lraw AS ({left_sql}), rraw AS ({right_sql}),
lb AS (SELECT *, unnest(generate_series({l_start} // {bucket_us},
                        ({l_end} - 1) // {bucket_us})) AS _b
       FROM lraw WHERE {l_end} > {l_start}),
rb AS (SELECT *, unnest(generate_series({r_start} // {bucket_us},
                        ({r_end} - 1) // {bucket_us})) AS _b
       FROM rraw WHERE {r_end} > {r_start})
SELECT lb.* EXCLUDE (_b), rb.* EXCLUDE (_b),
       least({l_end}, {r_end}) - greatest({l_start}, {r_start})
         AS overlap_us
FROM lb JOIN rb USING (_b)
WHERE _b = greatest({l_start} // {bucket_us},
                    {r_start} // {bucket_us})
  AND least({l_end}, {r_end}) - greatest({l_start}, {r_start}) > 0
"""


def colocation_pairs(events, res: int, *, user_col: str = "user_id",
                     lat_col: str = "lat", lon_col: str = "lon",
                     us_col: str = "us", day_us: int = 86_400_000_000,
                     max_bucket: int = 1000, min_codays: int = 1):
    """Co-location pair graph: user pairs observed in the SAME grid
    cell on the SAME day, with the number of distinct co-located
    (cell, day) buckets per pair — the contact-graph / co-visitation
    primitive behind place recommendations and exposure analytics.

    Scale: the pair explosion is bucketed exactly like LSH candidate
    generation — distinct (cell, day, user) first (a user's repeat
    visits collapse), buckets larger than ``max_bucket`` users dropped
    whole (a stadium cell would emit C(n,2) pairs; the cap is the
    documented recall trade, mirrored in the oracle), then one
    bucket-keyed self-join with u_a < u_b. -> (user_a, user_b,
    n_codays)."""
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode
    d = (events.select(
        F.col(user_col).alias("_u"),
        cell_encode(lat_col, lon_col, res).alias("_cell"),
        F.expr(f"{us_col} div {day_us}").alias("_day"))
        .distinct())
    sizes = (d.groupBy("_cell", "_day").count()
             .filter((F.col("count") > 1)
                     & (F.col("count") <= max_bucket))
             .select("_cell", "_day"))
    db = d.join(sizes, ["_cell", "_day"])
    l = db.alias("l")
    r = db.alias("r")
    pairs = (l.join(r, ["_cell", "_day"])
             .filter(F.col("l._u") < F.col("r._u"))
             .select(F.col("l._u").alias("user_a"),
                     F.col("r._u").alias("user_b")))
    return (pairs.groupBy("user_a", "user_b")
            .agg(F.count(F.lit(1)).alias("n_codays"))
            .filter(F.col("n_codays") >= min_codays))


def colocation_pairs_sql(pts_sql: str, res: int, *,
                         day_us: int = 86_400_000_000,
                         max_bucket: int = 1000,
                         min_codays: int = 1) -> str:
    """DuckDB twin of colocation_pairs over a subquery producing
    (user_id, lat, lon, us) — same cell/day bucketing, same cap."""
    from ..functions.cells import cell_encode_sql
    cell = cell_encode_sql("lat", "lon", res)
    return f"""
WITH d AS (SELECT DISTINCT user_id AS u, {cell} AS cell,
           us // {day_us} AS day FROM ({pts_sql})),
ok AS (SELECT cell, day FROM d GROUP BY cell, day
       HAVING COUNT(*) > 1 AND COUNT(*) <= {max_bucket}),
db AS (SELECT d.* FROM d JOIN ok USING (cell, day)),
pairs AS (SELECT l.u AS user_a, r.u AS user_b
          FROM db l JOIN db r ON l.cell = r.cell AND l.day = r.day
          WHERE l.u < r.u)
SELECT user_a, user_b, COUNT(*) AS n_codays
FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= {min_codays}
"""


def stay_points(points, res: int, *, user_col: str = "user_id",
                us_col: str = "us", lat_col: str = "lat",
                lon_col: str = "lon",
                order_cols=("us", "event_id"),
                min_dwell_us: int = 3_600_000_000,
                min_events: int = 2):
    """Stay-point (dwell) detection — the trajectory-mining step that
    turns a GPS stream into visits: maximal runs of CONSECUTIVE events
    of a user inside the same grid cell, kept when the run spans at
    least ``min_dwell_us`` and ``min_events``.  Gaps-and-islands: a
    run id is the running count of cell CHANGES (lag + conditional
    sum), so one user-keyed window pass builds segments without a
    self-join; the segment agg rides the same exchange.  Integer-µs
    throughout. -> (user, cell, n_events, start_us, end_us,
    dwell_s)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode
    ocols = list(order_cols)
    d = points.select(
        F.col(user_col).alias("_user"), *[F.col(c) for c in ocols],
        cell_encode(lat_col, lon_col, res).alias("_cell"))
    w = Window.partitionBy("_user").orderBy(
        *[F.col(c).asc() for c in ocols])
    changed = F.when(
        F.lag("_cell").over(w).isNull()
        | (F.lag("_cell").over(w) != F.col("_cell")), 1).otherwise(0)
    seg = d.withColumn("_seg", F.sum(changed).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    g = (seg.groupBy("_user", "_seg", "_cell")
         .agg(F.count(F.lit(1)).alias("n_events"),
              F.min(us_col).alias("start_us"),
              F.max(us_col).alias("end_us")))
    return (g.filter((F.col("end_us") - F.col("start_us")
                      >= min_dwell_us)
                     & (F.col("n_events") >= min_events))
            .select(F.col("_user").alias(user_col),
                    F.col("_cell").alias("cell"),
                    "n_events", "start_us", "end_us",
                    F.round((F.col("end_us") - F.col("start_us"))
                            / 1_000_000.0, 3).alias("dwell_s")))


def stay_points_sql(pts_sql: str, res: int, *,
                    min_dwell_us: int = 3_600_000_000,
                    min_events: int = 2,
                    order_sql: str = "us, event_id") -> str:
    """DuckDB twin of stay_points over a subquery producing
    (user_id, us, event_id, lat, lon)."""
    from ..functions.cells import cell_encode_sql
    cell = cell_encode_sql("lat", "lon", res)
    return f"""
WITH d AS (SELECT user_id AS u, us, event_id, {cell} AS cell
           FROM ({pts_sql})),
f AS (SELECT u, us, event_id, cell,
      CASE WHEN LAG(cell) OVER (PARTITION BY u ORDER BY {order_sql})
                IS DISTINCT FROM cell THEN 1 ELSE 0 END AS chg
      FROM d),
s AS (SELECT u, us, cell,
      SUM(chg) OVER (PARTITION BY u ORDER BY {order_sql}
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        AS seg
      FROM f),
g AS (SELECT u, seg, cell, COUNT(*) AS n_events,
      MIN(us) AS start_us, MAX(us) AS end_us
      FROM s GROUP BY 1, 2, 3)
SELECT u AS user_id, cell, n_events, start_us, end_us,
       ROUND((end_us - start_us) / 1000000.0, 3) AS dwell_s
FROM g
WHERE end_us - start_us >= {min_dwell_us} AND n_events >= {min_events}
"""


def od_matrix(points, res: int, *, user_col: str = "user_id",
              us_col: str = "us", lat_col: str = "lat",
              lon_col: str = "lon", tie_col: str = "event_id",
              day_us: int = 86_400_000_000, min_trips: int = 1):
    """Origin-destination matrix — the mobility-analytics staple: per
    (user, day), the day's FIRST event cell is the origin and the LAST
    the destination (ties on the timestamp broken by ``tie_col``);
    trips aggregate to (origin, destination, n_trips).  Same-cell days
    count as stationary trips (o == d rows kept — filter downstream).

    Scale: first/last are ONE (user, day)-keyed aggregate via
    min/max(struct(us, tie, cell)) — map-side partial, no window, no
    sort; the trip agg is a second small map-side-combined groupBy.
    -> (o_cell, d_cell, n_trips)."""
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode
    d = points.select(
        F.col(user_col).alias("_u"),
        F.expr(f"{us_col} div {day_us}").alias("_day"),
        F.col(us_col).alias("_us"), F.col(tie_col).alias("_tie"),
        cell_encode(lat_col, lon_col, res).alias("_cell"))
    s = F.struct(F.col("_us"), F.col("_tie"), F.col("_cell"))
    g = (d.groupBy("_u", "_day")
         .agg(F.min(s).alias("_first"), F.max(s).alias("_last")))
    return (g.select(F.col("_first._cell").alias("o_cell"),
                     F.col("_last._cell").alias("d_cell"))
            .groupBy("o_cell", "d_cell")
            .agg(F.count(F.lit(1)).alias("n_trips"))
            .filter(F.col("n_trips") >= min_trips))


def od_matrix_sql(pts_sql: str, res: int, *,
                  day_us: int = 86_400_000_000,
                  min_trips: int = 1) -> str:
    """DuckDB twin of od_matrix over a subquery producing (user_id,
    us, event_id, lat, lon) — arg-min/max expressed as rn=1 windows
    over the same (us, tie) total order."""
    from ..functions.cells import cell_encode_sql
    cell = cell_encode_sql("lat", "lon", res)
    return f"""
WITH d AS (SELECT user_id AS u, us // {day_us} AS day, us, event_id,
           {cell} AS cell FROM ({pts_sql})),
r AS (SELECT u, day, cell,
      ROW_NUMBER() OVER (PARTITION BY u, day
                         ORDER BY us ASC, event_id ASC) AS rf,
      ROW_NUMBER() OVER (PARTITION BY u, day
                         ORDER BY us DESC, event_id DESC) AS rl
      FROM d),
g AS (SELECT u, day,
      MAX(CASE WHEN rf = 1 THEN cell END) AS o_cell,
      MAX(CASE WHEN rl = 1 THEN cell END) AS d_cell
      FROM r GROUP BY 1, 2)
SELECT o_cell, d_cell, COUNT(*) AS n_trips
FROM g GROUP BY 1, 2 HAVING COUNT(*) >= {min_trips}
"""


def od_matrix_closed_sql(pts_sql: str, res: int, *,
                         day_us: int = 86_400_000_000) -> str:
    """DuckDB oracle for streaming/stream.stream_od_trips: the
    od_matrix_sql body restricted to each user's CLOSED days
    (day < the user's max day — the stream emits a trip only when a
    later-day event proves the day ended, and the final day never
    closes inside the replay)."""
    from ..functions.cells import cell_encode_sql
    cell = cell_encode_sql("lat", "lon", res)
    return f"""
WITH d AS (SELECT user_id AS u, us // {day_us} AS day, us, event_id,
           {cell} AS cell FROM ({pts_sql})),
r AS (SELECT u, day, cell,
      ROW_NUMBER() OVER (PARTITION BY u, day
                         ORDER BY us ASC, event_id ASC) AS rf,
      ROW_NUMBER() OVER (PARTITION BY u, day
                         ORDER BY us DESC, event_id DESC) AS rl
      FROM d),
g AS (SELECT u, day,
      MAX(CASE WHEN rf = 1 THEN cell END) AS o_cell,
      MAX(CASE WHEN rl = 1 THEN cell END) AS d_cell
      FROM r GROUP BY 1, 2),
m AS (SELECT *, MAX(day) OVER (PARTITION BY u) AS mxd FROM g)
SELECT o_cell, d_cell, COUNT(*) AS n_trips
FROM m WHERE day < mxd GROUP BY 1, 2
"""


def od_gravity(points, res: int, *, user_col: str = "user_id",
               us_col: str = "us", lat_col: str = "lat",
               lon_col: str = "lon", tie_col: str = "event_id",
               day_us: int = 86_400_000_000):
    """Gravity-model flow lift over the OD matrix — the spatial-
    interaction staple: under the independence (gravity, unit
    deterrence) null, the expected flow on pair (i, j) is
    E_ij = O_i * D_j / T with O_i the origin's total outflow, D_j the
    destination's total inflow, and T the trip total; the LIFT

        lift_ppm = 1e6 * n_ij * T  div  (O_i * D_j)

    says how far the observed flow sits above (>1e6) or below the
    null — the corridor-discovery / anomalous-route signal. Exactly
    the colloc_lift identity with cells for words. Stationary o == d
    days are kept (they are flows under the od_matrix convention and
    dominate the diagonal; filter downstream for travel-only lift).

    Integer-exact: numerator and denominator are nonnegative BIGINT
    products run in DECIMAL(38,0)/HUGEINT (1e12 trips: n*T*1e6 ~
    1e30 fits 38 digits), so div == floor in both engines.

    Scale: everything past od_matrix's two map-side aggs runs on
    AGGREGATE rows — two cell-keyed marginal aggs broadcast back
    onto the pair rows plus a broadcast 1-row total; the repeated od
    subplan is one reused exchange (identical aggregates -> Catalyst
    ReusedExchange), never a second event scan per marginal.
    -> (o_cell, d_cell, n_trips, o_out, d_in, lift_ppm)."""
    from pyspark.sql import functions as F
    od = od_matrix(points, res, user_col=user_col, us_col=us_col,
                   lat_col=lat_col, lon_col=lon_col,
                   tie_col=tie_col, day_us=day_us)
    o = od.groupBy("o_cell").agg(F.sum("n_trips").alias("o_out"))
    d = od.groupBy("d_cell").agg(F.sum("n_trips").alias("d_in"))
    t = od.agg(F.sum("n_trips").alias("_t"))
    return (od.join(F.broadcast(o), "o_cell")
            .join(F.broadcast(d), "d_cell")
            .crossJoin(F.broadcast(t))
            .select("o_cell", "d_cell",
                    F.col("n_trips").cast("long").alias("n_trips"),
                    F.col("o_out").cast("long").alias("o_out"),
                    F.col("d_in").cast("long").alias("d_in"),
                    F.expr("CAST((CAST(n_trips AS DECIMAL(38,0)) "
                           "* _t * 1000000) div "
                           "(CAST(o_out AS DECIMAL(38,0)) * d_in) "
                           "AS BIGINT)").alias("lift_ppm")))


def od_gravity_sql(pts_sql: str, res: int, *,
                   day_us: int = 86_400_000_000) -> str:
    """DuckDB twin of od_gravity — the od_matrix_sql body with
    window-sum marginals (HUGEINT products, // floor)."""
    od = od_matrix_sql(pts_sql, res, day_us=day_us)
    return f"""
WITH og AS ({od}),
om AS (SELECT o_cell, d_cell, n_trips,
       SUM(n_trips) OVER (PARTITION BY o_cell) AS o_out,
       SUM(n_trips) OVER (PARTITION BY d_cell) AS d_in,
       SUM(n_trips) OVER () AS t FROM og)
SELECT o_cell, d_cell, CAST(n_trips AS BIGINT) AS n_trips,
       CAST(o_out AS BIGINT) AS o_out, CAST(d_in AS BIGINT) AS d_in,
       CAST((CAST(n_trips AS HUGEINT) * t * 1000000)
            // (CAST(o_out AS HUGEINT) * d_in) AS BIGINT)
       AS lift_ppm
FROM om
"""


def peak_concurrency(intervals, *, key_col: str = "day",
                     start_col: str = "start_us",
                     end_col: str = "end_us"):
    """Sweep-line peak concurrency: per ``key_col`` bucket, the
    maximum number of half-open [start, end) intervals active at any
    instant — peak simultaneous sessions/users/connections, the
    capacity-planning staple. -> (key, peak, n_intervals).

    Classic sweep: every interval contributes a +1 event at start and
    a -1 at end; the running sum ordered by (us, delta) is the live
    count, and its max is the peak. delta ASC puts the -1 before the
    +1 at equal timestamps, so back-to-back intervals (a ends at t, b
    starts at t) never double-count — the half-open convention.
    Simultaneous starts collapse into one RANGE-frame step (both
    engines' default window frame), so the running value after a tie
    group is the true instantaneous count.

    Scale: intervals must not cross key buckets (clip upstream —
    day-bounded sessions are by construction); the sweep is then one
    key-keyed exchange + one window sort per bucket. A single hot
    bucket at 10^12 rows is the two-phase prefix-sum case
    (pack.prefix_sum): sub-bucket local sweeps + carry-in offsets —
    this direct form is correct at any scale and optimal while a
    bucket fits a partition."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    iv = intervals.filter(F.col(end_col) > F.col(start_col))
    starts = iv.select(F.col(key_col).alias("key"),
                       F.col(start_col).alias("us"),
                       F.lit(1).alias("delta"))
    ends = iv.select(F.col(key_col).alias("key"),
                     F.col(end_col).alias("us"),
                     F.lit(-1).alias("delta"))
    w = Window.partitionBy("key").orderBy("us", "delta")
    return (starts.unionByName(ends)
            .withColumn("live", F.sum("delta").over(w))
            .groupBy("key")
            .agg(F.max("live").cast("int").alias("peak"),
                 (F.count(F.lit(1)) / 2).cast("long")
                 .alias("n_intervals"))
            .select(F.col("key").alias(key_col), "peak",
                    "n_intervals"))


def peak_concurrency_sql(intervals_sql: str, *, key_col: str = "day",
                         start_col: str = "start_us",
                         end_col: str = "end_us") -> str:
    """DuckDB twin of :func:`peak_concurrency` — same +-1 event
    stream, same (us, delta) order, same default RANGE frame, so tie
    groups step identically."""
    return f"""
WITH iv AS (SELECT * FROM ({intervals_sql})
            WHERE {end_col} > {start_col}),
ev AS (
  SELECT {key_col} AS key, {start_col} AS us, 1 AS delta FROM iv
  UNION ALL
  SELECT {key_col} AS key, {end_col} AS us, -1 AS delta FROM iv
),
sw AS (
  SELECT key, SUM(delta) OVER (PARTITION BY key
                               ORDER BY us, delta) AS live
  FROM ev
)
SELECT key AS {key_col}, CAST(MAX(live) AS INTEGER) AS peak,
       CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals
FROM sw GROUP BY 1
"""


def traj_similarity(events, res: int, *, user_col: str = "user_id",
                    lat_col: str = "lat", lon_col: str = "lon",
                    max_bucket: int = 1000, min_shared: int = 2,
                    min_jacc_ppm: int = 0):
    """Trajectory similarity pairs: users whose visited-cell SETS
    overlap — Jaccard over distinct cells at ``res``, the
    mobility-mining companion to colocation_pairs (which needs
    same-day co-presence; this matches users who trace the same
    places at ANY time — commute-twin / account-linking analytics).

    Scale shape is the LSH candidate convention: DISTINCT
    (user, cell) first (repeat visits collapse — one point-level
    shuffle), cells hotter than ``max_bucket`` users dropped WHOLE
    from the universe (a stadium cell fans the self-join out
    quadratically; ngram_pairs' kept-universe rule: per-user set
    sizes are recomputed over kept cells, so the Jaccard is EXACT
    over that universe and the cap is a documented recall trade
    mirrored in the oracle), then one cell-keyed self-join with
    u_a < u_b and a pair-keyed count.

    ``jacc_ppm = (1e6 * shared) div (na + nb - shared)`` — BIGINT
    floor division end to end, no float ulp to flip cross-engine.
    -> (user_a, user_b, n_shared, jacc_ppm)."""
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode
    d = (events.select(
        F.col(user_col).alias("_u"),
        cell_encode(lat_col, lon_col, res).alias("_cell"))
        .distinct())
    ok = (d.groupBy("_cell").count()
          .filter(F.col("count") <= max_bucket).select("_cell"))
    kept = d.join(ok, "_cell")
    sizes = kept.groupBy("_u").agg(F.count(F.lit(1)).alias("_nc"))
    kept = kept.join(sizes, "_u")
    l = kept.select(F.col("_u").alias("user_a"),
                    F.col("_nc").alias("_na"), "_cell")
    r = kept.select(F.col("_u").alias("user_b"),
                    F.col("_nc").alias("_nb"), "_cell")
    inter = (l.join(r, "_cell")
             .filter(F.col("user_a") < F.col("user_b"))
             .groupBy("user_a", "user_b", "_na", "_nb")
             .agg(F.count(F.lit(1)).alias("n_shared")))
    jacc = F.expr("(1000000 * n_shared) div (_na + _nb - n_shared)")
    return (inter
            .filter(F.col("n_shared") >= min_shared)
            .select("user_a", "user_b", "n_shared",
                    jacc.alias("jacc_ppm"))
            .filter(F.col("jacc_ppm") >= min_jacc_ppm))


def traj_similarity_sql(pts_sql: str, res: int, *,
                        max_bucket: int = 1000, min_shared: int = 2,
                        min_jacc_ppm: int = 0) -> str:
    """DuckDB twin of traj_similarity over a subquery producing
    (user_id, lat, lon) — same kept-universe cap, same BIGINT floor
    Jaccard."""
    from ..functions.cells import cell_encode_sql
    cell = cell_encode_sql("lat", "lon", res)
    return f"""
WITH d AS (SELECT DISTINCT user_id AS u, {cell} AS cell
           FROM ({pts_sql})),
ok AS (SELECT cell FROM d GROUP BY cell
       HAVING COUNT(*) <= {max_bucket}),
kept AS (SELECT d.* FROM d JOIN ok USING (cell)),
sized AS (SELECT kept.*, nc FROM kept JOIN (
    SELECT u, COUNT(*) AS nc FROM kept GROUP BY u) s USING (u)),
inter AS (
  SELECT a.u AS user_a, b.u AS user_b, a.nc AS na, b.nc AS nb,
         COUNT(*) AS n_shared
  FROM sized a JOIN sized b ON a.cell = b.cell AND a.u < b.u
  GROUP BY 1, 2, 3, 4)
SELECT user_a, user_b, n_shared,
       (1000000 * n_shared) // (na + nb - n_shared) AS jacc_ppm
FROM inter
WHERE n_shared >= {min_shared}
  AND (1000000 * n_shared) // (na + nb - n_shared) >= {min_jacc_ppm}
"""


def fence_events(points, fence, res: int, *, user_col: str = "user_id",
                 us_col: str = "us", lat_col: str = "lat",
                 lon_col: str = "lon", tie_col: str = "event_id"):
    """Geofence transition detection — the alerting primitive on top
    of a cell fence: per user, ordered by (us, tie), emit one row per
    ENTER (previous event outside or no previous event, current
    inside) and one per EXIT (previous inside, current outside),
    stamped with the event that DETECTED the transition (an exit's
    timestamp is the first event observed outside — the event-stream
    convention; the fence was left somewhere in the unobserved gap).
    A user who starts inside the fence enters at their first event;
    a user never inside emits nothing.

    ``fence`` is a DataFrame with a ``cell`` column at ``res`` —
    aggregate-sized by construction (a fence is a geometry covering,
    e.g. dbscan cores or adaptive_tiles hot set), so membership is a
    broadcast LEFT join flag; the only exchange is the user-keyed
    window, same as stay_points. -> (user, us, event 'enter'|'exit',
    cell = the cell at the detecting event)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode
    d = points.select(
        F.col(user_col).alias("_user"), F.col(us_col).alias("_us"),
        F.col(tie_col).alias("_tie"),
        cell_encode(lat_col, lon_col, res).alias("_cell"))
    marks = F.broadcast(
        fence.select(F.col("cell").alias("_cell")).distinct()
             .withColumn("_m", F.lit(1)))
    d = (d.join(marks, "_cell", "left")
         .withColumn("_in", F.coalesce("_m", F.lit(0))))
    w = Window.partitionBy("_user").orderBy("_us", "_tie")
    d = d.withColumn("_prev", F.coalesce(F.lag("_in").over(w),
                                         F.lit(0)))
    return (d.filter(F.col("_in") != F.col("_prev"))
            .select(F.col("_user").alias(user_col),
                    F.col("_us").alias(us_col),
                    F.when(F.col("_in") == 1, F.lit("enter"))
                     .otherwise(F.lit("exit")).alias("event"),
                    F.col("_cell").alias("cell")))


def fence_events_sql(pts_sql: str, fence_sql: str, res: int) -> str:
    """DuckDB twin of fence_events over subqueries producing
    (user_id, us, event_id, lat, lon) and (cell)."""
    from ..functions.cells import cell_encode_sql
    cell = cell_encode_sql("lat", "lon", res)
    return f"""
WITH d AS (SELECT user_id AS u, us, event_id AS tie, {cell} AS cell
           FROM ({pts_sql})),
fc AS (SELECT DISTINCT cell FROM ({fence_sql})),
m AS (SELECT d.*, CASE WHEN fc.cell IS NULL THEN 0 ELSE 1 END AS inf
      FROM d LEFT JOIN fc ON d.cell = fc.cell),
t AS (SELECT u, us, cell, inf,
      COALESCE(LAG(inf) OVER (PARTITION BY u ORDER BY us, tie), 0)
        AS prev
      FROM m)
SELECT u AS user_id, us,
       CASE WHEN inf = 1 THEN 'enter' ELSE 'exit' END AS event, cell
FROM t WHERE inf <> prev
"""


def _user_hops(points, *, user_col, us_col, lat_col, lon_col,
               tie_col):
    """Shared hop derivation for speed_flags / jump_hist: per-user
    consecutive event pairs (ordered by (us, tie)) with micro-degree
    BIGINT coords, squared displacement d2 and dt_us — ONE user-keyed
    window, identical expression text in both consumers so the SQL
    twins can't drift."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    d = points.select(
        F.col(user_col).alias("_user"), F.col(us_col).alias("_us"),
        F.col(tie_col).alias("_tie"),
        F.expr(f"CAST(floor({lat_col} * 1000000.0) AS BIGINT)")
         .alias("_iy"),
        F.expr(f"CAST(floor({lon_col} * 1000000.0) AS BIGINT)")
         .alias("_ix"))
    w = Window.partitionBy("_user").orderBy("_us", "_tie")
    d = (d.withColumn("_px", F.lag("_ix").over(w))
          .withColumn("_py", F.lag("_iy").over(w))
          .withColumn("_pus", F.lag("_us").over(w))
          .filter(F.col("_pus").isNotNull()))
    return (d.withColumn("dt_us", F.col("_us") - F.col("_pus"))
             .withColumn("d2", F.expr(
                 "(_ix - _px) * (_ix - _px) "
                 "+ (_iy - _py) * (_iy - _py)")))


def speed_flags(points, *, vmax_udeg_s: int, user_col: str = "user_id",
                us_col: str = "us", lat_col: str = "lat",
                lon_col: str = "lon", tie_col: str = "event_id"):
    """Implausible-speed hop detection — the GPS-noise / teleport
    filter every trajectory pipeline runs before mining: per user,
    consecutive event pairs (ordered by (us, tie)) whose implied
    planar speed exceeds ``vmax_udeg_s`` micro-degrees/second
    (~0.111 m per micro-degree at the equator; walking ≈ 14, plane
    ≈ 2250).

    Integer-exact flag: coords quantized to micro-degree BIGINTs,
    d2 = dx² + dy² compared against lim² where
    ``lim = least((vmax * dt_us) div 1e6, 6e8)`` — BIGINT floor end
    to end, no float speed to ulp-flip cross-engine. The 6e8 clamp
    is semantics-free overflow protection: d2 ≤ (3.6e8)² + (1.8e8)²
    = 1.62e17 < (6e8)², so any lim at or past the clamp already
    passes every possible hop, while an unclamped lim² overflows
    BIGINT once dt_us exceeds ~6e14/vmax seconds-worth of gap.
    A dt of 0 with any displacement is a
    teleport (lim = 0 < d2). One user-keyed window is the only
    exchange; map-side lattice math otherwise. -> flagged hops
    (user, us = arrival event, dt_us, d2)."""
    from pyspark.sql import functions as F
    d = _user_hops(points, user_col=user_col, us_col=us_col,
                   lat_col=lat_col, lon_col=lon_col, tie_col=tie_col)
    d = d.withColumn("_lim", F.expr(
        f"least(({vmax_udeg_s} * dt_us) div 1000000, "
        "600000000)"))
    return (d.filter(F.col("d2") > F.col("_lim") * F.col("_lim"))
            .select(F.col("_user").alias(user_col),
                    F.col("_us").alias(us_col), "dt_us", "d2"))


def speed_flags_sql(pts_sql: str, vmax_udeg_s: int) -> str:
    """DuckDB twin of speed_flags over a subquery producing
    (user_id, us, event_id, lat, lon) — identical micro-degree
    quantization and BIGINT floor limit."""
    return f"""
WITH d AS (SELECT user_id AS u, us, event_id AS tie,
           CAST(floor(lat * 1000000.0) AS BIGINT) AS iy,
           CAST(floor(lon * 1000000.0) AS BIGINT) AS ix
           FROM ({pts_sql})),
h AS (SELECT u, us, ix, iy,
      LAG(ix) OVER w AS px, LAG(iy) OVER w AS py,
      LAG(us) OVER w AS pus
      FROM d WINDOW w AS (PARTITION BY u ORDER BY us, tie)),
p AS (SELECT u, us, us - pus AS dt_us,
      (ix - px) * (ix - px) + (iy - py) * (iy - py) AS d2,
      least(({vmax_udeg_s} * (us - pus)) // 1000000, 600000000)
        AS lim
      FROM h WHERE pus IS NOT NULL)
SELECT u AS user_id, us, dt_us, d2 FROM p WHERE d2 > lim * lim
"""


def user_mobility(points, res: int, *, user_col: str = "user_id",
                  lat_col: str = "lat", lon_col: str = "lon"):
    """Per-user mobility profile — the feature block mobility mining
    starts from (and the input to predictability / account-linking
    models): event volume, spatial breadth (distinct cells at
    ``res``), and concentration = the modal cell's share of the
    user's events in ppm (``(1e6 * top_cnt) div n_events`` — a
    commuter pinned to one cell scores 1e6, a tourist scores low;
    BIGINT floor, no float share to drift cross-engine; modal ties
    need no break — the SHARE is tie-invariant).

    Scale shape: one (user, cell)-keyed count shuffle, then a
    user-keyed agg over the aggregate-sized rows riding a second
    (strictly smaller) exchange; both stages map-side combinable.
    -> (user, n_events, n_cells, top_share_ppm)."""
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode
    per = (points.select(
        F.col(user_col).alias("_u"),
        cell_encode(lat_col, lon_col, res).alias("_cell"))
        .groupBy("_u", "_cell").agg(F.count(F.lit(1)).alias("_n")))
    return (per.groupBy("_u")
            .agg(F.sum("_n").alias("n_events"),
                 F.count(F.lit(1)).alias("n_cells"),
                 F.max("_n").alias("_top"))
            .select(F.col("_u").alias(user_col), "n_events",
                    "n_cells",
                    F.expr("(1000000 * _top) div n_events")
                    .alias("top_share_ppm")))


def user_mobility_sql(pts_sql: str, res: int) -> str:
    """DuckDB twin of user_mobility over a subquery producing
    (user_id, lat, lon)."""
    from ..functions.cells import cell_encode_sql
    cell = cell_encode_sql("lat", "lon", res)
    return f"""
WITH per AS (SELECT user_id AS u, {cell} AS cell, COUNT(*) AS n
             FROM ({pts_sql}) GROUP BY 1, 2)
SELECT u AS user_id, CAST(SUM(n) AS BIGINT) AS n_events,
       COUNT(*) AS n_cells,
       CAST((1000000 * MAX(n)) // SUM(n) AS BIGINT) AS top_share_ppm
FROM per GROUP BY 1
"""


def home_work(points, res: int, *, user_col: str = "user_id",
              us_col: str = "us", lat_col: str = "lat",
              lon_col: str = "lon",
              night: tuple = (0, 6), day: tuple = (9, 17),
              hour_us: int = 3_600_000_000):
    """Home/work location inference — the mobility-mining classic:
    a user's HOME is the modal cell among events in the night window
    [night[0], night[1]) hours-of-day, WORK the modal cell in the day
    window; either is NULL when the user has no events in that
    window. Hour-of-day is ``(us div hour_us) % 24`` — integer bit
    math off the µs epoch (the synthetic tables carry no timezone;
    shift ``us`` upstream for local-time semantics). Modal ties break
    on the smaller cell id via one struct-MIN over (-count, cell).

    Scale shape: one (user, window, cell) count shuffle, then two
    aggregate-sized user-keyed aggs (argmin, pivot-by-CASE) riding
    strictly smaller exchanges. -> (user, home_cell, work_cell)."""
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode
    hr = F.expr(f"({us_col} div {hour_us}) % 24")
    k = (F.when((hr >= night[0]) & (hr < night[1]), F.lit("h"))
         .when((hr >= day[0]) & (hr < day[1]), F.lit("w")))
    per = (points.select(
        F.col(user_col).alias("_u"), k.alias("_k"),
        cell_encode(lat_col, lon_col, res).alias("_cell"))
        .filter(F.col("_k").isNotNull())
        .groupBy("_u", "_k", "_cell")
        .agg(F.count(F.lit(1)).alias("_n")))
    best = (per.groupBy("_u", "_k")
            .agg(F.min(F.struct((-F.col("_n")).alias("_neg"),
                                F.col("_cell"))).alias("_b"))
            .select("_u", "_k", F.col("_b._cell").alias("_best")))
    return (best.groupBy("_u")
            .agg(F.min(F.when(F.col("_k") == "h", F.col("_best")))
                 .alias("home_cell"),
                 F.min(F.when(F.col("_k") == "w", F.col("_best")))
                 .alias("work_cell"))
            .select(F.col("_u").alias(user_col), "home_cell",
                    "work_cell"))


def home_work_sql(pts_sql: str, res: int, *,
                  night: tuple = (0, 6), day: tuple = (9, 17),
                  hour_us: int = 3_600_000_000) -> str:
    """DuckDB twin of home_work over a subquery producing
    (user_id, us, lat, lon)."""
    from ..functions.cells import cell_encode_sql
    cell = cell_encode_sql("lat", "lon", res)
    hr = f"((us // {hour_us}) % 24)"
    k = (f"CASE WHEN {hr} >= {night[0]} AND {hr} < {night[1]} "
         f"THEN 'h' WHEN {hr} >= {day[0]} AND {hr} < {day[1]} "
         f"THEN 'w' END")
    return f"""
WITH per AS (
  SELECT user_id AS u, {k} AS k, {cell} AS cell, COUNT(*) AS n
  FROM ({pts_sql}) WHERE {k} IS NOT NULL GROUP BY 1, 2, 3),
best AS (
  SELECT u, k, cell AS best FROM (
    SELECT u, k, cell,
           ROW_NUMBER() OVER (PARTITION BY u, k
                              ORDER BY n DESC, cell ASC) AS rn
    FROM per) WHERE rn = 1)
SELECT u AS user_id,
       MIN(CASE WHEN k = 'h' THEN best END) AS home_cell,
       MIN(CASE WHEN k = 'w' THEN best END) AS work_cell
FROM best GROUP BY 1
"""


def jump_hist(points, *, user_col: str = "user_id",
              us_col: str = "us", lat_col: str = "lat",
              lon_col: str = "lon", tie_col: str = "event_id"):
    """Displacement (jump-length) histogram — the mobility-science
    fingerprint (human travel follows a truncated power law; a bot
    swarm or synthetic GPS track doesn't): per-user consecutive hops
    bucketed by squared micro-degree displacement into exact log2
    bins, ``bucket = length(bin(d2))`` = floor(log2 d2) + 1 — the
    binary-string length trick gives an INTEGER log2 with no float
    log to ulp-flip at exact powers of two (bin() renders BIGINTs
    identically in both engines, tested); stationary hops (d2 = 0)
    get bucket 0. Shares _user_hops' window with speed_flags.
    -> (bucket, n_hops), one aggregate-sized histogram."""
    from pyspark.sql import functions as F
    d = _user_hops(points, user_col=user_col, us_col=us_col,
                   lat_col=lat_col, lon_col=lon_col, tie_col=tie_col)
    bucket = F.expr(
        "CASE WHEN d2 = 0 THEN 0 ELSE length(bin(d2)) END")
    return (d.groupBy(bucket.cast("int").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_hops")))


def jump_hist_sql(pts_sql: str) -> str:
    """DuckDB twin of jump_hist over a subquery producing
    (user_id, us, event_id, lat, lon)."""
    return f"""
WITH d AS (SELECT user_id AS u, us, event_id AS tie,
           CAST(floor(lat * 1000000.0) AS BIGINT) AS iy,
           CAST(floor(lon * 1000000.0) AS BIGINT) AS ix
           FROM ({pts_sql})),
h AS (SELECT u, us, ix, iy,
      LAG(ix) OVER w AS px, LAG(iy) OVER w AS py,
      LAG(us) OVER w AS pus
      FROM d WINDOW w AS (PARTITION BY u ORDER BY us, tie)),
p AS (SELECT (ix - px) * (ix - px) + (iy - py) * (iy - py) AS d2
      FROM h WHERE pus IS NOT NULL)
SELECT CAST(CASE WHEN d2 = 0 THEN 0
            ELSE length(bin(d2)) END AS INT) AS bucket,
       COUNT(*) AS n_hops
FROM p GROUP BY 1
"""


def _octant_case(dx: str, dy: str) -> str:
    """Spark/DuckDB-shared SQL text: classify an integer displacement
    (dx, dy) into one of 8 EQUAL 45-degree sectors whose boundaries
    lie on the axes and exact diagonals (the Bresenham octants, each
    half-open [k*45, (k+1)*45) counterclockwise from due east) — so
    every boundary test is a pure integer comparison, no atan2 to
    ulp-flip a hop sitting exactly on a sector edge. Sector names are
    the 16-wind compass label of each sector's interior: ENE covers
    [0,45) (due east inclusive), NNE [45,90) (the NE diagonal
    inclusive), and so on around. Generated from one function so the
    two engines can't drift. Callers exclude (0, 0) (the ELSE arm
    would mislabel it ESE)."""
    x, y = f"({dx})", f"({dy})"
    return (f"CASE WHEN {y} >= 0 AND {x} > {y} THEN 'ENE' "
            f"WHEN {x} > 0 AND {y} >= {x} THEN 'NNE' "
            f"WHEN {x} <= 0 AND {y} > -{x} THEN 'NNW' "
            f"WHEN {y} > 0 AND -{x} >= {y} THEN 'WNW' "
            f"WHEN {y} <= 0 AND -{x} > -{y} THEN 'WSW' "
            f"WHEN {x} < 0 AND -{y} >= -{x} THEN 'SSW' "
            f"WHEN {x} >= 0 AND -{y} > {x} THEN 'SSE' "
            f"ELSE 'ESE' END")


def bearing_hist(points, *, user_col: str = "user_id",
                 us_col: str = "us", lat_col: str = "lat",
                 lon_col: str = "lon", tie_col: str = "event_id"):
    """Heading-octant histogram — the movement ANISOTROPY fingerprint
    (a road-grid city shows N/S/E/W spikes, open-water drift doesn't,
    a uniform bot swarm is flat): per-user consecutive hops binned
    into 8 EQUAL 45-degree direction sectors by integer comparisons
    on the micro-degree displacement (_octant_case: the Bresenham
    octants, boundaries on axes and exact diagonals — no atan2), with
    hop count and TRUNCATED MEAN squared displacement per octant.
    Stationary hops (dx = dy = 0) carry no direction and are dropped.
    The d2 sum accumulates in DECIMAL(38,0) (DuckDB: HUGEINT — a
    single antipodal hop is ~1.6e17 µdeg², so a BIGINT sum overflows
    after ~57 such hops) but the OUTPUT is the mean, which always
    fits BIGINT (mean <= max d2) — both engines' pandas bridges
    narrow wide types to float64, so a wide column must never reach
    the result schema. Shares _user_hops' window with
    speed_flags/jump_hist; the histogram is one 8-row
    map-side-combinable agg. -> (octant, n_hops, mean_d2)."""
    from pyspark.sql import functions as F
    d = _user_hops(points, user_col=user_col, us_col=us_col,
                   lat_col=lat_col, lon_col=lon_col, tie_col=tie_col)
    d = d.filter(F.col("d2") > 0)
    oct_ = F.expr(_octant_case("_ix - _px", "_iy - _py"))
    return (d.groupBy(oct_.alias("octant"))
            .agg(F.count(F.lit(1)).alias("n_hops"),
                 F.sum(F.col("d2").cast("decimal(38,0)"))
                 .alias("_s"))
            .select("octant", "n_hops",
                    F.expr("_s div n_hops").alias("mean_d2")))


def bearing_hist_sql(pts_sql: str) -> str:
    """DuckDB twin of bearing_hist over a subquery producing
    (user_id, us, event_id, lat, lon) — identical octant CASE text;
    the sum runs in HUGEINT (BIGINT overflows, see bearing_hist) and
    only the BIGINT-safe truncated mean reaches the output."""
    oct_ = _octant_case("ix - px", "iy - py")
    return f"""
WITH d AS (SELECT user_id AS u, us, event_id AS tie,
           CAST(floor(lat * 1000000.0) AS BIGINT) AS iy,
           CAST(floor(lon * 1000000.0) AS BIGINT) AS ix
           FROM ({pts_sql})),
h AS (SELECT u, us, ix, iy,
      LAG(ix) OVER w AS px, LAG(iy) OVER w AS py,
      LAG(us) OVER w AS pus
      FROM d WINDOW w AS (PARTITION BY u ORDER BY us, tie)),
p AS (SELECT ix, iy, px, py,
      (ix - px) * (ix - px) + (iy - py) * (iy - py) AS d2
      FROM h WHERE pus IS NOT NULL)
SELECT {oct_} AS octant, COUNT(*) AS n_hops,
       CAST(SUM(CAST(d2 AS HUGEINT)) // COUNT(*) AS BIGINT)
         AS mean_d2
FROM p WHERE d2 > 0 GROUP BY 1
"""


def revisit_hist(points, res: int, *, user_col: str = "user_id",
                 us_col: str = "us", lat_col: str = "lat",
                 lon_col: str = "lon", tie_col: str = "event_id"):
    """Revisit-interval histogram — the temporal twin of jump_hist:
    gaps between a user's CONSECUTIVE visits to the SAME grid cell,
    bucketed into exact log2 bins of whole seconds. Human place
    revisitation is bursty (heavy-tailed inter-visit times); a
    scripted poller revisits on a metronome — this one aggregate row
    set separates them, and it is the dwell/recency feature behind
    place-ranking models.

    Integer-exact: the gap quantizes to whole seconds with BIGINT
    ``div`` BEFORE bucketing, then ``bucket = length(bin(gap_s))``
    = floor(log2 gap_s) + 1 (the jump_hist binary-string-length
    trick — no float log to ulp-flip at exact powers of two);
    same-second revisits (gap_s = 0) get bucket 0. Consecutive means
    per (user, cell) ordered by (us, tie) — an interleaved visit to
    ANOTHER cell does not break the pair (cell-keyed LAG, the
    standard inter-visit-time definition).

    Scale: one (user, cell)-keyed window over the event stream (same
    shuffle class as sessionize), then an aggregate-sized groupBy of
    ~60 buckets with map-side combine. -> (bucket, n_gaps)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode
    d = points.select(
        F.col(user_col).alias("_user"), F.col(us_col).alias("_us"),
        F.col(tie_col).alias("_tie"),
        cell_encode(lat_col, lon_col, res).alias("_cell"))
    w = Window.partitionBy("_user", "_cell").orderBy("_us", "_tie")
    g = (d.withColumn("_pus", F.lag("_us").over(w))
          .filter(F.col("_pus").isNotNull())
          .select(F.expr("(_us - _pus) div 1000000").alias("_gap_s")))
    bucket = F.expr(
        "CASE WHEN _gap_s = 0 THEN 0 ELSE length(bin(_gap_s)) END")
    return (g.groupBy(bucket.cast("int").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_gaps")))


def revisit_hist_sql(pts_sql: str, res: int) -> str:
    """DuckDB twin of revisit_hist over a subquery producing
    (user_id, us, event_id, lat, lon) — same cell id, same
    integer-second quantization, same bin()-length bucket."""
    from ..functions.cells import cell_encode_sql
    cell = cell_encode_sql("lat", "lon", res)
    return f"""
WITH d AS (SELECT user_id AS u, us, event_id AS tie,
           {cell} AS cell FROM ({pts_sql})),
h AS (SELECT u, cell, us,
      LAG(us) OVER (PARTITION BY u, cell ORDER BY us, tie) AS pus
      FROM d),
g AS (SELECT (us - pus) // 1000000 AS gap_s
      FROM h WHERE pus IS NOT NULL)
SELECT CAST(CASE WHEN gap_s = 0 THEN 0
            ELSE length(bin(gap_s)) END AS INT) AS bucket,
       COUNT(*) AS n_gaps
FROM g GROUP BY 1
"""


def gyration(points, *, user_col: str = "user_id",
             lat_col: str = "lat", lon_col: str = "lon"):
    """Radius of gyration — the mobility-science size-of-life scalar
    (Gonzalez/Hidalgo/Barabasi 2008: human rg is heavy-tailed and
    per-user stationary; a bot farm's is degenerate): per user, the
    mean squared deviation of their µdeg lattice positions from
    their own centroid, exactly — rg2 = (n·Σ(x²+y²) − (Σx)² − (Σy)²)
    div n², the one-pass sufficient-statistics identity, so no
    centroid join and no second scan.

    Integer-exact: per-row x²+y² fits BIGINT (≤ ~4.1e16) but the SUMS
    don't (57 antipodal rows overflow), so all three accumulate in
    DECIMAL(38,0)/HUGEINT; the numerator is nonnegative by
    Cauchy-Schwarz, div truncation == floor, and only the BIGINT-safe
    quotient (≤ max d2) reaches the schema (the bearing_hist rule).

    Scale: ONE user-keyed partial-aggregating groupBy — four
    combinable sums, map-side combine does the volume work; no
    window, no self-join. -> (user, n_pts, rg2)."""
    from pyspark.sql import functions as F
    d = points.select(
        F.col(user_col).alias("_user"),
        F.expr(f"CAST(floor({lon_col} * 1000000.0) AS BIGINT)")
         .alias("_ix"),
        F.expr(f"CAST(floor({lat_col} * 1000000.0) AS BIGINT)")
         .alias("_iy"))
    g = (d.groupBy("_user")
         .agg(F.count(F.lit(1)).alias("n_pts"),
              F.sum(F.col("_ix").cast("decimal(38,0)")).alias("_sx"),
              F.sum(F.col("_iy").cast("decimal(38,0)")).alias("_sy"),
              F.sum(F.expr("_ix * _ix + _iy * _iy")
                    .cast("decimal(38,0)")).alias("_s2")))
    return (g.select(
        F.col("_user").alias(user_col), "n_pts",
        F.expr("(CAST(n_pts AS DECIMAL(38,0)) * _s2 "
               "- _sx * _sx - _sy * _sy) "
               "div (CAST(n_pts AS DECIMAL(38,0)) * n_pts)")
        .alias("rg2")))


def gyration_sql(pts_sql: str) -> str:
    """DuckDB twin of gyration over a subquery producing
    (user_id, lat, lon) — HUGEINT sums, same one-pass identity."""
    return f"""
WITH d AS (SELECT user_id AS u,
           CAST(floor(lat * 1000000.0) AS BIGINT) AS iy,
           CAST(floor(lon * 1000000.0) AS BIGINT) AS ix
           FROM ({pts_sql})),
g AS (SELECT u, COUNT(*) AS n,
      SUM(CAST(ix AS HUGEINT)) AS sx,
      SUM(CAST(iy AS HUGEINT)) AS sy,
      SUM(CAST(ix * ix + iy * iy AS HUGEINT)) AS s2
      FROM d GROUP BY u)
SELECT u AS user_id, CAST(n AS BIGINT) AS n_pts,
       CAST((CAST(n AS HUGEINT) * s2 - sx * sx - sy * sy)
            // (CAST(n AS HUGEINT) * n) AS BIGINT) AS rg2
FROM g
"""


def path_motifs(points, res: int, *, min_count: int = 2,
                user_col: str = "user_id", us_col: str = "us",
                lat_col: str = "lat", lon_col: str = "lon",
                tie_col: str = "event_id"):
    """Path-motif mining — the sequential-pattern primitive over
    trajectories: global counts of cell TRIGRAMS (a -> b -> c) in
    user movement sequences after collapsing consecutive repeats (a
    dwell is one step, so motifs are about MOVEMENT structure, not
    sampling rate), kept when seen at least ``min_count`` times.
    Recurrent trigrams are commute corridors / detour patterns; a
    threshold (not top-k) keeps the result set deterministic under
    count ties.

    Scale: one user-keyed window to collapse repeats, a second lag
    pass over the COLLAPSED rows (same exchange class — Spark reuses
    the user partitioning), then ONE (c1,c2,c3) groupBy with map-side
    combine. The collapsed stream is at most the event stream.
    -> (c1, c2, c3, n)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode
    d = points.select(
        F.col(user_col).alias("_user"), F.col(us_col).alias("_us"),
        F.col(tie_col).alias("_tie"),
        cell_encode(lat_col, lon_col, res).alias("_cell"))
    w = Window.partitionBy("_user").orderBy("_us", "_tie")
    d = (d.withColumn("_prev", F.lag("_cell").over(w))
          .filter(F.col("_prev").isNull()
                  | (F.col("_prev") != F.col("_cell"))))
    tri = (d.withColumn("_c2", F.lag("_cell", 1).over(w))
            .withColumn("_c1", F.lag("_cell", 2).over(w))
            .filter(F.col("_c1").isNotNull()))
    return (tri.groupBy(F.col("_c1").alias("c1"),
                        F.col("_c2").alias("c2"),
                        F.col("_cell").alias("c3"))
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= min_count))


def path_motifs_sql(pts_sql: str, res: int, *,
                    min_count: int = 2) -> str:
    """DuckDB twin of path_motifs over a subquery producing
    (user_id, us, event_id, lat, lon)."""
    from ..functions.cells import cell_encode_sql
    cell = cell_encode_sql("lat", "lon", res)
    return f"""
WITH d AS (SELECT user_id AS u, us, event_id AS tie, {cell} AS cell
           FROM ({pts_sql})),
f AS (SELECT u, us, tie, cell,
      LAG(cell) OVER (PARTITION BY u ORDER BY us, tie) AS prev
      FROM d),
c AS (SELECT u, us, tie, cell FROM f
      WHERE prev IS NULL OR prev <> cell),
t AS (SELECT cell AS c3,
      LAG(cell, 1) OVER (PARTITION BY u ORDER BY us, tie) AS c2,
      LAG(cell, 2) OVER (PARTITION BY u ORDER BY us, tie) AS c1
      FROM c)
SELECT c1, c2, c3, COUNT(*) AS n
FROM t WHERE c1 IS NOT NULL
GROUP BY 1, 2, 3 HAVING COUNT(*) >= {min_count}
"""


def contact_graph(events, res: int, tau_us: int, *,
                  user_col: str = "user_id", us_col: str = "us",
                  lat_col: str = "lat", lon_col: str = "lon",
                  tie_col: str = "event_id", max_bucket: int = 1000,
                  min_contacts: int = 1):
    """Proximity contact graph — the exposure/contact-tracing
    primitive colocation_pairs coarsens away: user pairs whose events
    land in the SAME grid cell within ``tau_us`` of each other, with
    the exact number of qualifying event pairs per user pair. A
    same-day bucket (colocation) calls an 8 a.m. and an 11 p.m. visit
    a contact; this is the real |Δt| <= τ interval predicate.

    Each qualifying event pair counts EXACTLY once with no dedup
    shuffle: pairs are time-ordered by (us, tie), the earlier side
    explodes to its τ-bucket and the next one, the later side keys on
    its OWN bucket — since 0 <= Δt <= τ the later bucket is one of
    those two, and the two exploded copies are distinct keys, so the
    equi-join matches each ordered pair exactly once. Self-pairs
    (same user) drop; the user pair is canonicalized least/greatest.

    Scale: the same (cell, bucket)-keyed bucket-join discipline as
    colocation_pairs/LSH — buckets larger than ``max_bucket`` events
    drop whole (a stadium cell-minute would emit C(n,2) pairs; the
    cap is the documented recall trade, mirrored in the oracle), one
    equi-join, one pair-keyed groupBy with map-side combine.
    -> (user_a, user_b, n_contacts)."""
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode
    d = events.select(
        F.col(user_col).alias("_u"), F.col(us_col).alias("_us"),
        F.col(tie_col).alias("_tie"),
        cell_encode(lat_col, lon_col, res).alias("_cell"),
        F.expr(f"{us_col} div {tau_us}").alias("_b"))
    sizes = (d.groupBy("_cell", "_b").count()
             .filter(F.col("count") <= max_bucket)
             .select("_cell", "_b"))
    db = d.join(sizes, ["_cell", "_b"])
    left = (db.withColumn("_bx", F.explode(F.array(
        F.col("_b"), F.col("_b") + 1)))
            .select(F.col("_u").alias("_ul"),
                    F.col("_us").alias("_usl"),
                    F.col("_tie").alias("_tl"),
                    "_cell", F.col("_bx").alias("_b")))
    right = db.select(F.col("_u").alias("_ur"),
                      F.col("_us").alias("_usr"),
                      F.col("_tie").alias("_tr"), "_cell", "_b")
    pairs = (left.join(right, ["_cell", "_b"])
             .filter((F.col("_usr") - F.col("_usl")
                      <= F.lit(tau_us))
                     & ((F.col("_usl") < F.col("_usr"))
                        | ((F.col("_usl") == F.col("_usr"))
                           & (F.col("_tl") < F.col("_tr"))))
                     & (F.col("_ul") != F.col("_ur"))))
    return (pairs.groupBy(
        F.least("_ul", "_ur").alias("user_a"),
        F.greatest("_ul", "_ur").alias("user_b"))
        .agg(F.count(F.lit(1)).alias("n_contacts"))
        .filter(F.col("n_contacts") >= min_contacts))


def contact_graph_sql(pts_sql: str, res: int, tau_us: int, *,
                      max_bucket: int = 1000,
                      min_contacts: int = 1) -> str:
    """DuckDB twin of contact_graph over a subquery producing
    (user_id, us, event_id, lat, lon) — brute-force same-cell
    time-ordered pair enumeration with the SAME τ-bucket cap."""
    from ..functions.cells import cell_encode_sql
    cell = cell_encode_sql("lat", "lon", res)
    return f"""
WITH d AS (SELECT user_id AS u, us, event_id AS tie, {cell} AS cell,
           us // {tau_us} AS b FROM ({pts_sql})),
ok AS (SELECT cell, b FROM d GROUP BY cell, b
       HAVING COUNT(*) <= {max_bucket}),
db AS (SELECT d.* FROM d JOIN ok USING (cell, b)),
pairs AS (SELECT l.u AS ul, r.u AS ur
          FROM db l JOIN db r ON l.cell = r.cell
          WHERE r.us - l.us BETWEEN 0 AND {tau_us}
            AND (l.us < r.us OR (l.us = r.us AND l.tie < r.tie))
            AND l.u <> r.u)
SELECT LEAST(ul, ur) AS user_a, GREATEST(ul, ur) AS user_b,
       COUNT(*) AS n_contacts
FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= {min_contacts}
"""


def type_transitions(events, *, user_col: str = "user_id",
                     us_col: str = "us", type_col: str = "event_type",
                     tie_col: str = "event_id", min_count: int = 1):
    """Behavioral Markov fingerprint — first-order transition counts
    between a user's CONSECUTIVE event types, with the exact floor-ppm
    conditional P(next | current) (the bigram_lm identity on event
    streams instead of token streams): organic sessions have ragged
    rows that sum to ~1e6 with a heavy self-loop diagonal; replayed
    or scripted traffic shows near-deterministic rows — the cheapest
    sequence-level bot screen after jump_hist (space) and
    revisit_hist (time).

    The conditioning denominator is the TRANSITION-start count (sum
    over each t1 row), fixed BEFORE the ``min_count`` prune, so
    surviving probabilities are unchanged by the prune (the bigram_lm
    rule). Scale: one user-keyed window (the sessionize exchange
    class), one (t1, t2) groupBy with map-side combine, and the
    denominator rides a t1 window over AGGREGATE rows (the type
    alphabet squared, not events). -> (t1, t2, n, cond_ppm)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    d = events.select(
        F.col(user_col).alias("_user"), F.col(us_col).alias("_us"),
        F.col(tie_col).alias("_tie"), F.col(type_col).alias("_t"))
    w = Window.partitionBy("_user").orderBy("_us", "_tie")
    d = (d.withColumn("_p", F.lag("_t").over(w))
          .filter(F.col("_p").isNotNull()))
    g = (d.groupBy(F.col("_p").alias("t1"), F.col("_t").alias("t2"))
          .agg(F.count(F.lit(1)).alias("n")))
    return (g.withColumn("cond_ppm",
                         F.expr("(1000000 * n) div "
                                "sum(n) OVER (PARTITION BY t1)"))
            .filter(F.col("n") >= min_count)
            .select("t1", "t2", "n", "cond_ppm"))


def type_transitions_sql(pts_sql: str, *, min_count: int = 1) -> str:
    """DuckDB twin of type_transitions over a subquery producing
    (user_id, us, event_id, event_type)."""
    return f"""
WITH d AS (SELECT user_id AS u, us, event_id AS tie,
           event_type AS t FROM ({pts_sql})),
h AS (SELECT t,
      LAG(t) OVER (PARTITION BY u ORDER BY us, tie) AS p
      FROM d),
g AS (SELECT p AS t1, t AS t2, COUNT(*) AS n FROM h
      WHERE p IS NOT NULL GROUP BY 1, 2)
SELECT t1, t2, CAST(n AS BIGINT) AS n,
       CAST((1000000 * n) // SUM(n) OVER (PARTITION BY t1)
            AS BIGINT) AS cond_ppm
FROM g QUALIFY n >= {min_count}
"""


def triangles(edges, *, a_col: str = "user_a",
              b_col: str = "user_b"):
    """Per-node triangle count + exact local clustering coefficient
    over an undirected graph — the triadic-closure primitive
    (exposure triads on a contact graph, link-farm cliques on a host
    graph): n_tri = triangles through the node, cc_ppm =
    (1e6·2·n_tri) div (d·(d−1)) with d the node's degree; nodes with
    d >= 2 report (cc_ppm = 0 when no wedge closes).

    Degree-ordered orientation (Schank-Wagner): each undirected edge
    points from its lexicographically smaller (degree, id) endpoint,
    so every triangle has exactly ONE node with two out-edges — the
    wedge join enumerates each triangle exactly once, and a node's
    wedge work is bounded by its ORIENTED out-degree (O(sqrt(m)) on
    any graph, the arboricity bound), which is what makes the
    quadratic hub blow-up a non-event at scale: a 1e6-degree celebrity
    node generates ~0 wedges because every edge points INTO it.

    Scale: dedup groupBy, one node-keyed degree agg joined back to
    both endpoints, one wedge self-join keyed on the pivot, one
    closure equi-join against the canonical edge set, one explode +
    node-keyed count. -> (node, degree, n_tri, cc_ppm)."""
    from pyspark.sql import functions as F
    e = (edges.select(F.least(a_col, b_col).alias("_a"),
                      F.greatest(a_col, b_col).alias("_b"))
         .filter(F.col("_a") != F.col("_b"))
         .distinct())
    deg = (e.select(F.explode(F.array("_a", "_b")).alias("_v"))
           .groupBy("_v").agg(F.count(F.lit(1)).alias("_d")))
    da = deg.select(F.col("_v").alias("_a"), F.col("_d").alias("_da"))
    db = deg.select(F.col("_v").alias("_b"), F.col("_d").alias("_db"))
    ed = e.join(da, "_a").join(db, "_b")
    fwd = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("_a") < F.col("_b")))
    o = ed.select(
        F.when(fwd, F.col("_a")).otherwise(F.col("_b")).alias("_u"),
        F.when(fwd, F.col("_b")).otherwise(F.col("_a")).alias("_w"))
    o1 = o.select(F.col("_u"), F.col("_w").alias("_x"))
    o2 = o.select(F.col("_u"), F.col("_w").alias("_y"))
    wedges = (o1.join(o2, "_u")
              .filter(F.col("_x") < F.col("_y")))
    tri = wedges.join(
        e, (wedges["_x"] == e["_a"]) & (wedges["_y"] == e["_b"]))
    per = (tri.select(F.explode(F.array("_u", "_x", "_y"))
                      .alias("_v"))
           .groupBy("_v").agg(F.count(F.lit(1)).alias("n_tri")))
    return (deg.filter(F.col("_d") >= 2)
            .join(per, "_v", "left")
            .select(F.col("_v").alias("node"),
                    F.col("_d").alias("degree"),
                    F.coalesce("n_tri", F.lit(0)).cast("long")
                    .alias("n_tri"))
            .withColumn("cc_ppm", F.expr(
                "(1000000 * 2 * n_tri) div (degree * (degree - 1))")))


def triangles_sql(edges_sql: str) -> str:
    """DuckDB twin of triangles over a subquery producing
    (user_a, user_b) — brute-force closed-triple enumeration on the
    canonical a<b edge set (the orientation trick is the scale path;
    both count each triangle once per member node)."""
    return f"""
WITH tr_e AS (SELECT DISTINCT LEAST(user_a, user_b) AS a,
              GREATEST(user_a, user_b) AS b
              FROM ({edges_sql}) WHERE user_a <> user_b),
tr_d AS (SELECT v, COUNT(*) AS d FROM
         (SELECT a AS v FROM tr_e UNION ALL SELECT b FROM tr_e)
         GROUP BY v),
tr_t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         FROM tr_e e1 JOIN tr_e e2 ON e2.a = e1.b
         JOIN tr_e e3 ON e3.a = e1.a AND e3.b = e2.b),
tr_n AS (SELECT v, COUNT(*) AS n_tri FROM
         (SELECT x AS v FROM tr_t UNION ALL SELECT y FROM tr_t
          UNION ALL SELECT z FROM tr_t) GROUP BY v)
SELECT d.v AS node, CAST(d.d AS BIGINT) AS degree,
       CAST(COALESCE(n.n_tri, 0) AS BIGINT) AS n_tri,
       CAST((1000000 * 2 * COALESCE(n.n_tri, 0))
            // (d.d * (d.d - 1)) AS BIGINT) AS cc_ppm
FROM tr_d d LEFT JOIN tr_n n USING (v) WHERE d.d >= 2
"""


def user_segments(points, *, max_d2: int, user_col: str = "user_id",
                  us_col: str = "us", lat_col: str = "lat",
                  lon_col: str = "lon", tie_col: str = "event_id"):
    """Per-user consecutive hops as integer-lattice LINE SEGMENTS —
    the seg_crossings feed: (id = arrival tie, ax/ay = previous
    point, bx/by = current point) for every hop with squared lattice
    displacement <= ``max_d2`` (drops the data-gap teleports whose
    "segments" span the globe and would quadratically dominate any
    crossing join). Rides _user_hops' single user-keyed window —
    identical ordering and lattice text as speed_flags/jump_hist so
    the SQL twins can't drift. -> (id, ax, ay, bx, by)."""
    from pyspark.sql import functions as F
    d = _user_hops(points, user_col=user_col, us_col=us_col,
                   lat_col=lat_col, lon_col=lon_col, tie_col=tie_col)
    return (d.filter(F.col("d2") <= F.lit(int(max_d2)))
            .select(F.col("_tie").alias("id"),
                    F.col("_px").alias("ax"),
                    F.col("_py").alias("ay"),
                    F.col("_ix").alias("bx"),
                    F.col("_iy").alias("by")))


def user_segments_sql(pts_sql: str, max_d2: int) -> str:
    """DuckDB twin of user_segments over a subquery producing
    (user_id, us, event_id, lat, lon)."""
    return f"""
SELECT tie AS id, px AS ax, py AS ay, ix AS bx, iy AS by
FROM (SELECT tie, ix, iy,
      LAG(ix) OVER w AS px, LAG(iy) OVER w AS py,
      LAG(us) OVER w AS pus
      FROM (SELECT user_id AS u, us, event_id AS tie,
            CAST(floor(lat * 1000000.0) AS BIGINT) AS iy,
            CAST(floor(lon * 1000000.0) AS BIGINT) AS ix
            FROM ({pts_sql}))
      WINDOW w AS (PARTITION BY u ORDER BY us, tie))
WHERE pus IS NOT NULL
AND (ix - px) * (ix - px) + (iy - py) * (iy - py) <= {int(max_d2)}
"""


def knox_stat(points, r_udeg: int, tau_us: int, *,
              id_col: str = "id", lat_col: str = "lat",
              lon_col: str = "lon", us_col: str = "us",
              res: int = 6):
    """Knox space-time interaction statistic (Knox 1964) — the
    classic epidemiology / event-burst test: over all unordered
    point pairs, how many are close in space (lattice d2 <= r²),
    close in time (|Δt| <= τ), and close in BOTH, versus the
    independence expectation n_space·n_time/n_pairs. Emits the four
    exact BIGINT counts plus assoc_ppm = (1e6·n_both·n_pairs) div
    (n_space·n_time) — 1e6 means space and time proximity are
    independent, >1e6 means clusters MOVE TOGETHER in space-time
    (contagion, flash events); NULL when a marginal is empty. The
    product runs DECIMAL(38,0)/HUGEINT — n_both·n_pairs reaches
    n⁴/4, so 1e6·n_both·n_pairs fits the 38-digit/127-bit range
    only up to n ≈ 1.6e8 points; past that bound the RATIO column
    (never the four counts, which stay under BIGINT for n < 4e9)
    needs a pre-aggregated or sampled input — overflow behavior
    diverges across engines (Spark non-ANSI nulls, DuckDB errors),
    so don't rely on it. Timestamps must be nonnegative (µs since a
    pre-data epoch) — integer div bucketing truncates toward zero.

    Scale — nothing touches the quadratic pair space:
    * n_pairs = n(n-1)/2 off one count;
    * n_space AND n_both ride ONE proximity_edges blocked pair join
      (carry=us — the timestamps travel with the pair, no join-back)
      as two conditional sums of a single aggregation;
    * n_time rides contact_graph's exact-once two-bucket trick: the
      earlier event explodes to its τ-bucket and the next, the later
      keys its own bucket, (us, id)-ordering keeps each unordered
      pair once — one 1D equi-join.
    -> one row (n_pairs, n_space, n_time, n_both, assoc_ppm)."""
    from pyspark.sql import functions as F

    from .tiles import proximity_edges
    pts = points.select(F.col(id_col).alias("id"),
                        F.col(lat_col).alias("lat"),
                        F.col(lon_col).alias("lon"),
                        F.col(us_col).alias("_us"))
    sp = proximity_edges(pts, r_udeg, res=res, carry=("_us",))
    sagg = sp.agg(
        F.count(F.lit(1)).alias("n_space"),
        F.coalesce(F.sum(F.expr(
            f"CASE WHEN abs(_us_a - _us_b) <= {int(tau_us)} "
            "THEN 1 ELSE 0 END")), F.lit(0))
        .cast("long").alias("n_both"))
    d = pts.select("id", "_us",
                   F.expr(f"_us div {int(tau_us)}").alias("_b"))
    left = (d.withColumn("_bx", F.explode(F.array(
        F.col("_b"), F.col("_b") + 1)))
            .select(F.col("id").alias("_il"),
                    F.col("_us").alias("_usl"),
                    F.col("_bx").alias("_b")))
    right = d.select(F.col("id").alias("_ir"),
                     F.col("_us").alias("_usr"), "_b")
    tagg = (left.join(right, "_b")
            .filter((F.col("_usr") - F.col("_usl")
                     <= F.lit(int(tau_us)))
                    & ((F.col("_usl") < F.col("_usr"))
                       | ((F.col("_usl") == F.col("_usr"))
                          & (F.col("_il") < F.col("_ir")))))
            .agg(F.count(F.lit(1)).alias("n_time")))
    base = pts.agg(F.expr(
        "(count(1) * (count(1) - 1)) div 2").alias("n_pairs"))
    return (base.crossJoin(sagg).crossJoin(tagg)
            .select("n_pairs", "n_space", "n_time", "n_both",
                    F.expr(
                        "CASE WHEN n_space = 0 OR n_time = 0 "
                        "THEN NULL ELSE "
                        "(CAST(1000000 AS DECIMAL(38,0)) * n_both "
                        "* n_pairs) div "
                        "(CAST(n_space AS DECIMAL(38,0)) * n_time) "
                        "END").alias("assoc_ppm")))


def knox_stat_sql(pts_sql: str, r_udeg: int, tau_us: int) -> str:
    """DuckDB twin of knox_stat over a subquery producing
    (id, lat, lon, us) — one brute-force pair scan, HUGEINT ratio."""
    r2 = int(r_udeg) ** 2
    return f"""
WITH kx_p AS (SELECT id, us,
              CAST(floor(lat * 1000000.0) AS BIGINT) AS iy,
              CAST(floor(lon * 1000000.0) AS BIGINT) AS ix
              FROM ({pts_sql})),
kx_pr AS (SELECT (a.ix - b.ix) * (a.ix - b.ix)
                 + (a.iy - b.iy) * (a.iy - b.iy) AS d2,
                 ABS(a.us - b.us) AS adt
          FROM kx_p a JOIN kx_p b ON a.id < b.id),
kx_c AS (SELECT COUNT(*) AS n_pairs,
         COALESCE(SUM(CASE WHEN d2 <= {r2} THEN 1 ELSE 0 END), 0)
           AS n_space,
         COALESCE(SUM(CASE WHEN adt <= {int(tau_us)}
                      THEN 1 ELSE 0 END), 0) AS n_time,
         COALESCE(SUM(CASE WHEN d2 <= {r2}
                      AND adt <= {int(tau_us)}
                      THEN 1 ELSE 0 END), 0) AS n_both
         FROM kx_pr)
SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(n_space AS BIGINT) AS n_space,
       CAST(n_time AS BIGINT) AS n_time,
       CAST(n_both AS BIGINT) AS n_both,
       CASE WHEN n_space = 0 OR n_time = 0 THEN NULL
            ELSE CAST((CAST(1000000 AS HUGEINT) * n_both * n_pairs)
                      // (CAST(n_space AS HUGEINT) * n_time)
                      AS BIGINT) END AS assoc_ppm
FROM kx_c
"""


def centroid_drift(points, *, us_col: str = "us",
                   lat_col: str = "lat", lon_col: str = "lon",
                   bucket_us: int = 86_400_000_000):
    """Daily activity-centroid drift — the center-of-mass telemetry
    under distribution-shift detection: per time bucket (default one
    day), the exact integer centroid of all points and the squared
    lattice displacement from the PREVIOUS OBSERVED bucket's centroid
    (NULL for the first). A platform whose event mass migrates (a
    regional outage, a launch, a bot farm) shows up as a d2 spike
    before any per-cell test fires.

    Exact cross-engine arithmetic: coordinate sums in BIGINT with a
    +180e6/+90e6 SHIFT so the floor-mean runs on NONNEGATIVE operands
    — Spark's `div` truncates toward zero while DuckDB's `//` floors,
    and they only agree on nonnegative values; the shift is removed
    after the division, so cx/cy are exact floor-mean µdeg.
    Timestamps must be nonnegative (the shared pre-data epoch).

    Scale: ONE bucket-keyed partial-aggregating groupBy over the
    point stream (3 combinable sums), then a lag window over
    AGGREGATE rows (one per bucket). -> (day, n, cx, cy, d2_prev)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    d = points.select(
        F.expr(f"{us_col} div {int(bucket_us)}").alias("day"),
        F.expr(f"CAST(floor({lat_col} * 1000000.0) AS BIGINT) "
               "+ 90000000").alias("_sy"),
        F.expr(f"CAST(floor({lon_col} * 1000000.0) AS BIGINT) "
               "+ 180000000").alias("_sx"))
    g = (d.groupBy("day")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("_sx").alias("_tx"), F.sum("_sy").alias("_ty"))
         .withColumn("cx", F.expr("_tx div n - 180000000"))
         .withColumn("cy", F.expr("_ty div n - 90000000")))
    w = Window.orderBy("day")
    g = (g.withColumn("_px", F.lag("cx").over(w))
          .withColumn("_py", F.lag("cy").over(w)))
    return g.select(
        "day", "n", "cx", "cy",
        F.expr("(cx - _px) * (cx - _px) + (cy - _py) * (cy - _py)")
        .alias("d2_prev"))


def centroid_drift_sql(pts_sql: str,
                       bucket_us: int = 86_400_000_000) -> str:
    """DuckDB twin of centroid_drift over a subquery producing
    (us, lat, lon) — same nonnegative-shift floor-mean."""
    return f"""
WITH cd_d AS (SELECT us // {int(bucket_us)} AS day,
              CAST(floor(lat * 1000000.0) AS BIGINT) + 90000000
                AS sy,
              CAST(floor(lon * 1000000.0) AS BIGINT) + 180000000
                AS sx
              FROM ({pts_sql})),
cd_g AS (SELECT day, COUNT(*) AS n,
         CAST(SUM(sx) AS BIGINT) AS tx,
         CAST(SUM(sy) AS BIGINT) AS ty FROM cd_d GROUP BY 1),
cd_c AS (SELECT day, n, tx // n - 180000000 AS cx,
         ty // n - 90000000 AS cy FROM cd_g),
cd_w AS (SELECT *, LAG(cx) OVER (ORDER BY day) AS px,
         LAG(cy) OVER (ORDER BY day) AS py FROM cd_c)
SELECT day, CAST(n AS BIGINT) AS n, CAST(cx AS BIGINT) AS cx,
       CAST(cy AS BIGINT) AS cy,
       CAST((cx - px) * (cx - px) + (cy - py) * (cy - py) AS BIGINT)
         AS d2_prev
FROM cd_w
"""


def threshold_alerts(points, res: int, window_us: int, hi: int,
                     lo: int, *, us_col: str = "us",
                     lat_col: str = "lat", lon_col: str = "lon"):
    """Hysteresis threshold alerting over per-cell tumbling-window
    counts — the monitoring primitive a plain `n >= T` filter
    flaps on: an alert RAISES when a cell's window count reaches
    ``hi`` and only CLEARS when a later window drops below ``lo``
    (lo <= hi; counts in [lo, hi) hold the current state). Emits one
    row per state TRANSITION: (cell, w, n, alert 1=raise/0=clear).

    Exact fold-free formulation (the automaton is a fold, but with
    two thresholds the state after any prefix equals "the most
    recent DEFINING window was a raise": windows in [lo, hi) define
    nothing, a window cannot be both, so state = last_hi > last_lo
    over running maxima — two window-function MAXes, no recursion,
    identical in both engines).

    OBSERVED-window semantics: windows with zero events for a cell
    are absent and neither clear nor raise (the streaming twin
    cannot see them either); a transition is CONFIRMED at the cell's
    next observed activity (the streaming twin can only evaluate a
    window once a later event closes it), so each cell's final
    observed window is never evaluated — LEAD(w) IS NOT NULL in
    both engines.

    Scale: one (cell, window) combinable count, then three window
    functions over AGGREGATE rows. -> (cell, w, n, alert)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode
    d = points.select(
        cell_encode(lat_col, lon_col, res).alias("cell"),
        F.expr(f"{us_col} div {int(window_us)}").alias("w"))
    c = d.groupBy("cell", "w").agg(F.count(F.lit(1)).alias("n"))
    run = (Window.partitionBy("cell").orderBy("w")
           .rowsBetween(Window.unboundedPreceding, 0))
    seq = Window.partitionBy("cell").orderBy("w")
    s = (c.withColumn("_lh", F.max(F.expr(
            f"CASE WHEN n >= {int(hi)} THEN w END")).over(run))
         .withColumn("_ll", F.max(F.expr(
            f"CASE WHEN n < {int(lo)} THEN w END")).over(run))
         .withColumn("_nxt", F.lead("w").over(seq)))
    s = s.withColumn("_st", F.expr(
        "CASE WHEN _lh IS NOT NULL AND (_ll IS NULL OR _lh > _ll) "
        "THEN 1 ELSE 0 END"))
    s = s.withColumn("_pst", F.coalesce(
        F.lag("_st").over(seq), F.lit(0)))
    return (s.filter((F.col("_st") != F.col("_pst"))
                     & F.col("_nxt").isNotNull())
            .select("cell", "w", F.col("n").cast("long").alias("n"),
                    F.col("_st").cast("long").alias("alert")))


def threshold_alerts_sql(pts_sql: str, res: int, window_us: int,
                         hi: int, lo: int) -> str:
    """DuckDB twin of threshold_alerts over a subquery producing
    (us, lat, lon) — same running-maxima state formula."""
    from ..functions.cells import cell_encode_sql
    cell = cell_encode_sql("lat", "lon", res)
    return f"""
WITH ta_d AS (SELECT {cell} AS cell, us // {int(window_us)} AS w
              FROM ({pts_sql})),
ta_c AS (SELECT cell, w, COUNT(*) AS n FROM ta_d GROUP BY 1, 2),
ta_s AS (SELECT cell, w, n,
         MAX(CASE WHEN n >= {int(hi)} THEN w END) OVER runw
           AS lh,
         MAX(CASE WHEN n < {int(lo)} THEN w END) OVER runw AS ll,
         LEAD(w) OVER (PARTITION BY cell ORDER BY w) AS nxt
         FROM ta_c
         WINDOW runw AS (PARTITION BY cell ORDER BY w
                         ROWS UNBOUNDED PRECEDING)),
ta_t AS (SELECT cell, w, n, nxt,
         CASE WHEN lh IS NOT NULL AND (ll IS NULL OR lh > ll)
         THEN 1 ELSE 0 END AS st FROM ta_s),
ta_u AS (SELECT cell, w, n, nxt, st,
         COALESCE(LAG(st) OVER (PARTITION BY cell ORDER BY w), 0)
           AS pst FROM ta_t)
SELECT cell, w, CAST(n AS BIGINT) AS n, CAST(st AS BIGINT) AS alert
FROM ta_u WHERE st <> pst AND nxt IS NOT NULL
"""


_RESAMPLE_INTERP_CASE = (
    "CASE WHEN {num} >= 0 THEN ({num}) {d} ({den}) "
    "ELSE -((-({num})) {d} ({den})) END")


def traj_resample(points, step_us: int, *, user_col: str = "user_id",
                  us_col: str = "us", lat_col: str = "lat",
                  lon_col: str = "lon", tie_col: str = "event_id"):
    """Fixed-time-grid trajectory resampling — the track
    regularization every downstream sequence model wants (equal-dt
    positions) that raw event streams never provide: per user, the
    linearly interpolated micro-degree position at every grid epoch
    k * step_us covered by the user's observation span.

    Epoch ownership is exact and collision-free: each consecutive
    event pair (t0, t1] emits the epochs in its HALF-OPEN interval
    (floor(t0/step)+1 .. floor(t1/step) — duplicate-timestamp pairs
    emit nothing, and a pair boundary epoch belongs to exactly one
    pair), plus the user's FIRST event (row 1 by (us, tie)) emits
    its own epoch when it sits exactly on the grid. Interpolation is
    trunc-toward-zero rational arithmetic, sign-decomposed so
    Spark's `div` and DuckDB's flooring `//` produce the same
    integer (the cell_mk convention):

        x(e) = x0 + trunc((x1 - x0)(e - t0) / (t1 - t0))

    Scale: ONE user-keyed window (lead) and one bounded explode
    (span/step epochs per pair) — no joins, no epoch-to-pair
    shuffle; the output partitioning stays user-keyed for the
    sequence models downstream. -> (user_id, epoch_us, ix, iy)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    s = int(step_us)
    d = points.select(
        F.col(user_col).alias("_user"), F.col(us_col).alias("_us"),
        F.col(tie_col).alias("_tie"),
        F.expr(f"CAST(floor({lat_col} * 1000000.0) AS BIGINT)")
         .alias("_iy"),
        F.expr(f"CAST(floor({lon_col} * 1000000.0) AS BIGINT)")
         .alias("_ix"))
    w = Window.partitionBy("_user").orderBy("_us", "_tie")
    d = (d.withColumn("_nus", F.lead("_us").over(w))
          .withColumn("_nx", F.lead("_ix").over(w))
          .withColumn("_ny", F.lead("_iy").over(w))
          .withColumn("_rk", F.row_number().over(w)))
    first = (d.filter((F.col("_rk") == 1)
                      & (F.col("_us") % s == 0))
             .select(F.col("_user"), F.col("_us").alias("epoch_us"),
                     F.col("_ix").alias("ix"),
                     F.col("_iy").alias("iy")))
    # guard the empty range: Spark's sequence(a, b) runs DESCENDING
    # when b < a (a same-bucket pair would emit phantom epochs);
    # explode(NULL) drops the row, matching DuckDB's empty
    # generate_series
    pair = (d.filter(F.col("_nus").isNotNull()
                     & (F.col("_nus") > F.col("_us")))
            .withColumn("_k", F.explode(F.expr(
                f"CASE WHEN _nus div {s} >= _us div {s} + 1 "
                f"THEN sequence(_us div {s} + 1, _nus div {s}) "
                f"END")))
            .withColumn("epoch_us", F.col("_k") * s))
    # the displacement x time-gap product overflows BIGINT (a 1-day
    # gap is ~8.6e10 us) -> DECIMAL(38,0); `div` narrows back
    ix_num = "CAST(_nx - _ix AS DECIMAL(38,0)) * (epoch_us - _us)"
    iy_num = "CAST(_ny - _iy AS DECIMAL(38,0)) * (epoch_us - _us)"
    den = "(_nus - _us)"
    pair = pair.select(
        "_user", "epoch_us",
        (F.col("_ix") + F.expr(_RESAMPLE_INTERP_CASE.format(
            num=ix_num, den=den, d="div"))).alias("ix"),
        (F.col("_iy") + F.expr(_RESAMPLE_INTERP_CASE.format(
            num=iy_num, den=den, d="div"))).alias("iy"))
    return (first.unionByName(pair)
            .select(F.col("_user").alias(user_col), "epoch_us",
                    F.col("ix").cast("long").alias("ix"),
                    F.col("iy").cast("long").alias("iy")))


def traj_resample_sql(pts_sql: str, step_us: int) -> str:
    """DuckDB twin of traj_resample over a subquery producing
    (user_id, us, event_id, lat, lon) — same lead window, same
    half-open epoch ownership, same sign-decomposed interpolation
    (`//` wrapped by the shared CASE so flooring never differs from
    Spark's trunc)."""
    s = int(step_us)
    ix_i = _RESAMPLE_INTERP_CASE.format(
        num=f"CAST(nx - ix AS HUGEINT) * (e * {s} - us)",
        den="(nus - us)", d="//")
    iy_i = _RESAMPLE_INTERP_CASE.format(
        num=f"CAST(ny - iy AS HUGEINT) * (e * {s} - us)",
        den="(nus - us)", d="//")
    return f"""
WITH tr_d AS (SELECT user_id AS u, us, event_id AS tie,
    CAST(floor(lat * 1000000.0) AS BIGINT) AS iy,
    CAST(floor(lon * 1000000.0) AS BIGINT) AS ix
    FROM ({pts_sql})),
tr_w AS (SELECT u, us, ix, iy,
    LEAD(us) OVER w AS nus, LEAD(ix) OVER w AS nx,
    LEAD(iy) OVER w AS ny,
    ROW_NUMBER() OVER w AS rk
    FROM tr_d WINDOW w AS (PARTITION BY u ORDER BY us, tie)),
tr_first AS (SELECT u AS user_id, us AS epoch_us, ix, iy
    FROM tr_w WHERE rk = 1 AND us % {s} = 0),
tr_pair AS (SELECT u AS user_id, e * {s} AS epoch_us,
    ix + ({ix_i}) AS ix, iy + ({iy_i}) AS iy
    FROM (SELECT *, unnest(generate_series(us // {s} + 1,
                                           nus // {s})) AS e
          FROM tr_w WHERE nus IS NOT NULL AND nus > us) q)
SELECT user_id, epoch_us, CAST(ix AS BIGINT) AS ix,
       CAST(iy AS BIGINT) AS iy FROM tr_first
UNION ALL
SELECT user_id, epoch_us, CAST(ix AS BIGINT) AS ix,
       CAST(iy AS BIGINT) AS iy FROM tr_pair
"""


def active_coverage(points, dur_us: int, *,
                    user_col: str = "user_id", us_col: str = "us",
                    tie_col: str = "event_id"):
    """Per-user active-time coverage — the sweep-line INTERVAL UNION
    the interval_overlap join can't express: give each event a
    ``dur_us`` activity window [us, us + dur) and merge overlaps, so
    a burst of 100 events in one minute counts once while spaced
    events accumulate — the denominator behind duty-cycle /
    engagement-rate features, and the classic merge-intervals
    algorithm as ONE window chain:

        new_block = [s > running-max(e) over all EARLIER intervals]
        block id  = running sum of new_block
        covered   = sum over blocks of (max e in block - min s)

    Integer-exact (µs BIGINT); block assignment is order-insensitive
    among equal-start rows (their running max already includes the
    earlier twin's end), and the (s, tie) ordering pins determinism
    anyway.

    Scale: ONE user-keyed window (two passes over the same sort) +
    one (user, block) agg + one user agg, all map-side combinable
    after the single sort shuffle — no joins, no explode.
    -> (user_id, n_intervals, n_blocks, covered_us)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    d = int(dur_us)
    iv = points.select(F.col(user_col).alias("_u"),
                       F.col(us_col).alias("_s"),
                       (F.col(us_col) + d).alias("_e"),
                       F.col(tie_col).alias("_tie"))
    w = Window.partitionBy("_u").orderBy("_s", "_tie")
    prev = w.rowsBetween(Window.unboundedPreceding, -1)
    iv = (iv.withColumn("_pmax", F.max("_e").over(prev))
            .withColumn("_nb", F.expr(
                "CASE WHEN _pmax IS NULL OR _s > _pmax THEN 1 "
                "ELSE 0 END"))
            .withColumn("_blk", F.sum("_nb").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    blocks = (iv.groupBy("_u", "_blk")
              .agg(F.min("_s").alias("_lo"), F.max("_e").alias("_hi"),
                   F.count(F.lit(1)).alias("_n")))
    return (blocks.groupBy("_u")
            .agg(F.sum("_n").cast("long").alias("n_intervals"),
                 F.count(F.lit(1)).cast("long").alias("n_blocks"),
                 F.sum(F.col("_hi") - F.col("_lo")).cast("long")
                 .alias("covered_us"))
            .select(F.col("_u").alias(user_col), "n_intervals",
                    "n_blocks", "covered_us"))


def active_coverage_sql(pts_sql: str, dur_us: int) -> str:
    """DuckDB twin of active_coverage over a subquery producing
    (user_id, us, event_id) — same window chain."""
    d = int(dur_us)
    return f"""
WITH ac_iv AS (SELECT user_id AS u, us AS s, us + {d} AS e,
    event_id AS tie FROM ({pts_sql})),
ac_w AS (SELECT u, s, e, tie,
    MAX(e) OVER (PARTITION BY u ORDER BY s, tie
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      AS pmax,
    CASE WHEN MAX(e) OVER (PARTITION BY u ORDER BY s, tie
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         OR s > MAX(e) OVER (PARTITION BY u ORDER BY s, tie
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         THEN 1 ELSE 0 END AS nb
    FROM ac_iv),
ac_b AS (SELECT u, s, e,
    SUM(nb) OVER (PARTITION BY u ORDER BY s, tie
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS blk
    FROM ac_w),
ac_g AS (SELECT u, blk, MIN(s) AS lo, MAX(e) AS hi, COUNT(*) AS n
         FROM ac_b GROUP BY 1, 2)
SELECT u AS user_id, CAST(SUM(n) AS BIGINT) AS n_intervals,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(hi - lo) AS BIGINT) AS covered_us
FROM ac_g GROUP BY 1
"""


def sd_ellipse(points, *, user_col: str = "user_id",
               lat_col: str = "lat", lon_col: str = "lon"):
    """Standard deviational ellipse (directional distribution) per
    user — the GIS-standard "which WAY does this activity cloud
    stretch" summary that gyration's isotropic radius cannot see:
    exact central second moments of the µdeg lattice positions plus
    the ellipse's orientation CLASS. Uses the same one-pass
    sufficient-statistics identity as gyration (Sxx = n·Σx² − (Σx)²
    etc., no centroid join): var_x = Sxx div n², var_y = Syy div n²,
    cov_xy = Sxy div n² — and since tan(2θ) = 2Sxy/(Sxx−Syy), the
    exact SIGNS of Sxy and Sxx−Syy classify the major axis without
    a single libm call: NE (θ in (0°,90°)), NW, EW, NS, or CIRCULAR
    (isotropic: Sxy = 0 and Sxx = Syy — includes n = 1).

    Integer-exact: sums in DECIMAL(38,0)/HUGEINT; Sxx, Syy are
    nonnegative (Cauchy-Schwarz) so their div is floor in both
    engines; cov_xy CAN be negative — Spark's decimal div truncates
    toward zero, replicated in the twin by sign decomposition over
    HUGEINT floor division (the moran_i rule).

    Scale: ONE user-keyed partial-aggregating groupBy — six
    combinable sums, map-side combine does the volume work.
    -> (user, n_pts, var_x, var_y, cov_xy, orient)."""
    from pyspark.sql import functions as F
    d = points.select(
        F.col(user_col).alias("_user"),
        F.expr(f"CAST(floor({lon_col} * 1000000.0) AS BIGINT)")
         .alias("_ix"),
        F.expr(f"CAST(floor({lat_col} * 1000000.0) AS BIGINT)")
         .alias("_iy"))
    g = (d.groupBy("_user")
         .agg(F.count(F.lit(1)).alias("n_pts"),
              F.sum(F.col("_ix").cast("decimal(38,0)")).alias("_sx"),
              F.sum(F.col("_iy").cast("decimal(38,0)")).alias("_sy"),
              F.sum(F.expr("_ix * _ix").cast("decimal(38,0)"))
              .alias("_sxx"),
              F.sum(F.expr("_iy * _iy").cast("decimal(38,0)"))
              .alias("_syy"),
              F.sum(F.expr("_ix * _iy").cast("decimal(38,0)"))
              .alias("_sxy")))
    n2 = "CAST(n_pts AS DECIMAL(38,0)) * n_pts"
    cxx = f"(CAST(n_pts AS DECIMAL(38,0)) * _sxx - _sx * _sx)"
    cyy = f"(CAST(n_pts AS DECIMAL(38,0)) * _syy - _sy * _sy)"
    cxy = f"(CAST(n_pts AS DECIMAL(38,0)) * _sxy - _sx * _sy)"
    return (g.select(
        F.col("_user").alias(user_col), "n_pts",
        F.expr(f"CAST({cxx} div ({n2}) AS BIGINT)").alias("var_x"),
        F.expr(f"CAST({cyy} div ({n2}) AS BIGINT)").alias("var_y"),
        F.expr(f"CAST({cxy} div ({n2}) AS BIGINT)").alias("cov_xy"),
        F.expr(f"CASE WHEN {cxy} > 0 THEN 'NE' "
               f"WHEN {cxy} < 0 THEN 'NW' "
               f"WHEN {cxx} > {cyy} THEN 'EW' "
               f"WHEN {cxx} < {cyy} THEN 'NS' "
               f"ELSE 'CIRCULAR' END").alias("orient")))


def sd_ellipse_sql(pts_sql: str) -> str:
    """DuckDB twin of sd_ellipse over a subquery producing
    (user_id, lat, lon) — HUGEINT sums; cov_xy's truncating division
    via sign decomposition over floor //."""
    cxx = "(CAST(n AS HUGEINT) * sxx - sx * sx)"
    cyy = "(CAST(n AS HUGEINT) * syy - sy * sy)"
    cxy = "(CAST(n AS HUGEINT) * sxy - sx * sy)"
    n2 = "(CAST(n AS HUGEINT) * n)"
    return f"""
WITH d AS (SELECT user_id AS u,
           CAST(floor(lat * 1000000.0) AS BIGINT) AS iy,
           CAST(floor(lon * 1000000.0) AS BIGINT) AS ix
           FROM ({pts_sql})),
g AS (SELECT u, COUNT(*) AS n,
      SUM(CAST(ix AS HUGEINT)) AS sx,
      SUM(CAST(iy AS HUGEINT)) AS sy,
      SUM(CAST(ix AS HUGEINT) * ix) AS sxx,
      SUM(CAST(iy AS HUGEINT) * iy) AS syy,
      SUM(CAST(ix AS HUGEINT) * iy) AS sxy
      FROM d GROUP BY u)
SELECT u AS user_id, CAST(n AS BIGINT) AS n_pts,
       CAST({cxx} // {n2} AS BIGINT) AS var_x,
       CAST({cyy} // {n2} AS BIGINT) AS var_y,
       CAST(CASE WHEN {cxy} >= 0 THEN {cxy} // {n2}
            ELSE -((-{cxy}) // {n2}) END AS BIGINT) AS cov_xy,
       CASE WHEN {cxy} > 0 THEN 'NE' WHEN {cxy} < 0 THEN 'NW'
            WHEN {cxx} > {cyy} THEN 'EW'
            WHEN {cxx} < {cyy} THEN 'NS'
            ELSE 'CIRCULAR' END AS orient
FROM g
"""


def hour_profile(points, res: int, *, us_col: str = "us",
                 lat_col: str = "lat", lon_col: str = "lon"):
    """Diurnal concentration per cell — the bot-vs-human temporal
    signature over the raster: bin each cell's events into 24
    hour-of-day buckets and score how far the profile sits from
    uniform with the exact chi-square identity

        chi2_ppm = 1e6 * (24 * sum c_h^2 - T^2)  div  T

    (T = cell total; this equals 1e6 * sum (c_h - T/24)^2 / (T/24),
    the classic goodness-of-fit statistic, in one fraction with no
    intermediate rounding — the quadrat_csr identity over TIME bins
    instead of space). Uniform activity scores ~23e6 under
    randomness (chi2 df=23 scaled by 1e6); a single-hour spike
    scores 23 * T * 1e6 — organic diurnal cycles sit between. Hour
    is integer microsecond arithmetic ((us div 3600e6) mod 24), no
    timestamp libm. Also reports the active-hour count and the
    peak hour (ties -> lowest hour).

    Integer-exact: numerator nonnegative by Cauchy-Schwarz so div ==
    floor in both engines; 24 * sum c_h^2 runs in DECIMAL(38,0)/
    HUGEINT (a 1e12-event single cell squares to 1e24).

    Scale: two map-side-combinable groupBys, (cell, hour) then cell
    — both shuffle the AGGREGATE rows (<= 24 per cell), never the
    events twice. -> (cell, n_pts, n_hours, chi2_ppm, peak_hour)."""
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode
    h = (points.select(
            cell_encode(lat_col, lon_col, res).alias("cell"),
            F.expr(f"CAST(({us_col} div 3600000000) % 24 AS INT)")
             .alias("_h"))
         .groupBy("cell", "_h")
         .agg(F.count(F.lit(1)).cast("long").alias("_c")))
    return (h.groupBy("cell")
            .agg(F.sum("_c").alias("_t"),
                 F.count(F.lit(1)).cast("long").alias("n_hours"),
                 F.sum(F.expr("CAST(_c AS DECIMAL(38,0)) * _c"))
                 .alias("_s2"),
                 F.min(F.struct(F.negate(F.col("_c")).alias("_nc"),
                                F.col("_h"))).alias("_pk"))
            .select("cell", F.col("_t").cast("long").alias("n_pts"),
                    "n_hours",
                    F.expr("CAST((24 * _s2 - CAST(_t AS "
                           "DECIMAL(38,0)) * _t) * 1000000 div _t "
                           "AS BIGINT)").alias("chi2_ppm"),
                    F.col("_pk._h").cast("int").alias("peak_hour")))


def hour_profile_sql(pts_sql: str, res: int) -> str:
    """DuckDB twin of hour_profile over a subquery producing
    (lat, lon, us) — same integer hour, HUGEINT squares, arg-min
    peak-hour tiebreak."""
    from ..functions.cells import cell_encode_sql
    cell = cell_encode_sql("lat", "lon", res)
    return f"""
WITH hp_h AS (SELECT {cell} AS cell,
              CAST((us // 3600000000) % 24 AS INTEGER) AS h,
              COUNT(*) AS c
              FROM ({pts_sql}) GROUP BY 1, 2)
SELECT cell, CAST(SUM(c) AS BIGINT) AS n_pts,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST((24 * SUM(CAST(c AS HUGEINT) * c)
             - CAST(SUM(c) AS HUGEINT) * SUM(c)) * 1000000
            // SUM(c) AS BIGINT) AS chi2_ppm,
       CAST(MIN({{'nc': -c, 'h': h}}).h AS INTEGER) AS peak_hour
FROM hp_h GROUP BY cell
"""


# ---------------------------------------------------------------------------
# Discrete-time hazard / Kaplan-Meier life table (r5.44)
# ---------------------------------------------------------------------------

def km_hazard(events, *, user_col: str = "user_id", ts_col: str = "ts",
              unit_us: int = 3_600_000_000):
    """Discrete-time Kaplan-Meier life table over per-user RETURN
    gaps — the churn/retention primitive revisit_hist's histogram
    cannot express, because "how many users who survived t hours
    without returning came back in hour t" needs the RISK SET, and
    the user's final open gap must be right-CENSORED at the global
    horizon rather than dropped (dropping it biases hazard upward:
    long silences are exactly the spells still open at snapshot
    time; Kaplan-Meier 1958).

    Spells, in integer ``unit_us`` buckets of the fixed-NTZ-epoch
    microsecond timeline (the sessionizer convention): every
    consecutive-event gap is a COMPLETE spell (the user returned);
    each user contributes one CENSORED spell from their last event
    to the global max timestamp. Life table at each duration t with
    at least one return:

        n_risk(t)   = spells with duration >= t (complete or censored)
        hazard_ppm  = n_events(t) * 1e6 div n_risk(t)

    Survival itself is a product of (1 - h) — not integer-exact, so
    the table reports the exact hazard column and leaves the
    cumulative product to the (client-side) consumer, the same
    division of labor as the sketch operators.

    Scale: gaps ride ONE user-keyed lead() window (ties share a
    timestamp bucket; the sorted-gap multiset is order-invariant);
    the horizon is a broadcast 1-row max; the life table aggregates
    to AT MOST horizon/unit rows (bounded by the observation window
    in units, NOT by event volume), so the final risk-set cumulative
    window runs on that bounded grid — the same grid-not-data
    argument as ks_stat. -> (dur, n_risk, n_events, n_censored,
    hazard_ppm), one row per duration with n_events > 0."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    us = _us_expr(ts_col)
    ev = events.select(F.col(user_col).alias("_u"), us.alias("_us"))
    w = Window.partitionBy("_u").orderBy("_us")
    nx = ev.withColumn("_nus", F.lead("_us").over(w))
    complete = (nx.filter(F.col("_nus").isNotNull())
                .select(F.expr(f"(_nus - _us) div {unit_us}")
                        .alias("_dur"), F.lit(1).alias("_ev")))
    horizon = ev.agg(F.max("_us").alias("_h"))
    censored = (ev.groupBy("_u").agg(F.max("_us").alias("_mx"))
                .crossJoin(F.broadcast(horizon))
                .select(F.expr(f"(_h - _mx) div {unit_us}")
                        .alias("_dur"), F.lit(0).alias("_ev")))
    g = (complete.unionByName(censored)
         .groupBy("_dur")
         .agg(F.sum("_ev").alias("_d"),
              F.sum(1 - F.col("_ev")).alias("_c")))
    wg = (Window.orderBy("_dur")
          .rowsBetween(Window.unboundedPreceding, -1))
    out = (g.withColumn("_ended", F.coalesce(
               F.sum(F.col("_d") + F.col("_c")).over(wg), F.lit(0)))
           .crossJoin(F.broadcast(
               g.agg(F.sum(F.col("_d") + F.col("_c")).alias("_tot"))))
           .withColumn("n_risk", F.col("_tot") - F.col("_ended"))
           .filter(F.col("_d") > 0))
    return out.select(
        F.col("_dur").cast("long").alias("dur"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("_d").cast("long").alias("n_events"),
        F.col("_c").cast("long").alias("n_censored"),
        F.expr("_d * 1000000 div n_risk").cast("long")
        .alias("hazard_ppm"))


def km_hazard_sql(src_sql: str, *, unit_us: int = 3_600_000_000) -> str:
    """DuckDB twin of km_hazard over a subquery producing (u, ts) —
    same spells, same bounded-grid running risk set. All quantities
    nonnegative, so floor division needs no sign decomposition."""
    us = f"datediff('microseconds', TIMESTAMP '{EPOCH}', ts)"
    return f"""
WITH km_ev AS (SELECT u, {us} AS us FROM ({src_sql})),
km_h AS (SELECT MAX(us) AS h FROM km_ev),
km_nx AS (SELECT u, us, LEAD(us) OVER (PARTITION BY u ORDER BY us)
                 AS nus FROM km_ev),
km_sp AS (SELECT (nus - us) // {unit_us} AS dur, 1 AS ev
          FROM km_nx WHERE nus IS NOT NULL
          UNION ALL
          SELECT (km_h.h - mx) // {unit_us}, 0
          FROM (SELECT u, MAX(us) AS mx FROM km_ev GROUP BY 1), km_h),
km_g AS (SELECT dur, SUM(ev) AS d, SUM(1 - ev) AS c
         FROM km_sp GROUP BY 1),
km_r AS (SELECT dur, d, c, t.tot - COALESCE(
             SUM(d + c) OVER (ORDER BY dur
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0) AS n_risk
         FROM km_g, (SELECT SUM(d + c) AS tot FROM km_g) t)
SELECT CAST(dur AS BIGINT) AS dur, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_events, CAST(c AS BIGINT) AS n_censored,
       CAST(d * 1000000 // n_risk AS BIGINT) AS hazard_ppm
FROM km_r WHERE d > 0
"""


# ---------------------------------------------------------------------------
# Per-cell circular concentration (Rayleigh resultant) (r5.44)
# ---------------------------------------------------------------------------

def _octant_unit_ppm() -> dict[str, tuple[int, int]]:
    """(cos, sin) of each octant's CENTER angle in ppm — computed
    once in Python and embedded as the SAME literals in both engines
    (the benford/_ln_ppm_case constant-table convention). Sector
    centers are 22.5 + k*45 degrees counterclockwise from due east,
    matching _octant_case's half-open sectors."""
    import math
    labels = ["ENE", "NNE", "NNW", "WNW", "WSW", "SSW", "SSE", "ESE"]
    return {lab: (round(math.cos(math.radians(22.5 + 45 * k)) * 1e6),
                  round(math.sin(math.radians(22.5 + 45 * k)) * 1e6))
            for k, lab in enumerate(labels)}


def _octant_unit_case(oct_expr: str) -> tuple[str, str]:
    """Shared SQL text mapping an octant label to its unit-vector
    ppm components."""
    units = _octant_unit_ppm()
    ux = " ".join(f"WHEN {oct_expr} = '{o}' THEN {c}"
                  for o, (c, _) in units.items())
    uy = " ".join(f"WHEN {oct_expr} = '{o}' THEN {s}"
                  for o, (_, s) in units.items())
    return f"CASE {ux} END", f"CASE {uy} END"


def _origin_cell_exprs(px: str, py: str, res: int) -> str:
    """Shared SQL text: the res-grid cell id of a µdeg integer
    position — the same floor((coord+offset)/span*2^res) grid as
    cell_encode, carried out in EXACT integer arithmetic on the
    µdeg values (both engines run this text, so the hop's origin
    cell can never ulp-flip across a cell edge)."""
    n = 1 << res
    # clamp BEFORE the division so the numerator is nonnegative and
    # Spark's trunc-toward-zero agrees with DuckDB's floor even on
    # out-of-domain coordinates
    cx = (f"least(greatest(({px}) + 180000000, 0) * {n} "
          f"div 360000000, {n - 1})")
    cy = (f"least(greatest(({py}) + 90000000, 0) * {n} "
          f"div 180000000, {n - 1})")
    return f"(CAST({res} AS BIGINT) * {1 << 56} + ({cy}) * {n} + ({cx}))"


def rayleigh_cells(points, res: int, *, user_col: str = "user_id",
                   us_col: str = "us", lat_col: str = "lat",
                   lon_col: str = "lon", tie_col: str = "event_id",
                   min_hops: int = 5):
    """Per-cell circular CONCENTRATION of outgoing movement bearings
    — the directional-flow field bearing_hist's global histogram
    cannot localize: a cell on a one-way arterial shows a resultant
    near 1, a cell where trips scatter shows near 0 (Rayleigh test /
    Mardia circular statistics, mean-resultant-length form). Each
    per-user consecutive hop contributes its octant's CENTER unit
    vector (the _octant_case sectors; components from the shared
    ppm literal table, so no trig runs in either engine), keyed by
    the hop's ORIGIN cell via exact integer µdeg grid math:

        r2_ppm = (Sx^2 + Sy^2) div (n^2 * 1e6)   in [0, 1e6]

    the squared mean resultant length in ppm — squaring instead of
    sqrt keeps it integer-exact (the assortativity convention), and
    n * R^2 is the Rayleigh z if the consumer wants the test. Sx, Sy
    are also emitted (BIGINT, bounded by n * 1e6): their signs give
    the mean flow direction. Octant quantization caps r2 at
    cos(22.5deg)^2 ~ 853553 ppm for perfectly aligned real bearings;
    comparisons across cells are unaffected (same quantizer
    everywhere).

    Scale: one user-keyed lag window (shared shape with
    speed_flags/jump_hist), then ONE map-side-combinable groupBy on
    the origin cell; squares ride DECIMAL(38,0)/HUGEINT (n ~ 1e9
    hops in a hub cell puts Sx^2 at 1e30). Stationary hops carry no
    direction and are dropped; cells with fewer than ``min_hops``
    hops are suppressed (a 1-hop cell is always r2 = 1e6 * cos^2 —
    pure noise). -> (cell, n_hops, sx, sy, r2_ppm)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    d = points.select(
        F.col(user_col).alias("_u"), F.col(us_col).alias("_us"),
        F.col(tie_col).alias("_tie"),
        F.expr(f"CAST(floor({lat_col} * 1000000.0) AS BIGINT)")
        .alias("_iy"),
        F.expr(f"CAST(floor({lon_col} * 1000000.0) AS BIGINT)")
        .alias("_ix"))
    w = Window.partitionBy("_u").orderBy("_us", "_tie")
    h = (d.withColumn("_px", F.lag("_ix").over(w))
         .withColumn("_py", F.lag("_iy").over(w))
         .filter(F.col("_px").isNotNull()
                 & ((F.col("_ix") != F.col("_px"))
                    | (F.col("_iy") != F.col("_py")))))
    oct_ = _octant_case("_ix - _px", "_iy - _py")
    ux, uy = _octant_unit_case(f"({oct_})")
    cell = _origin_cell_exprs("_px", "_py", res)
    g = (h.select(F.expr(cell).alias("cell"),
                  F.expr(ux).alias("_ux"), F.expr(uy).alias("_uy"))
         .groupBy("cell")
         .agg(F.count(F.lit(1)).alias("n_hops"),
              F.sum("_ux").alias("_sx"), F.sum("_uy").alias("_sy"))
         .filter(F.col("n_hops") >= min_hops))
    r2 = ("(CAST(_sx AS DECIMAL(38,0)) * _sx "
          "+ CAST(_sy AS DECIMAL(38,0)) * _sy) div "
          "(CAST(n_hops AS DECIMAL(38,0)) * n_hops * 1000000)")
    return g.select(
        "cell", F.col("n_hops").cast("long").alias("n_hops"),
        F.col("_sx").cast("long").alias("sx"),
        F.col("_sy").cast("long").alias("sy"),
        F.expr(r2).cast("long").alias("r2_ppm"))


def rayleigh_cells_sql(pts_sql: str, res: int, *,
                       min_hops: int = 5) -> str:
    """DuckDB twin of rayleigh_cells over a subquery producing
    (user_id, us, event_id, lat, lon) — identical octant CASE,
    identical unit literal table, identical integer origin-cell
    text; numerator nonnegative so floor == trunc."""
    oct_ = _octant_case("ix - px", "iy - py")
    ux, uy = _octant_unit_case(f"({oct_})")
    cell = (_origin_cell_exprs("px", "py", res)
            .replace(" div ", " // "))
    return f"""
WITH rc_d AS (SELECT user_id AS u, us, event_id AS tie,
              CAST(floor(lat * 1000000.0) AS BIGINT) AS iy,
              CAST(floor(lon * 1000000.0) AS BIGINT) AS ix
              FROM ({pts_sql})),
rc_h AS (SELECT ix, iy, LAG(ix) OVER w AS px, LAG(iy) OVER w AS py
         FROM rc_d WINDOW w AS (PARTITION BY u ORDER BY us, tie)),
rc_p AS (SELECT ix, iy, px, py FROM rc_h
         WHERE px IS NOT NULL AND (ix <> px OR iy <> py)),
rc_g AS (SELECT {cell} AS cell, COUNT(*) AS n,
         SUM(CAST({ux} AS HUGEINT)) AS sx,
         SUM(CAST({uy} AS HUGEINT)) AS sy
         FROM rc_p GROUP BY 1 HAVING COUNT(*) >= {min_hops})
SELECT cell, CAST(n AS BIGINT) AS n_hops,
       CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
       CAST((sx * sx + sy * sy)
            // (CAST(n AS HUGEINT) * n * 1000000) AS BIGINT)
         AS r2_ppm
FROM rc_g
"""


# ---------------------------------------------------------------------------
# Per-cell diurnal phase vector (r5.44)
# ---------------------------------------------------------------------------

def _hour_unit_ppm() -> dict[int, tuple[int, int]]:
    """(cos, sin) of each hour-of-day angle (h * 15 degrees) in ppm
    — computed once in Python, embedded as the SAME literals in both
    engines (the octant/benford constant-table convention; round()
    lands exact 0 at 90/180/270)."""
    import math
    return {h: (round(math.cos(math.radians(15 * h)) * 1e6),
                round(math.sin(math.radians(15 * h)) * 1e6))
            for h in range(24)}


def _hour_unit_case(hour_expr: str) -> tuple[str, str]:
    units = _hour_unit_ppm()
    ux = " ".join(f"WHEN {hour_expr} = {h} THEN {c}"
                  for h, (c, _) in units.items())
    uy = " ".join(f"WHEN {hour_expr} = {h} THEN {s}"
                  for h, (_, s) in units.items())
    return f"CASE {ux} END", f"CASE {uy} END"


def diurnal_vector(points, res: int, *, us_col: str = "us",
                   lat_col: str = "lat", lon_col: str = "lon"):
    """Per-cell circular MEAN of event hour-of-day — the diurnal
    PHASE signature hour_profile's chi-square cannot express: chi2
    says "this cell's clock is non-uniform", the resultant vector
    says WHERE on the clock its mass sits (sx > 0, sy > 0 -> morning
    quadrant; a commuter origin and a nightlife strip can share a
    chi2 yet sit opposite on the dial) and how tightly (r2). Hours
    map to the 24-point unit circle via the shared ppm literal trig
    table (midnight = (1e6, 0), 06:00 = (0, 1e6)); per cell,

        r2_ppm = (Sx^2 + Sy^2) div (n^2 * 1e6)   in [0, 1e6]

    the squared mean resultant length (rayleigh_cells' estimator
    over TIME-of-day instead of bearing octants — circular variance
    is 1 - sqrt(r2)). Hour is integer µs arithmetic, no timestamp
    libm; a uniform 24/7 cell scores 0, a one-hour spike exactly
    1e6.

    Scale: hour quantization is map-side; ONE (cell)-keyed
    combinable groupBy; squares ride DECIMAL(38,0)/HUGEINT.
    -> (cell, n_pts, sx, sy, r2_ppm)."""
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode
    hour = f"CAST(({us_col} div 3600000000) % 24 AS INT)"
    ux, uy = _hour_unit_case(f"({hour})")
    g = (points.select(
            cell_encode(lat_col, lon_col, res).alias("cell"),
            F.expr(ux).alias("_ux"), F.expr(uy).alias("_uy"))
         .groupBy("cell")
         .agg(F.count(F.lit(1)).alias("_n"),
              F.sum("_ux").alias("_sx"), F.sum("_uy").alias("_sy")))
    r2 = ("CAST((CAST(_sx AS DECIMAL(38,0)) * _sx "
          "+ CAST(_sy AS DECIMAL(38,0)) * _sy) div "
          "(CAST(_n AS DECIMAL(38,0)) * _n * 1000000) AS BIGINT)")
    return g.select(
        "cell", F.col("_n").cast("long").alias("n_pts"),
        F.col("_sx").cast("long").alias("sx"),
        F.col("_sy").cast("long").alias("sy"),
        F.expr(r2).alias("r2_ppm"))


def diurnal_vector_sql(pts_sql: str, res: int) -> str:
    """DuckDB twin of diurnal_vector over a subquery producing
    (us, lat, lon) — identical literal trig table and cell grid;
    numerator nonnegative so floor == trunc."""
    n = 1 << res
    cell = (f"(CAST({res} AS BIGINT) << 56) "
            f"| (CAST(least(greatest(floor((lat + 90.0) / 180.0 "
            f"* {n}), 0), {n - 1}) AS BIGINT) << {res}) "
            f"| CAST(least(greatest(floor((lon + 180.0) / 360.0 "
            f"* {n}), 0), {n - 1}) AS BIGINT)")
    ux, uy = _hour_unit_case("((us // 3600000000) % 24)")
    return f"""
WITH dv_p AS (SELECT {cell} AS cell,
              CAST({ux} AS HUGEINT) AS ux,
              CAST({uy} AS HUGEINT) AS uy
              FROM ({pts_sql})),
dv_g AS (SELECT cell, COUNT(*) AS n, SUM(ux) AS sx, SUM(uy) AS sy
         FROM dv_p GROUP BY 1)
SELECT cell, CAST(n AS BIGINT) AS n_pts,
       CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
       CAST((sx * sx + sy * sy)
            // (CAST(n AS HUGEINT) * n * 1000000) AS BIGINT)
         AS r2_ppm
FROM dv_g
"""


# ---------------------------------------------------------------------------
# Markov stationary mix over the type-transition chain (r5.44)
# ---------------------------------------------------------------------------

def markov_stationary(events, *, user_col: str = "user_id",
                      us_col: str = "us", type_col: str = "event_type",
                      tie_col: str = "event_id", iters: int = 8):
    """Long-run stationary mix of the first-order event-type Markov
    chain — "if sessions keep flowing like this, what does steady-
    state traffic look like": power iteration on type_transitions'
    floor-ppm conditional matrix, the chain-level summary its
    per-edge table doesn't give (a type can be a rare ENTRY yet
    dominate steady state through self-loops).

    Integer-exact pagerank conventions: x_0 = 1e6 div n_states
    micro-units; one step x'(j) = SUM over i of
    (x(i) * cond_ppm(i, j)) div 1e6 with the floor applied PER TERM
    (a sum of per-term floors is partitioning/order-invariant; a
    floored sum of exact products would need exact order). States
    with no outgoing transitions leak their mass — the pagerank
    dangling convention, mirrored by the twin. After ``iters`` steps
    the vector is reported as-is (mass <= 1e6 with the leak/floor
    losses); consumers compare components, not the total.

    Scale: the matrix and the vector are ALPHABET-sized aggregate
    frames — after one user-keyed lag window and one (t1, t2) count
    shuffle, every round is a tiny join + combinable agg
    (materialize() per round, the pagerank lesson).
    -> (event_type, pi_ppm) for every state seen as a transition
    source or target."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..materialize import materialize
    d = events.select(
        F.col(user_col).alias("_u"), F.col(us_col).alias("_us"),
        F.col(tie_col).alias("_tie"), F.col(type_col).alias("_t"))
    w = Window.partitionBy("_u").orderBy("_us", "_tie")
    h = (d.withColumn("_p", F.lag("_t").over(w))
         .filter(F.col("_p").isNotNull()))
    g = (h.groupBy(F.col("_p").alias("_t1"), F.col("_t").alias("_t2"))
         .agg(F.count(F.lit(1)).alias("_n")))
    trans = materialize(
        g.withColumn("_cp", F.expr(
            "(1000000 * _n) div sum(_n) OVER (PARTITION BY _t1)"))
        .select("_t1", "_t2", "_cp"))
    states = materialize(
        trans.select(F.col("_t1").alias("_s"))
        .union(trans.select("_t2")).distinct())
    n_states = states.count()
    x = states.select("_s", F.lit(10**6 // n_states).cast("long")
                      .alias("_x"))
    for _ in range(iters):
        step = (trans.join(x, trans["_t1"] == x["_s"])
                .select(F.col("_t2").alias("_v"),
                        F.expr("(_x * _cp) div 1000000").alias("_c"))
                .groupBy("_v").agg(F.sum("_c").alias("_nx")))
        x = materialize(
            states.join(step, states["_s"] == step["_v"], "left")
            .select("_s", F.coalesce("_nx", F.lit(0)).cast("long")
                    .alias("_x")))
    return x.select(F.col("_s").alias(type_col),
                    F.col("_x").alias("pi_ppm"))


def markov_stationary_sql(pts_sql: str, *, iters: int = 8,
                          type_col: str = "event_type") -> str:
    """DuckDB twin of markov_stationary over a subquery producing
    (user_id, us, event_id, event_type) — the same per-term-floor
    power step unrolled one CTE per iteration; all values
    nonnegative so floor == trunc."""
    ctes = [
        f"mk_d AS (SELECT user_id AS u, us, event_id AS tie, "
        f"event_type AS t FROM ({pts_sql}))",
        "mk_h AS (SELECT t, LAG(t) OVER (PARTITION BY u "
        "ORDER BY us, tie) AS p FROM mk_d)",
        "mk_g AS (SELECT p AS t1, t AS t2, COUNT(*) AS n FROM mk_h "
        "WHERE p IS NOT NULL GROUP BY 1, 2)",
        "mk_tr AS (SELECT t1, t2, (1000000 * n) // "
        "SUM(n) OVER (PARTITION BY t1) AS cp FROM mk_g)",
        "mk_s AS (SELECT DISTINCT t1 AS s FROM mk_tr "
        "UNION SELECT DISTINCT t2 FROM mk_tr)",
        "mk_ns AS (SELECT COUNT(*) AS ns FROM mk_s)",
        "x0 AS (SELECT s, CAST(1000000 // ns AS BIGINT) AS x "
        "FROM mk_s, mk_ns)",
    ]
    for i in range(iters):
        ctes.append(
            f"x{i + 1} AS (SELECT n.s, CAST(COALESCE(st.nx, 0) "
            f"AS BIGINT) AS x FROM mk_s n LEFT JOIN ("
            f"SELECT tr.t2 AS v, SUM((p.x * tr.cp) // 1000000) AS nx "
            f"FROM mk_tr tr JOIN x{i} p ON tr.t1 = p.s GROUP BY 1"
            f") st ON n.s = st.v)")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT s AS {type_col}, x AS pi_ppm FROM x{iters}")


# ---------------------------------------------------------------------------
# Week-over-week per-cell audience churn
# ---------------------------------------------------------------------------

WEEK_US = 7 * 86_400 * 1_000_000


def cell_churn(pts, res: int, *, period_us: int = WEEK_US):
    """Per-cell audience turnover between consecutive periods: for
    every cell occupied in week p-1 AND week p, the distinct-user
    overlap of the two weekly audiences —

        jaccard_ppm = n_common * 1e6  div  (n_prev + n_curr - n_common)

    exact BIGINT floor. The geospatial churn table behind retention's
    user-level cohort curve: a cell whose audience replaces itself
    weekly (low Jaccard at flat counts) is transient footfall —
    stations, venues — while a high-Jaccard cell is habitual
    territory; at crawl scale the same shape over (host-cell, week,
    user) separates loyal-readership regions from drive-by traffic.
    Input pts = (user_id, lat, lon, us) with us microseconds from the
    epoch floor; period index p = us div period_us (integer, both
    engines truncate the same for nonnegative us).

    Scale: ONE distinct shuffle on (cell, p, user) builds the visit
    frame v; the per-period counts are a combinable groupBy of v, and
    the overlap join keys on (cell, user) — per-key groups are the
    handful of weeks a user visits a cell, so no hot reducer; both
    sides derive from the same v, so AQE reuses the exchange. Cells
    occupied in only one of the two weeks carry no row (the join is
    the week-pair existence test); overlap-free pairs report 0 via
    the left join, never dropped rows. -> (cell, period, n_prev,
    n_curr, n_common, jaccard_ppm)."""
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode
    v = (pts.select(cell_encode("lat", "lon", res).alias("cell"),
                    F.expr(f"us div {int(period_us)}").alias("p"),
                    "user_id")
         .distinct())
    cnt = v.groupBy("cell", "p").agg(F.count(F.lit(1)).alias("n"))
    pairs = (cnt.alias("a").join(
        cnt.alias("b"),
        (F.col("a.cell") == F.col("b.cell"))
        & (F.col("b.p") == F.col("a.p") + 1))
        .select(F.col("a.cell").alias("cell"),
                F.col("b.p").alias("period"),
                F.col("a.n").alias("n_prev"),
                F.col("b.n").alias("n_curr")))
    common = (v.alias("x").join(
        v.alias("y"),
        (F.col("x.cell") == F.col("y.cell"))
        & (F.col("x.user_id") == F.col("y.user_id"))
        & (F.col("y.p") == F.col("x.p") + 1))
        .groupBy(F.col("y.cell").alias("cell"),
                 F.col("y.p").alias("period"))
        .agg(F.count(F.lit(1)).alias("n_common")))
    out = (pairs.join(common, ["cell", "period"], "left")
           .fillna(0, subset=["n_common"]))
    return out.select(
        "cell", "period",
        F.col("n_prev").cast("long"), F.col("n_curr").cast("long"),
        F.col("n_common").cast("long"),
        F.expr("(n_common * 1000000) div "
               "(n_prev + n_curr - n_common)").cast("long")
        .alias("jaccard_ppm"))


def cell_churn_sql(pts_sql: str, res: int, *,
                   period_us: int = WEEK_US) -> str:
    """DuckDB twin of cell_churn over a subquery producing
    (user_id, lat, lon, us) — same cell grid text, same floor."""
    from ..functions.cells import cell_encode_sql
    cell = cell_encode_sql("lat", "lon", res)
    return f"""
WITH ch_v AS (SELECT DISTINCT {cell} AS cell,
                     us // {int(period_us)} AS p, user_id
              FROM ({pts_sql})),
ch_c AS (SELECT cell, p, COUNT(*) AS n FROM ch_v GROUP BY 1, 2),
ch_p AS (SELECT a.cell, b.p AS period, a.n AS n_prev, b.n AS n_curr
         FROM ch_c a JOIN ch_c b
         ON a.cell = b.cell AND b.p = a.p + 1),
ch_o AS (SELECT y.cell, y.p AS period, COUNT(*) AS n_common
         FROM ch_v x JOIN ch_v y
         ON x.cell = y.cell AND x.user_id = y.user_id
            AND y.p = x.p + 1
         GROUP BY 1, 2)
SELECT cell, period,
       CAST(n_prev AS BIGINT) AS n_prev,
       CAST(n_curr AS BIGINT) AS n_curr,
       CAST(COALESCE(n_common, 0) AS BIGINT) AS n_common,
       CAST((COALESCE(n_common, 0) * 1000000)
            // (n_prev + n_curr - COALESCE(n_common, 0)) AS BIGINT)
       AS jaccard_ppm
FROM ch_p LEFT JOIN ch_o USING (cell, period)
"""


# ---------------------------------------------------------------------------
# Radiation-model OD flow prediction
# ---------------------------------------------------------------------------

def radiation_flows(points, res: int, *, user_col: str = "user_id",
                    us_col: str = "us", lat_col: str = "lat",
                    lon_col: str = "lon", tie_col: str = "event_id",
                    day_us: int = 86_400_000_000):
    """Radiation-model trip prediction over the observed OD matrix —
    the parameter-free null that od_gravity's fitted decay can't
    give (Simini et al. 2012): the probability a trip leaving origin
    i lands at destination j is

        p_ij = m_i * m_j / ((m_i + s_ij) * (m_i + m_j + s_ij))

    with m the cell "population" (event mass) and s_ij the mass
    STRICTLY inside the circle of radius d_ij around i, excluding i
    and j themselves — opportunities absorb trips before distance
    does. Everything is integer-exact: distances are squared wrapped
    grid distances (dx wraps mod 2^res, dy clamps — the cell-family
    convention), "inside" is the pure-BIGINT comparison d2 < d2_ij,
    and the products run in DECIMAL(38,0)/HUGEINT before one floor
    to ppm. Reported next to p_ppm: t_pred = T_i * p_ij floored,
    the expected trip count given i's observed outflow — the lift
    table (n_trips vs t_pred) is corridor discovery under the
    radiation null, the same readout od_gravity builds under the
    gravity null.

    Scale: masses and observed OD pairs are both AGGREGATE-sized
    frames (occupied cells <= 4^res; pairs <= realized trips); the
    s_ij step is a broadcast-nested-loop of pairs x occupied-raster
    — bounded broadcast, CPU-bound candidate arithmetic, so the pair
    frame pre-partitions one-per-core (AQE's byte-based coalescing
    cannot see per-row CPU; the seg_crossings lesson). No point-level
    shuffle beyond od_matrix's own (user, day) agg and the mass
    groupBy. -> (o_cell, d_cell, n_trips, m_o, m_d, s_mass, p_ppm,
    t_pred)."""
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode
    n = 1 << res
    mask = n - 1
    spark = points.sparkSession
    par = spark.sparkContext.defaultParallelism
    m = (points
         .select(cell_encode(lat_col, lon_col, res).alias("cell"))
         .groupBy("cell").agg(F.count(F.lit(1)).alias("mass"))
         .withColumn("x", F.col("cell").bitwiseAND(F.lit(mask)))
         .withColumn("y", F.shiftright("cell", res)
                     .bitwiseAND(F.lit(mask))))
    od = od_matrix(points, res, user_col=user_col, us_col=us_col,
                   lat_col=lat_col, lon_col=lon_col, tie_col=tie_col,
                   day_us=day_us).filter("o_cell <> d_cell")
    tout = od.groupBy("o_cell").agg(F.sum("n_trips").alias("t_out"))
    mo = m.select(F.col("cell").alias("o_cell"),
                  F.col("mass").alias("m_o"),
                  F.col("x").alias("_xo"), F.col("y").alias("_yo"))
    md = m.select(F.col("cell").alias("d_cell"),
                  F.col("mass").alias("m_d"),
                  F.col("x").alias("_xd"), F.col("y").alias("_yd"))
    pairs = (od.join(tout, "o_cell").join(mo, "o_cell")
             .join(md, "d_cell")
             .withColumn("_d2", F.expr(
                 f"least(abs(_xo - _xd), {n} - abs(_xo - _xd)) "
                 f"* least(abs(_xo - _xd), {n} - abs(_xo - _xd)) "
                 f"+ (_yo - _yd) * (_yo - _yd)"))
             .repartition(par, "o_cell", "d_cell"))
    k = m.select(F.col("cell").alias("_kc"),
                 F.col("mass").alias("_km"),
                 F.col("x").alias("_xk"), F.col("y").alias("_yk"))
    dk = (f"least(abs(_xo - _xk), {n} - abs(_xo - _xk)) "
          f"* least(abs(_xo - _xk), {n} - abs(_xo - _xk)) "
          f"+ (_yo - _yk) * (_yo - _yk)")
    s = (pairs.join(
            F.broadcast(k),
            F.expr(f"({dk}) < _d2 AND _kc <> o_cell AND _kc <> d_cell"))
         .groupBy("o_cell", "d_cell")
         .agg(F.sum("_km").alias("s_mass")))
    out = (pairs.join(s, ["o_cell", "d_cell"], "left")
           .fillna(0, subset=["s_mass"]))
    den = ("(CAST(m_o AS DECIMAL(38,0)) + s_mass) "
           "* (CAST(m_o AS DECIMAL(38,0)) + m_d + s_mass)")
    return out.select(
        "o_cell", "d_cell", F.col("n_trips").cast("long"),
        F.col("m_o").cast("long"), F.col("m_d").cast("long"),
        F.col("s_mass").cast("long"),
        F.expr(f"CAST((CAST(1000000 AS DECIMAL(38,0)) * m_o * m_d) "
               f"div ({den}) AS BIGINT)").alias("p_ppm"),
        F.expr(f"CAST((CAST(t_out AS DECIMAL(38,0)) * m_o * m_d) "
               f"div ({den}) AS BIGINT)").alias("t_pred"))


def radiation_flows_sql(pts_sql: str, res: int, *,
                        day_us: int = 86_400_000_000) -> str:
    """DuckDB twin of radiation_flows over a subquery producing
    (user_id, us, event_id, lat, lon) — same od_matrix first/last
    convention, same wrapped d2, same HUGEINT floor."""
    from ..functions.cells import cell_encode_sql
    n = 1 << res
    mask = n - 1
    cell = cell_encode_sql("lat", "lon", res)
    def d2(xa, ya, xb, yb):
        return (f"least(abs({xa} - {xb}), {n} - abs({xa} - {xb})) "
                f"* least(abs({xa} - {xb}), {n} - abs({xa} - {xb})) "
                f"+ ({ya} - {yb}) * ({ya} - {yb})")
    return f"""
WITH rf_d AS (SELECT user_id AS u, us // {day_us} AS day, us,
              event_id, {cell} AS cell FROM ({pts_sql})),
rf_r AS (SELECT u, day, cell,
         ROW_NUMBER() OVER (PARTITION BY u, day
                            ORDER BY us ASC, event_id ASC) AS rf,
         ROW_NUMBER() OVER (PARTITION BY u, day
                            ORDER BY us DESC, event_id DESC) AS rl
         FROM rf_d),
rf_g AS (SELECT u, day,
         MAX(CASE WHEN rf = 1 THEN cell END) AS o_cell,
         MAX(CASE WHEN rl = 1 THEN cell END) AS d_cell
         FROM rf_r GROUP BY 1, 2),
rf_od AS (SELECT o_cell, d_cell, COUNT(*) AS n_trips FROM rf_g
          WHERE o_cell <> d_cell GROUP BY 1, 2),
rf_t AS (SELECT o_cell, SUM(n_trips) AS t_out FROM rf_od GROUP BY 1),
rf_m AS (SELECT cell, COUNT(*) AS mass, cell & {mask} AS x,
         (cell >> {res}) & {mask} AS y
         FROM (SELECT {cell} AS cell FROM ({pts_sql})) GROUP BY 1),
rf_p AS (SELECT od.o_cell, od.d_cell, od.n_trips, t.t_out,
         a.mass AS m_o, b.mass AS m_d, a.x AS xo, a.y AS yo,
         {d2('a.x', 'a.y', 'b.x', 'b.y')} AS dij2
         FROM rf_od od
         JOIN rf_t t ON od.o_cell = t.o_cell
         JOIN rf_m a ON od.o_cell = a.cell
         JOIN rf_m b ON od.d_cell = b.cell),
rf_s AS (SELECT p.o_cell, p.d_cell, SUM(k.mass) AS s_mass
         FROM rf_p p JOIN rf_m k
         ON ({d2('p.xo', 'p.yo', 'k.x', 'k.y')}) < p.dij2
            AND k.cell <> p.o_cell AND k.cell <> p.d_cell
         GROUP BY 1, 2)
SELECT p.o_cell, p.d_cell, CAST(p.n_trips AS BIGINT) AS n_trips,
       CAST(p.m_o AS BIGINT) AS m_o, CAST(p.m_d AS BIGINT) AS m_d,
       CAST(COALESCE(s.s_mass, 0) AS BIGINT) AS s_mass,
       CAST((CAST(1000000 AS HUGEINT) * p.m_o * p.m_d)
            // ((CAST(p.m_o AS HUGEINT) + COALESCE(s.s_mass, 0))
                * (CAST(p.m_o AS HUGEINT) + p.m_d
                   + COALESCE(s.s_mass, 0))) AS BIGINT) AS p_ppm,
       CAST((CAST(p.t_out AS HUGEINT) * p.m_o * p.m_d)
            // ((CAST(p.m_o AS HUGEINT) + COALESCE(s.s_mass, 0))
                * (CAST(p.m_o AS HUGEINT) + p.m_d
                   + COALESCE(s.s_mass, 0))) AS BIGINT) AS t_pred
FROM rf_p p LEFT JOIN rf_s s
ON p.o_cell = s.o_cell AND p.d_cell = s.d_cell
"""


# ---------------------------------------------------------------------------
# Bounded DTW trajectory-pair distance
# ---------------------------------------------------------------------------

DTW_L = 8


def _dtw_cols(L: int, idx) -> list:
    """The unrolled DTW dynamic program as an ORDERED list of
    (column_name, expression_text) pairs — dp_i_j = d(i, j) +
    least(dp_{i-1}_j, dp_i_{j-1}, dp_{i-1}_{j-1}) in row-major
    dependency order, so each engine folds them one projection at a
    time (Spark withColumn chain / DuckDB nested SELECTs). ``idx``
    maps (array_name, 1-based position) to that engine's subscript
    syntax — the ONLY dialect difference; the arithmetic text is
    shared (single-source, the enclosing_cell convention). L is a
    plan-time constant: L^2 generated columns, no recursion, no UDF.
    """
    def d(i, j):
        dx = f"({idx('ax', i)} - {idx('bx', j)})"
        dy = f"({idx('ay', i)} - {idx('by', j)})"
        return f"({dx} * {dx} + {dy} * {dy})"

    cols = []
    for i in range(1, L + 1):
        for j in range(1, L + 1):
            if i == 1 and j == 1:
                prev = None
            elif i == 1:
                prev = f"dp_1_{j - 1}"
            elif j == 1:
                prev = f"dp_{i - 1}_1"
            else:
                prev = (f"least(dp_{i - 1}_{j}, dp_{i}_{j - 1}, "
                        f"dp_{i - 1}_{j - 1})")
            e = d(i, j) if prev is None else f"{d(i, j)} + {prev}"
            cols.append((f"dp_{i}_{j}", e))
    return cols


def dtw_pairs(points, *, block_res: int = 1, L: int = DTW_L,
              user_col: str = "user_id", us_col: str = "us",
              tie_col: str = "event_id", lat_col: str = "lat",
              lon_col: str = "lon"):
    """Dynamic-time-warping distance between user trajectories —
    the alignment-aware similarity traj_similarity's place-set
    Jaccard cannot give (two commuters tracing the same loop at
    different speeds score CLOSE here, identical-places-visited-in-
    reverse score far): each user's first ``L`` events (by us, tie)
    form a centidegree integer sequence; users sharing a
    ``block_res`` home cell (their FIRST event's cell — the
    candidate blocker that keeps the pair join key-equality) pair
    up, and the classic DP

        dp[i][j] = d2(i, j) + min(dp[i-1][j], dp[i][j-1],
                                  dp[i-1][j-1])

    runs UNROLLED as L^2 generated integer column expressions (a
    sequential-looking algorithm made one whole-stage-codegen
    projection — no iteration, no Python, engine-parity by
    construction since the DuckDB twin folds the same generated
    text). Centidegrees bound the arithmetic: d2 <= ~1.5e9 and the
    warp path has <= 2L-1 steps, so dtw < 5e10 — BIGINT everywhere.
    Users with fewer than L events drop (no padding bias).

    Scale: one user-keyed rank window + one combinable
    array_sort(collect_list) agg build the L-point sequences (state
    O(L) per user); the pair join keys on the home cell — block
    sizes are the skew knob, and the DP itself is flat CPU per pair,
    the blocked-join shape that pins one-per-core partitioning at
    bench scale. -> (user_a, user_b, block, dtw)."""
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode
    p = points.select(
        F.col(user_col).alias("u"), F.col(us_col).alias("_us"),
        F.col(tie_col).alias("_tie"),
        F.floor(F.col(lat_col) * 100).cast("long").alias("cy"),
        F.floor(F.col(lon_col) * 100).cast("long").alias("cx"),
        cell_encode(lat_col, lon_col, block_res).alias("_bc"))
    r = p.withColumn("_rn", F.expr(
        "row_number() OVER (PARTITION BY u ORDER BY _us, _tie)"))
    seq = (r.filter(F.col("_rn") <= L)
           .groupBy("u")
           .agg(F.count(F.lit(1)).alias("_n"),
                F.array_sort(F.collect_list(F.struct(
                    "_rn", "cx", "cy"))).alias("_s"),
                F.max(F.when(F.col("_rn") == 1, F.col("_bc")))
                .alias("block"))
           .filter(F.col("_n") == L)
           .select("u", "block",
                   F.expr("transform(_s, s -> s.cx)").alias("x"),
                   F.expr("transform(_s, s -> s.cy)").alias("y")))
    a = seq.select(F.col("u").alias("user_a"), "block",
                   F.col("x").alias("ax"), F.col("y").alias("ay"))
    b = seq.select(F.col("u").alias("user_b"),
                   F.col("block").alias("_bb"),
                   F.col("x").alias("bx"), F.col("y").alias("by"))
    pairs = a.join(b, (F.col("block") == F.col("_bb"))
                   & (F.col("user_a") < F.col("user_b")))
    for name, expr in _dtw_cols(L, lambda arr, i: f"{arr}[{i - 1}]"):
        pairs = pairs.withColumn(name, F.expr(expr))
    return pairs.select("user_a", "user_b", "block",
                        F.col(f"dp_{L}_{L}").cast("long")
                        .alias("dtw"))


def dtw_pairs_sql(pts_sql: str, *, block_res: int = 1,
                  L: int = DTW_L) -> str:
    """DuckDB twin of dtw_pairs over a subquery producing (user_id,
    us, event_id, lat, lon) — same rank/sequence build, same
    generated DP text folded as nested SELECTs (1-based list
    subscripts are the only dialect difference)."""
    from ..functions.cells import cell_encode_sql
    cell = cell_encode_sql("lat", "lon", block_res)
    sql = f"""
SELECT a.u AS user_a, b.u AS user_b, a.block, a.x AS ax, a.y AS ay,
       b.x AS bx, b.y AS by
FROM (SELECT u, block, x, y FROM (
  SELECT u, COUNT(*) AS n,
         MAX(CASE WHEN rn = 1 THEN bc END) AS block,
         list(cx ORDER BY rn) AS x, list(cy ORDER BY rn) AS y
  FROM (SELECT user_id AS u,
               CAST(floor(lat * 100) AS BIGINT) AS cy,
               CAST(floor(lon * 100) AS BIGINT) AS cx,
               {cell} AS bc,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY us, event_id) AS rn
        FROM ({pts_sql})) WHERE rn <= {L} GROUP BY u)
  WHERE n = {L}) a
JOIN (SELECT u, block, x, y FROM (
  SELECT u, COUNT(*) AS n,
         MAX(CASE WHEN rn = 1 THEN bc END) AS block,
         list(cx ORDER BY rn) AS x, list(cy ORDER BY rn) AS y
  FROM (SELECT user_id AS u,
               CAST(floor(lat * 100) AS BIGINT) AS cy,
               CAST(floor(lon * 100) AS BIGINT) AS cx,
               {cell} AS bc,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY us, event_id) AS rn
        FROM ({pts_sql})) WHERE rn <= {L} GROUP BY u)
  WHERE n = {L}) b
ON a.block = b.block AND a.u < b.u
"""
    for name, expr in _dtw_cols(L, lambda arr, i: f"{arr}[{i}]"):
        sql = f"SELECT *, {expr} AS {name} FROM ({sql})"
    return (f"SELECT user_a, user_b, block, "
            f"CAST(dp_{L}_{L} AS BIGINT) AS dtw FROM ({sql})")


def detour_index(points, *, user_col: str = "user_id",
                 us_col: str = "us", tie_col: str = "event_id",
                 lat_col: str = "lat", lon_col: str = "lon",
                 day_us: int = 86_400_000_000):
    """Per-trip detour index — network efficiency without a network:
    for every (user, day) with >= 2 events, the traveled path length
    against the straight origin-destination line,

        detour_ppm = path_udeg * 1e6  div  line_udeg

    in L1 microdegrees (|dlat| + |dlon| — integer-exact, no sqrt;
    the SAME norm for both legs so the ratio is scale-honest:
    1e6 = perfectly direct, 3e6 = three times the straight way).
    The route-quality screen over od_matrix's corridors: a corridor
    whose trips all read high detour is a missing road / blocked
    link signal, and in crawl terms the same shape scores redirect-
    chain inefficiency. Zero-line trips (o == d, round trips) report
    NULL detour rather than dividing by zero — they're loops, not
    detours; zero-PATH trips (stationary all day) drop entirely.

    Scale: one (user, day)-keyed lag window for the hop lengths,
    then one combinable agg per trip — the sessionize cost envelope;
    no joins, no raster. -> (user_id, day, n_hops, path_udeg,
    line_udeg, detour_ppm)."""
    from pyspark.sql import functions as F

    d = points.select(
        F.col(user_col).alias("user_id"),
        F.expr(f"{us_col} div {int(day_us)}").alias("day"),
        F.col(us_col).alias("_us"), F.col(tie_col).alias("_tie"),
        F.floor(F.col(lat_col) * 1_000_000).cast("long")
        .alias("_uy"),
        F.floor(F.col(lon_col) * 1_000_000).cast("long")
        .alias("_ux"))
    w = "(PARTITION BY user_id, day ORDER BY _us, _tie)"
    h = (d.withColumn("_py", F.expr(f"lag(_uy) OVER {w}"))
         .withColumn("_px", F.expr(f"lag(_ux) OVER {w}"))
         .withColumn("_rf", F.expr(f"row_number() OVER {w}"))
         .withColumn("_rl", F.expr(
             "row_number() OVER (PARTITION BY user_id, day "
             "ORDER BY _us DESC, _tie DESC)")))
    t = (h.groupBy("user_id", "day")
         .agg(F.count(F.lit(1)).alias("_n"),
              F.sum(F.expr(
                  "CASE WHEN _py IS NULL THEN 0 ELSE "
                  "abs(_uy - _py) + abs(_ux - _px) END"))
              .alias("path_udeg"),
              F.max(F.when(F.col("_rf") == 1, F.struct("_uy", "_ux")))
              .alias("_o"),
              F.max(F.when(F.col("_rl") == 1, F.struct("_uy", "_ux")))
              .alias("_d")))
    return (t.filter(F.col("_n") >= 2)
            .withColumn("line_udeg", F.expr(
                "abs(_d._uy - _o._uy) + abs(_d._ux - _o._ux)"))
            .filter(F.col("path_udeg") > 0)
            .select("user_id", "day",
                    (F.col("_n") - 1).cast("long").alias("n_hops"),
                    F.col("path_udeg").cast("long"),
                    F.col("line_udeg").cast("long"),
                    F.expr("CASE WHEN line_udeg = 0 THEN NULL ELSE "
                           "(path_udeg * 1000000) div line_udeg END")
                    .cast("long").alias("detour_ppm")))


def detour_index_sql(pts_sql: str, *,
                     day_us: int = 86_400_000_000) -> str:
    """DuckDB twin of detour_index over a subquery producing
    (user_id, us, event_id, lat, lon) — same lag/argmin text, same
    L1 floor."""
    return f"""
WITH dt_d AS (SELECT user_id, us // {int(day_us)} AS day, us,
              event_id,
              CAST(floor(lat * 1000000) AS BIGINT) AS uy,
              CAST(floor(lon * 1000000) AS BIGINT) AS ux
              FROM ({pts_sql})),
dt_h AS (SELECT user_id, day, uy, ux,
         LAG(uy) OVER w AS py, LAG(ux) OVER w AS px,
         ROW_NUMBER() OVER w AS rf,
         ROW_NUMBER() OVER (PARTITION BY user_id, day
                            ORDER BY us DESC, event_id DESC) AS rl
         FROM dt_d
         WINDOW w AS (PARTITION BY user_id, day
                      ORDER BY us, event_id)),
dt_t AS (SELECT user_id, day, COUNT(*) AS n,
         SUM(CASE WHEN py IS NULL THEN 0
             ELSE abs(uy - py) + abs(ux - px) END) AS path_udeg,
         MAX(CASE WHEN rf = 1 THEN uy END) AS oy,
         MAX(CASE WHEN rf = 1 THEN ux END) AS ox,
         MAX(CASE WHEN rl = 1 THEN uy END) AS dy,
         MAX(CASE WHEN rl = 1 THEN ux END) AS dx
         FROM dt_h GROUP BY 1, 2)
SELECT user_id, day, CAST(n - 1 AS BIGINT) AS n_hops,
       CAST(path_udeg AS BIGINT) AS path_udeg,
       CAST(abs(dy - oy) + abs(dx - ox) AS BIGINT) AS line_udeg,
       CAST(CASE WHEN abs(dy - oy) + abs(dx - ox) = 0 THEN NULL
            ELSE (path_udeg * 1000000)
                 // (abs(dy - oy) + abs(dx - ox)) END AS BIGINT)
         AS detour_ppm
FROM dt_t WHERE n >= 2 AND path_udeg > 0
"""


def od_ipf(points, res: int, *, rounds: int = 3, tail_day: int = 21,
           user_col: str = "user_id", us_col: str = "us",
           tie_col: str = "event_id", lat_col: str = "lat",
           lon_col: str = "lon", day_us: int = 86_400_000_000):
    """Iterative proportional fitting (Furness balancing) of the OD
    matrix — the transport-planning step after od_gravity/radiation
    judge corridors: rescale the FULL-period trip matrix so its
    margins match a target period's outflows/inflows (here the days
    >= ``tail_day`` tail — "yesterday's structure, today's volumes"),
    alternating row and column scalings

        v_ij <- v_ij * (R_i * 1e6)  div  rowsum_i(v)      (then cols)

    for ``rounds`` rounds in trip-ppm integer units with per-entry
    floors (the markov per-term-floor convention: order- and
    partition-invariant, so both engines land identical matrices
    without converging "exactly" — the achieved margins ARE the
    output contract, not an epsilon claim). Origins/destinations
    absent from the tail zero their rows/columns (R = 0), and a
    zeroed row guards its division. Products run in
    DECIMAL(38,0)/HUGEINT (v * R * 1e6 reaches ~1e19 at city scale).

    Scale: both matrices are AGGREGATE frames from od_matrix's one
    (user, day) shuffle each; every IPF half-round is one o- or
    d-keyed window sum + a scale projection on the OD frame — no
    joins wider than the margin tables. -> (o_cell, d_cell, n_obs,
    fit_ppm) with fit_ppm the balanced matrix in trip-ppm."""
    from pyspark.sql import functions as F

    od = od_matrix(points, res, user_col=user_col, us_col=us_col,
                   lat_col=lat_col, lon_col=lon_col, tie_col=tie_col,
                   day_us=day_us).filter("o_cell <> d_cell")
    tail = points.filter(
        F.expr(f"{us_col} div {int(day_us)} >= {int(tail_day)}"))
    tod = od_matrix(tail, res, user_col=user_col, us_col=us_col,
                    lat_col=lat_col, lon_col=lon_col,
                    tie_col=tie_col, day_us=day_us) \
        .filter("o_cell <> d_cell")
    rmarg = tod.groupBy("o_cell").agg(F.sum("n_trips").alias("_r"))
    cmarg = tod.groupBy("d_cell").agg(F.sum("n_trips").alias("_c"))
    v = (od.join(rmarg, "o_cell", "left")
         .join(cmarg, "d_cell", "left")
         .fillna(0, subset=["_r", "_c"])
         .withColumn("_v", F.expr("n_trips * CAST(1000000 AS BIGINT)")))
    # each half-round: BIGINT state, DECIMAL(38,0) product headroom
    # (v * r * 1e6 reaches ~2e19 — past BIGINT — before the floor
    # brings it back under r * 1e6)
    for _ in range(int(rounds)):
        v = (v.withColumn("_rs", F.expr(
                "sum(_v) OVER (PARTITION BY o_cell)"))
             .withColumn("_v", F.expr(
                "CASE WHEN _rs = 0 THEN CAST(0 AS BIGINT) "
                "ELSE CAST((CAST(_v AS DECIMAL(38,0)) * _r "
                "* 1000000) div _rs AS BIGINT) END"))
             .drop("_rs"))
        v = (v.withColumn("_cs", F.expr(
                "sum(_v) OVER (PARTITION BY d_cell)"))
             .withColumn("_v", F.expr(
                "CASE WHEN _cs = 0 THEN CAST(0 AS BIGINT) "
                "ELSE CAST((CAST(_v AS DECIMAL(38,0)) * _c "
                "* 1000000) div _cs AS BIGINT) END"))
             .drop("_cs"))
    return v.select("o_cell", "d_cell",
                    F.col("n_trips").cast("long").alias("n_obs"),
                    F.col("_v").cast("long").alias("fit_ppm"))


def od_ipf_sql(pts_sql: str, res: int, *, rounds: int = 3,
               tail_day: int = 21,
               day_us: int = 86_400_000_000) -> str:
    """DuckDB twin of od_ipf — od_matrix_sql-style first/last CTEs
    for both matrices, then the IPF half-rounds UNROLLED (the
    kmeans/markov convention), HUGEINT products, per-entry floors."""
    from ..functions.cells import cell_encode_sql
    cell = cell_encode_sql("lat", "lon", res)

    def odm(name, where):
        return f"""
{name}_d AS (SELECT user_id AS u, us // {int(day_us)} AS day, us,
             event_id, {cell} AS cell FROM ({pts_sql}){where}),
{name}_r AS (SELECT u, day, cell,
             ROW_NUMBER() OVER (PARTITION BY u, day
                                ORDER BY us ASC, event_id ASC) AS rf,
             ROW_NUMBER() OVER (PARTITION BY u, day
                                ORDER BY us DESC, event_id DESC)
               AS rl
             FROM {name}_d),
{name}_g AS (SELECT u, day,
             MAX(CASE WHEN rf = 1 THEN cell END) AS o_cell,
             MAX(CASE WHEN rl = 1 THEN cell END) AS d_cell
             FROM {name}_r GROUP BY 1, 2),
{name}_od AS (SELECT o_cell, d_cell, COUNT(*) AS n_trips
              FROM {name}_g WHERE o_cell <> d_cell GROUP BY 1, 2)"""

    ctes = [odm("ip_f", ""),
            odm("ip_t",
                f" WHERE us // {int(day_us)} >= {int(tail_day)}"),
            """ip_m AS (SELECT f.o_cell, f.d_cell, f.n_trips,
             COALESCE(r._r, 0) AS r, COALESCE(c._c, 0) AS c,
             CAST(f.n_trips AS HUGEINT) * 1000000 AS v
             FROM ip_f_od f
             LEFT JOIN (SELECT o_cell, SUM(n_trips) AS _r
                        FROM ip_t_od GROUP BY 1) r
               ON f.o_cell = r.o_cell
             LEFT JOIN (SELECT d_cell, SUM(n_trips) AS _c
                        FROM ip_t_od GROUP BY 1) c
               ON f.d_cell = c.d_cell)"""]
    cur = "ip_m"
    for i in range(int(rounds)):
        ctes.append(f"""ip_a{i} AS (SELECT o_cell, d_cell, n_trips, r, c,
             CASE WHEN SUM(v) OVER (PARTITION BY o_cell) = 0
                  THEN CAST(0 AS HUGEINT)
                  ELSE (v * r * 1000000)
                       // SUM(v) OVER (PARTITION BY o_cell) END AS v
             FROM {cur})""")
        ctes.append(f"""ip_b{i} AS (SELECT o_cell, d_cell, n_trips, r, c,
             CASE WHEN SUM(v) OVER (PARTITION BY d_cell) = 0
                  THEN CAST(0 AS HUGEINT)
                  ELSE (v * c * 1000000)
                       // SUM(v) OVER (PARTITION BY d_cell) END AS v
             FROM ip_a{i})""")
        cur = f"ip_b{i}"
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT o_cell, d_cell, "
              f"CAST(n_trips AS BIGINT) AS n_obs, "
              f"CAST(v AS BIGINT) AS fit_ppm FROM {cur}")


def _lcs_cols(L: int, idx) -> list:
    """Longest-common-subsequence DP as ordered (name, expr) pairs —
    the _dtw_cols generator's sibling: lc_i_j = a_i == b_j ?
    lc_{i-1}_{j-1} + 1 : greatest(lc_{i-1}_j, lc_i_{j-1}), with the
    i=0 / j=0 border folded into the expressions (plan-time
    constants, no extra columns)."""
    def eq(i, j):
        return (f"({idx('ac', i)} = {idx('bc', j)} "
                f"AND {idx('ar', i)} = {idx('br', j)})")

    cols = []
    for i in range(1, L + 1):
        for j in range(1, L + 1):
            diag = "0" if (i == 1 or j == 1) else f"lc_{i-1}_{j-1}"
            up = "0" if i == 1 else f"lc_{i-1}_{j}"
            left = "0" if j == 1 else f"lc_{i}_{j-1}"
            cols.append((f"lc_{i}_{j}",
                         f"CASE WHEN {eq(i, j)} THEN {diag} + 1 "
                         f"ELSE greatest({up}, {left}) END"))
    return cols


def lcs_routes(points, res: int, *, block_res: int = 1,
               L: int = 8, user_col: str = "user_id",
               us_col: str = "us", tie_col: str = "event_id",
               lat_col: str = "lat", lon_col: str = "lon"):
    """Order-preserving route overlap — the third trajectory
    similarity next to traj_similarity's place-set Jaccard (no
    order) and dtw_pairs' elastic alignment (no skips): the longest
    common CELL subsequence of two users' first-``L``-event routes,
    as overlap_ppm = lcs * 1e6 div L. Two couriers sharing a 5-stop
    corridor in the same order score 625000 even if each detours
    differently between stops — the shared-itinerary signal neither
    Jaccard (order-blind) nor DTW (skip-blind) isolates. Sequences
    quantize to res cells; pairs block on the res-``block_res`` home
    cell; the L x L recurrence UNROLLS into generated integer
    columns exactly like dtw_pairs (one codegen projection, no
    iteration, engine parity by construction).

    Scale: identical envelope to dtw_pairs — one user-keyed rank
    window, one combinable sequence agg, a home-cell-blocked pair
    join with flat CPU per pair. -> (user_a, user_b, block, lcs,
    overlap_ppm)."""
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode
    mask = (1 << res) - 1
    p = points.select(
        F.col(user_col).alias("u"), F.col(us_col).alias("_us"),
        F.col(tie_col).alias("_tie"),
        cell_encode(lat_col, lon_col, res).alias("_c"),
        cell_encode(lat_col, lon_col, block_res).alias("_bc"))
    r = p.withColumn("_rn", F.expr(
        "row_number() OVER (PARTITION BY u ORDER BY _us, _tie)"))
    seq = (r.filter(F.col("_rn") <= L)
           .groupBy("u")
           .agg(F.count(F.lit(1)).alias("_n"),
                F.array_sort(F.collect_list(F.struct("_rn", "_c")))
                .alias("_s"),
                F.max(F.when(F.col("_rn") == 1, F.col("_bc")))
                .alias("block"))
           .filter(F.col("_n") == L)
           .select("u", "block",
                   F.expr(f"transform(_s, s -> s._c & {mask})")
                   .alias("cx"),
                   F.expr(f"transform(_s, s -> (s._c >> {res}) "
                          f"& {mask})").alias("cy")))
    a = seq.select(F.col("u").alias("user_a"), "block",
                   F.col("cx").alias("ac"), F.col("cy").alias("ar"))
    b = seq.select(F.col("u").alias("user_b"),
                   F.col("block").alias("_bb"),
                   F.col("cx").alias("bc"), F.col("cy").alias("br"))
    pairs = a.join(b, (F.col("block") == F.col("_bb"))
                   & (F.col("user_a") < F.col("user_b")))
    for name, expr in _lcs_cols(L, lambda arr, i: f"{arr}[{i - 1}]"):
        pairs = pairs.withColumn(name, F.expr(expr))
    return pairs.select(
        "user_a", "user_b", "block",
        F.col(f"lc_{L}_{L}").cast("long").alias("lcs"),
        F.expr(f"(lc_{L}_{L} * 1000000) div {L}").cast("long")
        .alias("overlap_ppm"))


def lcs_routes_sql(pts_sql: str, res: int, *, block_res: int = 1,
                   L: int = 8) -> str:
    """DuckDB twin of lcs_routes — same sequence build, same
    generated LCS text folded as nested SELECTs."""
    from ..functions.cells import cell_encode_sql
    mask = (1 << res) - 1
    cell = cell_encode_sql("lat", "lon", res)
    bcell = cell_encode_sql("lat", "lon", block_res)
    seq = f"""SELECT u, block, x AS cx, y AS cy FROM (
  SELECT u, COUNT(*) AS n,
         MAX(CASE WHEN rn = 1 THEN bc END) AS block,
         list(c & {mask} ORDER BY rn) AS x,
         list((c >> {res}) & {mask} ORDER BY rn) AS y
  FROM (SELECT user_id AS u, {cell} AS c, {bcell} AS bc,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY us, event_id) AS rn
        FROM ({pts_sql})) WHERE rn <= {L} GROUP BY u)
  WHERE n = {L}"""
    sql = f"""
SELECT a.u AS user_a, b.u AS user_b, a.block, a.cx AS ac,
       a.cy AS ar, b.cx AS bc, b.cy AS br
FROM ({seq}) a JOIN ({seq}) b
ON a.block = b.block AND a.u < b.u
"""
    for name, expr in _lcs_cols(L, lambda arr, i: f"{arr}[{i}]"):
        sql = f"SELECT *, {expr} AS {name} FROM ({sql})"
    return (f"SELECT user_a, user_b, block, "
            f"CAST(lc_{L}_{L} AS BIGINT) AS lcs, "
            f"CAST((lc_{L}_{L} * 1000000) // {L} AS BIGINT) "
            f"AS overlap_ppm FROM ({sql})")


def cell_rules(pts, res: int, *, min_users: int = 5,
               user_col: str = "user_id", lat_col: str = "lat",
               lon_col: str = "lon"):
    """Market-basket association rules over visited cells — "users
    who frequent A also frequent B": for every ordered cell pair
    with at least ``min_users`` co-visitors,

        support_ppm = n_ab * 1e6 div N
        conf_ppm    = n_ab * 1e6 div n_a          (A -> B)
        lift_ppm    = n_ab * N * 1e6 div (n_a * n_b)

    over the distinct (user, cell) visit sets — ANY-time co-patronage
    at the USER grain, vs colocation's same-day co-presence and
    colloc_lift's adjacent-token grain; lift > 1e6 is the
    cross-visitation signal retail siting and transit planning run
    on. Integer-exact throughout (the n_ab·N product runs in
    DECIMAL(38,0)/HUGEINT).

    Scale: the apriori prune comes FIRST — cells with fewer than
    ``min_users`` visitors can never reach the co-visitor floor, so
    visits semi-join the frequent-cell set before the user-keyed
    pair explode (the step that bounds basket fanout); the pair
    groupBy is map-side combinable. -> (cell_a, cell_b, n_a, n_b,
    n_ab, support_ppm, conf_ppm, lift_ppm), both directions."""
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode
    v = (pts.select(F.col(user_col).alias("u"),
                    cell_encode(lat_col, lon_col, res).alias("c"))
         .distinct())
    freq = (v.groupBy("c").agg(F.count(F.lit(1)).alias("n_c"))
            .filter(F.col("n_c") >= int(min_users)))
    fv = v.join(F.broadcast(freq), "c")
    n_tot = v.select("u").distinct().count()
    pairs = (fv.alias("a").join(
        fv.alias("b"),
        (F.col("a.u") == F.col("b.u"))
        & (F.col("a.c") != F.col("b.c")))
        .groupBy(F.col("a.c").alias("cell_a"),
                 F.col("b.c").alias("cell_b"),
                 F.col("a.n_c").alias("n_a"),
                 F.col("b.n_c").alias("n_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= int(min_users)))
    return pairs.select(
        "cell_a", "cell_b",
        F.col("n_a").cast("long"), F.col("n_b").cast("long"),
        F.col("n_ab").cast("long"),
        F.expr(f"(n_ab * 1000000) div {n_tot}").cast("long")
        .alias("support_ppm"),
        F.expr("(n_ab * 1000000) div n_a").cast("long")
        .alias("conf_ppm"),
        F.expr(f"CAST((CAST(n_ab AS DECIMAL(38,0)) * {n_tot} "
               f"* 1000000) div (CAST(n_a AS DECIMAL(38,0)) * n_b) "
               f"AS BIGINT)").alias("lift_ppm"))


def cell_rules_sql(pts_sql: str, res: int, *,
                   min_users: int = 5) -> str:
    """DuckDB twin of cell_rules over a subquery producing
    (user_id, lat, lon) — same prune-first order, same floors."""
    from ..functions.cells import cell_encode_sql
    cell = cell_encode_sql("lat", "lon", res)
    return f"""
WITH cr_v AS (SELECT DISTINCT user_id AS u, {cell} AS c
              FROM ({pts_sql})),
cr_f AS (SELECT c, COUNT(*) AS n_c FROM cr_v GROUP BY 1
         HAVING COUNT(*) >= {int(min_users)}),
cr_n AS (SELECT COUNT(DISTINCT u) AS n FROM cr_v),
cr_fv AS (SELECT v.u, v.c, f.n_c FROM cr_v v JOIN cr_f f
          ON v.c = f.c),
cr_p AS (SELECT a.c AS cell_a, b.c AS cell_b, a.n_c AS n_a,
         b.n_c AS n_b, COUNT(*) AS n_ab
         FROM cr_fv a JOIN cr_fv b
         ON a.u = b.u AND a.c <> b.c
         GROUP BY 1, 2, 3, 4
         HAVING COUNT(*) >= {int(min_users)})
SELECT cell_a, cell_b, CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b, CAST(n_ab AS BIGINT) AS n_ab,
       CAST((n_ab * 1000000) // n AS BIGINT) AS support_ppm,
       CAST((n_ab * 1000000) // n_a AS BIGINT) AS conf_ppm,
       CAST((CAST(n_ab AS HUGEINT) * n * 1000000)
            // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS lift_ppm
FROM cr_p, cr_n
"""


def dwell_cells(points, res: int, *, user_col: str = "user_id",
                us_col: str = "us", tie_col: str = "event_id",
                lat_col: str = "lat", lon_col: str = "lon",
                max_gap_us: int = 6 * 3600 * 1_000_000):
    """Time-in-cell accounting — occupancy TIME, not event counts:
    each consecutive same-user event pair attributes its duration to
    the FIRST event's cell (the piecewise-constant position model
    every telecom/coverage dwell metric uses), gaps longer than
    ``max_gap_us`` are censored (the user unobserved, not parked),
    and cells report

        dwell_share_ppm = dwell_us * 1e6 div total_attributed_us

    exact BIGINT. Count-based rasters over-weight chatty sessions
    and under-weight long quiet stays; this is the correction — the
    difference between "where events happen" (cell_counts) and
    "where TIME is spent", which is what coverage, ad exposure and
    habitat-use analyses actually want.

    Scale: one (user)-keyed lead window + one cell-keyed combinable
    agg — the sessionize envelope; the censor threshold bounds any
    single attribution so one idle user cannot dominate a cell.
    -> (cell, n_intervals, dwell_us, dwell_share_ppm)."""
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode
    w = "(PARTITION BY _u ORDER BY _us, _tie)"
    d = (points.select(
            F.col(user_col).alias("_u"), F.col(us_col).alias("_us"),
            F.col(tie_col).alias("_tie"),
            cell_encode(lat_col, lon_col, res).alias("cell"))
         .withColumn("_nxt", F.expr(f"lead(_us) OVER {w}"))
         .withColumn("_dur", F.expr("_nxt - _us"))
         .filter(F.col("_nxt").isNotNull()
                 & (F.col("_dur") <= int(max_gap_us))))
    g = (d.groupBy("cell")
         .agg(F.count(F.lit(1)).alias("n_intervals"),
              F.sum("_dur").alias("dwell_us")))
    return (g.withColumn("_tot", F.expr("sum(dwell_us) OVER ()"))
            .select("cell", F.col("n_intervals").cast("long"),
                    F.col("dwell_us").cast("long"),
                    F.expr("(dwell_us * 1000000) div _tot")
                    .cast("long").alias("dwell_share_ppm")))


def dwell_cells_sql(pts_sql: str, res: int, *,
                    max_gap_us: int = 6 * 3600 * 1_000_000) -> str:
    """DuckDB twin of dwell_cells over a subquery producing
    (user_id, us, event_id, lat, lon) — same lead/censor text."""
    from ..functions.cells import cell_encode_sql
    cell = cell_encode_sql("lat", "lon", res)
    return f"""
WITH dw_d AS (SELECT user_id AS u, us, event_id, {cell} AS cell
              FROM ({pts_sql})),
dw_l AS (SELECT cell,
         LEAD(us) OVER (PARTITION BY u ORDER BY us, event_id) - us
           AS dur
         FROM dw_d),
dw_g AS (SELECT cell, COUNT(*) AS n_intervals, SUM(dur) AS dwell_us
         FROM dw_l WHERE dur IS NOT NULL AND dur <= {int(max_gap_us)}
         GROUP BY 1)
SELECT cell, CAST(n_intervals AS BIGINT) AS n_intervals,
       CAST(dwell_us AS BIGINT) AS dwell_us,
       CAST((dwell_us * 1000000) // SUM(dwell_us) OVER ()
            AS BIGINT) AS dwell_share_ppm
FROM dw_g
"""
