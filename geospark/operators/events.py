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
