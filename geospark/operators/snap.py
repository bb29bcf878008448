"""Map-matching lite: snap points to the nearest polyline segment.

The geocoding/telemetry primitive over a road (or coastline, or
administrative-boundary) edge list: every point gets the id of its
nearest segment, the clamped projection parameter t, the snapped
coordinate, and the squared distance. Closed-form point-to-segment
projection — no iteration, no UDF, pure column arithmetic.

Plan shape (scale-first):
  * the segment table is the small side (a planet road network is
    ~10^8 edges; per-region working sets are far smaller) — it is
    BROADCAST, so the pts x segs expansion happens map-side with no
    shuffle of the fact table;
  * the per-point argmin is ONE struct MIN aggregation
    (lexicographic over (d2, seg_id, ...)) — map-side combinable, so
    the only shuffle carries one candidate row per point, not the
    |pts| x |segs| expansion (a window/ROW_NUMBER plan would shuffle
    the whole expansion; the oracle twin uses that shape because it
    never needs to scale);
  * for networks too big to broadcast, pre-bucket both sides by cell
    (the kNN ring machinery) and run this per bucket — the math here
    is unchanged.

Determinism: the nearest segment is chosen by MIN over
(d2, seg_id, ...) so exact distance ties break on the lower segment
id; d2/t/sx/sy are IEEE doubles computed with the same expression
shape as the SQL twin, hence bit-identical cross-engine.

Degenerate (zero-length) segments are treated as points: t = 0.
"""

from __future__ import annotations


def snap_points(pts, segs, *, pt_id: str = "pt_id",
                x_col: str = "x", y_col: str = "y",
                seg_id: str = "seg_id", carry: tuple = ()):
    """-> (pt_id, *carry, seg_id, t, sx, sy, d2): nearest segment per
    point. ``segs`` must carry (seg_id, x0, y0, x1, y1) and be small
    enough to broadcast (see module docstring for the bucketed
    alternative). ``carry`` columns are functionally dependent on
    pt_id and ride the argmin group keys — cheaper than a join-back
    against the fact table to recover them (route_legs uses this for
    user/timestamp)."""
    from pyspark.sql import functions as F

    j = pts.select(F.col(pt_id), *[F.col(c) for c in carry],
                   F.col(x_col).alias("_px"),
                   F.col(y_col).alias("_py")) \
        .crossJoin(F.broadcast(segs.select(
            F.col(seg_id), F.col("x0"), F.col("y0"),
            F.col("x1"), F.col("y1"))))
    dx = F.col("x1") - F.col("x0")
    dy = F.col("y1") - F.col("y0")
    len2 = dx * dx + dy * dy
    t_raw = ((F.col("_px") - F.col("x0")) * dx
             + (F.col("_py") - F.col("y0")) * dy) / len2
    t = F.when(len2 == F.lit(0.0), F.lit(0.0)) \
        .otherwise(F.greatest(F.lit(0.0), F.least(F.lit(1.0), t_raw)))
    sx = F.col("x0") + t * dx
    sy = F.col("y0") + t * dy
    ex = F.col("_px") - sx
    ey = F.col("_py") - sy
    d2 = ex * ex + ey * ey
    cand = j.select(F.col(pt_id), *[F.col(c) for c in carry],
                    F.struct(d2.alias("d2"),
                             F.col(seg_id).alias(seg_id),
                             t.alias("t"),
                             sx.alias("sx"),
                             sy.alias("sy")).alias("_c"))
    best = cand.groupBy(pt_id, *carry).agg(F.min("_c").alias("_b"))
    return best.select(pt_id, *carry,
                       F.col(f"_b.{seg_id}").alias(seg_id),
                       F.col("_b.t").alias("t"),
                       F.col("_b.sx").alias("sx"),
                       F.col("_b.sy").alias("sy"),
                       F.col("_b.d2").alias("d2"))


def snap_points_sql(pts_sql: str, segs_sql: str, *,
                    pt_id: str = "pt_id", x_col: str = "x",
                    y_col: str = "y", seg_id: str = "seg_id") -> str:
    """DuckDB twin: same projection arithmetic, argmin via
    ROW_NUMBER ordered by (d2, seg_id). ``pts_sql`` -> (pt_id, x, y);
    ``segs_sql`` -> (seg_id, x0, y0, x1, y1)."""
    dx, dy = "(x1 - x0)", "(y1 - y0)"
    len2 = f"({dx} * {dx} + {dy} * {dy})"
    t_raw = (f"((({x_col}) - x0) * {dx} + (({y_col}) - y0) * {dy}) "
             f"/ {len2}")
    t = (f"CASE WHEN {len2} = 0.0 THEN 0.0 "
         f"ELSE greatest(0.0, least(1.0, {t_raw})) END")
    return f"""
WITH cand AS (
  SELECT p.{pt_id}, s.{seg_id},
         {t} AS t,
         x0 + {t} * {dx} AS sx,
         y0 + {t} * {dy} AS sy
  FROM ({pts_sql}) p CROSS JOIN ({segs_sql}) s),
scored AS (
  SELECT c.{pt_id}, c.{seg_id}, c.t, c.sx, c.sy,
         ((p.{x_col}) - c.sx) * ((p.{x_col}) - c.sx)
         + ((p.{y_col}) - c.sy) * ((p.{y_col}) - c.sy) AS d2
  FROM cand c JOIN ({pts_sql}) p USING ({pt_id}))
SELECT {pt_id}, {seg_id}, t, sx, sy, d2 FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY {pt_id}
            ORDER BY d2, {seg_id}) AS rk FROM scored)
WHERE rk = 1
"""


def route_legs(pts, segs, *, user_col: str = "user_id",
               us_col: str = "us", tie_col: str = "event_id",
               x_col: str = "x", y_col: str = "y",
               seg_id: str = "seg_id", min_trips: int = 1):
    """Road-network transition matrix — the map-matching step after
    snapping: each event snaps to its nearest segment (snap_points'
    clamped projection, broadcast segs), each user's snapped stream
    orders by (us, tie), and consecutive DIFFERENT-segment pairs
    count as legs -> (seg_from, seg_to, n_trips). Self-transitions
    (consecutive events on the same segment) are dwell, not movement,
    and are dropped; the routing / congestion OD matrix over the road
    graph, the segment-level sibling of od_matrix's cell trips.

    Scale shape: the snap's argmin carries (user, us) in its group
    keys (functionally dependent on the event id — no join-back
    against the fact table), then ONE user-keyed window and ONE
    (from, to)-keyed count with map-side combine."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    snapped = snap_points(
        pts, segs, pt_id=tie_col, x_col=x_col, y_col=y_col,
        seg_id=seg_id, carry=(user_col, us_col))
    w = Window.partitionBy(user_col).orderBy(us_col, tie_col)
    h = (snapped.withColumn("_prev", F.lag(seg_id).over(w))
         .filter(F.col("_prev").isNotNull()
                 & (F.col("_prev") != F.col(seg_id))))
    return (h.groupBy(F.col("_prev").alias("seg_from"),
                      F.col(seg_id).alias("seg_to"))
            .agg(F.count(F.lit(1)).alias("n_trips"))
            .filter(F.col("n_trips") >= min_trips))


def route_legs_sql(pts_sql: str, segs_sql: str, *,
                   seg_id: str = "seg_id",
                   min_trips: int = 1) -> str:
    """DuckDB twin of route_legs over subqueries producing
    (user_id, us, event_id, x, y) and (seg_id, x0, y0, x1, y1) —
    snap_points_sql's argmin, then the same lag/count."""
    snap = snap_points_sql(
        f"SELECT event_id AS pt_id, x, y FROM ({pts_sql})",
        segs_sql, seg_id=seg_id)
    return f"""
WITH snapped AS (SELECT pt_id, {seg_id} FROM ({snap}) s),
j AS (SELECT p.user_id, p.us, p.event_id, s.{seg_id}
      FROM ({pts_sql}) p JOIN snapped s ON p.event_id = s.pt_id),
h AS (SELECT user_id, {seg_id},
      LAG({seg_id}) OVER (PARTITION BY user_id
                          ORDER BY us, event_id) AS prev
      FROM j)
SELECT prev AS seg_from, {seg_id} AS seg_to, COUNT(*) AS n_trips
FROM h WHERE prev IS NOT NULL AND prev <> {seg_id}
GROUP BY 1, 2 HAVING COUNT(*) >= {min_trips}
"""
