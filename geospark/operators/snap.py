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


def corridor_join(pts, segs, eps_udeg: int, *, res: int = 4,
                  pt_id: str = "pt_id", x_col: str = "x",
                  y_col: str = "y", seg_id: str = "seg_id"):
    """Corridor (within-distance-of-polyline) join — the buffer-zone
    spatial join snap_points' argmin can't express: ALL (point,
    segment) pairs whose planar micro-degree distance is <= eps, the
    "events near any road / cable / boundary edge" query. Unlike a
    geometric buffer-polygon + PIP plan there is NO polygon
    construction and NO float projection: the within-eps test is
    EXACT INTEGER arithmetic on the quantized lattice
    (floor(deg * 1e6), the pair_counts convention) —

        endpoint zones:  tnum <= 0  ->  |P-A|^2 <= eps^2
                         tnum >= len2 -> |P-B|^2 <= eps^2
        interior zone:   cross^2 <= eps^2 * len2

    (tnum = (P-A).(B-A), cross = (B-A) x (P-A); clearing the
    rational projection of its denominator keeps every comparison in
    integers — cross^2 reaches ~1e33 at antipodal spans, so the two
    interior products run in DECIMAL(38,0)/HUGEINT, never the
    output). The emitted `zone` ('a' / 'mid' / 'b') states which
    test fired, with exact-boundary ties resolved by the same
    half-open integer conditions in both engines. Degenerate
    (zero-length) segments take the endpoint-a test.

    Scale: each segment explodes over the grid cells of its
    eps-EXPANDED bbox at ``res`` (sequence explode over the same
    clamped monotone div lattice the points key on — a cell a
    matching point sits in can never be missed, the pair_counts ulp
    argument); points carry ONE cell, so the equi-join emits each
    candidate pair exactly once — no post-join dedup shuffle. Pick
    ``res`` so a typical segment+eps spans ~1-4 cells. The refine is
    a map-side expression. -> (pt_id, seg_id, zone)."""
    from pyspark.sql import functions as F
    n = 1 << res

    def q(col):
        return F.expr(f"CAST(floor({col} * 1000000.0) AS BIGINT)")

    def cx(e):
        return (f"(greatest(0, least(359999999, ({e}) + 180000000)) "
                f"* {n}) div 360000000")

    def cy(e):
        return (f"(greatest(0, least(179999999, ({e}) + 90000000)) "
                f"* {n}) div 180000000")

    p = pts.select(F.col(pt_id), q(x_col).alias("_px"),
                   q(y_col).alias("_py"))
    p = p.withColumn("_cell", F.expr(
        f"({cx('_px')}) * {n} + ({cy('_py')})"))
    s = segs.select(F.col(seg_id), q("x0").alias("_ax"),
                    q("y0").alias("_ay"), q("x1").alias("_bx"),
                    q("y1").alias("_by"))
    e = int(eps_udeg)
    cover = (s
             .withColumn("_gx", F.explode(F.expr(
                 f"sequence({cx(f'least(_ax, _bx) - {e}')}, "
                 f"{cx(f'greatest(_ax, _bx) + {e}')})")))
             .withColumn("_gy", F.explode(F.expr(
                 f"sequence({cy(f'least(_ay, _by) - {e}')}, "
                 f"{cy(f'greatest(_ay, _by) + {e}')})")))
             .withColumn("_cell",
                         F.col("_gx") * n + F.col("_gy")))
    j = cover.join(p, "_cell")
    dx = "CAST(_bx - _ax AS DECIMAL(38,0))"
    dy = "CAST(_by - _ay AS DECIMAL(38,0))"
    len2 = f"({dx} * {dx} + {dy} * {dy})"
    tnum = f"((_px - _ax) * (_bx - _ax) + (_py - _ay) * (_by - _ay))"
    cross = (f"(CAST(_bx - _ax AS DECIMAL(38,0)) * (_py - _ay) "
             f"- CAST(_by - _ay AS DECIMAL(38,0)) * (_px - _ax))")
    d2a = "((_px - _ax) * (_px - _ax) + (_py - _ay) * (_py - _ay))"
    d2b = "((_px - _bx) * (_px - _bx) + (_py - _by) * (_py - _by))"
    zone = (f"CASE WHEN {len2} = 0 OR {tnum} <= 0 THEN "
            f"  CASE WHEN {d2a} <= {e * e} THEN 'a' END "
            f"WHEN {tnum} >= {len2} THEN "
            f"  CASE WHEN {d2b} <= {e * e} THEN 'b' END "
            f"WHEN {cross} * {cross} <= "
            f"  CAST({e * e} AS DECIMAL(38,0)) * {len2} THEN 'mid' "
            f"END")
    return (j.withColumn("_zone", F.expr(zone))
            .filter(F.col("_zone").isNotNull())
            .select(pt_id, seg_id, F.col("_zone").alias("zone")))


def corridor_join_sql(pts_sql: str, segs_sql: str, eps_udeg: int, *,
                      pt_id: str = "pt_id",
                      seg_id: str = "seg_id") -> str:
    """DuckDB twin of corridor_join — brute-force pts x segs (oracle
    scale; the cell cover is the scale path), identical integer zone
    predicate in HUGEINT. ``pts_sql`` -> (pt_id, x, y); ``segs_sql``
    -> (seg_id, x0, y0, x1, y1)."""
    e = int(eps_udeg)
    len2 = ("(CAST(bx - ax AS HUGEINT) * (bx - ax) "
            "+ CAST(by - ay AS HUGEINT) * (by - ay))")
    tnum = ("(CAST(px - ax AS HUGEINT) * (bx - ax) "
            "+ CAST(py - ay AS HUGEINT) * (by - ay))")
    cross = ("(CAST(bx - ax AS HUGEINT) * (py - ay) "
             "- CAST(by - ay AS HUGEINT) * (px - ax))")
    d2a = ("(CAST(px - ax AS HUGEINT) * (px - ax) "
           "+ CAST(py - ay AS HUGEINT) * (py - ay))")
    d2b = ("(CAST(px - bx AS HUGEINT) * (px - bx) "
           "+ CAST(py - by AS HUGEINT) * (py - by))")
    return f"""
WITH cj_p AS (SELECT {pt_id},
    CAST(floor(x * 1000000.0) AS BIGINT) AS px,
    CAST(floor(y * 1000000.0) AS BIGINT) AS py
    FROM ({pts_sql})),
cj_s AS (SELECT {seg_id},
    CAST(floor(x0 * 1000000.0) AS BIGINT) AS ax,
    CAST(floor(y0 * 1000000.0) AS BIGINT) AS ay,
    CAST(floor(x1 * 1000000.0) AS BIGINT) AS bx,
    CAST(floor(y1 * 1000000.0) AS BIGINT) AS by
    FROM ({segs_sql})),
cj_z AS (SELECT {pt_id}, {seg_id},
    CASE WHEN {len2} = 0 OR {tnum} <= 0 THEN
      CASE WHEN {d2a} <= {e * e} THEN 'a' END
    WHEN {tnum} >= {len2} THEN
      CASE WHEN {d2b} <= {e * e} THEN 'b' END
    WHEN {cross} * {cross} <= CAST('{e * e}' AS HUGEINT) * {len2}
      THEN 'mid'
    END AS zone
    FROM cj_p, cj_s)
SELECT {pt_id}, {seg_id}, zone FROM cj_z WHERE zone IS NOT NULL
"""
