"""Ring validity: exact self-intersection detection for polygon rings
(SURVEY.md §2 round-5 additions; the ST_IsSimple/ST_IsValid family the
reference's GEOS substrate exposes upstream — geoarrow-c-geos itself
only encodes/decodes, so this is engine-new surface in the same domain).

A ring given as integer vertex arrays is SIMPLE iff no two
non-adjacent segments intersect (adjacent segments share an endpoint
by construction and are excluded; a non-adjacent touch — a spike — is
an intersection and makes the ring non-simple). The test is the
classic orientation/on-segment predicate (CLRS segments-intersect) in
pure BIGINT arithmetic: coordinates are integers, every cross product
is exact, there is no epsilon anywhere — so Spark and DuckDB agree
bit-for-bit by construction.

Both engines evaluate the SAME generated arithmetic: the pair
predicates are unrolled in Python once per (fixed) vertex count and
rendered twice — Spark `element_at(xs, k)` vs DuckDB `xs[k]` — exactly
the unrolled-codegen precedent of the ANN dot product. Unrolling keeps
the whole operator a single map-only projection (no lambda
interpretation, no UDF, no shuffle): at 100 TB this is a pure scan.
"""

from __future__ import annotations


def _cross(o, a, b) -> str:
    """Exact integer cross product sign term: (a-o) x (b-o)."""
    return (f"(({a[0]}-{o[0]})*({b[1]}-{o[1]})"
            f"-({a[1]}-{o[1]})*({b[0]}-{o[0]}))")


def _on_seg(p, q, r) -> str:
    """Given collinearity, is r within segment pq's bounding box."""
    return (f"(least({p[0]},{q[0]})<={r[0]} AND "
            f"{r[0]}<=greatest({p[0]},{q[0]}) AND "
            f"least({p[1]},{q[1]})<={r[1]} AND "
            f"{r[1]}<=greatest({p[1]},{q[1]}))")


def _seg_intersect(a, b, c, d) -> str:
    """Segments ab and cd intersect (proper or improper)."""
    d1, d2 = _cross(c, d, a), _cross(c, d, b)
    d3, d4 = _cross(a, b, c), _cross(a, b, d)
    proper = (f"((({d1}>0 AND {d2}<0) OR ({d1}<0 AND {d2}>0)) AND "
              f"(({d3}>0 AND {d4}<0) OR ({d3}<0 AND {d4}>0)))")
    return (f"({proper} OR ({d1}=0 AND {_on_seg(c, d, a)}) "
            f"OR ({d2}=0 AND {_on_seg(c, d, b)}) "
            f"OR ({d3}=0 AND {_on_seg(a, b, c)}) "
            f"OR ({d4}=0 AND {_on_seg(a, b, d)}))")


def crossings_expr(n: int, xs: str, ys: str, *,
                   dialect: str = "spark") -> str:
    """Unrolled n_crossings expression for a closed ring of exactly
    ``n`` vertices held in integer array columns ``xs``/``ys``: the
    number of intersecting non-adjacent segment pairs. Segment i runs
    vertex i -> (i+1) mod n; pairs (i, j) with j >= i+2 are tested,
    minus the (0, n-1) wrap adjacency."""
    if n < 4:
        return "0"

    def v(k):
        k = k % n
        if dialect == "spark":
            return (f"element_at({xs},{k + 1})",
                    f"element_at({ys},{k + 1})")
        return f"{xs}[{k + 1}]", f"{ys}[{k + 1}]"

    terms = []
    for i in range(n - 2):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue
            pred = _seg_intersect(v(i), v(i + 1), v(j), v(j + 1))
            terms.append(f"(CASE WHEN {pred} THEN 1 ELSE 0 END)")
    return "(" + "+".join(terms) + ")"


def ring_stats(df, xs_col: str, ys_col: str, n: int, *,
               id_cols: list[str] | None = None):
    """-> (id_cols..., n_crossings, is_simple) for fixed-size integer
    rings. Map-only projection; whole-stage codegen end to end."""
    from pyspark.sql import functions as F
    expr = crossings_expr(n, xs_col, ys_col, dialect="spark")
    out = df.select(
        *(id_cols or [c for c in df.columns
                      if c not in (xs_col, ys_col)]),
        F.expr(expr).cast("long").alias("n_crossings"))
    return out.withColumn("is_simple", F.col("n_crossings") == 0)


def ring_stats_sql(ring_sql: str, n: int, id_cols: str,
                   xs: str = "xs", ys: str = "ys") -> str:
    """DuckDB twin of ring_stats over a subquery producing
    (``id_cols``, xs, ys) — the identical generated arithmetic with
    list indexing instead of element_at."""
    expr = crossings_expr(n, xs, ys, dialect="duckdb")
    return (f"SELECT {id_cols}, CAST({expr} AS BIGINT) AS n_crossings, "
            f"({expr}) = 0 AS is_simple FROM ({ring_sql})")


def shoelace_expr(n: int, xs: str, ys: str, *,
                  dialect: str = "spark") -> str:
    """Unrolled signed doubled-area (shoelace) expression for a closed
    integer ring of exactly ``n`` vertices: sum of x_i*y_{i+1} -
    x_{i+1}*y_i with the wrap term included. Positive = counter-
    clockwise. Every term is exact BIGINT — no float area anywhere."""
    def v(k):
        k = k % n
        if dialect == "spark":
            return (f"element_at({xs},{k + 1})",
                    f"element_at({ys},{k + 1})")
        return f"{xs}[{k + 1}]", f"{ys}[{k + 1}]"

    terms = []
    for i in range(n):
        (x0, y0), (x1, y1) = v(i), v(i + 1)
        terms.append(f"({x0}*{y1}-{x1}*{y0})")
    return "(" + "+".join(terms) + ")"


def ring_area(df, xs_col: str, ys_col: str, n: int, *,
              id_cols: list[str] | None = None):
    """-> (id_cols..., area2, is_ccw): exact signed doubled area and
    winding orientation for fixed-size integer rings. area2 keeps the
    doubled integer (halving would need a fraction); orientation is
    its sign. Map-only projection like ring_stats."""
    from pyspark.sql import functions as F
    expr = shoelace_expr(n, xs_col, ys_col, dialect="spark")
    out = df.select(
        *(id_cols or [c for c in df.columns
                      if c not in (xs_col, ys_col)]),
        F.expr(expr).cast("long").alias("area2"))
    return out.withColumn("is_ccw", F.col("area2") > 0)


def ring_area_sql(ring_sql: str, n: int, id_cols: str,
                  xs: str = "xs", ys: str = "ys") -> str:
    """DuckDB twin of ring_area (identical unrolled shoelace)."""
    expr = shoelace_expr(n, xs, ys, dialect="duckdb")
    return (f"SELECT {id_cols}, CAST({expr} AS BIGINT) AS area2, "
            f"({expr}) > 0 AS is_ccw FROM ({ring_sql})")


def union_area(boxes, *, xmin: str = "xmin", ymin: str = "ymin",
               xmax: str = "xmax", ymax: str = "ymax"):
    """Exact union area of a rectangle set — "how much ground do all
    our geofences/coverings actually cover", overlaps counted ONCE
    (a plain SUM of widths*heights double-counts; at web scale box
    dims overlap heavily by construction). Classic slab
    decomposition, windowed: consecutive distinct x edges cut the
    plane into vertical slabs; per slab the covered y length is the
    interval-union sweep (sort by ymin, running max of ymax — covered
    += max(0, ymax - max(run_max_prev, ymin)), a pure window);
    area = sum(slab_width * covered_y). Integer coordinates in, so
    every step is exact BIGINT (micro-degree areas fit: 3.6e8 *
    1.8e8 = 6.5e16 < 2^63).

    Scale shape: the box table is a DIM (a covering / fence / zone
    set, aggregate-sized) — slabs are its own edges, the slab x box
    overlap join is broadcast, and the per-slab sweep is one
    slab-keyed window; nothing here touches a fact table. For 10^7+
    boxes, pre-partition slabs by x-range so each partition sweeps
    its own boxes. -> one row (area, n_slabs).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    b = boxes.select(F.col(xmin).cast("long").alias("x0"),
                     F.col(ymin).cast("long").alias("y0"),
                     F.col(xmax).cast("long").alias("x1"),
                     F.col(ymax).cast("long").alias("y1")) \
        .filter((F.col("x1") > F.col("x0"))
                & (F.col("y1") > F.col("y0")))
    edges = (b.select(F.col("x0").alias("e"))
             .unionByName(b.select(F.col("x1").alias("e")))
             .distinct())
    we = Window.orderBy("e")
    slabs = (edges.withColumn("_nx", F.lead("e").over(we))
             .filter(F.col("_nx").isNotNull())
             .select(F.col("e").alias("s0"),
                     F.col("_nx").alias("s1")))
    j = slabs.join(F.broadcast(b),
                   (F.col("x0") <= F.col("s0"))
                   & (F.col("x1") >= F.col("s1")))
    ws = (Window.partitionBy("s0")
          .orderBy(F.col("y0").asc(), F.col("y1").asc())
          .rowsBetween(Window.unboundedPreceding, -1))
    cov = (j.withColumn("_rm", F.max("y1").over(ws))
           .withColumn("_c", F.greatest(
               F.lit(0).cast("long"),
               F.col("y1") - F.greatest(
                   F.coalesce("_rm", F.col("y0")), F.col("y0")))))
    per = (cov.groupBy("s0", "s1")
           .agg(F.sum("_c").alias("_cy")))
    return per.agg(
        F.sum(F.expr("(s1 - s0) * _cy")).alias("area"),
        F.count(F.lit(1)).cast("long").alias("n_slabs"))


def union_area_sql(boxes_sql: str) -> str:
    """DuckDB twin of union_area over a subquery producing integer
    (xmin, ymin, xmax, ymax)."""
    return f"""
WITH b AS (SELECT CAST(xmin AS BIGINT) AS x0,
           CAST(ymin AS BIGINT) AS y0,
           CAST(xmax AS BIGINT) AS x1, CAST(ymax AS BIGINT) AS y1
           FROM ({boxes_sql}) WHERE xmax > xmin AND ymax > ymin),
edges AS (SELECT DISTINCT e FROM (
  SELECT x0 AS e FROM b UNION ALL SELECT x1 FROM b)),
slabs AS (SELECT e AS s0, LEAD(e) OVER (ORDER BY e) AS s1
          FROM edges),
j AS (SELECT s.s0, s.s1, b.y0, b.y1 FROM slabs s JOIN b
      ON b.x0 <= s.s0 AND b.x1 >= s.s1 WHERE s.s1 IS NOT NULL),
cov AS (SELECT s0, s1, y0, y1,
        MAX(y1) OVER (PARTITION BY s0 ORDER BY y0, y1
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS rm
        FROM j),
per AS (SELECT s0, s1,
        SUM(greatest(0, y1 - greatest(COALESCE(rm, y0), y0))) AS cy
        FROM cov GROUP BY 1, 2)
SELECT CAST(SUM((s1 - s0) * cy) AS BIGINT) AS area,
       COUNT(*) AS n_slabs
FROM per
"""
