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
