"""Per-group convex hull over integer lattice coordinates.

The classic GIS aggregate (``ST_ConvexHull`` over a GROUP BY) the
cell/tile machinery can't express: the minimal convex polygon around
each group's points. Everything runs on INTEGER coordinates (the
caller quantizes, e.g. micro-degrees) so every orientation test is an
exact int64 cross product — no epsilon, no float robustness bugs, and
the DuckDB oracle can replicate the decision with plain arithmetic.

Output convention: the SET of STRICT hull vertices (collinear
boundary points are not corners and are excluded; duplicates
deduped). A set — not a ring order — because the driver's comparison
is order-insensitive and the set is the robustness-sensitive part;
ring order is a deterministic O(h log h) angular sort the caller can
apply.

Scale shape (the two-phase hull): phase 1 computes a PARTIAL hull per
Arrow batch via ``mapInPandas`` — a strict vertex of the whole group
is a strict vertex of every subset containing it, so partial hulls
lose nothing while shrinking each batch's contribution to O(hull
size); phase 2 merges per group with ``applyInPandas`` (hull of
hulls). The only shuffle carries partial-hull vertices, not the point
cloud — at 10^12 points per group the exchange is O(partitions x h).
This is the documented Arrow-batched custom-operator path (most of
the engine is pure-JVM column math; a hull's while-loop isn't
expressible there, so it earns the Pandas tier).

Oracle (SQL-expressible without recursion, used by the `_sql` twin):
by Caratheodory in the plane, v is inside conv(S minus {v}) iff some
(a, b, c) triangle of other points contains it — so a point is a
strict hull vertex iff NO triangle of other points (degenerate ones
included) contains it. Containment is the classic same-sign cross
test, plus a bounding-box guard for the all-collinear-and-zero case
(v on the same line but OUTSIDE the segment must not count as
contained). O(n^4) per group — oracle-only; cap group sizes upstream.
"""

from __future__ import annotations


def _chain(xy):
    """Strict-vertex monotone chain over an (n, 2) int64 array.
    Returns the hull vertex array (m, 2); collinear boundary points
    and duplicates dropped; n <= 2 returns the distinct points."""
    import numpy as np
    xy = np.unique(xy, axis=0)          # dedup + lexsort
    n = len(xy)
    if n <= 2:
        return xy

    def half(pts):
        h = []
        for p in pts:
            while len(h) >= 2:
                ax, ay = h[-2]
                bx, by = h[-1]
                # strict left turn required to keep b
                if (bx - ax) * (p[1] - ay) - (by - ay) * (p[0] - ax) <= 0:
                    h.pop()
                else:
                    break
            h.append((int(p[0]), int(p[1])))
        return h[:-1]

    lower = half(xy)
    upper = half(xy[::-1])
    out = lower + upper
    if not out:                         # all collinear: endpoints
        out = [tuple(xy[0]), tuple(xy[-1])]
    import numpy as np
    return np.array(sorted(set(out)), dtype="int64")


def convex_hull(pts, *, group_col: str = "g", x_col: str = "x",
                y_col: str = "y"):
    """-> (group, x, y): the strict hull vertex set per group.
    Coordinates must be integers (quantize upstream)."""
    import pandas as pd
    from pyspark.sql import functions as F

    d = pts.select(F.col(group_col).alias("g"),
                   F.col(x_col).cast("long").alias("x"),
                   F.col(y_col).cast("long").alias("y"))
    schema = "g long, x long, y long"

    def _hull_frame(pdf):
        out = []
        for g, sub in pdf.groupby("g"):
            h = _chain(sub[["x", "y"]].to_numpy("int64"))
            out.append(pd.DataFrame(
                {"g": g, "x": h[:, 0], "y": h[:, 1]}))
        return (pd.concat(out) if out
                else pdf.iloc[:0][["g", "x", "y"]])

    def partial(it):
        for pdf in it:
            yield _hull_frame(pdf)

    part = d.mapInPandas(partial, schema)
    out = part.groupBy("g").applyInPandas(
        lambda pdf: _hull_frame(pdf), schema)
    return out.select(F.col("g").alias(group_col),
                      F.col("x").alias(x_col),
                      F.col("y").alias(y_col))


def convex_hull_sql(pts_sql: str, *, group_col: str = "g",
                    x_col: str = "x", y_col: str = "y") -> str:
    """DuckDB twin via the Caratheodory triangle test (module
    docstring). ``pts_sql`` -> (group, x, y) integer rows."""
    def cross(p, q, r):
        return (f"(({q}.x - {p}.x) * ({r}.y - {p}.y) "
                f"- ({q}.y - {p}.y) * ({r}.x - {p}.x))")
    d1, d2, d3 = (cross("a", "b", "v"), cross("b", "c", "v"),
                  cross("c", "a", "v"))
    return f"""
WITH hp AS (SELECT DISTINCT {group_col} AS g, CAST({x_col} AS BIGINT)
           AS x, CAST({y_col} AS BIGINT) AS y FROM ({pts_sql}))
SELECT v.g AS {group_col}, v.x AS {x_col}, v.y AS {y_col} FROM hp v
WHERE NOT EXISTS (
  SELECT 1 FROM hp a, hp b, hp c
  WHERE a.g = v.g AND b.g = v.g AND c.g = v.g
    AND NOT (a.x = v.x AND a.y = v.y)
    AND NOT (b.x = v.x AND b.y = v.y)
    AND NOT (c.x = v.x AND c.y = v.y)
    AND NOT (({d1} < 0 OR {d2} < 0 OR {d3} < 0)
             AND ({d1} > 0 OR {d2} > 0 OR {d3} > 0))
    AND ({d1} <> 0 OR {d2} <> 0 OR {d3} <> 0
         OR (v.x BETWEEN least(a.x, b.x, c.x)
                     AND greatest(a.x, b.x, c.x)
             AND v.y BETWEEN least(a.y, b.y, c.y)
                         AND greatest(a.y, b.y, c.y))))
"""
