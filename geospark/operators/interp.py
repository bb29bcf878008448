"""Spatial interpolation: inverse-distance weighting over a kNN
neighborhood (SURVEY.md §2 round-5 additions).

IDW estimates a surface value at each query point as the
weight-averaged value of its k nearest observations, weight 1/d. The
whole estimate is computed in INTEGER arithmetic so both engines agree
bit-for-bit with no float-summation order dependence:

  d_int = floor(sqdist * 2^20)      -- sqdist is the kNN join's
                                       IEEE-exact squared-degrees
                                       double; x * 2^20 and floor are
                                       both exact, so d_int is
                                       engine-identical
  w     = W_SCALE div (d_int + 1)   -- integer weights, zero-distance
                                       safe
  est   = sum(w*v) div sum(w)       -- BIGINT sums: accumulation-order
                                       independent (the float version
                                       is not); v must be nonnegative
                                       so truncating div (Spark) ==
                                       flooring div (DuckDB)

Overflow headroom: w <= W_SCALE (1e9), so with values below ~1e6 and
k in the hundreds the sum stays under 2^63.

Scale shape: one groupBy keyed by query id over k·|queries| neighbor
rows — the aggregation is map-side combinable and the heavy lifting
(candidate generation, ring expansion) already happened inside
knn_join.
"""

from __future__ import annotations

W_SCALE = 10**9
D_SCALE = 1 << 20


def idw_estimate(neighbors, *, query_col: str = "query_id",
                 val_col: str = "v_int", sqdist_col: str = "sqdist"):
    """Aggregate a kNN neighbor table (query, value, sqdist) into one
    integer IDW estimate per query. ``val_col`` must be a nonnegative
    BIGINT (shift-scale upstream). -> (query_col, idw_v, w_sum)."""
    from pyspark.sql import functions as F
    w = F.expr(f"{W_SCALE} div "
               f"(CAST(floor({sqdist_col} * {D_SCALE}) AS BIGINT) + 1)")
    return (neighbors.groupBy(query_col)
            .agg(F.sum(w * F.col(val_col)).alias("_wv"),
                 F.sum(w).alias("_w"))
            .select(query_col,
                    F.expr("_wv div _w").alias("idw_v"),
                    F.col("_w").alias("w_sum")))


def idw_estimate_sql(neighbors_sql: str, *, query_col: str = "query_id",
                     val_col: str = "v_int",
                     sqdist_col: str = "sqdist") -> str:
    """DuckDB twin of idw_estimate over a subquery producing
    (``query_col``, ``val_col``, ``sqdist_col``) — identical integer
    weight arithmetic ('//' == Spark's `div` because every operand is
    nonnegative)."""
    w = (f"({W_SCALE} // "
         f"(CAST(floor({sqdist_col} * {D_SCALE}) AS BIGINT) + 1))")
    return (f"SELECT {query_col}, "
            f"CAST(CAST(SUM({w} * {val_col}) AS BIGINT) "
            f"// CAST(SUM({w}) AS BIGINT) AS BIGINT) AS idw_v, "
            f"CAST(SUM({w}) AS BIGINT) AS w_sum "
            f"FROM ({neighbors_sql}) GROUP BY {query_col}")
