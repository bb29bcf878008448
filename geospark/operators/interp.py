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


# ---------------------------------------------------------------------------
# areal interpolation: envelope-weighted measure reapportionment
# ---------------------------------------------------------------------------
#
# The classic GIS re-aggregation step (population on census zones ->
# population on grid tiles): each source polygon's measure is split
# across the target polygons it intersects in proportion to
# overlap_area / source_area. Weights come from the ENVELOPES of the
# two geometries — exact for axis-aligned boxes (the synthetic-zone
# case and most web-geo tiling), the standard first-moment
# approximation for general polygons (swap the weight kernel for exact
# polygon clipping where GEOS is available).
#
# Integer-exactness: the weight is a double, but it is derived from
# envelope bounds that both engines compute bit-identically (WKT
# encodes shortest-roundtrip decimal strings; IEEE ops on the parsed
# doubles are deterministic), and each pair's contribution is floored
# to parts-per-million BEFORE the sum — so the aggregate is a BIGINT
# sum, independent of accumulation order, and hash-exact cross-engine.
#
# Scale shape: candidate pairs come from spatial_join_polygons (cell
# equi-join + pair dedup, both equi-keyed); envelopes are computed in
# one vectorized pass per side table (aggregate-sized for zones);
# the final agg is keyed by target id and map-side combinable.

PPM = 1_000_000


def areal_interp(src, tgt, *, res: int | None = None,
                 src_id: str = "src_id", tgt_id: str = "tgt_id",
                 val_col: str = "v_int",
                 src_geom: str = "geom_wkb", tgt_geom: str = "geom_wkb"):
    """Apportion ``src``'s integer measure onto ``tgt`` polygons by
    envelope-overlap fraction -> (tgt_id, v_ppm, n_src). ``v_ppm`` is
    the apportioned measure in millionths (floor per contribution)."""
    from pyspark.sql import functions as F

    from ..functions.geometry import st_envelope
    from .joins import spatial_join_polygons

    pairs = spatial_join_polygons(src, tgt, res=res,
                                  l_id=src_id, l_geom=src_geom,
                                  r_id=tgt_id, r_geom=tgt_geom)
    se = src.select(
        F.col(src_id),
        F.col(val_col).alias("_v"),
        st_envelope(F.col(src_geom)).alias("_se"))
    se = se.select(src_id, "_v",
                   F.col("_se.xmin").alias("_sx0"),
                   F.col("_se.ymin").alias("_sy0"),
                   F.col("_se.xmax").alias("_sx1"),
                   F.col("_se.ymax").alias("_sy1"))
    te = tgt.select(
        F.col(tgt_id),
        st_envelope(F.col(tgt_geom)).alias("_te"))
    te = te.select(tgt_id,
                   F.col("_te.xmin").alias("_tx0"),
                   F.col("_te.ymin").alias("_ty0"),
                   F.col("_te.xmax").alias("_tx1"),
                   F.col("_te.ymax").alias("_ty1"))
    j = pairs.join(se, src_id).join(te, tgt_id)
    # expression order mirrors areal_interp_sql token for token: the
    # doubles must be bit-identical cross-engine before the floor
    ow = F.greatest(F.lit(0.0),
                    F.least("_sx1", "_tx1") - F.greatest("_sx0", "_tx0"))
    oh = F.greatest(F.lit(0.0),
                    F.least("_sy1", "_ty1") - F.greatest("_sy0", "_ty0"))
    frac = (ow * oh) / ((F.col("_sx1") - F.col("_sx0"))
                        * (F.col("_sy1") - F.col("_sy0")))
    contrib = F.floor(F.col("_v") * frac * F.lit(float(PPM))).cast("long")
    return (j.groupBy(tgt_id)
            .agg(F.sum(contrib).alias("v_ppm"),
                 F.count(F.lit(1)).alias("n_src")))


def areal_interp_sql(pairs_sql: str, src_sql: str, tgt_sql: str, *,
                     src_id: str = "src_id", tgt_id: str = "tgt_id",
                     val_col: str = "v_int") -> str:
    """DuckDB twin. ``pairs_sql`` -> (src_id, tgt_id); ``src_sql`` ->
    (src_id, val_col, sx0, sy0, sx1, sy1); ``tgt_sql`` -> (tgt_id,
    tx0, ty0, tx1, ty1). Identical weight arithmetic, floored to ppm
    per pair before the BIGINT sum."""
    ow = "greatest(0.0, least(sx1, tx1) - greatest(sx0, tx0))"
    oh = "greatest(0.0, least(sy1, ty1) - greatest(sy0, ty0))"
    frac = f"({ow} * {oh}) / ((sx1 - sx0) * (sy1 - sy0))"
    return (f"SELECT {tgt_id}, "
            f"CAST(SUM(CAST(floor({val_col} * {frac} * {float(PPM)}) "
            f"AS BIGINT)) AS BIGINT) AS v_ppm, "
            f"COUNT(*) AS n_src "
            f"FROM ({pairs_sql}) "
            f"JOIN ({src_sql}) USING ({src_id}) "
            f"JOIN ({tgt_sql}) USING ({tgt_id}) "
            f"GROUP BY {tgt_id}")


def idw_loocv(points, res: int, *, lat_col: str = "lat",
              lon_col: str = "lon"):
    """Leave-one-out cross-validation of ring-2 IDW smoothing over
    the occupied raster — "how well does this surface actually
    interpolate", the honesty check idw_interp's fitted surface
    can't provide about itself: every occupied cell is predicted
    from its Chebyshev ring-2 NEIGHBORS ONLY (self excluded — the
    LOO fold), and the absolute error lands next to the truth.
    Integer-exact by the lcm trick: ring-2 squared distances can
    only be {1, 2, 4, 5, 8} (lon wraps, lat clamps — the cell-family
    convention), whose lcm is 40, so inverse-distance weights are
    the EXACT integers 40 div d2 in {40, 20, 10, 8, 5} and

        pred = sum(w * v) div sum(w)

    needs no float anywhere. Cells with no ring-2 neighbor drop
    (nothing to predict from — reported by absence, the gap-week
    convention). A pipeline reads the err distribution before
    trusting idw_interp's surface at unsampled cells.

    Scale: one point-level cell shuffle; the 24x ring explode and
    the prediction agg run on the occupied AGGREGATE frame keyed by
    target cell. -> (cell, v_true, pred, abs_err)."""
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode, cell_neighbors_explode
    n = 1 << res
    mask = n - 1
    cnt = (points
           .select(cell_encode(lat_col, lon_col, res).alias("cell"))
           .groupBy("cell").agg(F.count(F.lit(1)).alias("v")))
    src = cnt.select(F.col("cell").alias("_src"),
                     F.col("v").alias("_vs"))
    nb = (cell_neighbors_explode(
        src.withColumnRenamed("_src", "cell"), res, ring=2,
        cell_col="cell")
        .select(F.col("_neighbor").alias("cell"),
                F.col("cell").alias("_src"), "_vs"))
    j = (nb.join(cnt, "cell")
         .filter(F.col("_src") != F.col("cell")))
    dx = (f"least(abs((cell & {mask}) - (_src & {mask})), "
          f"{n} - abs((cell & {mask}) - (_src & {mask})))")
    dy = f"abs(((cell >> {res}) & {mask}) - ((_src >> {res}) & {mask}))"
    d2 = f"({dx} * {dx} + {dy} * {dy})"
    w = f"(40 div {d2})"
    pred = (j.groupBy("cell", "v")
            .agg(F.sum(F.expr(f"{w} * _vs")).alias("_num"),
                 F.sum(F.expr(w)).alias("_den")))
    return pred.select(
        "cell", F.col("v").cast("long").alias("v_true"),
        F.expr("_num div _den").cast("long").alias("pred"),
        F.expr("abs(v - (_num div _den))").cast("long")
        .alias("abs_err"))


def idw_loocv_sql(pts_sql: str, res: int) -> str:
    """DuckDB twin of idw_loocv — same wrap/clamp ring-2 adjacency,
    same lcm-40 integer weights, same floor."""
    from ..functions.cells import cell_encode_sql
    n = 1 << res
    mask = n - 1
    cell = cell_encode_sql("lat", "lon", res)
    ax, bx = f"(a.cell & {mask})", f"(b.cell & {mask})"
    ay, by = (f"((a.cell >> {res}) & {mask})",
              f"((b.cell >> {res}) & {mask})")
    dx = f"least(abs({ax} - {bx}), {n} - abs({ax} - {bx}))"
    dy = f"abs({ay} - {by})"
    d2 = f"({dx} * {dx} + {dy} * {dy})"
    return f"""
WITH lv_c AS (SELECT cell, COUNT(*) AS v FROM
              (SELECT {cell} AS cell FROM ({pts_sql})) GROUP BY 1),
lv_j AS (SELECT b.cell, b.v,
         SUM((40 // {d2}) * a.v) AS num,
         SUM(40 // {d2}) AS den
         FROM lv_c a JOIN lv_c b
         ON a.cell <> b.cell AND {dx} <= 2 AND {dy} <= 2
         GROUP BY 1, 2)
SELECT cell, CAST(v AS BIGINT) AS v_true,
       CAST(num // den AS BIGINT) AS pred,
       CAST(abs(v - (num // den)) AS BIGINT) AS abs_err
FROM lv_j
"""
