"""Tiling: raster<->vector per-cell aggregation (SURVEY.md §2.2 tiling).

A "raster" here is a per-cell aggregate table at resolution r (the
discrete grid = raster); "vector tiles" attach the cell's polygon
boundary. Rollup across resolutions is exact integer parent arithmetic
(cells.cell_parent), so multi-resolution pyramids are plain groupBys —
partial aggregation (map-side combine) applies, and no UDF appears in
the plan until the optional boundary materialization.
"""

from __future__ import annotations

from ..functions.cells import cell_encode, cell_parent


def tile_counts(points, res: int, *, lat_col: str = "lat",
                lon_col: str = "lon", extra_keys: list[str] | None = None,
                agg_exprs: dict | None = None):
    """points -> per-cell aggregates at resolution ``res``.
    Default aggregate: n_docs count. extra_keys e.g. ["lang"]."""
    from pyspark.sql import functions as F
    keys = ["cell"] + (extra_keys or [])
    df = points.withColumn("cell", cell_encode(lat_col, lon_col, res))
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for name, expr in (agg_exprs or {}).items():
        aggs.append(expr.alias(name))
    return df.groupBy(*keys).agg(*aggs)


def rollup_tiles(tiles, child_res: int, steps: int = 1,
                 count_col: str = "n_docs",
                 extra_keys: list[str] | None = None):
    """Per-cell table at child_res -> parent resolution. Pure integer
    parent arithmetic + sum: re-aggregation without touching raw data
    (the raster pyramid path)."""
    from pyspark.sql import functions as F
    keys = ["cell"] + (extra_keys or [])
    return (tiles
            .withColumn("cell", cell_parent("cell", child_res, steps))
            .groupBy(*keys)
            .agg(F.sum(count_col).alias(count_col)))


def tile_boundaries(tiles, res: int):
    """Attach the cell polygon (vector tile geometry) as WKT — exact
    inverse arithmetic of cell_encode, pure column expressions."""
    from pyspark.sql import functions as F
    n = 1 << res
    mask = n - 1
    x = F.col("cell").bitwiseAND(F.lit(mask)).cast("double")
    y = F.shiftright(F.col("cell"), res).bitwiseAND(F.lit(mask)) \
        .cast("double")
    lon0 = x / n * 360.0 - 180.0
    lon1 = (x + 1) / n * 360.0 - 180.0
    lat0 = y / n * 180.0 - 90.0
    lat1 = (y + 1) / n * 180.0 - 90.0
    wkt = F.concat(
        F.lit("POLYGON (("),
        lon0.cast("string"), F.lit(" "), lat0.cast("string"), F.lit(", "),
        lon1.cast("string"), F.lit(" "), lat0.cast("string"), F.lit(", "),
        lon1.cast("string"), F.lit(" "), lat1.cast("string"), F.lit(", "),
        lon0.cast("string"), F.lit(" "), lat1.cast("string"), F.lit(", "),
        lon0.cast("string"), F.lit(" "), lat0.cast("string"),
        F.lit("))"))
    return (tiles.withColumn("lon_min", lon0).withColumn("lat_min", lat0)
                 .withColumn("lon_max", lon1).withColumn("lat_max", lat1)
                 .withColumn("boundary_wkt", wkt))


def top_k_cells(tiles, k: int, count_col: str = "n_docs"):
    """Densest cells, deterministic tiebreak on cell id."""
    from pyspark.sql import functions as F
    return tiles.orderBy(F.col(count_col).desc(), F.col("cell").asc()) \
                .limit(k)
