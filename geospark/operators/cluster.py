"""Grid-density clustering: DBSCAN over the cell raster.

The PostGIS/GEOS surface this fills in: ``ST_ClusterDBSCAN`` — the
reference's GeoArrow columns feed GEOS-side clustering in downstream
consumers (geoarrow_geos.h exposes the buffers, not the algorithm), so
the Spark-native engine supplies the algorithm itself, grid-quantized
the way every distributed DBSCAN is (the eps ball becomes the 8-cell
Chebyshev neighborhood at a chosen resolution):

  1. quantize points to cells at ``res``  — map-only column math;
  2. per-cell counts                      — ONE shuffle keyed by cell,
                                            map-side combinable;
  3. core cells = count >= minpts         — density filter on the
                                            aggregate rows (|cells| <<
                                            |points|);
  4. edges between Chebyshev-adjacent core cells — k-ring explode of
     the CORE AGGREGATE rows joined back against the core-cell set
     (both sides tiny relative to the input; lon wraps, lat clamps,
     exactly cell_neighbors_explode's contract);
  5. connected components over the core-cell graph (minlabel, the
     dedup CC machinery) — cluster id = min cell id in the component.

Scale shape: the only full-data pass is step 2's count shuffle; every
later stage runs on core-cell aggregates (at res 12 the whole planet
has <= 2^24 x 2^24 cells but web-corpus occupancy is bounded by the
point count, and core cells are a further density-filtered subset).
CC inherits connected_components' materialize() plan truncation and
its 'star' O(log n) fallback for adversarial chain graphs.

Determinism: cluster_id = MIN cell id reachable — integer bit math
end to end, no floats anywhere past quantization, so the DuckDB twin
(recursive-CTE transitive closure) is hash-exact.
"""

from __future__ import annotations

from ..functions.cells import _RES_SHIFT  # noqa: F401 (shared layout)


def dbscan_core_cells(pts, res: int, minpts: int, *,
                      lat_col: str = "lat", lon_col: str = "lon"):
    """(lat, lon) points -> (cell, n_pts) core-cell table at ``res``:
    the density filter half of grid-DBSCAN, reusable standalone (e.g.
    as a hot-cell mask). One count shuffle; output is aggregate-sized."""
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode
    return (pts
            .select(cell_encode(lat_col, lon_col, res).alias("cell"))
            .groupBy("cell").agg(F.count("*").alias("n_pts"))
            .filter(F.col("n_pts") >= minpts))


def dbscan_cells(pts, res: int, minpts: int, *,
                 lat_col: str = "lat", lon_col: str = "lon",
                 max_iters: int = 20, algorithm: str = "minlabel"):
    """Grid-DBSCAN: -> (cell, n_pts, cluster_id) for every core cell,
    cluster_id = minimum cell id in the 8-adjacency-connected run of
    core cells (longitude wraps across the antimeridian; latitude
    clamps at the poles — no polar wrap, matching the k-ring
    primitive). Non-core cells are noise and are not emitted.

    ``algorithm``/``max_iters`` pass through to connected_components
    (minlabel converges in component-diameter rounds; 'star' is the
    O(log n) fallback; both raise instead of returning partial labels).
    """
    from pyspark.sql import functions as F

    from ..functions.cells import cell_neighbors_explode
    from .dedup import connected_components

    core = dbscan_core_cells(pts, res, minpts,
                             lat_col=lat_col, lon_col=lon_col)
    # Edge list over aggregate rows: explode each core cell's ring-1
    # neighborhood, keep the neighbors that are themselves core. The
    # join is keyed by cell id on both sides; the core set is small
    # enough that AQE broadcasts it in practice, and at adversarial
    # densities it degrades to a well-keyed shuffle join, never a
    # cartesian product.
    nbrs = (cell_neighbors_explode(core.select("cell"), res, ring=1)
            .filter(F.col("_neighbor") != F.col("cell"))
            .select(F.col("cell").alias("u"),
                    F.col("_neighbor").alias("v")))
    edges = nbrs.join(core.select(F.col("cell").alias("v")), "v")
    labels = connected_components(edges, a_col="u", b_col="v",
                                  max_iters=max_iters,
                                  algorithm=algorithm) \
        .select(F.col("doc_id").alias("cell"),
                F.col("cluster_id"))
    # Singleton core cells (no core neighbor) never enter the edge
    # set; they are their own cluster.
    return (core.join(labels, "cell", "left")
            .select("cell", "n_pts",
                    F.coalesce("cluster_id", "cell").alias("cluster_id")))


def dbscan_cells_sql(pts_cte: str, res: int, minpts: int) -> str:
    """DuckDB twin: per-cell counts + density filter, self-join
    adjacency (x wraps mod 2^res via least(|dx|, n-|dx|), y plain |dy|
    because latitude clamps), recursive-CTE transitive closure with
    cluster id = LEAST(self, MIN(reachable)). ``pts_cte`` must yield
    (lat, lon) rows."""
    n = 1 << res
    mask = n - 1
    cell = (f"(CAST({res} AS BIGINT) << {_RES_SHIFT}) "
            f"| (CAST(least(greatest(floor((lat + 90.0) / 180.0 * {n}), "
            f"0), {n - 1}) AS BIGINT) << {res}) "
            f"| CAST(least(greatest(floor((lon + 180.0) / 360.0 * {n}), "
            f"0), {n - 1}) AS BIGINT)")
    ax, bx = f"(a.cell & {mask})", f"(b.cell & {mask})"
    ay, by = f"((a.cell >> {res}) & {mask})", f"((b.cell >> {res}) & {mask})"
    return f"""
WITH RECURSIVE counts AS (
  SELECT {cell} AS cell, COUNT(*) AS n_pts
  FROM ({pts_cte}) GROUP BY 1),
core AS (SELECT cell, n_pts FROM counts WHERE n_pts >= {minpts}),
edges AS (
  SELECT a.cell AS u, b.cell AS v FROM core a JOIN core b
  ON a.cell <> b.cell
  AND abs({ay} - {by}) <= 1
  AND least(abs({ax} - {bx}), {n} - abs({ax} - {bx})) <= 1),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
lbl AS (SELECT u AS cell, LEAST(u, MIN(v)) AS cluster_id
        FROM reach GROUP BY u)
SELECT c.cell, c.n_pts, COALESCE(l.cluster_id, c.cell) AS cluster_id
FROM core c LEFT JOIN lbl l USING (cell)
"""
