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


# ---------------------------------------------------------------------------
# multi-source BFS hop labeling (discrete isochrone / coverage assignment)
# ---------------------------------------------------------------------------

def grid_reach(pts, res: int, max_hops: int, *,
               min_seed_pts: int | None = None, seeds=None,
               lat_col: str = "lat", lon_col: str = "lon"):
    """Hop-distance labeling over the OCCUPIED cell raster from a set
    of seed cells -> (cell, seed, hops): for every occupied cell
    reachable within ``max_hops`` 8-adjacency steps that never leave
    occupied cells, the shortest hop count to a seed and the winning
    seed (ties at equal hops -> MIN seed id). The discrete
    isochrone / nearest-facility primitive: closed-form Chebyshev
    distance does NOT apply because paths are constrained to occupied
    cells (coverage holes are obstacles), so this is true multi-source
    BFS shortest path over the cell graph.

    Seeds: either ``min_seed_pts`` (seeds = cells with count >= it,
    dbscan_core_cells' density rule — keeps the seed choice identical
    in the SQL twin) or an explicit ``seeds`` DataFrame with a `cell`
    column. Seeds that are not occupied cells are dropped (a path
    must start on the raster).

    Scale shape: ONE point-level shuffle (the distinct-cell count);
    every BFS round runs on aggregate-sized cell tables — frontier
    neighbor explode (9x frontier), equi-join against the occupied
    set, anti-join against visited (cell, seed) pairs. State is
    O(occupied_cells x seeds_within_range) pairs worst case; the
    bounds are ``max_hops`` (radius) and the seed density — both
    caller-owned knobs, and rounds are ``max_hops`` regardless of
    graph size. Per-round materialize() is the CC lesson: without
    lineage truncation Catalyst re-analyzes O(rounds^2) plans.

    Determinism: integer bit math end to end — hop levels are exact
    BFS distances per (cell, seed) pair (a pair is anti-joined out
    after first reach; longer rediscoveries can't lower its level),
    so the recursive-CTE twin's MIN(hops) per pair is hash-exact.
    """
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode, cell_neighbors_explode
    from ..materialize import materialize
    if (min_seed_pts is None) == (seeds is None):
        raise ValueError("exactly one of min_seed_pts / seeds")
    counts = (pts
              .select(cell_encode(lat_col, lon_col, res).alias("cell"))
              .groupBy("cell").agg(F.count("*").alias("n_pts")))
    occ = materialize(counts.select("cell"))
    if seeds is None:
        seeds = counts.filter(F.col("n_pts") >= min_seed_pts) \
                      .select("cell")
    pairs = materialize(
        seeds.join(occ, "cell")
             .select("cell", F.col("cell").alias("seed"),
                     F.lit(0).cast("int").alias("hops")))
    front = pairs
    for h in range(1, max_hops + 1):
        nbr = (cell_neighbors_explode(front.select("cell", "seed"),
                                      res, ring=1)
               .select(F.col("_neighbor").alias("cell"), "seed")
               .distinct())
        cand = (nbr.join(occ, "cell")
                .join(pairs.select("cell", "seed"),
                      ["cell", "seed"], "left_anti")
                .select("cell", "seed",
                        F.lit(h).cast("int").alias("hops")))
        cand = materialize(cand)
        if cand.isEmpty():
            break
        pairs = materialize(pairs.unionByName(cand))
        front = cand
    best = pairs.groupBy("cell").agg(
        F.min(F.struct("hops", "seed")).alias("_b"))
    return best.select("cell", F.col("_b.seed").alias("seed"),
                       F.col("_b.hops").alias("hops"))


def grid_reach_sql(pts_cte: str, res: int, max_hops: int,
                   min_seed_pts: int) -> str:
    """DuckDB twin of grid_reach (density-rule seeds): recursive-CTE
    multi-source BFS over (cell, seed, hops) triples — UNION dedups
    triples and ``hops < max_hops`` bounds the walk, MIN(hops) per
    pair recovers the BFS distance, then a min-hops/min-seed argmin.
    Neighbor arithmetic matches cell_neighbors_sql (x wraps mod 2^res,
    y clamps by range filter)."""
    n = 1 << res
    mask = n - 1
    cell = (f"(CAST({res} AS BIGINT) << {_RES_SHIFT}) "
            f"| (CAST(least(greatest(floor((lat + 90.0) / 180.0 * {n}), "
            f"0), {n - 1}) AS BIGINT) << {res}) "
            f"| CAST(least(greatest(floor((lon + 180.0) / 360.0 * {n}), "
            f"0), {n - 1}) AS BIGINT)")
    wx = f"((w.cell & {mask}) + dx.g)"
    wy = f"(((w.cell >> {res}) & {mask}) + dy.g)"
    nbr = (f"(CAST({res} AS BIGINT) << {_RES_SHIFT}) "
           f"| (CAST({wy} AS BIGINT) << {res}) "
           f"| CAST((({wx}) % {n} + {n}) % {n} AS BIGINT)")
    return f"""
WITH RECURSIVE counts AS (
  SELECT {cell} AS cell, COUNT(*) AS n_pts
  FROM ({pts_cte}) GROUP BY 1),
occ AS (SELECT cell FROM counts),
walk(cell, seed, hops) AS (
  SELECT cell, cell, 0 FROM counts WHERE n_pts >= {min_seed_pts}
  UNION
  SELECT o.cell, w.seed, w.hops + 1
  FROM walk w,
       generate_series(-1, 1) dx(g), generate_series(-1, 1) dy(g),
       occ o
  WHERE w.hops < {max_hops}
    AND {wy} >= 0 AND {wy} < {n}
    AND o.cell = {nbr}),
dist AS (SELECT cell, seed, MIN(hops) AS hops
         FROM walk GROUP BY cell, seed),
best AS (SELECT cell, MIN(hops) AS hops FROM dist GROUP BY cell)
SELECT d.cell, MIN(d.seed) AS seed, CAST(d.hops AS INTEGER) AS hops
FROM dist d JOIN best b ON d.cell = b.cell AND d.hops = b.hops
GROUP BY d.cell, d.hops
"""


# ---------------------------------------------------------------------------
# Lloyd k-means over the cell histogram (centroid clustering)
# ---------------------------------------------------------------------------

def kmeans_cells(pts, res: int, k: int, iters: int, *,
                 lat_col: str = "lat", lon_col: str = "lon"):
    """Weighted Lloyd k-means over the OCCUPIED-cell histogram — the
    centroid-clustering companion to dbscan_cells (density) and
    grid_reach (reachability): points quantize to lattice cells once,
    and every Lloyd round runs on the aggregate (cell, count) rows,
    never the points. This is the standard scalable k-means shape: at
    10^12 points the histogram at res 12 is <= occupancy-bounded
    millions of rows, so each round is a broadcast join against k
    centroid rows plus one k-keyed agg — the ONE point-level shuffle
    is the initial count.

    Deterministic and integer-exact end to end, no RNG and no floats:
    seeds are the top-``k`` cells by (count DESC, cell ASC); distance
    is squared lattice distance d2 = (x-cx)^2 + (y-cy)^2 with ties
    broken by MIN centroid id (min(struct(d2, cid))); the update is
    the FLOOR weighted mean ``sum(n*x) div sum(n)`` (headroom:
    res + log2(points) < 63). A centroid whose cluster empties drops
    out (standard Lloyd degeneracy; k shrinks). After ``iters``
    update rounds the labels are re-derived against the FINAL
    centroids -> (cell, n_pts, cid) with cid = the seed cell id the
    centroid started from.
    """
    from pyspark.sql import functions as F

    from ..functions.cells import _RES_SHIFT, cell_encode
    from ..materialize import materialize
    mask = (1 << res) - 1
    cells = (pts
             .select(cell_encode(lat_col, lon_col, res).alias("cell"))
             .groupBy("cell").agg(F.count("*").alias("n_pts"))
             .withColumn("x", F.expr(f"cell & {mask}"))
             .withColumn("y", F.expr(f"(cell >> {res}) & {mask}")))
    cells = materialize(cells)
    cents = (cells.orderBy(F.col("n_pts").desc(), F.col("cell").asc())
             .limit(k)
             .select(F.col("cell").alias("cid"),
                     F.col("x").alias("cx"), F.col("y").alias("cy")))
    cents = materialize(cents)

    def assign(cs):
        j = cells.join(F.broadcast(cs))
        d2 = F.expr("(x - cx) * (x - cx) + (y - cy) * (y - cy)")
        return (j.withColumn("_d2", d2)
                .groupBy("cell", "n_pts", "x", "y")
                .agg(F.min(F.struct("_d2", "cid")).alias("_b"))
                .select("cell", "n_pts", "x", "y",
                        F.col("_b.cid").alias("cid")))

    for _ in range(iters):
        a = assign(cents)
        cents = materialize(
            a.groupBy("cid").agg(
                F.expr("sum(n_pts * x) div sum(n_pts)").alias("cx"),
                F.expr("sum(n_pts * y) div sum(n_pts)").alias("cy")))
    return assign(cents).select("cell", "n_pts", "cid")


def kmeans_cells_sql(pts_sql: str, res: int, k: int,
                     iters: int) -> str:
    """DuckDB twin of kmeans_cells: the Lloyd rounds are UNROLLED
    textually (c0 -> a0 -> c1 -> ... -> c{iters} -> final labels) —
    fixed iteration count means plain chained CTEs, no recursion;
    argmin is ROW_NUMBER() OVER (ORDER BY d2, cid), the same total
    order as the struct-MIN."""
    from ..functions.cells import cell_encode_sql
    mask = (1 << res) - 1
    cell = cell_encode_sql("lat", "lon", res)
    d2 = "(g.x - c.cx) * (g.x - c.cx) + (g.y - c.cy) * (g.y - c.cy)"
    parts = [f"""
WITH cells AS (
  SELECT cell, COUNT(*) AS n_pts,
         cell & {mask} AS x, (cell >> {res}) & {mask} AS y
  FROM (SELECT {cell} AS cell FROM ({pts_sql})) GROUP BY 1),
c0 AS (SELECT cell AS cid, x AS cx, y AS cy FROM cells
       ORDER BY n_pts DESC, cell ASC LIMIT {k})"""]
    for i in range(iters):
        parts.append(f"""
a{i} AS (
  SELECT cell, n_pts, x, y, cid FROM (
    SELECT g.cell, g.n_pts, g.x, g.y, c.cid,
           ROW_NUMBER() OVER (PARTITION BY g.cell
                              ORDER BY {d2}, c.cid) AS rn
    FROM cells g CROSS JOIN c{i} c) WHERE rn = 1),
c{i + 1} AS (
  SELECT cid, SUM(n_pts * x) // SUM(n_pts) AS cx,
         SUM(n_pts * y) // SUM(n_pts) AS cy
  FROM a{i} GROUP BY cid)""")
    return (",".join(parts) + f"""
SELECT cell, n_pts, cid FROM (
  SELECT g.cell, g.n_pts, c.cid,
         ROW_NUMBER() OVER (PARTITION BY g.cell
                            ORDER BY {d2}, c.cid) AS rn
  FROM cells g CROSS JOIN c{iters} c) WHERE rn = 1
""")


# ---------------------------------------------------------------------------
# raster segmentation: contiguous same-label regions
# ---------------------------------------------------------------------------

def cell_regions(pts, res: int, *, label_col: str,
                 lat_col: str = "lat", lon_col: str = "lon",
                 max_iters: int = 20, algorithm: str = "minlabel"):
    """Raster segmentation — dissolve the occupied cell raster into
    contiguous SAME-LABEL regions: each cell takes its MODAL label
    (most events; ties -> lexicographically smallest label, via one
    struct-MIN over (-count, label)), then 8-adjacent cells sharing a
    modal label merge into one region (region_id = MIN cell id, the
    dbscan/CC convention; lon wraps, lat clamps). The vector-dissolve
    answer a raster engine gives: dominant-language areas, dominant-
    category zones, land-cover-style maps.

    Scale shape: ONE (cell, label) count shuffle is the only
    full-data pass; modal argmin, the ring-1 edge explode, and the CC
    rounds all run on aggregate-sized cell tables. algorithm /
    max_iters pass through to connected_components (raises on
    non-convergence rather than returning partial labels).
    -> (cell, label, n_pts, region_id) for every occupied cell
    (isolated cells self-label)."""
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode, cell_neighbors_explode
    from .dedup import connected_components
    per = (pts.select(
        cell_encode(lat_col, lon_col, res).alias("cell"),
        F.col(label_col).alias("_lbl"))
        .groupBy("cell", "_lbl").agg(F.count(F.lit(1)).alias("_n")))
    modal = (per.groupBy("cell")
             .agg(F.sum("_n").alias("n_pts"),
                  F.min(F.struct((-F.col("_n")).alias("_neg"),
                                 F.col("_lbl"))).alias("_b"))
             .select("cell", F.col("_b._lbl").alias("label"),
                     "n_pts"))
    nbrs = (cell_neighbors_explode(modal.select("cell", "label"),
                                   res, ring=1)
            .filter(F.col("_neighbor") != F.col("cell"))
            .select(F.col("cell").alias("u"), "label",
                    F.col("_neighbor").alias("v")))
    edges = nbrs.join(
        modal.select(F.col("cell").alias("v"), "label"),
        ["v", "label"]).select("u", "v")
    labels = connected_components(edges, a_col="u", b_col="v",
                                  max_iters=max_iters,
                                  algorithm=algorithm) \
        .select(F.col("doc_id").alias("cell"), F.col("cluster_id"))
    return (modal.join(labels, "cell", "left")
            .select("cell", "label", "n_pts",
                    F.coalesce("cluster_id", "cell")
                    .alias("region_id")))


def cell_regions_sql(pts_cte: str, res: int, *,
                     label_sql: str = "label") -> str:
    """DuckDB twin of cell_regions over a CTE yielding
    (lat, lon, <label_sql>): modal label via ROW_NUMBER over
    (n DESC, label ASC) — the same total order as the struct-MIN —
    then the dbscan recursive-closure convention with label equality
    in the edge join."""
    n = 1 << res
    mask = n - 1
    cell = (f"(CAST({res} AS BIGINT) << {_RES_SHIFT}) "
            f"| (CAST(least(greatest(floor((lat + 90.0) / 180.0 * {n}), "
            f"0), {n - 1}) AS BIGINT) << {res}) "
            f"| CAST(least(greatest(floor((lon + 180.0) / 360.0 * {n}), "
            f"0), {n - 1}) AS BIGINT)")
    ax, bx = f"(a.cell & {mask})", f"(b.cell & {mask})"
    ay, by = (f"((a.cell >> {res}) & {mask})",
              f"((b.cell >> {res}) & {mask})")
    return f"""
WITH RECURSIVE per AS (
  SELECT {cell} AS cell, {label_sql} AS lbl, COUNT(*) AS n
  FROM ({pts_cte}) GROUP BY 1, 2),
tot AS (SELECT cell, CAST(SUM(n) AS BIGINT) AS n_pts
        FROM per GROUP BY 1),
modal AS (
  SELECT cell, lbl AS label FROM (
    SELECT cell, lbl,
           ROW_NUMBER() OVER (PARTITION BY cell
                              ORDER BY n DESC, lbl ASC) AS rn
    FROM per) WHERE rn = 1),
edges AS (
  SELECT a.cell AS u, b.cell AS v FROM modal a JOIN modal b
  ON a.cell <> b.cell AND a.label = b.label
  AND abs({ay} - {by}) <= 1
  AND least(abs({ax} - {bx}), {n} - abs({ax} - {bx})) <= 1),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
lbl AS (SELECT u AS cell, LEAST(u, MIN(v)) AS region_id
        FROM reach GROUP BY u)
SELECT m.cell, m.label, t.n_pts,
       COALESCE(l.region_id, m.cell) AS region_id
FROM modal m JOIN tot t USING (cell) LEFT JOIN lbl l USING (cell)
"""


def cost_distance(pts, res: int, rounds: int, *,
                  min_seed_pts: int, lat_col: str = "lat",
                  lon_col: str = "lon"):
    """Accumulated-cost distance over the OCCUPIED cell raster — the
    WEIGHTED sibling of grid_reach: entering a cell costs its point
    count (the congestion surface), seeds (density rule: count >=
    ``min_seed_pts``, same as grid_reach/dbscan) start at 0, and
    each occupied cell gets the minimum summed cost over 8-adjacency
    paths of at most ``rounds`` steps that never leave occupied
    cells. The cost-surface / least-cost-corridor primitive: hop BFS
    treats a packed cell and an empty-ish one alike; this one routes
    AROUND congestion.

    Bounded Bellman-Ford with frontier relaxation: round k relaxes
    only from cells improved in round k-1 — exact for the <=k-hop
    minimum (an unimproved cell was already fully relaxed with the
    same value), so the result equals the twin's enumerate-all-paths
    MIN by induction, with early exit when a round improves nothing
    (identical output, fewer jobs). Integer-exact: costs are BIGINT
    count sums, ties need no rule (MIN over equal costs).

    Scale shape: ONE point-level shuffle (the cell count), then
    every round runs on aggregate-sized tables — frontier neighbor
    explode (9x), equi-join against the cell-cost table, one
    cell-keyed MIN, an improvement join. State is O(occupied cells);
    rounds are caller-bounded regardless of raster size. Per-round
    materialize() is the CC lineage-truncation lesson.
    -> (cell, cost), cost = 0 rows are the seeds."""
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode, cell_neighbors_explode
    from ..materialize import materialize
    counts = (pts
              .select(cell_encode(lat_col, lon_col, res).alias("cell"))
              .groupBy("cell")
              .agg(F.count("*").cast("long").alias("n_pts")))
    counts = materialize(counts)
    best = materialize(
        counts.filter(F.col("n_pts") >= int(min_seed_pts))
              .select("cell", F.lit(0).cast("long").alias("cost")))
    front = best
    for _ in range(int(rounds)):
        cand = (cell_neighbors_explode(front.select("cell", "cost"),
                                       res, ring=1)
                .filter(F.col("_neighbor") != F.col("cell"))
                .select(F.col("_neighbor").alias("cell"), "cost")
                .join(counts, "cell")
                .select("cell",
                        (F.col("cost") + F.col("n_pts"))
                        .alias("cost"))
                .groupBy("cell").agg(F.min("cost").alias("cost")))
        improved = (cand.join(best.select("cell",
                                          F.col("cost").alias("_old")),
                              "cell", "left")
                    .filter(F.col("_old").isNull()
                            | (F.col("cost") < F.col("_old")))
                    .select("cell", "cost"))
        improved = materialize(improved)
        if improved.isEmpty():
            break
        best = materialize(
            best.join(improved.select("cell",
                                      F.col("cost").alias("_new")),
                      "cell", "left")
                .select("cell", F.coalesce("_new", "cost")
                        .alias("cost"))
                .unionByName(
                    improved.join(best.select("cell"), "cell",
                                  "left_anti")))
        front = improved
    return best


def cost_distance_sql(pts_cte: str, res: int, rounds: int,
                      min_seed_pts: int) -> str:
    """DuckDB twin of cost_distance: recursive-CTE path enumeration
    over (cell, cost, hops) with ``hops < rounds`` bounding the walk
    and MIN(cost) per cell recovering the accumulated-cost distance.
    Neighbor arithmetic matches cell_neighbors_sql (x wraps mod
    2^res, y clamps by range filter)."""
    n = 1 << res
    mask = n - 1
    cell = (f"(CAST({res} AS BIGINT) << {_RES_SHIFT}) "
            f"| (CAST(least(greatest(floor((lat + 90.0) / 180.0 * {n}), "
            f"0), {n - 1}) AS BIGINT) << {res}) "
            f"| CAST(least(greatest(floor((lon + 180.0) / 360.0 * {n}), "
            f"0), {n - 1}) AS BIGINT)")
    wx = f"((w.cell & {mask}) + dx.g)"
    wy = f"(((w.cell >> {res}) & {mask}) + dy.g)"
    nbr = (f"(CAST({res} AS BIGINT) << {_RES_SHIFT}) "
           f"| (CAST({wy} AS BIGINT) << {res}) "
           f"| CAST((({wx}) % {n} + {n}) % {n} AS BIGINT)")
    return f"""
WITH RECURSIVE cd_counts AS (
  SELECT {cell} AS cell, COUNT(*) AS n_pts
  FROM ({pts_cte}) GROUP BY 1),
walk(cell, cost, hops) AS (
  SELECT cell, CAST(0 AS BIGINT), 0 FROM cd_counts
  WHERE n_pts >= {min_seed_pts}
  UNION
  SELECT o.cell, w.cost + o.n_pts, w.hops + 1
  FROM walk w,
       generate_series(-1, 1) dx(g), generate_series(-1, 1) dy(g),
       cd_counts o
  WHERE w.hops < {rounds}
    AND NOT (dx.g = 0 AND dy.g = 0)
    AND {wy} >= 0 AND {wy} < {n}
    AND o.cell = {nbr})
SELECT cell, MIN(cost) AS cost FROM walk GROUP BY cell
"""


# ---------------------------------------------------------------------------
# Region shape metrics (r5.44)
# ---------------------------------------------------------------------------

def _pi_ppm() -> int:
    """round(pi * 1e6), computed once in Python and embedded as the
    SAME literal in both engines (the benford/octant constant-table
    convention)."""
    import math
    return round(math.pi * 1e6)


def region_shape(regions, res: int, *, cell_col: str = "cell",
                 region_col: str = "region_id"):
    """Shape metrics for each contiguous cell region — area,
    perimeter, and Polsby-Popper compactness, the morphometrics pass
    that separates a compact downtown zone from a sprawling
    ribbon-along-a-highway region of the SAME area (Polsby &
    Popper 1991; on a raster, area = cell count and perimeter =
    EXPOSED rook edge count, the standard raster perimeter):

        perimeter = 4 * area - (# ordered same-region rook-adjacent
                                cell pairs)
        pp_ppm    = (4 * PI_PPM * area) div perimeter^2

    with PI_PPM from the shared literal table, so a grid square
    scores pi/4 ~ 785398 ppm (the raster ceiling) and a 1-cell-wide
    ribbon of length L scores ~pi*L/(L+1)^2 -> 0. Rook neighbors
    follow the cells-module boundary convention: longitude WRAPS,
    latitude CLAMPS (a polar-edge cell has its off-grid side
    exposed). Requires res >= 2 (at res 1 the two lon neighbors
    coincide and the pair count would double).

    Scale: all work on AGGREGATE cell rows — one 4-way rook explode,
    one (cell, region)-keyed equi-join, one region-keyed combinable
    agg. Input is cell_regions/d8_basins-shaped (cell, region_id).
    -> (region_id, area_cells, perimeter, pp_ppm)."""
    from pyspark.sql import functions as F
    if res < 2:
        raise ValueError("region_shape requires res >= 2")
    n = 1 << res
    mask = n - 1
    d = regions.select(F.col(cell_col).alias("_cell"),
                       F.col(region_col).alias("_rid"))
    x = f"(_cell & {mask})"
    y = f"(shiftright(_cell, {res}) & {mask})"
    head = f"shiftleft(CAST({res} AS BIGINT), {_RES_SHIFT})"
    nbrs = (f"array(({head}) | shiftleft({y}, {res}) "
            f"| (({x} + 1) % {n}), "
            f"({head}) | shiftleft({y}, {res}) "
            f"| (({x} + {n - 1}) % {n}), "
            f"IF({y} < {n - 1}, "
            f"({head}) | shiftleft({y} + 1, {res}) | {x}, NULL), "
            f"IF({y} > 0, "
            f"({head}) | shiftleft({y} - 1, {res}) | {x}, NULL))")
    pairs = (d.select("_rid", F.explode(F.expr(nbrs)).alias("_nb"))
             .filter(F.col("_nb").isNotNull())
             .join(d.select(F.col("_cell").alias("_nb"),
                            F.col("_rid").alias("_rid2")), "_nb")
             .filter(F.col("_rid") == F.col("_rid2"))
             .groupBy("_rid").agg(F.count(F.lit(1)).alias("_m")))
    area = d.groupBy("_rid").agg(F.count(F.lit(1)).alias("_a"))
    pp = (f"CAST((4 * {_pi_ppm()} * CAST(_a AS DECIMAL(38,0))) div "
          f"(CAST(_p AS DECIMAL(38,0)) * _p) AS BIGINT)")
    return (area.join(pairs, "_rid", "left")
            .withColumn("_p", F.expr("4 * _a - coalesce(_m, 0)"))
            .select(F.col("_rid").alias(region_col),
                    F.col("_a").cast("long").alias("area_cells"),
                    F.col("_p").cast("long").alias("perimeter"),
                    F.expr(pp).alias("pp_ppm")))


def region_shape_sql(src_sql: str, res: int) -> str:
    """DuckDB twin of region_shape over a subquery producing
    (cell, region_id) — same wrap/clamp rook relation expressed as a
    pair join (oracle-scale), same literal pi table; every quantity
    nonnegative so floor == trunc."""
    n = 1 << res
    mask = n - 1
    ax, bx = f"(a.cell & {mask})", f"(b.cell & {mask})"
    ay, by = (f"((a.cell >> {res}) & {mask})",
              f"((b.cell >> {res}) & {mask})")
    rook = (f"(({ay} = {by} AND least(abs({ax} - {bx}), "
            f"{n} - abs({ax} - {bx})) = 1) OR "
            f"({ax} = {bx} AND abs({ay} - {by}) = 1))")
    return f"""
WITH rs_src AS (SELECT cell, region_id FROM ({src_sql})),
rs_m AS (SELECT a.region_id, COUNT(*) AS m
         FROM rs_src a JOIN rs_src b
         ON a.region_id = b.region_id AND a.cell <> b.cell
         AND {rook} GROUP BY 1),
rs_a AS (SELECT region_id, COUNT(*) AS a FROM rs_src GROUP BY 1),
rs_f AS (SELECT rs_a.region_id, a,
         4 * a - COALESCE(m, 0) AS p
         FROM rs_a LEFT JOIN rs_m USING (region_id))
SELECT region_id, CAST(a AS BIGINT) AS area_cells,
       CAST(p AS BIGINT) AS perimeter,
       CAST((4 * {_pi_ppm()} * CAST(a AS HUGEINT))
            // (CAST(p AS HUGEINT) * p) AS BIGINT) AS pp_ppm
FROM rs_f
"""


def kmeans_silhouette(pts, res: int, k: int, iters: int, *,
                      lat_col: str = "lat", lon_col: str = "lon"):
    """Per-cluster simplified-silhouette audit over kmeans_cells —
    "did k fit": for every occupied cell, a = squared lattice
    distance to its OWN cluster's center (recomputed from the final
    labels — one more Lloyd half-step, the standard evaluation
    convention) and b = the min distance to any OTHER center, scored

        s_ppm = sign(b - a) * (|b - a| * 1e6) div max(a, b)

    — the centroid-based simplified silhouette (Hruschka et al.),
    sqrt-free on squared distances so it stays integer-exact; a cell
    whose own center is no longer nearest reads negative. Clusters
    aggregate point-weighted: sil_ppm = sign-decomposed floor of
    sum(n_pts * s) / sum(n_pts), plus a cid = -1 overall row — the
    ONE-TABLE answer to "raise or lower k" that the inertia curve
    needs a sweep for. Degeneracies: max(a,b) = 0 (coincident
    centers) and a vanished-b (k collapsed to 1) read 0.

    Scale: rides kmeans_cells' aggregate frames — the scoring join
    is occupied-cells x k-row broadcast, the rollup one k-keyed
    combinable agg; headroom sum(n_pts * s_ppm) <= 1e6 * N needs
    N <= 9e12 points per cluster before a DECIMAL upgrade.
    -> (cid, n_cells, n_pts, sil_ppm)."""
    from pyspark.sql import functions as F

    mask = (1 << res) - 1
    a = (kmeans_cells(pts, res, k, iters,
                      lat_col=lat_col, lon_col=lon_col)
         .withColumn("x", F.expr(f"cell & {mask}"))
         .withColumn("y", F.expr(f"(cell >> {res}) & {mask}")))
    cents = (a.groupBy("cid").agg(
        F.expr("sum(n_pts * x) div sum(n_pts)").alias("cx"),
        F.expr("sum(n_pts * y) div sum(n_pts)").alias("cy"))
        .select(F.col("cid").alias("ocid"), "cx", "cy"))
    per = (a.join(F.broadcast(cents))
           .withColumn("_d2", F.expr(
               "(x - cx) * (x - cx) + (y - cy) * (y - cy)"))
           .groupBy("cell", "n_pts", "cid")
           .agg(F.min(F.when(F.col("ocid") == F.col("cid"),
                             F.col("_d2"))).alias("_a"),
                F.min(F.when(F.col("ocid") != F.col("cid"),
                             F.col("_d2"))).alias("_b"))
           .withColumn("_s", F.expr(
               "CASE WHEN _b IS NULL OR greatest(_a, _b) = 0 THEN 0 "
               "ELSE (CASE WHEN _b >= _a THEN 1 ELSE -1 END) * "
               "((abs(_b - _a) * 1000000) div greatest(_a, _b)) "
               "END")))
    grp = (per.groupBy("cid")
           .agg(F.count(F.lit(1)).alias("n_cells"),
                F.sum("n_pts").alias("n_pts"),
                F.sum(F.expr("n_pts * _s")).alias("_num")))
    allr = (per.agg(F.lit(-1).cast("long").alias("cid"),
                    F.count(F.lit(1)).alias("n_cells"),
                    F.sum("n_pts").alias("n_pts"),
                    F.sum(F.expr("n_pts * _s")).alias("_num")))
    sil = ("(CASE WHEN _num >= 0 THEN 1 ELSE -1 END) * "
           "(abs(_num) div n_pts)")
    return (grp.unionByName(allr)
            .select(F.col("cid").cast("long"),
                    F.col("n_cells").cast("long"),
                    F.col("n_pts").cast("long"),
                    F.expr(sil).cast("long").alias("sil_ppm")))


def kmeans_silhouette_sql(pts_sql: str, res: int, k: int,
                          iters: int) -> str:
    """DuckDB twin of kmeans_silhouette — nests the kmeans_cells_sql
    oracle verbatim (the region_shape composition convention), then
    the same center recompute, broadcast scoring and sign-decomposed
    floors."""
    mask = (1 << res) - 1
    inner = kmeans_cells_sql(pts_sql, res, k, iters)
    return f"""
WITH ks_a AS (SELECT cell, n_pts, cid,
              cell & {mask} AS x, (cell >> {res}) & {mask} AS y
              FROM ({inner})),
ks_c AS (SELECT cid AS ocid,
         SUM(n_pts * x) // SUM(n_pts) AS cx,
         SUM(n_pts * y) // SUM(n_pts) AS cy
         FROM ks_a GROUP BY 1),
ks_p AS (SELECT a.cell, a.n_pts, a.cid,
         MIN(CASE WHEN c.ocid = a.cid THEN
             (a.x - c.cx) * (a.x - c.cx)
             + (a.y - c.cy) * (a.y - c.cy) END) AS da,
         MIN(CASE WHEN c.ocid <> a.cid THEN
             (a.x - c.cx) * (a.x - c.cx)
             + (a.y - c.cy) * (a.y - c.cy) END) AS db
         FROM ks_a a CROSS JOIN ks_c c
         GROUP BY 1, 2, 3),
ks_s AS (SELECT cell, n_pts, cid,
         CASE WHEN db IS NULL OR greatest(da, db) = 0 THEN 0
              ELSE (CASE WHEN db >= da THEN 1 ELSE -1 END) *
                   ((abs(db - da) * 1000000) // greatest(da, db))
         END AS s
         FROM ks_p),
ks_g AS (SELECT cid, COUNT(*) AS n_cells, SUM(n_pts) AS n_pts,
         SUM(n_pts * s) AS num FROM ks_s GROUP BY 1
         UNION ALL
         SELECT -1, COUNT(*), SUM(n_pts), SUM(n_pts * s) FROM ks_s)
SELECT CAST(cid AS BIGINT) AS cid,
       CAST(n_cells AS BIGINT) AS n_cells,
       CAST(n_pts AS BIGINT) AS n_pts,
       CAST((CASE WHEN num >= 0 THEN 1 ELSE -1 END)
            * (abs(num) // n_pts) AS BIGINT) AS sil_ppm
FROM ks_g
"""


def coverage_holes(points, res: int, *, lat_col: str = "lat",
                   lon_col: str = "lon"):
    """Coverage-gap analysis — the COMPLEMENT-space view every other
    raster operator ignores: inside the occupied raster's bounding
    box, the UNOCCUPIED cells dissolve into 8-connected hole regions
    (lon wraps, lat clamps — the cell-family convention), each
    reported with its size and its perimeter pressure

        perim_load = sum of counts of occupied cells 8-adjacent to
                     the region (each counted once)

    — "how big is this blind spot and how much signal surrounds it",
    the table a sensor-placement / crawl-frontier planner ranks:
    a large hole ringed by heavy traffic is the next probe target; a
    hole bordered by nothing is the map's edge. The bbox restriction
    keeps the complement finite and honest (cells outside the
    observed extent are unknown-unknowns, not holes).

    Scale: the grid frame is bbox-bounded (<= 4^res rows, aggregate-
    sized by construction); one anti-join carves the holes, the CC
    rounds ride connected_components' aggregate machinery, and both
    the adjacency explodes run on cell tables — the only point-level
    pass is the occupancy count. -> (region_id, n_cells,
    perim_load), isolated holes self-label."""
    from pyspark.sql import functions as F

    from ..functions.cells import (_RES_SHIFT, cell_encode,
                                   cell_neighbors_explode)
    from .dedup import connected_components
    spark = points.sparkSession
    n = 1 << res
    mask = n - 1
    occ = (points
           .select(cell_encode(lat_col, lon_col, res).alias("cell"))
           .groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
           .withColumn("x", F.col("cell").bitwiseAND(F.lit(mask)))
           .withColumn("y", F.shiftright("cell", res)
                       .bitwiseAND(F.lit(mask))))
    b = occ.agg(F.min("x").alias("x0"), F.max("x").alias("x1"),
                F.min("y").alias("y0"), F.max("y").alias("y1")) \
        .collect()[0]
    if b["x0"] is None:
        return (occ.select(F.col("cell").alias("region_id"),
                           F.col("n").alias("n_cells"),
                           F.col("n").alias("perim_load")).limit(0))
    grid = (spark.range(int(b["x0"]), int(b["x1"]) + 1)
            .select(F.col("id").alias("x"))
            .crossJoin(spark.range(int(b["y0"]), int(b["y1"]) + 1)
                       .select(F.col("id").alias("y")))
            .select(F.expr(
                f"(CAST({res} AS BIGINT) << {_RES_SHIFT}) "
                f"+ (y << {res}) + x").alias("cell")))
    holes = grid.join(occ.select("cell"), "cell", "left_anti")
    nbrs = (cell_neighbors_explode(holes, res, ring=1)
            .filter(F.col("_neighbor") != F.col("cell")))
    edges = (nbrs.join(holes.select(F.col("cell").alias("_neighbor")),
                       "_neighbor")
             .select(F.col("cell").alias("u"),
                     F.col("_neighbor").alias("v")))
    # holes can be high-diameter blobs (unlike shallow near-dup
    # clusters), so the O(log n)-round star algorithm, not minlabel
    labels = connected_components(edges, a_col="u", b_col="v",
                                  algorithm="star", max_iters=40) \
        .select(F.col("doc_id").alias("cell"), "cluster_id")
    lab = (holes.join(labels, "cell", "left")
           .select("cell", F.coalesce("cluster_id", "cell")
                   .alias("region_id")))
    press = (cell_neighbors_explode(lab, res, ring=1)
             .filter(F.col("_neighbor") != F.col("cell"))
             .join(occ.select(F.col("cell").alias("_neighbor"),
                              "n"), "_neighbor")
             .select("region_id", "_neighbor", "n").distinct()
             .groupBy("region_id").agg(F.sum("n").alias("perim_load")))
    return (lab.groupBy("region_id")
            .agg(F.count(F.lit(1)).alias("n_cells"))
            .join(press, "region_id", "left")
            .fillna(0, subset=["perim_load"])
            .select(F.col("region_id").cast("long"),
                    F.col("n_cells").cast("long"),
                    F.col("perim_load").cast("long")))


def coverage_holes_sql(pts_sql: str, res: int) -> str:
    """DuckDB twin of coverage_holes — same bbox grid, same wrap
    adjacency, the cell_regions recursive-closure convention."""
    from ..functions.cells import _RES_SHIFT, cell_encode_sql
    n = 1 << res
    mask = n - 1
    cell = cell_encode_sql("lat", "lon", res)
    ax, bx = f"(a.cell & {mask})", f"(b.cell & {mask})"
    ay, by = (f"((a.cell >> {res}) & {mask})",
              f"((b.cell >> {res}) & {mask})")
    adj = (f"a.cell <> b.cell AND abs({ay} - {by}) <= 1 AND "
           f"least(abs({ax} - {bx}), {n} - abs({ax} - {bx})) <= 1")
    hx, ox = f"(h.cell & {mask})", f"(o.cell & {mask})"
    hy, oy = (f"((h.cell >> {res}) & {mask})",
              f"((o.cell >> {res}) & {mask})")
    hadj = (f"abs({hy} - {oy}) <= 1 AND "
            f"least(abs({hx} - {ox}), {n} - abs({hx} - {ox})) <= 1")
    return f"""
WITH RECURSIVE ch_o AS (
  SELECT cell, COUNT(*) AS n FROM
  (SELECT {cell} AS cell FROM ({pts_sql})) GROUP BY 1),
ch_b AS (SELECT MIN(cell & {mask}) AS x0, MAX(cell & {mask}) AS x1,
         MIN((cell >> {res}) & {mask}) AS y0,
         MAX((cell >> {res}) & {mask}) AS y1 FROM ch_o),
ch_g AS (SELECT (CAST({res} AS BIGINT) << {_RES_SHIFT})
                + (y * {n}) + x AS cell
         FROM ch_b,
              unnest(generate_series(x0, x1)) AS gx(x),
              unnest(generate_series(y0, y1)) AS gy(y)),
ch_h AS (SELECT g.cell FROM ch_g g LEFT JOIN ch_o o
         ON g.cell = o.cell WHERE o.cell IS NULL),
ch_e AS (SELECT a.cell AS u, b.cell AS v
         FROM ch_h a JOIN ch_h b ON {adj}),
reach(u, v) AS (
  SELECT u, v FROM ch_e
  UNION
  SELECT r.u, e.v FROM reach r JOIN ch_e e ON r.v = e.u),
ch_l AS (SELECT h.cell,
         COALESCE(l.rid, h.cell) AS region_id
         FROM ch_h h LEFT JOIN
         (SELECT u AS cell, LEAST(u, MIN(v)) AS rid
          FROM reach GROUP BY u) l ON h.cell = l.cell),
ch_p AS (SELECT region_id, SUM(n) AS perim_load FROM (
           SELECT DISTINCT h.region_id, o.cell, o.n
           FROM ch_l h JOIN ch_o o ON {hadj}) GROUP BY 1)
SELECT l.region_id, CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(COALESCE(MAX(p.perim_load), 0) AS BIGINT) AS perim_load
FROM ch_l l LEFT JOIN ch_p p ON l.region_id = p.region_id
GROUP BY 1
"""
