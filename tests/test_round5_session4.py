"""Round-5 session-4 operator tests: grid-DBSCAN clustering."""

from __future__ import annotations

import numpy as np


def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _center(y, x, res):
    """(lat, lon) of cell (y, x) center at ``res``."""
    n = 1 << res
    return (-90.0 + (y + 0.5) * 180.0 / n,
            -180.0 + (x + 0.5) * 360.0 / n)


def _cell(y, x, res):
    return (res << 56) | (y << res) | x


def _pts(spark, cells, res, counts):
    """DataFrame of ``counts[i]`` points at the center of cells[i]."""
    rows = []
    for (y, x), c in zip(cells, counts):
        lat, lon = _center(y, x, res)
        rows += [(lat, lon)] * c
    return spark.createDataFrame(rows, "lat double, lon double")


class TestDbscanCells:
    RES = 4

    def test_two_clusters_and_noise(self, spark):
        """Two 8-adjacent core runs separated by a >1-cell gap get two
        distinct labels (min cell id each); a below-minpts cell is
        noise and absent even though it touches a core cell."""
        from geospark.operators.cluster import dbscan_cells
        cells = [(4, 4), (4, 5), (5, 5),   # cluster A (edge+diagonal)
                 (10, 10), (10, 11),       # cluster B
                 (4, 6)]                   # noise: count 2 < minpts 3
        pts = _pts(spark, cells, self.RES, [3, 3, 4, 3, 5, 2])
        got = _rows(dbscan_cells(pts, self.RES, 3),
                    ["cell", "n_pts", "cluster_id"])
        r = self.RES
        a = min(_cell(4, 4, r), _cell(4, 5, r), _cell(5, 5, r))
        b = min(_cell(10, 10, r), _cell(10, 11, r))
        assert got == sorted([
            (_cell(4, 4, r), 3, a), (_cell(4, 5, r), 3, a),
            (_cell(5, 5, r), 4, a),
            (_cell(10, 10, r), 3, b), (_cell(10, 11, r), 5, b)])

    def test_antimeridian_wrap_merges(self, spark):
        """Core cells at x=0 and x=n-1 on the same row are adjacent
        (longitude wraps) -> one cluster."""
        from geospark.operators.cluster import dbscan_cells
        n = 1 << self.RES
        pts = _pts(spark, [(7, 0), (7, n - 1)], self.RES, [3, 3])
        got = _rows(dbscan_cells(pts, self.RES, 3), ["cell", "cluster_id"])
        lbl = _cell(7, 0, self.RES)
        assert got == sorted([(_cell(7, 0, self.RES), lbl),
                              (_cell(7, n - 1, self.RES), lbl)])

    def test_no_polar_wrap(self, spark):
        """y=0 and y=n-1 (poles) do NOT merge — latitude clamps, it
        never wraps."""
        from geospark.operators.cluster import dbscan_cells
        n = 1 << self.RES
        pts = _pts(spark, [(0, 3), (n - 1, 3)], self.RES, [3, 3])
        got = _rows(dbscan_cells(pts, self.RES, 3), ["cell", "cluster_id"])
        assert got == sorted([
            (_cell(0, 3, self.RES), _cell(0, 3, self.RES)),
            (_cell(n - 1, 3, self.RES), _cell(n - 1, 3, self.RES))])

    def test_singleton_core_is_own_cluster(self, spark):
        from geospark.operators.cluster import dbscan_cells
        pts = _pts(spark, [(8, 8)], self.RES, [5])
        assert _rows(dbscan_cells(pts, self.RES, 3)) == [
            (_cell(8, 8, self.RES), 5, _cell(8, 8, self.RES))]

    def test_empty_when_all_below_minpts(self, spark):
        from geospark.operators.cluster import dbscan_cells
        pts = _pts(spark, [(1, 1), (2, 2)], self.RES, [2, 2])
        assert dbscan_cells(pts, self.RES, 3).count() == 0

    def test_duckdb_twin_parity_random(self, spark):
        """300 seeded random points: Spark operator == recursive-CTE
        oracle, row for row."""
        import duckdb

        from geospark.operators.cluster import dbscan_cells, \
            dbscan_cells_sql
        rng = np.random.default_rng(7)
        lat = rng.uniform(-89, 89, 300).round(3)
        lon = rng.uniform(-179, 179, 300).round(3)
        rows = [(float(a), float(b)) for a, b in zip(lat, lon)]
        pts = spark.createDataFrame(rows, "lat double, lon double")
        got = _rows(dbscan_cells(pts, 3, 2),
                    ["cell", "n_pts", "cluster_id"])
        con = duckdb.connect()
        con.execute("CREATE TABLE p (lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(
            dbscan_cells_sql("SELECT lat, lon FROM p", 3, 2)).fetchall())
        assert got == want

    def test_star_algorithm_matches_minlabel(self, spark):
        from geospark.operators.cluster import dbscan_cells
        cells = [(4, 4), (4, 5), (5, 6), (6, 7), (9, 9)]
        pts = _pts(spark, cells, self.RES, [3] * 5)
        a = _rows(dbscan_cells(pts, self.RES, 3))
        b = _rows(dbscan_cells(pts, self.RES, 3, algorithm="star"))
        assert a == b

    def test_plan_no_cartesian(self, spark):
        """The adjacency join is keyed (neighbor id == cell id) — no
        nested-loop/cartesian product anywhere in the plan."""
        from geospark.operators.cluster import dbscan_cells
        pts = _pts(spark, [(4, 4), (4, 5)], self.RES, [3, 3])
        plan = dbscan_cells(pts, self.RES, 3) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def _box_df(spark, rows, id_col):
    """rows: (id, x0, y0, x1, y1[, v]) -> (id[, v_int], geom_wkb)."""
    from pyspark.sql import functions as F

    from geospark.functions.geometry import st_geomfromtext
    has_v = len(rows[0]) == 6
    schema = f"{id_col} long, x0 double, y0 double, x1 double, y1 double"
    if has_v:
        schema += ", v_int long"
    df = spark.createDataFrame(rows, schema)
    wkt = F.concat(
        F.lit("POLYGON (("),
        F.col("x0").cast("string"), F.lit(" "), F.col("y0").cast("string"),
        F.lit(", "),
        F.col("x1").cast("string"), F.lit(" "), F.col("y0").cast("string"),
        F.lit(", "),
        F.col("x1").cast("string"), F.lit(" "), F.col("y1").cast("string"),
        F.lit(", "),
        F.col("x0").cast("string"), F.lit(" "), F.col("y1").cast("string"),
        F.lit(", "),
        F.col("x0").cast("string"), F.lit(" "), F.col("y0").cast("string"),
        F.lit("))"))
    cols = [id_col] + (["v_int"] if has_v else [])
    return df.select(*cols, st_geomfromtext(wkt).alias("geom_wkb"))


class TestArealInterp:
    def test_containment_and_split(self, spark):
        """Source A sits fully inside target 1 (frac exactly 1.0);
        source B straddles targets 1|2 half-and-half with a quarter
        hanging outside both — exact binary fractions, so the floored
        ppm values are closed-form."""
        from geospark.operators.interp import areal_interp
        src = _box_df(spark, [
            (100, 2.0, 2.0, 3.0, 3.0, 1000),   # inside tgt 1
            (200, 7.0, 0.0, 9.0, 1.0, 400),    # x 7-8 in tgt1, 8-9 in tgt2
        ], "src_id")
        tgt = _box_df(spark, [
            (1, 0.0, 0.0, 8.0, 8.0),
            (2, 8.0, 0.0, 16.0, 8.0),
        ], "tgt_id")
        got = _rows(areal_interp(src, tgt, res=4),
                    ["tgt_id", "v_ppm", "n_src"])
        # B: area 2, overlap 1 with each target -> frac 0.5 each
        assert got == [(1, 1000 * 1_000_000 + 200 * 1_000_000, 2),
                       (2, 200 * 1_000_000, 1)]

    def test_touching_contributes_zero(self, spark):
        """Closed ST_Intersects keeps a shared-edge pair, but its
        overlap area (and thus contribution) is exactly 0."""
        from geospark.operators.interp import areal_interp
        src = _box_df(spark, [(1, 0.0, 0.0, 2.0, 2.0, 100)], "src_id")
        tgt = _box_df(spark, [(9, 2.0, 0.0, 4.0, 2.0)], "tgt_id")
        got = _rows(areal_interp(src, tgt, res=4),
                    ["tgt_id", "v_ppm", "n_src"])
        assert got == [(9, 0, 1)]

    def test_duckdb_twin_parity_random(self, spark):
        """Seeded random boxes on a 0.25 lattice: operator == SQL twin
        row for row (bit-exact doubles through the floor)."""
        import duckdb

        from geospark.operators.interp import areal_interp, \
            areal_interp_sql
        rng = np.random.default_rng(11)
        def boxes(n, base):
            out = []
            for i in range(n):
                x0 = float(rng.integers(-600, 560)) * 0.25
                y0 = float(rng.integers(-340, 300)) * 0.25
                w = float(rng.integers(1, 40)) * 0.25
                h = float(rng.integers(1, 40)) * 0.25
                out.append((base + i, x0, y0, x0 + w, y0 + h,
                            int(rng.integers(1, 10000))))
            return out
        s_rows, t_rows = boxes(60, 0), [r[:5] for r in boxes(40, 1000)]
        src = _box_df(spark, s_rows, "src_id")
        tgt = _box_df(spark, t_rows, "tgt_id")
        got = _rows(areal_interp(src, tgt, res=4),
                    ["tgt_id", "v_ppm", "n_src"])
        con = duckdb.connect()
        con.execute("CREATE TABLE s (src_id BIGINT, sx0 DOUBLE, "
                    "sy0 DOUBLE, sx1 DOUBLE, sy1 DOUBLE, v_int BIGINT)")
        con.executemany("INSERT INTO s VALUES (?,?,?,?,?,?)", s_rows)
        con.execute("CREATE TABLE t (tgt_id BIGINT, tx0 DOUBLE, "
                    "ty0 DOUBLE, tx1 DOUBLE, ty1 DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", t_rows)
        pairs = ("SELECT src_id, tgt_id FROM s JOIN t ON "
                 "sx0 <= tx1 AND tx0 <= sx1 AND sy0 <= ty1 "
                 "AND ty0 <= sy1")
        want = sorted(tuple(r) for r in con.execute(areal_interp_sql(
            pairs, "SELECT * FROM s", "SELECT * FROM t")).fetchall())
        assert got == want


class TestSnapPoints:
    def _segs(self, spark, rows):
        return spark.createDataFrame(
            rows, "seg_id long, x0 double, y0 double, "
                  "x1 double, y1 double")

    def _pts(self, spark, rows):
        return spark.createDataFrame(rows, "pt_id long, x double, y double")

    def test_interior_endpoint_and_degenerate(self, spark):
        """Interior projection (t=0.5), clamp past the end (t=1),
        and a zero-length segment treated as a point (t=0)."""
        from geospark.operators.snap import snap_points
        segs = self._segs(spark, [(1, 0.0, 0.0, 4.0, 0.0),
                                  (2, 100.0, 100.0, 100.0, 100.0)])
        pts = self._pts(spark, [(10, 2.0, 1.0),    # above seg 1 middle
                                (11, 6.0, 0.0),    # past seg 1 end
                                (12, 101.0, 100.0)])  # near degenerate
        got = {r["pt_id"]: r for r in snap_points(pts, segs).collect()}
        assert (got[10]["seg_id"], got[10]["t"], got[10]["sx"],
                got[10]["sy"], got[10]["d2"]) == (1, 0.5, 2.0, 0.0, 1.0)
        assert (got[11]["seg_id"], got[11]["t"], got[11]["d2"]) == \
            (1, 1.0, 4.0)
        assert (got[12]["seg_id"], got[12]["t"], got[12]["d2"]) == \
            (2, 0.0, 1.0)

    def test_tie_breaks_on_lower_seg_id(self, spark):
        """A point exactly between two parallel segments snaps to the
        lower id."""
        from geospark.operators.snap import snap_points
        segs = self._segs(spark, [(5, 0.0, 2.0, 4.0, 2.0),
                                  (3, 0.0, -2.0, 4.0, -2.0)])
        pts = self._pts(spark, [(1, 2.0, 0.0)])
        [r] = snap_points(pts, segs).collect()
        assert (r["seg_id"], r["d2"]) == (3, 4.0)

    def test_plan_broadcast_no_window(self, spark):
        """The expansion is a broadcast nested-loop cross join (the
        intended plan for a small segment table) and the argmin is an
        aggregate, not a Window over the expansion."""
        from geospark.operators.snap import snap_points
        segs = self._segs(spark, [(1, 0.0, 0.0, 1.0, 1.0)])
        pts = self._pts(spark, [(1, 0.0, 0.0)])
        plan = snap_points(pts, segs) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan
        assert "Window" not in plan
        assert "SortMergeJoin" not in plan

    def test_duckdb_twin_parity_random(self, spark):
        import duckdb

        from geospark.operators.snap import snap_points, snap_points_sql
        rng = np.random.default_rng(13)
        seg_rows = [(i,
                     float(rng.integers(-160, 160)),
                     float(rng.integers(-70, 70)),
                     float(rng.integers(-160, 160)),
                     float(rng.integers(-70, 70))) for i in range(20)]
        seg_rows.append((20, 5.0, 5.0, 5.0, 5.0))  # degenerate
        pt_rows = [(i,
                    float(rng.integers(-7200, 7200)) * 0.025,
                    float(rng.integers(-3600, 3600)) * 0.025)
                   for i in range(200)]
        got = _rows(snap_points(self._pts(spark, pt_rows),
                                self._segs(spark, seg_rows)))
        con = duckdb.connect()
        con.execute("CREATE TABLE p (pt_id BIGINT, x DOUBLE, y DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?,?,?)", pt_rows)
        con.execute("CREATE TABLE s (seg_id BIGINT, x0 DOUBLE, "
                    "y0 DOUBLE, x1 DOUBLE, y1 DOUBLE)")
        con.executemany("INSERT INTO s VALUES (?,?,?,?,?)", seg_rows)
        want = sorted(tuple(r) for r in con.execute(snap_points_sql(
            "SELECT * FROM p", "SELECT * FROM s")).fetchall())
        assert got == want


class TestAdaptiveTiles:
    def _pts_at(self, spark, cells, res, counts):
        return _pts(spark, cells, res, counts)

    def test_split_and_keep(self, spark):
        """A coarse cell over the cap is replaced by exactly its
        occupied fine children (counts preserved); a cold cell stays
        at coarse res."""
        from geospark.operators.tiles import adaptive_tiles
        # fine res 4 cells: (8,8) and (8,9) share coarse (res 2) parent
        # (2,2); (0,0) is alone under coarse (0,0)
        pts = self._pts_at(spark, [(8, 8), (8, 9), (0, 0)], 4,
                           [6, 5, 3])
        got = _rows(adaptive_tiles(pts, 2, 4, cap=10),
                    ["cell", "res", "n_pts"])
        assert got == sorted([
            (_cell(8, 8, 4), 4, 6), (_cell(8, 9, 4), 4, 5),
            (_cell(0, 0, 2), 2, 3)])

    def test_boundary_cap_not_split(self, spark):
        """count == cap stays coarse (strict > splits)."""
        from geospark.operators.tiles import adaptive_tiles
        pts = self._pts_at(spark, [(8, 8)], 4, [10])
        got = _rows(adaptive_tiles(pts, 2, 4, cap=10),
                    ["cell", "res", "n_pts"])
        assert got == [(_cell(2, 2, 2), 2, 10)]

    def test_counts_conserved(self, spark):
        """Total n_pts across the adaptive layer == input row count."""
        from pyspark.sql import functions as F

        from geospark.operators.tiles import adaptive_tiles
        rng = np.random.default_rng(3)
        rows = [(float(a), float(b)) for a, b in zip(
            rng.uniform(-89, 89, 500).round(2),
            rng.uniform(-179, 179, 500).round(2))]
        pts = spark.createDataFrame(rows, "lat double, lon double")
        out = adaptive_tiles(pts, 2, 4, cap=20)
        assert out.agg(F.sum("n_pts")).collect()[0][0] == 500

    def test_one_scan_plan(self, spark):
        """The fine/coarse aggregate layers are materialized once, so
        the keep/hot/split branches never re-scan the raw input: the
        final plan reads only the frozen aggregates (zero parquet
        scans; the single real scan happened inside the eager
        materialize)."""
        from geospark.operators.tiles import adaptive_tiles
        self._pts_at(spark, [(8, 8)], 4, [3]) \
            .write.mode("overwrite").parquet("/tmp/_adapt_pts")
        df = spark.read.parquet("/tmp/_adapt_pts")
        plan = adaptive_tiles(df, 2, 4, cap=10) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan parquet") == 0
        assert "Scan ExistingRDD" in plan
