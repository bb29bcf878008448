"""Round-5 session-5 operator tests: grid_reach multi-source BFS."""

from __future__ import annotations


def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _center(y, x, res):
    n = 1 << res
    return (-90.0 + (y + 0.5) * 180.0 / n,
            -180.0 + (x + 0.5) * 360.0 / n)


def _cell(y, x, res):
    return (res << 56) | (y << res) | x


def _pts(spark, cells, res, counts):
    rows = []
    for (y, x), c in zip(cells, counts):
        lat, lon = _center(y, x, res)
        rows += [(lat, lon)] * c
    return spark.createDataFrame(rows, "lat double, lon double")


class TestGridReach:
    RES = 4

    def test_obstacle_lengthens_path(self, spark):
        """Paths are constrained to OCCUPIED cells: with the direct
        corridor missing, the hop count is the detour length, not the
        Chebyshev distance. Seed (4,4); target (4,7) is Chebyshev 3
        away but the straight cells (4,5)/(4,6) are unoccupied — the
        occupied detour via row 5 gives hops 3 only because diagonals
        count ((5,5),(5,6) then up); remove one detour cell and the
        target drops out entirely."""
        from geospark.operators.cluster import grid_reach
        cells = [(4, 4), (5, 5), (5, 6), (4, 7)]
        pts = _pts(spark, cells, self.RES, [3, 1, 1, 1])
        got = _rows(grid_reach(pts, self.RES, 5, min_seed_pts=3),
                    ["cell", "seed", "hops"])
        r = self.RES
        s = _cell(4, 4, r)
        assert got == sorted([
            (s, s, 0),
            (_cell(5, 5, r), s, 1),
            (_cell(5, 6, r), s, 2),
            (_cell(4, 7, r), s, 3)])
        # sever the detour: the target is unreachable at any budget
        pts2 = _pts(spark, [(4, 4), (5, 5), (4, 7)], self.RES,
                    [3, 1, 1])
        got2 = _rows(grid_reach(pts2, self.RES, 5, min_seed_pts=3),
                     ["cell", "seed", "hops"])
        assert got2 == sorted([
            (s, s, 0), (_cell(5, 5, r), s, 1)])

    def test_equal_hops_min_seed_wins(self, spark):
        """A cell at the same hop distance from two seeds gets the
        numerically smaller seed id."""
        from geospark.operators.cluster import grid_reach
        # seeds (4,4) and (4,6); middle (4,5) is 1 hop from both
        cells = [(4, 4), (4, 5), (4, 6)]
        pts = _pts(spark, cells, self.RES, [3, 1, 3])
        got = _rows(grid_reach(pts, self.RES, 2, min_seed_pts=3),
                    ["cell", "seed", "hops"])
        r = self.RES
        a, b = _cell(4, 4, r), _cell(4, 6, r)
        assert a < b
        assert got == sorted([
            (a, a, 0), (b, b, 0), (_cell(4, 5, r), a, 1)])

    def test_max_hops_cutoff_and_early_break(self, spark):
        """Cells past the hop budget are absent; a budget larger than
        the graph's eccentricity early-breaks to the same answer."""
        from geospark.operators.cluster import grid_reach
        chain = [(4, 4), (4, 5), (4, 6), (4, 7)]
        pts = _pts(spark, chain, self.RES, [3, 1, 1, 1])
        r = self.RES
        s = _cell(4, 4, r)
        got1 = _rows(grid_reach(pts, self.RES, 2, min_seed_pts=3),
                     ["cell", "seed", "hops"])
        assert got1 == sorted([
            (s, s, 0), (_cell(4, 5, r), s, 1), (_cell(4, 6, r), s, 2)])
        got2 = _rows(grid_reach(pts, self.RES, 20, min_seed_pts=3),
                     ["cell", "seed", "hops"])
        assert got2 == sorted(got1 + [(_cell(4, 7, r), s, 3)])

    def test_antimeridian_wrap(self, spark):
        """x wraps: a seed at x=0 reaches x=n-1 in one hop."""
        from geospark.operators.cluster import grid_reach
        n = 1 << self.RES
        pts = _pts(spark, [(7, 0), (7, n - 1)], self.RES, [3, 1])
        r = self.RES
        s = _cell(7, 0, r)
        got = _rows(grid_reach(pts, self.RES, 3, min_seed_pts=3),
                    ["cell", "seed", "hops"])
        assert got == sorted([(s, s, 0), (_cell(7, n - 1, r), s, 1)])

    def test_explicit_seeds_and_unoccupied_seed_dropped(self, spark):
        """An explicit seed on an unoccupied cell contributes nothing
        (paths must start on the raster); an occupied one labels its
        component."""
        from geospark.operators.cluster import grid_reach
        r = self.RES
        pts = _pts(spark, [(4, 4), (4, 5)], self.RES, [1, 1])
        seeds = spark.createDataFrame(
            [(_cell(4, 4, r),), (_cell(10, 10, r),)], "cell long")
        got = _rows(grid_reach(pts, self.RES, 2, seeds=seeds),
                    ["cell", "seed", "hops"])
        s = _cell(4, 4, r)
        assert got == sorted([(s, s, 0), (_cell(4, 5, r), s, 1)])

    def test_seed_arg_validation(self, spark):
        import pytest

        from geospark.operators.cluster import grid_reach
        pts = _pts(spark, [(4, 4)], self.RES, [1])
        with pytest.raises(ValueError):
            grid_reach(pts, self.RES, 2)
        with pytest.raises(ValueError):
            grid_reach(pts, self.RES, 2, min_seed_pts=1,
                       seeds=pts.limit(0))

    def test_inline_oracle_parity(self, spark, tmp_path):
        """Cross-engine hash parity on a small random cloud (the
        sf0.01 catalog row is the full-size version of this)."""
        import duckdb
        import numpy as np

        from geospark.operators.cluster import grid_reach, grid_reach_sql
        rng = np.random.default_rng(7)
        rows = [(float(a), float(b)) for a, b in zip(
            rng.uniform(-89, 89, 300).round(2),
            rng.uniform(-179, 179, 300).round(2))]
        pts = spark.createDataFrame(rows, "lat double, lon double")
        got = _rows(grid_reach(pts, 3, 3, min_seed_pts=2),
                    ["cell", "seed", "hops"])
        con = duckdb.connect()
        con.execute("CREATE TABLE p (lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(
            grid_reach_sql("SELECT lat, lon FROM p", 3, 3, 2))
            .fetchall())
        assert got == want


class TestTrajSimilarity:
    RES = 4

    def _ev(self, spark, visits):
        """visits: list of (user, (y, x)) -> events DataFrame."""
        rows = [(u, *_center(y, x, self.RES)) for u, (y, x) in visits]
        return spark.createDataFrame(
            rows, "user_id long, lat double, lon double")

    def test_jaccard_and_floor(self, spark):
        """A={c1,c2,c3}, B={c2,c3,c4}: shared 2, union 4 -> exactly
        500000 ppm; C={c1} vs A: shared 1, union 3 -> floor(1e6/3) =
        333333 (the BIGINT floor, not a rounded float)."""
        from geospark.operators.events import traj_similarity
        c1, c2, c3, c4 = (1, 1), (2, 2), (3, 3), (4, 4)
        ev = self._ev(spark, [(1, c1), (1, c2), (1, c3),
                              (2, c2), (2, c3), (2, c4),
                              (3, c1)])
        got = _rows(traj_similarity(ev, self.RES, min_shared=1),
                    ["user_a", "user_b", "n_shared", "jacc_ppm"])
        assert got == sorted([(1, 2, 2, 500000), (1, 3, 1, 333333)])

    def test_repeat_visits_collapse(self, spark):
        """Revisiting the same cell 5 times counts once in both the
        intersection and the set sizes."""
        from geospark.operators.events import traj_similarity
        c1, c2 = (1, 1), (2, 2)
        ev = self._ev(spark, [(1, c1)] * 5 + [(1, c2),
                                              (2, c1), (2, c2)])
        got = _rows(traj_similarity(ev, self.RES, min_shared=1),
                    ["user_a", "user_b", "n_shared", "jacc_ppm"])
        assert got == [(1, 2, 2, 1000000)]

    def test_hot_cell_dropped_from_universe(self, spark):
        """A cell hotter than max_bucket is dropped WHOLE: it neither
        produces pairs nor counts toward set sizes (the kept-universe
        rule), so the Jaccard stays exact over kept cells."""
        from geospark.operators.events import traj_similarity
        hot, c1, c2 = (1, 1), (2, 2), (3, 3)
        visits = [(u, hot) for u in range(1, 6)]          # 5 users
        visits += [(1, c1), (1, c2), (2, c1), (2, c2)]
        ev = self._ev(spark, visits)
        got = _rows(traj_similarity(ev, self.RES, max_bucket=4,
                                    min_shared=1),
                    ["user_a", "user_b", "n_shared", "jacc_ppm"])
        # hot cell gone: only users 1,2 share {c1,c2}, sizes 2 and 2
        assert got == [(1, 2, 2, 1000000)]

    def test_min_shared_and_min_jacc_gates(self, spark):
        from geospark.operators.events import traj_similarity
        c1, c2, c3, c4, c5 = [(i, i) for i in range(1, 6)]
        ev = self._ev(spark, [(1, c1), (1, c2), (1, c3), (1, c4),
                              (2, c1), (2, c2),
                              (3, c1), (3, c5)])
        # pair (1,2): shared 2 jacc 500000; (1,3): shared 1;
        # (2,3): shared 1
        got = _rows(traj_similarity(ev, self.RES, min_shared=2),
                    ["user_a", "user_b"])
        assert got == [(1, 2)]
        got2 = _rows(traj_similarity(ev, self.RES, min_shared=1,
                                     min_jacc_ppm=400000),
                     ["user_a", "user_b"])
        assert got2 == [(1, 2)]

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.events import (traj_similarity,
                                               traj_similarity_sql)
        rng = np.random.default_rng(11)
        rows = [(int(u), float(a), float(b)) for u, a, b in zip(
            rng.integers(1, 20, 400),
            rng.uniform(-80, 80, 400).round(1),
            rng.uniform(-170, 170, 400).round(1))]
        ev = spark.createDataFrame(
            rows, "user_id long, lat double, lon double")
        got = _rows(traj_similarity(ev, 3, min_shared=2),
                    ["user_a", "user_b", "n_shared", "jacc_ppm"])
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE e (user_id BIGINT, lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO e VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(traj_similarity_sql(
            "SELECT user_id, lat, lon FROM e", 3, min_shared=2))
            .fetchall())
        assert got == want


class TestFenceEvents:
    RES = 4

    def _ev(self, spark, rows):
        """rows: (user, us, event_id, (y, x))."""
        data = [(u, us, e, *_center(y, x, self.RES))
                for u, us, e, (y, x) in rows]
        return spark.createDataFrame(
            data, "user_id long, us long, event_id long, "
                  "lat double, lon double")

    def _fence(self, spark, cells):
        return spark.createDataFrame(
            [(_cell(y, x, self.RES),) for y, x in cells],
            "cell long")

    def test_enter_exit_sequence(self, spark):
        """outside -> inside -> inside -> outside emits one enter (at
        the first inside event) and one exit (at the first outside
        event — the detection-time convention)."""
        from geospark.operators.events import fence_events
        f = self._fence(spark, [(5, 5), (5, 6)])
        ev = self._ev(spark, [(1, 10, 1, (0, 0)), (1, 20, 2, (5, 5)),
                              (1, 30, 3, (5, 6)), (1, 40, 4, (9, 9))])
        got = _rows(fence_events(ev, f, self.RES),
                    ["user_id", "us", "event", "cell"])
        assert got == [(1, 20, "enter", _cell(5, 5, self.RES)),
                       (1, 40, "exit", _cell(9, 9, self.RES))]

    def test_starts_inside_enters_at_first_event(self, spark):
        from geospark.operators.events import fence_events
        f = self._fence(spark, [(5, 5)])
        ev = self._ev(spark, [(1, 10, 1, (5, 5)), (1, 20, 2, (5, 5))])
        got = _rows(fence_events(ev, f, self.RES),
                    ["user_id", "us", "event"])
        assert got == [(1, 10, "enter")]

    def test_never_inside_emits_nothing(self, spark):
        from geospark.operators.events import fence_events
        f = self._fence(spark, [(5, 5)])
        ev = self._ev(spark, [(1, 10, 1, (0, 0)), (1, 20, 2, (1, 1))])
        assert fence_events(ev, f, self.RES).count() == 0

    def test_moving_within_fence_no_event(self, spark):
        """Hopping between two fence cells is not a transition."""
        from geospark.operators.events import fence_events
        f = self._fence(spark, [(5, 5), (6, 6)])
        ev = self._ev(spark, [(1, 10, 1, (5, 5)), (1, 20, 2, (6, 6)),
                              (1, 30, 3, (5, 5))])
        got = _rows(fence_events(ev, f, self.RES),
                    ["user_id", "us", "event"])
        assert got == [(1, 10, "enter")]

    def test_equal_ts_tiebreak_by_event_id(self, spark):
        """Two events at the same us order by event_id: inside at
        tie 1, outside at tie 2 -> enter then exit, both at us 10."""
        from geospark.operators.events import fence_events
        f = self._fence(spark, [(5, 5)])
        ev = self._ev(spark, [(1, 10, 1, (5, 5)), (1, 10, 2, (0, 0))])
        got = _rows(fence_events(ev, f, self.RES),
                    ["user_id", "us", "event"])
        assert got == [(1, 10, "enter"), (1, 10, "exit")]

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.events import (fence_events,
                                               fence_events_sql)
        rng = np.random.default_rng(7)
        rows = [(int(u), int(us), int(e), float(a), float(b))
                for e, (u, us, a, b) in enumerate(zip(
                    rng.integers(1, 12, 300),
                    rng.integers(0, 10**9, 300),
                    rng.uniform(-80, 80, 300).round(1),
                    rng.uniform(-170, 170, 300).round(1)))]
        ev = spark.createDataFrame(
            rows, "user_id long, us long, event_id long, "
                  "lat double, lon double")
        # fence = density rule over the same points (aggregate-sized)
        from pyspark.sql import functions as F
        from geospark.functions.cells import cell_encode
        fence = (ev.select(cell_encode("lat", "lon", 2).alias("cell"))
                 .groupBy("cell").count()
                 .filter(F.col("count") >= 10).select("cell"))
        got = _rows(fence_events(ev, fence, 2),
                    ["user_id", "us", "event", "cell"])
        con = duckdb.connect()
        con.execute("CREATE TABLE e (user_id BIGINT, us BIGINT, "
                    "event_id BIGINT, lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO e VALUES (?, ?, ?, ?, ?)", rows)
        from geospark.functions.cells import cell_encode_sql
        fsql = (f"SELECT {cell_encode_sql('lat', 'lon', 2)} AS cell "
                "FROM e GROUP BY 1 HAVING COUNT(*) >= 10")
        want = sorted(tuple(r) for r in con.execute(fence_events_sql(
            "SELECT user_id, us, event_id, lat, lon FROM e", fsql, 2))
            .fetchall())
        assert len(got) > 0 and got == want


class TestSpeedFlags:
    def _ev(self, spark, rows):
        """rows: (user, us, event_id, lat, lon)."""
        return spark.createDataFrame(
            rows, "user_id long, us long, event_id long, "
                  "lat double, lon double")

    def test_flags_only_fast_hops(self, spark):
        """1 degree = 1e6 micro-deg. Hop of 1 deg lon in 1000 s =
        1000 u/s: flagged at vmax 999, clean at vmax 1001."""
        from geospark.operators.events import speed_flags
        ev = self._ev(spark, [(1, 0, 1, 0.0, 0.0),
                              (1, 10**9, 2, 0.0, 1.0)])
        assert speed_flags(ev, vmax_udeg_s=999).count() == 1
        assert speed_flags(ev, vmax_udeg_s=1001).count() == 0

    def test_boundary_is_strict(self, spark):
        """d2 == lim*lim is NOT flagged (strict >): 1000 u in 1 s at
        vmax 1000 -> lim 1000, d2 = 1000^2."""
        from geospark.operators.events import speed_flags
        ev = self._ev(spark, [(1, 0, 1, 0.0, 0.0),
                              (1, 10**6, 2, 0.0, 0.001)])
        assert speed_flags(ev, vmax_udeg_s=1000).count() == 0
        assert speed_flags(ev, vmax_udeg_s=999).count() == 1

    def test_zero_dt_teleport(self, spark):
        """Same timestamp, nonzero displacement: lim = 0, flagged at
        any vmax; zero displacement at same ts is clean."""
        from geospark.operators.events import speed_flags
        ev = self._ev(spark, [(1, 5, 1, 0.0, 0.0),
                              (1, 5, 2, 0.0, 2.0),
                              (2, 5, 1, 1.0, 1.0),
                              (2, 5, 2, 1.0, 1.0)])
        got = _rows(speed_flags(ev, vmax_udeg_s=10**6),
                    ["user_id", "us", "dt_us", "d2"])
        assert got == [(1, 5, 0, 4 * 10**12)]

    def test_per_user_windows_dont_cross(self, spark):
        """The hop from user 1's last event to user 2's first event
        does not exist."""
        from geospark.operators.events import speed_flags
        ev = self._ev(spark, [(1, 0, 1, 0.0, 0.0),
                              (2, 1, 2, 50.0, 50.0)])
        assert speed_flags(ev, vmax_udeg_s=1).count() == 0

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.events import (speed_flags,
                                               speed_flags_sql)
        rng = np.random.default_rng(13)
        rows = [(int(u), int(us), int(e), float(a), float(b))
                for e, (u, us, a, b) in enumerate(zip(
                    rng.integers(1, 15, 400),
                    rng.integers(0, 10**10, 400),
                    rng.uniform(-80, 80, 400),
                    rng.uniform(-170, 170, 400)))]
        ev = spark.createDataFrame(
            rows, "user_id long, us long, event_id long, "
                  "lat double, lon double")
        got = _rows(speed_flags(ev, vmax_udeg_s=25_000),
                    ["user_id", "us", "dt_us", "d2"])
        con = duckdb.connect()
        con.execute("CREATE TABLE e (user_id BIGINT, us BIGINT, "
                    "event_id BIGINT, lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO e VALUES (?, ?, ?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(speed_flags_sql(
            "SELECT user_id, us, event_id, lat, lon FROM e", 25_000))
            .fetchall())
        # both classes live in the fixture
        n_hops = con.execute(
            "SELECT COUNT(*) - COUNT(DISTINCT user_id) FROM e"
        ).fetchone()[0]
        assert 0 < len(got) < n_hops
        assert got == want

    def test_long_gap_no_overflow(self, spark):
        """A multi-year gap would overflow lim^2 unclamped; the 6e8
        clamp keeps the hop computable and (correctly) unflagged."""
        from geospark.operators.events import speed_flags
        ev = self._ev(spark, [(1, 0, 1, 0.0, -170.0),
                              (1, 10**14, 2, 0.0, 170.0)])
        assert speed_flags(ev, vmax_udeg_s=25_000).count() == 0


class TestKmeansCells:
    RES = 4

    def test_two_obvious_clusters(self, spark):
        """Two dense blobs far apart, k=2: every cell labels to the
        seed inside its own blob after one round."""
        from geospark.operators.cluster import kmeans_cells
        pts = _pts(spark,
                   [(1, 1), (1, 2), (2, 1),      # blob A
                    (12, 12), (12, 13), (13, 12)],  # blob B
                   self.RES, [5, 3, 3, 5, 3, 3])
        got = _rows(kmeans_cells(pts, self.RES, 2, 1),
                    ["cell", "cid"])
        a_seed = _cell(1, 1, self.RES)
        b_seed = _cell(12, 12, self.RES)
        want = sorted([(_cell(1, 1, self.RES), a_seed),
                       (_cell(1, 2, self.RES), a_seed),
                       (_cell(2, 1, self.RES), a_seed),
                       (_cell(12, 12, self.RES), b_seed),
                       (_cell(12, 13, self.RES), b_seed),
                       (_cell(13, 12, self.RES), b_seed)])
        assert got == want

    def test_weighted_floor_centroid_moves_label(self, spark):
        """The update is the weighted FLOOR mean: a heavy cell drags
        the centroid toward itself, flipping a boundary cell's label
        between iters=0 (seed positions) and iters=1 (one update)."""
        from geospark.operators.cluster import kmeans_cells
        # seeds = top-2 by count: (0,0) n=20 and (0,8) n=15. Boundary
        # cell (0,4) n=1 is d2=16 from BOTH seeds -> tie, broken by
        # MIN cid = seed (0,0). Cell (0,6) n=10 joins B (d2 4 vs 36)
        # and drags B's centroid to floor((8*15+6*10)/25) = 7 while
        # A's stays at floor((0*20+4*1)/21) = 0; next round (0,4)
        # sees d2 16 vs 9 and flips to B.
        pts = _pts(spark, [(0, 0), (0, 8), (0, 4), (0, 6)],
                   self.RES, [20, 15, 1, 10])
        a, b = _cell(0, 0, self.RES), _cell(0, 8, self.RES)
        got0 = dict((r[0], r[1]) for r in _rows(
            kmeans_cells(pts, self.RES, 2, 0), ["cell", "cid"]))
        assert got0[_cell(0, 4, self.RES)] == a  # tie d2=16 -> min cid
        got1 = dict((r[0], r[1]) for r in _rows(
            kmeans_cells(pts, self.RES, 2, 1), ["cell", "cid"]))
        assert got1[_cell(0, 4, self.RES)] == b

    def test_k_exceeds_cells(self, spark):
        """k larger than the number of occupied cells degrades to one
        centroid per cell (every cell is its own seed)."""
        from geospark.operators.cluster import kmeans_cells
        pts = _pts(spark, [(3, 3), (9, 9)], self.RES, [2, 1])
        got = _rows(kmeans_cells(pts, self.RES, 5, 2),
                    ["cell", "n_pts", "cid"])
        assert got == sorted([
            (_cell(3, 3, self.RES), 2, _cell(3, 3, self.RES)),
            (_cell(9, 9, self.RES), 1, _cell(9, 9, self.RES))])

    def test_empty_cluster_drops(self, spark):
        """A seed whose every cell defects re-labels nothing: with
        both points nearer seed A after A's centroid update, B keeps
        only its own seed cell (it IS a cell)."""
        from geospark.operators.cluster import kmeans_cells
        pts = _pts(spark, [(0, 0), (0, 1)], self.RES, [5, 4])
        got = _rows(kmeans_cells(pts, self.RES, 2, 3),
                    ["cell", "cid"])
        # both seeds are occupied cells, each stays its own cluster
        assert len(got) == 2 and len({c for _, c in got}) == 2

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.cluster import (kmeans_cells,
                                                kmeans_cells_sql)
        rng = np.random.default_rng(23)
        rows = [(float(a), float(b)) for a, b in zip(
            rng.uniform(-80, 80, 500).round(2),
            rng.uniform(-170, 170, 500).round(2))]
        pts = spark.createDataFrame(rows, "lat double, lon double")
        got = _rows(kmeans_cells(pts, 3, 5, 3),
                    ["cell", "n_pts", "cid"])
        con = duckdb.connect()
        con.execute("CREATE TABLE p (lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(kmeans_cells_sql(
            "SELECT lat, lon FROM p", 3, 5, 3)).fetchall())
        assert len({c for *_, c in got}) > 1
        assert got == want


class TestPolitenessSchedule:
    def _urls(self, spark, urls):
        return spark.createDataFrame([(u,) for u in urls],
                                     "url string")

    def test_slots_and_times_per_host(self, spark):
        """Three urls on one host queue at slots 0,1,2 with fetch
        times start + slot*delay; a second host starts back at 0."""
        from geospark.operators.dedup import politeness_schedule
        d = self._urls(spark, [
            "http://a.com/x", "http://a.com/y", "http://a.com/z",
            "http://b.com/only"])
        got = _rows(politeness_schedule(d, 1000, start_us=50),
                    ["host", "slot", "fetch_at_us"])
        assert got == sorted([("a.com", 0, 50), ("a.com", 1, 1050),
                              ("a.com", 2, 2050), ("b.com", 0, 50)])

    def test_queue_order_is_hash_not_path(self, spark):
        """Order within a host follows md5(canonical), not the path:
        with 50 sequential paths the queue is NOT in path order (a
        directory can't monopolize the queue head)."""
        from geospark.operators.dedup import politeness_schedule
        d = self._urls(spark, [f"http://a.com/p/{i:03d}"
                               for i in range(50)])
        rows = politeness_schedule(d, 10).orderBy("slot").collect()
        paths = [r["url"] for r in rows]
        assert sorted(paths) == [f"http://a.com/p/{i:03d}"
                                 for i in range(50)]
        assert paths != sorted(paths)

    def test_canonical_variants_share_host(self, spark):
        """HTTP://WWW.A.COM and https://a.com/ land on one host
        queue (canonicalization runs before host extraction)."""
        from geospark.operators.dedup import politeness_schedule
        d = self._urls(spark, ["HTTP://WWW.A.COM/x",
                               "https://a.com/y"])
        got = _rows(politeness_schedule(d, 10), ["host", "slot"])
        assert got == [("a.com", 0), ("a.com", 1)]

    def test_inline_oracle_parity(self, spark):
        import duckdb

        from geospark.operators.dedup import (politeness_schedule,
                                              politeness_schedule_sql)
        urls = ([f"http://h{i % 7}.org/d{i % 3}/p{i}?utm_source=x"
                 for i in range(200)]
                + [f"HTTPS://WWW.H{i % 7}.ORG/d{i % 3}/p{i}#frag"
                   for i in range(100)])
        d = self._urls(spark, urls)
        got = _rows(politeness_schedule(d, 250_000),
                    ["url", "host", "slot", "fetch_at_us"])
        con = duckdb.connect()
        con.execute("CREATE TABLE u (url VARCHAR)")
        con.executemany("INSERT INTO u VALUES (?)",
                        [(u,) for u in urls])
        want = sorted(tuple(r) for r in con.execute(
            politeness_schedule_sql("SELECT url FROM u", 250_000))
            .fetchall())
        assert got == want


class TestCellDownsample:
    RES = 4

    def test_cap_and_determinism(self, spark):
        """12 points in one cell, cap 5: exactly 5 survive, and two
        runs keep the SAME ids."""
        from geospark.operators.tiles import cell_downsample
        lat, lon = _center(3, 3, self.RES)
        d = spark.createDataFrame(
            [(i, lat, lon) for i in range(12)],
            "id long, lat double, lon double")
        a = _rows(cell_downsample(d, self.RES, 5, id_col="id"),
                  ["id"])
        b = _rows(cell_downsample(d, self.RES, 5, id_col="id"),
                  ["id"])
        assert len(a) == 5 and a == b

    def test_under_cap_cell_untouched(self, spark):
        from geospark.operators.tiles import cell_downsample
        la1, lo1 = _center(1, 1, self.RES)
        la2, lo2 = _center(9, 9, self.RES)
        d = spark.createDataFrame(
            [(1, la1, lo1), (2, la1, lo1)] + [(i, la2, lo2)
                                              for i in range(10, 20)],
            "id long, lat double, lon double")
        got = cell_downsample(d, self.RES, 3, id_col="id")
        per = dict((r["cell"], r["count"]) for r in
                   got.groupBy("cell").count().collect())
        assert per == {_cell(1, 1, self.RES): 2,
                       _cell(9, 9, self.RES): 3}

    def test_keeps_input_columns(self, spark):
        from geospark.operators.tiles import cell_downsample
        la, lo = _center(2, 2, self.RES)
        d = spark.createDataFrame([(1, la, lo, "payload")],
                                  "id long, lat double, lon double, "
                                  "extra string")
        row = cell_downsample(d, self.RES, 5, id_col="id").first()
        assert row["extra"] == "payload"
        assert row["cell"] == _cell(2, 2, self.RES)

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import (cell_downsample,
                                              cell_downsample_sql)
        rng = np.random.default_rng(31)
        rows = [(int(i), float(a), float(b)) for i, (a, b) in
                enumerate(zip(rng.uniform(-60, 60, 600).round(1),
                              rng.uniform(-150, 150, 600).round(1)))]
        d = spark.createDataFrame(rows,
                                  "id long, lat double, lon double")
        got = _rows(cell_downsample(d, 2, 7, id_col="id")
                    .select("id", "cell"), ["id", "cell"])
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE p (id BIGINT, lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(cell_downsample_sql(
            "SELECT id, lat, lon FROM p", 2, 7)).fetchall())
        assert 0 < len(got) < 600
        assert got == want


class TestCellQuotaSample:
    RES = 4

    def _pts_ids(self, spark, cells, counts):
        rows, i = [], 0
        for (y, x), c in zip(cells, counts):
            lat, lon = _center(y, x, self.RES)
            for _ in range(c):
                rows.append((i, lat, lon))
                i += 1
        return spark.createDataFrame(
            rows, "id long, lat double, lon double")

    def test_exact_total_and_proportionality(self, spark):
        """Counts 60/30/10, budget 10 -> quotas exactly 6/3/1 and
        exactly 10 rows total."""
        from geospark.operators.tiles import cell_quota_sample
        d = self._pts_ids(spark, [(1, 1), (2, 2), (3, 3)],
                          [60, 30, 10])
        got = cell_quota_sample(d, self.RES, 10, id_col="id")
        per = dict((r["cell"], r["count"]) for r in
                   got.groupBy("cell").count().collect())
        assert per == {_cell(1, 1, self.RES): 6,
                       _cell(2, 2, self.RES): 3,
                       _cell(3, 3, self.RES): 1}

    def test_largest_remainder_exactness(self, spark):
        """Counts 10/10/10, budget 10: floors are 3 each (9 total),
        the +1 goes to ONE cell by (remainder, cell) order — total
        still exactly 10."""
        from geospark.operators.tiles import cell_quota_sample
        d = self._pts_ids(spark, [(1, 1), (2, 2), (3, 3)],
                          [10, 10, 10])
        got = cell_quota_sample(d, self.RES, 10, id_col="id")
        per = sorted(r["count"] for r in
                     got.groupBy("cell").count().collect())
        assert per == [3, 3, 4]
        assert got.count() == 10

    def test_deterministic_reruns(self, spark):
        from geospark.operators.tiles import cell_quota_sample
        d = self._pts_ids(spark, [(1, 1), (5, 5)], [40, 20])
        a = _rows(cell_quota_sample(d, self.RES, 15, id_col="id"))
        b = _rows(cell_quota_sample(d, self.RES, 15, id_col="id"))
        assert a == b and len(a) == 15

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import (cell_quota_sample,
                                              cell_quota_sample_sql)
        rng = np.random.default_rng(41)
        rows = [(int(i), float(a), float(b)) for i, (a, b) in
                enumerate(zip(rng.uniform(-60, 60, 500).round(1),
                              rng.uniform(-150, 150, 500).round(1)))]
        d = spark.createDataFrame(rows,
                                  "id long, lat double, lon double")
        got = _rows(cell_quota_sample(d, 2, 123, id_col="id"),
                    ["id", "cell"])
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE p (id BIGINT, lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(
            cell_quota_sample_sql("SELECT id, lat, lon FROM p",
                                  2, 123)).fetchall())
        assert len(got) == 123
        assert got == want


class TestStreamFenceEvents:
    RES = 4

    def test_matches_batch_across_microbatches(self, spark, tmp_path):
        """Chunked replay through the state store equals the batch
        fence_events operator exactly — including a membership bit
        that must SURVIVE a microbatch boundary (user inside the
        fence at the end of file 1, exits in file 2)."""
        import datetime as dt

        from pyspark.sql import functions as F

        from geospark.operators.events import fence_events
        from geospark.streaming.stream import stream_fence_events
        base = dt.datetime(2024, 1, 1)
        inside, outside = _center(5, 5, self.RES), _center(0, 0,
                                                           self.RES)
        rows, eid = [], 0
        # user 1: out, in | in, out  (split across the file boundary
        # mid-stay); user 2: in | in (no exit ever); user 3 never in
        spots = {1: [outside, inside, inside, outside],
                 2: [inside, inside],
                 3: [outside, outside, outside]}
        for uid, seq in spots.items():
            t = base + dt.timedelta(minutes=uid)
            for lat, lon in seq:
                rows.append((eid, t, uid, lat, lon))
                eid += 1
                t += dt.timedelta(minutes=7)
        # interleave users, split mid-way
        rows.sort(key=lambda r: (r[1], r[0]))
        half = len(rows) // 2
        schema = ("event_id long, ts timestamp_ntz, user_id long, "
                  "lat double, lon double")
        src = str(tmp_path / "fence_src")
        spark.createDataFrame(rows[:half], schema).coalesce(1) \
            .write.mode("overwrite").parquet(src)
        spark.createDataFrame(rows[half:], schema).coalesce(1) \
            .write.mode("append").parquet(src)

        fence = [_cell(5, 5, self.RES)]
        sdf = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
        out = stream_fence_events(sdf, fence, self.RES)
        q = (out.writeStream.format("memory")
             .queryName("fence_stream").outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        got = sorted(tuple(r) for r in spark.sql(
            "SELECT user_id, us, event, cell FROM fence_stream")
            .collect())

        e = spark.read.parquet(src)
        pts = e.select("user_id", "event_id", "lat", "lon",
                       F.expr("timestampdiff(MICROSECOND, "
                              "TIMESTAMP_NTZ '2024-01-01 00:00:00', "
                              "ts)").alias("us"))
        fdf = spark.createDataFrame([(c,) for c in fence],
                                    "cell long")
        want_df = fence_events(pts, fdf, self.RES)
        # batch us is epoch-2024 µs; stream us is epoch-1970 µs
        off = int(dt.datetime(2024, 1, 1,
                              tzinfo=dt.timezone.utc).timestamp()
                  * 1_000_000)
        want = sorted((r["user_id"], r["us"] + off, r["event"],
                       r["cell"]) for r in want_df.collect())
        assert len(got) == 3  # u1 enter+exit, u2 enter, u3 nothing
        assert got == want

    def test_state_survives_restart(self, spark, tmp_path):
        """Same checkpoint dir, new files appended after the first
        run: the second run emits ONLY the new transition (the bit
        was persisted, not recomputed)."""
        import datetime as dt
        from geospark.streaming.stream import stream_fence_events
        base = dt.datetime(2024, 1, 1)
        inside, outside = _center(5, 5, self.RES), _center(0, 0,
                                                           self.RES)
        schema = ("event_id long, ts timestamp_ntz, user_id long, "
                  "lat double, lon double")
        src = str(tmp_path / "src")
        ck = str(tmp_path / "ck")
        fence = [_cell(5, 5, self.RES)]

        out = str(tmp_path / "out")

        def run():
            # file sink (memory sink can't recover from a checkpoint)
            sdf = (spark.readStream.schema(schema)
                   .option("maxFilesPerTrigger", 1).parquet(src))
            q = (stream_fence_events(sdf, fence, self.RES)
                 .writeStream.format("parquet")
                 .option("path", out).outputMode("append")
                 .option("checkpointLocation", ck)
                 .trigger(availableNow=True).start())
            q.awaitTermination()
            return sorted(tuple(r) for r in spark.read.parquet(out)
                          .select("user_id", "event").collect())

        spark.createDataFrame(
            [(0, base, 1, *inside)], schema).coalesce(1) \
            .write.mode("overwrite").parquet(src)
        assert run() == [(1, "enter")]
        spark.createDataFrame(
            [(1, base + dt.timedelta(hours=1), 1, *outside)],
            schema).coalesce(1).write.mode("append").parquet(src)
        # cumulative file-sink contents: first run's enter + new exit
        assert run() == [(1, "enter"), (1, "exit")]


class TestUserMobility:
    RES = 4

    def _ev(self, spark, visits):
        rows = [(u, *_center(y, x, self.RES)) for u, (y, x) in visits]
        return spark.createDataFrame(
            rows, "user_id long, lat double, lon double")

    def test_profile_and_floor_share(self, spark):
        """User 1: 3 events over 2 cells, modal 2/3 -> floor 666666
        ppm. User 2: pinned to one cell -> exactly 1e6."""
        from geospark.operators.events import user_mobility
        ev = self._ev(spark, [(1, (1, 1)), (1, (1, 1)), (1, (2, 2)),
                              (2, (5, 5)), (2, (5, 5))])
        got = _rows(user_mobility(ev, self.RES),
                    ["user_id", "n_events", "n_cells",
                     "top_share_ppm"])
        assert got == [(1, 3, 2, 666666), (2, 2, 1, 1000000)]

    def test_modal_tie_is_share_invariant(self, spark):
        """Two cells tied at 2 visits each: whichever is 'modal', the
        share is the same (2/4 -> 500000)."""
        from geospark.operators.events import user_mobility
        ev = self._ev(spark, [(1, (1, 1)), (1, (1, 1)),
                              (1, (2, 2)), (1, (2, 2))])
        got = _rows(user_mobility(ev, self.RES),
                    ["user_id", "top_share_ppm"])
        assert got == [(1, 500000)]

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.events import (user_mobility,
                                               user_mobility_sql)
        rng = np.random.default_rng(43)
        rows = [(int(u), float(a), float(b)) for u, a, b in zip(
            rng.integers(1, 25, 500),
            rng.uniform(-80, 80, 500).round(1),
            rng.uniform(-170, 170, 500).round(1))]
        ev = spark.createDataFrame(
            rows, "user_id long, lat double, lon double")
        got = _rows(user_mobility(ev, 3),
                    ["user_id", "n_events", "n_cells",
                     "top_share_ppm"])
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE e (user_id BIGINT, lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO e VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(user_mobility_sql(
            "SELECT user_id, lat, lon FROM e", 3)).fetchall())
        assert got == want


class TestCellTrend:
    RES = 4
    DAY = 10  # tiny day_us so test us values stay readable

    def _pts_days(self, spark, cells_days):
        """cells_days: {(y, x): [count_day0, count_day1, ...]}."""
        rows = []
        for (y, x), series in cells_days.items():
            lat, lon = _center(y, x, self.RES)
            for day, c in enumerate(series):
                rows += [(lat, lon, day * self.DAY)] * c
        return spark.createDataFrame(
            rows, "lat double, lon double, us long")

    def test_unit_slopes(self, spark):
        """Counts 1,2,3 -> slope exactly +1e6 ppm/day; 3,2,1 ->
        -1e6; flat 2,2,2 -> 0."""
        from geospark.operators.tiles import cell_trend
        got = dict((r["cell"], r["slope_ppm"]) for r in cell_trend(
            self._pts_days(spark, {(1, 1): [1, 2, 3],
                                   (2, 2): [3, 2, 1],
                                   (3, 3): [2, 2, 2]}),
            self.RES, day_us=self.DAY).collect())
        assert got == {_cell(1, 1, self.RES): 1_000_000,
                       _cell(2, 2, self.RES): -1_000_000,
                       _cell(3, 3, self.RES): 0}

    def test_gap_days_pull_slope_down(self, spark):
        """A cell seen only on the span's first day: its own series is
        1,0,...,0 thanks to the dense fill (another cell extends the
        calendar), so its slope is negative, not undefined."""
        from geospark.operators.tiles import cell_trend
        got = dict((r["cell"], r["slope_ppm"]) for r in cell_trend(
            self._pts_days(spark, {(1, 1): [1],
                                   (2, 2): [1, 1, 1]}),
            self.RES, day_us=self.DAY).collect())
        assert got[_cell(1, 1, self.RES)] < 0
        assert got[_cell(2, 2, self.RES)] == 0

    def test_negative_truncates_toward_zero(self, spark):
        """6-day span, one event on day 2: num = -3, den = 105 ->
        -3e6/105 = -28571.42..., truncated to -28571 (floor would be
        -28572 — the Spark `div` semantics the SQL twin replicates)."""
        from geospark.operators.tiles import cell_trend
        # (9,9) stretches the calendar to days 0..5 (its own slope is
        # 0 by symmetry); (1,1)'s dense series is 0,0,1,0,0,0
        got = dict((r["cell"], (r["n_total"], r["slope_ppm"]))
                   for r in cell_trend(
            self._pts_days(spark, {(1, 1): [0, 0, 1],
                                   (9, 9): [1, 0, 0, 0, 0, 1]}),
            self.RES, day_us=self.DAY).collect())
        assert got[_cell(1, 1, self.RES)] == (1, -28571)
        assert got[_cell(9, 9, self.RES)] == (2, 0)

    def test_single_day_span_empty(self, spark):
        from geospark.operators.tiles import cell_trend
        out = cell_trend(self._pts_days(spark, {(1, 1): [5]}),
                         self.RES, day_us=self.DAY)
        assert out.count() == 0
        assert out.columns == ["cell", "n_total", "slope_ppm"]

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import cell_trend, cell_trend_sql
        rng = np.random.default_rng(47)
        rows = [(float(a), float(b), int(u)) for a, b, u in zip(
            rng.uniform(-60, 60, 800).round(1),
            rng.uniform(-150, 150, 800).round(1),
            rng.integers(0, 200, 800))]
        d = spark.createDataFrame(rows,
                                  "lat double, lon double, us long")
        got = _rows(cell_trend(d, 2, day_us=10),
                    ["cell", "n_total", "slope_ppm"])
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE p (lat DOUBLE, lon DOUBLE, us BIGINT)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(cell_trend_sql(
            "SELECT lat, lon, us FROM p", 2, day_us=10)).fetchall())
        assert any(r[2] < 0 for r in got)   # negative slopes live
        assert got == want


class TestCellRegions:
    RES = 4

    def _pts(self, spark, labeled):
        """labeled: list of ((y, x), label) with repeats allowed."""
        rows = [( *_center(y, x, self.RES), l) for (y, x), l in labeled]
        return spark.createDataFrame(
            rows, "lat double, lon double, label string")

    def test_same_label_merges_different_splits(self, spark):
        """Two adjacent 'a' cells form one region; the adjacent 'b'
        cell is its own region despite touching both."""
        from geospark.operators.cluster import cell_regions
        d = self._pts(spark, [((1, 1), "a"), ((1, 2), "a"),
                              ((1, 3), "b")])
        got = _rows(cell_regions(d, self.RES, label_col="label"),
                    ["cell", "label", "region_id"])
        a1, a2, b = (_cell(1, 1, self.RES), _cell(1, 2, self.RES),
                     _cell(1, 3, self.RES))
        assert got == sorted([(a1, "a", a1), (a2, "a", a1),
                              (b, "b", b)])

    def test_modal_label_and_tie(self, spark):
        """Cell with 2x'b' + 1x'a' is a 'b' cell; a 1-1 tie picks the
        lexicographically smaller label."""
        from geospark.operators.cluster import cell_regions
        d = self._pts(spark, [((1, 1), "b"), ((1, 1), "b"),
                              ((1, 1), "a"),
                              ((5, 5), "b"), ((5, 5), "a")])
        got = dict((r[0], r[1]) for r in _rows(
            cell_regions(d, self.RES, label_col="label"),
            ["cell", "label"]))
        assert got[_cell(1, 1, self.RES)] == "b"
        assert got[_cell(5, 5, self.RES)] == "a"

    def test_diagonal_adjacency_and_gap(self, spark):
        """Diagonal same-label cells merge (8-adjacency); a one-cell
        gap does not."""
        from geospark.operators.cluster import cell_regions
        d = self._pts(spark, [((1, 1), "a"), ((2, 2), "a"),
                              ((2, 4), "a")])
        got = dict((r[0], r[1]) for r in _rows(
            cell_regions(d, self.RES, label_col="label"),
            ["cell", "region_id"]))
        c11 = _cell(1, 1, self.RES)
        assert got[_cell(2, 2, self.RES)] == c11
        assert got[_cell(2, 4, self.RES)] == _cell(2, 4, self.RES)

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.cluster import (cell_regions,
                                                cell_regions_sql)
        rng = np.random.default_rng(53)
        rows = [(float(a), float(b), f"t{int(t)}") for a, b, t in zip(
            rng.uniform(-80, 80, 600).round(1),
            rng.uniform(-170, 170, 600).round(1),
            rng.integers(0, 3, 600))]
        d = spark.createDataFrame(rows,
                                  "lat double, lon double, "
                                  "label string")
        got = _rows(cell_regions(d, 3, label_col="label"),
                    ["cell", "label", "n_pts", "region_id"])
        con = duckdb.connect()
        con.execute("CREATE TABLE p (lat DOUBLE, lon DOUBLE, "
                    "label VARCHAR)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(cell_regions_sql(
            "SELECT lat, lon, label FROM p", 3)).fetchall())
        # non-trivial segmentation: fewer regions than cells
        assert len({r[3] for r in got}) < len(got)
        assert got == want


class TestSemanticClusters:
    def _emb(self, spark, vecs):
        import numpy as np
        rows = [(i, [float(x) for x in np.asarray(v) /
                     np.linalg.norm(v)]) for i, v in vecs]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")

    def test_chain_collapses_singletons_kept(self, spark):
        """Vectors 1~2~3 (pairwise-chained above the threshold)
        collapse to cluster 1 with only vec 1 kept; orthogonal vec 9
        is a kept singleton."""
        import numpy as np
        from geospark.operators.similarity import semantic_clusters
        rng = np.random.default_rng(3)
        base = rng.normal(size=64)
        near1 = base + rng.normal(scale=0.01, size=64)
        near2 = near1 + rng.normal(scale=0.01, size=64)
        ortho = rng.normal(size=64)
        d = self._emb(spark, [(1, base), (2, near1), (3, near2),
                              (9, ortho)])
        got = _rows(semantic_clusters(d, 990_000, k=3,
                                      n_tables=1, n_bits=2,
                                      max_bucket=100),
                    ["vec_id", "cluster_id", "keep"])
        assert got == [(1, 1, 1), (2, 1, 0), (3, 1, 0), (9, 9, 1)]

    def test_threshold_splits_clusters(self, spark):
        """Raising min_sim_ppm above the 1-2 similarity separates
        them into two kept singletons."""
        import numpy as np
        from geospark.operators.similarity import semantic_clusters
        rng = np.random.default_rng(5)
        base = rng.normal(size=64)
        near = base + rng.normal(scale=0.2, size=64)  # sim ~0.98
        d = self._emb(spark, [(1, base), (2, near)])
        lo = semantic_clusters(d, 900_000, k=2, n_tables=1,
                               n_bits=1, max_bucket=100)
        hi = semantic_clusters(d, 999_999, k=2, n_tables=1,
                               n_bits=1, max_bucket=100)
        assert sorted(r["cluster_id"] for r in lo.collect()) == [1, 1]
        assert sorted(r["cluster_id"] for r in hi.collect()) == [1, 2]
        assert sum(r["keep"] for r in hi.collect()) == 2

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.similarity import (
            semantic_clusters, semantic_clusters_sql)
        rng = np.random.default_rng(59)
        # planted near-dup pairs on top of noise
        vecs = []
        for i in range(40):
            vecs.append((i, rng.normal(size=64)))
        for i in range(40, 60):
            b = vecs[i - 40][1]
            vecs.append((i, b + rng.normal(scale=0.02, size=64)))
        d = self._emb(spark, vecs)
        got = _rows(semantic_clusters(d, 950_000, k=3),
                    ["vec_id", "cluster_id", "keep"])
        con = duckdb.connect()
        con.execute("CREATE TABLE embeddings "
                    "(vec_id BIGINT, embedding FLOAT[])")
        norm = [(i, [float(x) for x in np.asarray(v) /
                     np.linalg.norm(v)]) for i, v in vecs]
        con.executemany("INSERT INTO embeddings VALUES (?, ?)", norm)
        want = sorted(tuple(r) for r in con.execute(
            semantic_clusters_sql(950_000, k=3)).fetchall())
        n_clusters = len({c for _, c, _ in got})
        assert n_clusters < 60          # planted dups collapsed
        assert sum(k for *_, k in got) == n_clusters
        assert got == want


class TestRouteLegs:
    def _segs(self, spark):
        """Three horizontal segments side by side on y=0, y=10, y=20."""
        return spark.createDataFrame(
            [(1, 0.0, 0.0, 10.0, 0.0),
             (2, 0.0, 10.0, 10.0, 10.0),
             (3, 0.0, 20.0, 10.0, 20.0)],
            "seg_id long, x0 double, y0 double, "
            "x1 double, y1 double")

    def _pts(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, us long, event_id long, "
                  "x double, y double")

    def test_transitions_counted_dwell_dropped(self, spark):
        """User path seg1 -> seg1 -> seg2 -> seg3 -> seg2 gives legs
        (1,2), (2,3), (3,2); the seg1->seg1 dwell is dropped."""
        from geospark.operators.snap import route_legs
        pts = self._pts(spark, [
            (1, 0, 1, 1.0, 0.1), (1, 1, 2, 5.0, 0.2),
            (1, 2, 3, 5.0, 9.8), (1, 3, 4, 5.0, 19.9),
            (1, 4, 5, 5.0, 10.3)])
        got = _rows(route_legs(pts, self._segs(spark)),
                    ["seg_from", "seg_to", "n_trips"])
        assert got == sorted([(1, 2, 1), (2, 3, 1), (3, 2, 1)])

    def test_legs_aggregate_across_users(self, spark):
        """Two users making the same 1->2 hop aggregate to n_trips=2;
        min_trips=2 filters a single-occurrence leg."""
        from geospark.operators.snap import route_legs
        pts = self._pts(spark, [
            (1, 0, 1, 1.0, 0.0), (1, 1, 2, 1.0, 10.0),
            (2, 0, 3, 2.0, 0.0), (2, 1, 4, 2.0, 10.0),
            (2, 2, 5, 2.0, 20.0)])
        got = _rows(route_legs(pts, self._segs(spark), min_trips=2),
                    ["seg_from", "seg_to", "n_trips"])
        assert got == [(1, 2, 2)]

    def test_no_cross_user_legs(self, spark):
        from geospark.operators.snap import route_legs
        pts = self._pts(spark, [(1, 0, 1, 1.0, 0.0),
                                (2, 1, 2, 1.0, 10.0)])
        assert route_legs(pts, self._segs(spark)).count() == 0

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.snap import route_legs, route_legs_sql
        rng = np.random.default_rng(61)
        pts_rows = [(int(u), int(us), int(e), float(a), float(b))
                    for e, (u, us, a, b) in enumerate(zip(
                        rng.integers(1, 10, 400),
                        rng.integers(0, 10**6, 400),
                        rng.uniform(-15.0, 25.0, 400).round(2),
                        rng.uniform(-5.0, 25.0, 400).round(2)))]
        seg_rows = [(int(i), float(x0), float(y0), float(x1),
                     float(y1)) for i, (x0, y0, x1, y1) in enumerate(
            zip(rng.uniform(-10, 20, 12), rng.uniform(-10, 20, 12),
                rng.uniform(-10, 20, 12), rng.uniform(-10, 20, 12)))]
        pts = self._pts(spark, pts_rows)
        segs = spark.createDataFrame(
            seg_rows, "seg_id long, x0 double, y0 double, "
                      "x1 double, y1 double")
        got = _rows(route_legs(pts, segs),
                    ["seg_from", "seg_to", "n_trips"])
        con = duckdb.connect()
        con.execute("CREATE TABLE p (user_id BIGINT, us BIGINT, "
                    "event_id BIGINT, x DOUBLE, y DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?, ?, ?)",
                        pts_rows)
        con.execute("CREATE TABLE s (seg_id BIGINT, x0 DOUBLE, "
                    "y0 DOUBLE, x1 DOUBLE, y1 DOUBLE)")
        con.executemany("INSERT INTO s VALUES (?, ?, ?, ?, ?)",
                        seg_rows)
        want = sorted(tuple(r) for r in con.execute(route_legs_sql(
            "SELECT user_id, us, event_id, x, y FROM p",
            "SELECT seg_id, x0, y0, x1, y1 FROM s")).fetchall())
        assert len(got) > 0
        assert got == want


class TestHomeWork:
    RES = 4
    HR = 3_600_000_000

    def _ev(self, spark, rows):
        """rows: (user, hour, (y, x))."""
        data = [(u, h * self.HR + 1, *_center(y, x, self.RES))
                for u, h, (y, x) in rows]
        return spark.createDataFrame(
            data, "user_id long, us long, lat double, lon double")

    def test_modal_night_and_day_cells(self, spark):
        """Night events (hours 0-5) pick home, day events (9-16) pick
        work; evening hour 20 counts toward neither."""
        from geospark.operators.events import home_work
        h, w, o = (1, 1), (5, 5), (9, 9)
        ev = self._ev(spark, [
            (1, 2, h), (1, 3, h), (1, 4, (2, 2)),   # night: h modal
            (1, 10, w), (1, 11, w), (1, 12, (6, 6)),  # day: w modal
            (1, 20, o)])                              # ignored
        got = _rows(home_work(ev, self.RES),
                    ["user_id", "home_cell", "work_cell"])
        assert got == [(1, _cell(*h, self.RES), _cell(*w, self.RES))]

    def test_missing_window_is_null(self, spark):
        """A day-only user has home_cell NULL; night-only -> work
        NULL."""
        from geospark.operators.events import home_work
        ev = self._ev(spark, [(1, 10, (5, 5)), (2, 3, (1, 1))])
        got = _rows(home_work(ev, self.RES))
        assert got == sorted([
            (1, None, _cell(5, 5, self.RES)),
            (2, _cell(1, 1, self.RES), None)])

    def test_modal_tie_smaller_cell(self, spark):
        from geospark.operators.events import home_work
        ev = self._ev(spark, [(1, 2, (1, 1)), (1, 3, (2, 2))])
        got = _rows(home_work(ev, self.RES),
                    ["user_id", "home_cell"])
        assert got == [(1, _cell(1, 1, self.RES))]

    def test_hour_wraps_across_days(self, spark):
        """us beyond day 1: hour-of-day is (us div hr) % 24 — an
        event at day 3, hour 2 is still night."""
        from geospark.operators.events import home_work
        ev = self._ev(spark, [(1, 3 * 24 + 2, (1, 1))])
        got = _rows(home_work(ev, self.RES),
                    ["user_id", "home_cell"])
        assert got == [(1, _cell(1, 1, self.RES))]

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.events import home_work, home_work_sql
        rng = np.random.default_rng(67)
        rows = [(int(u), int(us), float(a), float(b))
                for u, us, a, b in zip(
                    rng.integers(1, 20, 500),
                    rng.integers(0, 10**13, 500),
                    rng.uniform(-80, 80, 500).round(1),
                    rng.uniform(-170, 170, 500).round(1))]
        ev = spark.createDataFrame(
            rows, "user_id long, us long, lat double, lon double")
        got = _rows(home_work(ev, 3),
                    ["user_id", "home_cell", "work_cell"])
        con = duckdb.connect()
        con.execute("CREATE TABLE e (user_id BIGINT, us BIGINT, "
                    "lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO e VALUES (?, ?, ?, ?)", rows)
        want = sorted(
            tuple(r) for r in con.execute(home_work_sql(
                "SELECT user_id, us, lat, lon FROM e", 3)).fetchall())
        assert got == want


class TestCellSmooth:
    RES = 4

    def test_spike_spreads_with_floor(self, spark):
        """3x3 occupied block, center count 90, others 1: after one
        round the center is floor(98/9)=10 and each corner
        floor(93/4)=23 — hand-checked floor means over the occupied
        neighborhoods."""
        from geospark.operators.tiles import cell_smooth
        cells = [(y, x) for y in (4, 5, 6) for x in (4, 5, 6)]
        counts = [90 if (y, x) == (5, 5) else 1 for y, x in cells]
        pts = _pts(spark, cells, self.RES, counts)
        got = dict((r["cell"], r["value"]) for r in
                   cell_smooth(pts, self.RES, 1).collect())
        # center: all 9 occupied -> (90 + 8) // 9 = 10
        assert got[_cell(5, 5, self.RES)] == 10
        # corner (4,4): occupied nbrs = itself,(4,5),(5,4),(5,5) ->
        # (1+1+1+90) // 4 = 23
        assert got[_cell(4, 4, self.RES)] == 23
        # edge (4,5): 6 occupied nbrs -> (90 + 5) // 6 = 15
        assert got[_cell(4, 5, self.RES)] == 15

    def test_uniform_fixed_point(self, spark):
        """A uniform block is a fixed point of the floor mean."""
        from geospark.operators.tiles import cell_smooth
        cells = [(y, x) for y in (1, 2) for x in (1, 2)]
        pts = _pts(spark, cells, self.RES, [7] * 4)
        got = {r["value"] for r in
               cell_smooth(pts, self.RES, 3).collect()}
        assert got == {7}

    def test_holes_are_not_support(self, spark):
        """An isolated far cell never receives mass from the block
        (unoccupied cells don't conduct), and rounds=0 returns raw
        counts."""
        from geospark.operators.tiles import cell_smooth
        pts = _pts(spark, [(1, 1), (9, 9)], self.RES, [64, 2])
        got = dict((r["cell"], r["value"]) for r in
                   cell_smooth(pts, self.RES, 2).collect())
        assert got[_cell(9, 9, self.RES)] == 2   # isolated: own mean
        got0 = dict((r["cell"], r["value"]) for r in
                    cell_smooth(pts, self.RES, 0).collect())
        assert got0 == {_cell(1, 1, self.RES): 64,
                        _cell(9, 9, self.RES): 2}

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import cell_smooth, cell_smooth_sql
        rng = np.random.default_rng(71)
        rows = [(float(a), float(b)) for a, b in zip(
            rng.uniform(-80, 80, 700).round(1),
            rng.uniform(-170, 170, 700).round(1))]
        pts = spark.createDataFrame(rows, "lat double, lon double")
        got = _rows(cell_smooth(pts, 3, 2), ["cell", "value"])
        con = duckdb.connect()
        con.execute("CREATE TABLE p (lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(cell_smooth_sql(
            "SELECT lat, lon FROM p", 3, 2)).fetchall())
        assert got == want


class TestJumpHist:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, us long, event_id long, "
                  "lat double, lon double")

    def test_log2_buckets_exact(self, spark):
        """d2 = 1 -> bucket 1; d2 = 4 (exact power) -> bucket 3 =
        floor(log2 4)+1, where a float log could round either way;
        d2 = 0 -> bucket 0."""
        from geospark.operators.events import jump_hist
        ev = self._ev(spark, [
            # user 1: hop of exactly 1 microdeg east -> d2 = 1
            (1, 0, 1, 0.0, 0.0), (1, 1, 2, 0.0, 0.000001),
            # user 2: hop of exactly 2 microdeg -> d2 = 4
            (2, 0, 3, 0.0, 0.0), (2, 1, 4, 0.0, 0.000002),
            # user 3: stationary
            (3, 0, 5, 1.0, 1.0), (3, 1, 6, 1.0, 1.0)])
        got = _rows(jump_hist(ev), ["bucket", "n_hops"])
        assert got == [(0, 1), (1, 1), (3, 1)]

    def test_histogram_counts(self, spark):
        from geospark.operators.events import jump_hist
        rows = []
        for i in range(5):  # five identical d2=1 hops
            rows += [(10 + i, 0, 2 * i, 0.0, 0.0),
                     (10 + i, 1, 2 * i + 1, 0.0, 0.000001)]
        got = _rows(jump_hist(self._ev(spark, rows)),
                    ["bucket", "n_hops"])
        assert got == [(1, 5)]

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.events import jump_hist, jump_hist_sql
        rng = np.random.default_rng(73)
        rows = [(int(u), int(us), int(e), float(a), float(b))
                for e, (u, us, a, b) in enumerate(zip(
                    rng.integers(1, 15, 500),
                    rng.integers(0, 10**10, 500),
                    rng.uniform(-80, 80, 500),
                    rng.uniform(-170, 170, 500)))]
        ev = self._ev(spark, rows)
        got = _rows(jump_hist(ev), ["bucket", "n_hops"])
        con = duckdb.connect()
        con.execute("CREATE TABLE e (user_id BIGINT, us BIGINT, "
                    "event_id BIGINT, lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO e VALUES (?, ?, ?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(jump_hist_sql(
            "SELECT user_id, us, event_id, lat, lon FROM e"))
            .fetchall())
        assert len(got) > 3
        assert got == want


class TestCellDiversity:
    RES = 4

    def _pts(self, spark, labeled):
        rows = [(*_center(y, x, self.RES), l) for (y, x), l in labeled]
        return spark.createDataFrame(
            rows, "lat double, lon double, label string")

    def test_pure_mixed_and_floor(self, spark):
        """Single-label cell -> 0; 2+2 two-label cell -> 1e6 -
        (1e6*4) div 12 = 666667? No: floor((1e6*4)/12) = 333333, so
        simpson = 666667. 1+1 cell -> exactly 1e6."""
        from geospark.operators.tiles import cell_diversity
        d = self._pts(spark, [
            ((1, 1), "a"), ((1, 1), "a"),                 # pure
            ((2, 2), "a"), ((2, 2), "a"),
            ((2, 2), "b"), ((2, 2), "b"),                 # 2+2
            ((3, 3), "a"), ((3, 3), "b")])                # 1+1
        got = dict((r["cell"], r["simpson_ppm"]) for r in
                   cell_diversity(d, self.RES, label_col="label")
                   .collect())
        assert got[_cell(1, 1, self.RES)] == 0
        assert got[_cell(2, 2, self.RES)] == 666667
        assert got[_cell(3, 3, self.RES)] == 1_000_000

    def test_singleton_cell_dropped(self, spark):
        from geospark.operators.tiles import cell_diversity
        d = self._pts(spark, [((1, 1), "a")])
        assert cell_diversity(d, self.RES,
                              label_col="label").count() == 0

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import (cell_diversity,
                                              cell_diversity_sql)
        rng = np.random.default_rng(79)
        rows = [(float(a), float(b), f"t{int(t)}") for a, b, t in zip(
            rng.uniform(-80, 80, 600).round(1),
            rng.uniform(-170, 170, 600).round(1),
            rng.integers(0, 4, 600))]
        d = spark.createDataFrame(
            rows, "lat double, lon double, label string")
        got = _rows(cell_diversity(d, 3, label_col="label"),
                    ["cell", "n_pts", "n_labels", "simpson_ppm"])
        con = duckdb.connect()
        con.execute("CREATE TABLE p (lat DOUBLE, lon DOUBLE, "
                    "label VARCHAR)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(cell_diversity_sql(
            "SELECT lat, lon, label FROM p", 3)).fetchall())
        assert got == want


class TestConvexHull:
    def _pts(self, spark, rows):
        return spark.createDataFrame(rows, "g long, x long, y long")

    def test_square_strict_vertices_only(self, spark):
        """Square corners survive; mid-edge (collinear boundary) and
        interior points are not strict vertices."""
        from geospark.operators.hull import convex_hull
        d = self._pts(spark, [
            (1, 0, 0), (1, 10, 0), (1, 10, 10), (1, 0, 10),
            (1, 5, 0),            # mid-edge
            (1, 5, 5), (1, 3, 7)  # interior
        ])
        got = _rows(convex_hull(d), ["g", "x", "y"])
        assert got == sorted([(1, 0, 0), (1, 10, 0),
                              (1, 10, 10), (1, 0, 10)])

    def test_collinear_endpoints_and_small_groups(self, spark):
        from geospark.operators.hull import convex_hull
        d = self._pts(spark, [
            (1, 0, 0), (1, 5, 5), (1, 9, 9),   # collinear
            (2, 7, 7),                          # singleton
            (3, 1, 2), (3, 1, 2), (3, 4, 4)])   # dup + pair
        got = _rows(convex_hull(d), ["g", "x", "y"])
        assert got == sorted([(1, 0, 0), (1, 9, 9), (2, 7, 7),
                              (3, 1, 2), (3, 4, 4)])

    def test_partial_merge_equals_single_pass(self, spark):
        """Many partitions (forcing real partial hulls) give the same
        vertex set as a single-partition run."""
        import numpy as np

        from geospark.operators.hull import convex_hull
        rng = np.random.default_rng(83)
        rows = [(1, int(a), int(b)) for a, b in zip(
            rng.integers(-1000, 1000, 400),
            rng.integers(-1000, 1000, 400))]
        many = convex_hull(self._pts(spark, rows).repartition(13))
        one = convex_hull(self._pts(spark, rows).coalesce(1))
        assert _rows(many) == _rows(one)

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.hull import convex_hull, convex_hull_sql
        rng = np.random.default_rng(89)
        rows = [(int(g), int(a), int(b)) for g, a, b in zip(
            rng.integers(1, 7, 150),
            rng.integers(-50, 50, 150),
            rng.integers(-50, 50, 150))]
        # add a deliberately collinear trio in one group
        rows += [(9, 0, 0), (9, 2, 2), (9, 4, 4), (9, 0, 4)]
        d = self._pts(spark, rows)
        got = _rows(convex_hull(d), ["g", "x", "y"])
        con = duckdb.connect()
        con.execute("CREATE TABLE p (g BIGINT, x BIGINT, y BIGINT)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(convex_hull_sql(
            "SELECT g, x, y FROM p")).fetchall())
        assert len(got) > 10
        assert got == want


class TestZRanges:
    def _rects(self, spark, rows):
        return spark.createDataFrame(
            rows, "rect_id long, xmin double, ymin double, "
                  "xmax double, ymax double")

    def test_single_quadrant_is_one_range(self, spark):
        """A rect exactly covering one res-2 quadrant's 2x2 block of
        res-2... at res 1 the whole west-south quadrant is one cell:
        cover = 1 contiguous range of 1 cell."""
        from geospark.operators.tiles import z_ranges
        d = self._rects(spark, [(1, -170.0, -80.0, -100.0, -10.0)])
        got = _rows(z_ranges(d, 1),
                    ["rect_id", "z_lo", "z_hi", "n_cells"])
        assert got == [(1, 0, 0, 1)]

    def test_cover_partition_and_contiguity(self, spark):
        """Ranges partition the cover: SUM(n_cells) == cover size,
        ranges are disjoint, and each range's width equals its
        count (contiguous keys)."""
        from geospark.operators.tiles import z_ranges
        d = self._rects(spark, [(1, -10.0, -10.0, 40.0, 30.0),
                                (2, 100.0, 50.0, 160.0, 80.0)])
        res = 5
        rows = z_ranges(d, res).collect()
        for r in rows:
            assert r["z_hi"] - r["z_lo"] + 1 == r["n_cells"]
        import collections
        per = collections.defaultdict(list)
        for r in rows:
            per[r["rect_id"]].append((r["z_lo"], r["z_hi"]))
        n = 1 << res
        for rid, (x0, y0, x1, y1) in [(1, (-10, -10, 40, 30)),
                                      (2, (100, 50, 160, 80))]:
            xs = (int((x1 + 180) / 360 * n) - int((x0 + 180) / 360 * n)
                  + 1)
            ys = (int((y1 + 90) / 180 * n) - int((y0 + 90) / 180 * n)
                  + 1)
            spans = sorted(per[rid])
            assert sum(b - a + 1 for a, b in spans) == xs * ys
            for (a1, b1), (a2, b2) in zip(spans, spans[1:]):
                assert a2 > b1 + 1   # maximal ranges: gaps between

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import z_ranges, z_ranges_sql
        rng = np.random.default_rng(97)
        rows = []
        for i in range(40):
            x0 = float(rng.uniform(-170, 150))
            y0 = float(rng.uniform(-80, 60))
            rows.append((i, round(x0, 1), round(y0, 1),
                         round(x0 + float(rng.uniform(1, 25)), 1),
                         round(y0 + float(rng.uniform(1, 15)), 1)))
        d = self._rects(spark, rows)
        got = _rows(z_ranges(d, 6),
                    ["rect_id", "z_lo", "z_hi", "n_cells"])
        con = duckdb.connect()
        con.execute("CREATE TABLE r (rect_id BIGINT, xmin DOUBLE, "
                    "ymin DOUBLE, xmax DOUBLE, ymax DOUBLE)")
        con.executemany("INSERT INTO r VALUES (?, ?, ?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(z_ranges_sql(
            "SELECT rect_id, xmin, ymin, xmax, ymax FROM r", 6))
            .fetchall())
        assert len(got) > 40    # fragmentation: more ranges than rects
        assert got == want


class TestUnionArea:
    def _boxes(self, spark, rows):
        return spark.createDataFrame(
            rows, "xmin long, ymin long, xmax long, ymax long")

    def test_overlap_counted_once(self, spark):
        """Two 10x10 boxes overlapping in a 5x10 strip: union 150,
        not 200; a third disjoint 2x2 adds 4."""
        from geospark.operators.validity import union_area
        d = self._boxes(spark, [(0, 0, 10, 10), (5, 0, 15, 10),
                                (100, 100, 102, 102)])
        row = union_area(d).collect()[0]
        assert row["area"] == 150 + 4

    def test_nested_and_degenerate(self, spark):
        """A box inside another adds nothing; zero-width boxes are
        dropped."""
        from geospark.operators.validity import union_area
        d = self._boxes(spark, [(0, 0, 10, 10), (2, 2, 5, 5),
                                (3, 3, 3, 8)])
        assert union_area(d).collect()[0]["area"] == 100

    def test_vertical_split_coverage(self, spark):
        """Boxes stacked with a y gap in one slab: per-slab interval
        union, not bounding span: [0,2] and [5,9] in x [0,1] ->
        area 2 + 4 = 6."""
        from geospark.operators.validity import union_area
        d = self._boxes(spark, [(0, 0, 1, 2), (0, 5, 1, 9)])
        assert union_area(d).collect()[0]["area"] == 6

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.validity import (union_area,
                                                 union_area_sql)
        rng = np.random.default_rng(101)
        rows = []
        for _ in range(120):
            x0 = int(rng.integers(-500, 450))
            y0 = int(rng.integers(-500, 450))
            rows.append((x0, y0, x0 + int(rng.integers(1, 80)),
                         y0 + int(rng.integers(1, 60))))
        d = self._boxes(spark, rows)
        got = _rows(union_area(d), ["area", "n_slabs"])
        con = duckdb.connect()
        con.execute("CREATE TABLE bx (xmin BIGINT, ymin BIGINT, "
                    "xmax BIGINT, ymax BIGINT)")
        con.executemany("INSERT INTO bx VALUES (?, ?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(union_area_sql(
            "SELECT xmin, ymin, xmax, ymax FROM bx")).fetchall())
        # sanity: union strictly less than the naive double-counting
        naive = sum((x1 - x0) * (y1 - y0) for x0, y0, x1, y1 in rows)
        assert 0 < got[0][0] < naive
        assert got == want
