"""Round-5 session-9 operator tests: Horn slope/aspect map algebra
and D8 flow accumulation over the density raster."""

from __future__ import annotations

from geospark.functions.cells import encode_np


def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _cell(lat, lon, res):
    import numpy as np
    return int(encode_np(np.asarray([lat]), np.asarray([lon]),
                         res)[0])


def _tiles(spark, rows):
    """rows: [(cell, n)] -> a counts frame."""
    return spark.createDataFrame(rows, "cell long, n_pts long")


def _mk(res, x, y):
    return (res << 56) | (y << res) | x


class TestSlopeAspect:
    def test_east_gradient(self, spark):
        """Single occupied cell: every neighbor holds 0, so the Horn
        sums telescope to 0 from the neighbors and the center's own
        count never enters — gradient 0, FLAT."""
        from geospark.operators.tiles import slope_aspect
        t = _tiles(spark, [(_mk(4, 8, 8), 5)])
        got = _rows(slope_aspect(t, 4, count_col="n_pts"))
        assert got == [(_mk(4, 8, 8), 5, 0, 0, 0, "FLAT")]

    def test_horn_weights_east_neighbor(self, spark):
        """Center + one east neighbor with count 3: gx picks it up
        with cardinal weight 2 (gx = +6), gy = 0; downslope is due
        WEST (away from the mass): octant of (-gx, 0) = (-6, 0) ->
        'WSW' (due west lies on the WSW sector's closed edge)."""
        from geospark.operators.tiles import slope_aspect
        c, e = _mk(4, 8, 8), _mk(4, 9, 8)
        t = _tiles(spark, [(c, 1), (e, 3)])
        got = dict((r[0], r[1:]) for r in
                   _rows(slope_aspect(t, 4, count_col="n_pts")))
        assert got[c] == (1, 6, 0, 36, "WSW")
        # the east cell sees the center with weight 2 on its west
        # side: gx = -2, slope2 = 4, downslope due EAST ('ENE').
        assert got[e] == (3, -2, 0, 4, "ENE")

    def test_diagonal_weight_one(self, spark):
        """A NE diagonal neighbor contributes weight 1 to both
        sums: gx = gy = +n_ne."""
        from geospark.operators.tiles import slope_aspect
        c, ne = _mk(4, 8, 8), _mk(4, 9, 9)
        t = _tiles(spark, [(c, 1), (ne, 4)])
        got = dict((r[0], r[1:]) for r in
                   _rows(slope_aspect(t, 4, count_col="n_pts")))
        assert got[c] == (1, 4, 4, 32, "SSW")

    def test_lon_wrap(self, spark):
        """x = 0 sees x = n-1 as its west neighbor through the
        antimeridian: mass there pulls gx negative."""
        from geospark.operators.tiles import slope_aspect
        res, n = 4, 16
        c, w = _mk(res, 0, 8), _mk(res, n - 1, 8)
        t = _tiles(spark, [(c, 1), (w, 2)])
        got = dict((r[0], r[1:]) for r in
                   _rows(slope_aspect(t, res, count_col="n_pts")))
        assert got[c] == (1, -4, 0, 16, "ENE")

    def test_lat_border_keeps_weight_zero(self, spark):
        """A cell at y = 0: the three southern stencil rows are
        off-grid and contribute 0 (not renormalized away) — a lone
        occupied border cell still reads FLAT, and mass to its
        north tilts gy exactly as in the interior."""
        from geospark.operators.tiles import slope_aspect
        res = 4
        c, nn = _mk(res, 8, 0), _mk(res, 8, 1)
        t = _tiles(spark, [(c, 7), (nn, 3)])
        got = dict((r[0], r[1:]) for r in
                   _rows(slope_aspect(t, res, count_col="n_pts")))
        assert got[c] == (7, 0, 6, 36, "SSE")

    def test_matches_sql_twin(self, spark):
        """Spark output == DuckDB twin on a random-ish raster."""
        import duckdb

        from geospark.operators.tiles import (slope_aspect,
                                              slope_aspect_sql)
        res = 3
        rows = [(_mk(res, x, y), (x * 7 + y * 13) % 9 + 1)
                for x in range(8) for y in range(8)
                if (x * 3 + y) % 4 != 0]
        t = _tiles(spark, rows)
        got = _rows(slope_aspect(t, res, count_col="n_pts"))
        con = duckdb.connect()
        con.execute("CREATE TABLE c (cell BIGINT, n_pts BIGINT)")
        con.executemany("INSERT INTO c VALUES (?, ?)", rows)
        sql = slope_aspect_sql("SELECT cell, n_pts FROM c", res,
                               count_col="n_pts")
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == want


class TestFlowAccum:
    def test_chain_counts(self, spark):
        """A monotone 4-cell chain 8 > 6 > 4 > 2: each cell drains
        through every lower one; the lowest drains off-grid into an
        unoccupied terminal that accumulates all four."""
        from geospark.operators.tiles import d8_flow, flow_accum
        res = 4
        cells = [(_mk(res, 4 + i, 8), 8 - 2 * i) for i in range(4)]
        t = _tiles(spark, cells)
        f = {r["cell"]: r for r in
             d8_flow(t, res, count_col="n_pts").collect()}
        # every occupied cell has SOME 0-count neighbor -> no sinks
        assert all(r["is_sink"] == 0 for r in f.values())
        got = {r[0]: (r[1], r[2]) for r in
               _rows(flow_accum(t, res, 3, count_col="n_pts"))}
        for (c, n) in cells:
            assert got[c] == (n, 1), "0-neighbor drain beats chain"

    def test_linear_chain_accumulates(self, spark):
        """On a full row at res 2 (n = 4: the whole latitude band is
        occupied, wrap closes the ring... counts break the tie) the
        descent follows decreasing counts and accumulation grows
        along the chain."""
        from geospark.operators.tiles import flow_accum
        res = 2
        # one full y=1 row: counts 9, 7, 5, 3 -> descent terminates
        # in the y=0/y=2 zero cells; but each cell's OWN min
        # neighbor is off-row, so chains are length 1 again. Build
        # a plateau-free V instead: y=1 row [9, 3, 1, 3] with wrap.
        rows = [(_mk(res, 0, 1), 9), (_mk(res, 1, 1), 3),
                (_mk(res, 2, 1), 1), (_mk(res, 3, 1), 3)]
        # surround rows with occupied y=0 and y=2 bands so 0-count
        # shortcuts vanish and flow stays in-row
        for x in range(4):
            rows.append((_mk(res, x, 0), 50))
            rows.append((_mk(res, x, 2), 50))
        t = _tiles(spark, rows)
        got = {r[0]: (r[1], r[2]) for r in
               _rows(flow_accum(t, res, 3, count_col="n_pts"))}
        # x=2 (count 1) is the sink. Upstream: row cells 0, 1, 3;
        # the y=0 band (no off-grid escape: its southern stencil is
        # clipped, not zero-filled, in the NEIGHBOR relation) drains
        # x=1..3 directly into it and x=0 via the row's x=1; the
        # y=2 band instead drains north into unoccupied y=3. Total
        # 1 + 3 + 3 + 1 = 8.
        assert got[_mk(res, 2, 1)] == (1, 8)
        # x=1 receives row x=0 plus band (0, 0)
        assert got[_mk(res, 1, 1)] == (3, 3)

    def test_doubling_convergence(self, spark):
        """doublings k and k+1 agree once 2^k covers the deepest
        chain (the d8_basins discipline)."""
        from geospark.operators.tiles import flow_accum
        res = 3
        rows = [(_mk(res, x, 4), 10 - x) for x in range(8)]
        for x in range(8):
            rows.append((_mk(res, x, 3), 60))
            rows.append((_mk(res, x, 5), 60))
        t = _tiles(spark, rows)
        a3 = _rows(flow_accum(t, res, 3, count_col="n_pts"))
        a4 = _rows(flow_accum(t, res, 4, count_col="n_pts"))
        assert a3 == a4
        # and the 8-chain: head contributes to every lower cell
        got = {r[0]: r[2] for r in a3}
        assert got[_mk(res, 7, 4)] == 8

    def test_matches_sql_twin(self, spark):
        import duckdb

        from geospark.operators.tiles import (flow_accum,
                                              flow_accum_sql)
        res = 3
        rows = [(_mk(res, x, y), (x * 5 + y * 11) % 7 + 1)
                for x in range(8) for y in range(8)
                if (x + y * 2) % 3 != 0]
        t = _tiles(spark, rows)
        got = _rows(flow_accum(t, res, 4, count_col="n_pts"))
        con = duckdb.connect()
        con.execute("CREATE TABLE c (cell BIGINT, n_pts BIGINT)")
        con.executemany("INSERT INTO c VALUES (?, ?)", rows)
        sql = flow_accum_sql("SELECT cell, n_pts FROM c", res, 4,
                             count_col="n_pts")
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == want


class TestSemivariogram:
    def test_single_pair_gamma(self, spark):
        """Two adjacent cells valued 3 and 7: shell 1 holds the one
        pair, gamma = 1e6 * 16 / 2 = 8_000_000; farther shells are
        emitted empty with NULL gamma."""
        from geospark.operators.tiles import semivariogram
        t = _tiles(spark, [(_mk(6, 10, 10), 3), (_mk(6, 11, 10), 7)])
        got = _rows(semivariogram(t, 6, [1, 2, 4], count_col="n_pts"))
        assert got == [(1, 1, 8_000_000), (2, 0, None), (4, 0, None)]

    def test_half_open_shells(self, spark):
        """A pair at exact distance 2 lands in shell (1, 2], not
        (2, 4]."""
        from geospark.operators.tiles import semivariogram
        t = _tiles(spark, [(_mk(6, 10, 10), 1), (_mk(6, 12, 10), 5)])
        got = _rows(semivariogram(t, 6, [1, 2, 4], count_col="n_pts"))
        assert got == [(1, 0, None), (2, 1, 8_000_000), (4, 0, None)]

    def test_lon_wrap_distance(self, spark):
        """x = 0 and x = n-1 are lattice distance 1 through the
        antimeridian."""
        from geospark.operators.tiles import semivariogram
        res, n = 6, 64
        t = _tiles(spark, [(_mk(res, 0, 10), 2),
                           (_mk(res, n - 1, 10), 6)])
        got = _rows(semivariogram(t, res, [1], count_col="n_pts"))
        assert got == [(1, 1, 8_000_000)]

    def test_matches_sql_twin(self, spark):
        import duckdb

        from geospark.operators.tiles import (semivariogram,
                                              semivariogram_sql)
        res = 6
        rows = [(_mk(res, x, y), (x * 7 + y * 13) % 11 + 1)
                for x in range(20) for y in range(20)
                if (x + y) % 3 != 0]
        t = _tiles(spark, rows)
        got = _rows(semivariogram(t, res, [1, 2, 4, 8],
                                  count_col="n_pts"))
        con = duckdb.connect()
        con.execute("CREATE TABLE c (cell BIGINT, n_pts BIGINT)")
        con.executemany("INSERT INTO c VALUES (?, ?)", rows)
        sql = semivariogram_sql("SELECT cell, n_pts FROM c", res,
                                [1, 2, 4, 8], count_col="n_pts")
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == want


class TestDocSkyline:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_frontier_and_ties(self, spark):
        """(1, 1e6), (2, 800000) x2 duplicates, (3, 375000) are the
        frontier; (2, 750000) is dominated by the same-v1 800000."""
        from geospark.operators.textstats import doc_skyline
        d = self._docs(spark, [
            (1, "aaaa"),            # 1 token, ppm 1_000_000
            (2, "aa bb"),           # 2 tokens, ppm 800_000
            (3, "a b c!!!"),        # 3 tokens, ppm 375_000
            (4, "aa b"),            # 2 tokens, ppm 750_000 (dominated)
            (5, "aa bb"),           # duplicate point of doc 2 (kept)
        ])
        got = _rows(doc_skyline(d))
        assert got == [(1, 1, 1_000_000), (2, 2, 800_000),
                       (3, 3, 375_000), (5, 2, 800_000)]

    def test_matches_bruteforce_dominance(self, spark):
        """Window formulation == brute-force dominance filter on a
        spread of synthetic docs."""
        from geospark.operators.textstats import doc_skyline
        rows = []
        for i in range(40):
            n_tok = i % 7 + 1
            junk = "!" * (i % 5)
            rows.append((i, " ".join(["ab"] * n_tok) + junk))
        d = self._docs(spark, rows)
        got = _rows(doc_skyline(d))
        feats = {r[0]: (r[1], r[2]) for r in _rows(
            d.selectExpr(
                "doc_id",
                "CAST(size(regexp_extract_all(lower(text), "
                "'[a-z0-9]+', 0)) AS BIGINT) AS v1",
                "CAST(length(regexp_replace(lower(text), "
                "'[^a-z0-9]', '')) AS BIGINT) * 1000000 div "
                "greatest(length(text), 1) AS v2"))}
        want = sorted(
            (i, v1, v2) for i, (v1, v2) in feats.items()
            if not any((u1 >= v1 and u2 >= v2
                        and (u1 > v1 or u2 > v2))
                       for u1, u2 in feats.values()))
        assert got == want


class TestBM25TopK:
    def test_exact_scores_and_candidates_only(self, spark):
        """Hand-computed BM25-R on a 3-doc corpus: N=3, T=7,
        df(spark)=2 -> wm = 3000 div 5 = 600; d1 (tf=2, dl=3):
        supm = 616e6 div 484 = 1272727; d2 (tf=1, dl=2): 308e6 div
        290 = 1062068. d3 has no query term and is absent."""
        from geospark.operators.textstats import bm25_topk
        d = spark.createDataFrame(
            [(1, "spark spark data"), (2, "spark data"),
             (3, "data data")], "doc_id long, text string")
        got = [tuple(r) for r in bm25_topk(d, ["spark"], 10).collect()]
        assert got == [(1, 600 * 1272727), (2, 600 * 1062068)]

    def test_tie_break_and_limit(self, spark):
        """Identical docs score identically; ties order by doc_id
        and LIMIT k cuts deterministically."""
        from geospark.operators.textstats import bm25_topk
        d = spark.createDataFrame(
            [(i, "spark data") for i in (5, 3, 9, 1)],
            "doc_id long, text string")
        got = [r["doc_id"] for r in bm25_topk(d, ["spark"], 3).collect()]
        assert got == [1, 3, 5]

    def test_matches_sql_twin(self, spark):
        import duckdb

        from geospark.operators.textstats import (bm25_topk,
                                                  bm25_topk_sql)
        rows = [(i, " ".join(
            ["spark"] * (i % 4) + ["join"] * (i % 3)
            + ["data"] * (i % 5 + 1))) for i in range(30)]
        d = spark.createDataFrame(rows, "doc_id long, text string")
        got = [tuple(r) for r in
               bm25_topk(d, ["spark", "join"], 8).collect()]
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, "
                    "text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        want = [tuple(r) for r in con.execute(
            bm25_topk_sql(["spark", "join"], 8)).fetchall()]
        assert got == want


class TestCorridorJoin:
    def _run(self, spark, pts, segs, eps, res=4):
        from geospark.operators.snap import corridor_join
        p = spark.createDataFrame(pts,
                                  "pt_id long, x double, y double")
        s = spark.createDataFrame(
            segs, "seg_id long, x0 double, y0 double, "
                  "x1 double, y1 double")
        return _rows(corridor_join(p, s, eps, res=res))

    def test_zones(self, spark):
        """Interior perpendicular hit -> mid; past endpoint within
        eps -> a/b; far point absent."""
        segs = [(1, 0.0, 0.0, 10.0, 0.0)]
        pts = [(1, 5.0, 0.5), (2, -0.5, 0.0), (3, 10.5, 0.0),
               (4, 5.0, 3.0)]
        got = self._run(spark, pts, segs, 1_000_000)
        assert got == [(1, 1, "mid"), (2, 1, "a"), (3, 1, "b")]

    def test_exact_boundary_included(self, spark):
        """Perpendicular distance EXACTLY eps: cross^2 == eps^2 len2
        -> included (<=, both engines)."""
        got = self._run(spark, [(1, 5.0, 1.0)],
                        [(1, 0.0, 0.0, 10.0, 0.0)], 1_000_000)
        assert got == [(1, 1, "mid")]

    def test_degenerate_segment(self, spark):
        """Zero-length segment: endpoint-a test only."""
        got = self._run(spark, [(1, 0.5, 0.0), (2, 3.0, 0.0)],
                        [(1, 1.0, 0.0, 1.0, 0.0)], 1_000_000)
        assert got == [(1, 1, "a")]

    def test_matches_sql_twin(self, spark):
        import duckdb

        from geospark.operators.snap import (corridor_join,
                                             corridor_join_sql)
        pts = [(i, (i * 37) % 80 - 40 + 0.25 * (i % 3),
                (i * 53) % 60 - 30 + 0.5 * (i % 5)) for i in range(200)]
        segs = [(j, (j * 17) % 60 - 30.0, (j * 29) % 40 - 20.0,
                 (j * 17) % 60 - 30.0 + (j % 7) - 3.0,
                 (j * 29) % 40 - 20.0 + (j % 5) - 2.0)
                for j in range(12)]
        p = spark.createDataFrame(pts,
                                  "pt_id long, x double, y double")
        s = spark.createDataFrame(
            segs, "seg_id long, x0 double, y0 double, "
                  "x1 double, y1 double")
        got = _rows(corridor_join(p, s, 2_000_000, res=4))
        con = duckdb.connect()
        con.execute("CREATE TABLE p (pt_id BIGINT, x DOUBLE, "
                    "y DOUBLE)")
        con.execute("CREATE TABLE s (seg_id BIGINT, x0 DOUBLE, "
                    "y0 DOUBLE, x1 DOUBLE, y1 DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?)", pts)
        con.executemany("INSERT INTO s VALUES (?, ?, ?, ?, ?)", segs)
        want = sorted(tuple(r) for r in con.execute(corridor_join_sql(
            "SELECT pt_id, x, y FROM p",
            "SELECT seg_id, x0, y0, x1, y1 FROM s",
            2_000_000)).fetchall())
        assert got == want


_DAY = 86_400_000_000


class TestEmergingHotspots:
    def _pts(self, spark, series, res=2):
        """series: {(x, y): [n_day0, n_day1, ...]} -> points df with
        one row per event at the cell's center."""
        from geospark.functions.cells import cell_bounds_np
        import numpy as np
        rows = []
        for (x, y), days in series.items():
            cell = _mk(res, x, y)
            lo0, la0, lo1, la1 = cell_bounds_np(np.asarray([cell]))
            lat = float((la0[0] + la1[0]) / 2)
            lon = float((lo0[0] + lo1[0]) / 2)
            for d, n in enumerate(days):
                for _ in range(n):
                    rows.append((lat, lon, d * _DAY))
        return spark.createDataFrame(
            rows, "lat double, lon double, us long")

    def _classes(self, spark, series, res=2):
        from geospark.operators.tiles import emerging_hotspots
        out = emerging_hotspots(self._pts(spark, series, res), res)
        return {r["cell"]: r["class"] for r in out.collect()}

    def test_new_diminishing_sporadic(self, spark):
        got = self._classes(spark, {
            (0, 1): [1, 1, 5],   # hot only on the last day -> new
            (1, 1): [3, 1, 0],   # hot d0, downtrend -> diminishing
            (2, 1): [2, 2, 2],   # hot d1 only, flat -> sporadic
        })
        assert got[_mk(2, 0, 1)] == "new"
        assert got[_mk(2, 1, 1)] == "diminishing"
        assert got[_mk(2, 2, 1)] == "sporadic"

    def test_persistent_none(self, spark):
        got = self._classes(spark, {
            (0, 1): [5, 0, 5],   # hot d0+d2, flat MK -> persistent
            (1, 1): [0, 9, 0],   # hot d1 only, flat -> sporadic
            (2, 1): [1, 1, 1],   # never hot -> none
        })
        assert got[_mk(2, 0, 1)] == "persistent"
        assert got[_mk(2, 1, 1)] == "sporadic"
        assert got[_mk(2, 2, 1)] == "none"

    def test_intensifying_and_cooling(self, spark):
        got = self._classes(spark, {
            (0, 1): [1, 4, 9],   # hot d1+d2, uptrend -> intensifying
            (1, 1): [9, 1, 1],   # hot d0, downtrend -> diminishing
        })
        assert got[_mk(2, 0, 1)] == "intensifying"
        assert got[_mk(2, 1, 1)] == "diminishing"
        got = self._classes(spark, {
            (0, 1): [9, 2, 3],   # hot all days, downtrend -> cooling
            (1, 1): [1, 1, 2],   # never hot -> none
        })
        assert got[_mk(2, 0, 1)] == "cooling"
        assert got[_mk(2, 1, 1)] == "none"

    def test_single_day_span_empty(self, spark):
        from geospark.operators.tiles import emerging_hotspots
        assert emerging_hotspots(
            self._pts(spark, {(0, 1): [4]}), 2).count() == 0

    def test_matches_sql_twin(self, spark):
        import duckdb

        from geospark.operators.tiles import (emerging_hotspots,
                                              emerging_hotspots_sql)
        series = {}
        for x in range(5):
            for y in range(3):
                series[(x, y)] = [(x * 7 + y * 3 + d * d) % 6
                                  for d in range(4)]
        pts = self._pts(spark, series, res=3)
        got = _rows(emerging_hotspots(pts, 3))
        rows = [tuple(r) for r in pts.collect()]
        con = duckdb.connect()
        con.execute("CREATE TABLE p (lat DOUBLE, lon DOUBLE, "
                    "us BIGINT)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(
            emerging_hotspots_sql("SELECT lat, lon, us FROM p", 3))
            .fetchall())
        assert got == want


def _day_series_pts(spark, series, res=2):
    """series: {(x, y): [n_day0, ...]} -> (lat, lon, us) points at
    cell centers, one row per event."""
    import numpy as np

    from geospark.functions.cells import cell_bounds_np
    rows = []
    for (x, y), days in series.items():
        cell = _mk(res, x, y)
        lo0, la0, lo1, la1 = cell_bounds_np(np.asarray([cell]))
        lat = float((la0[0] + la1[0]) / 2)
        lon = float((lo0[0] + lo1[0]) / 2)
        for d, n in enumerate(days):
            for _ in range(n):
                rows.append((lat, lon, d * _DAY))
    return spark.createDataFrame(rows,
                                 "lat double, lon double, us long")


class TestTrajResample:
    def _pts(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, event_id long, lat double, "
                  "lon double, us long")

    def test_linear_grid(self, spark):
        """Events at us 0 (lon 0) and us 100 (lon 100 udeg), step
        10: epoch 0 comes from the on-grid first event, epochs
        10..100 from the pair; ix == epoch (slope 1 udeg/us)."""
        from geospark.operators.events import traj_resample
        d = self._pts(spark, [(1, 1, 0.0, 0.0, 0),
                              (1, 2, 0.0, 0.000100, 100)])
        got = _rows(traj_resample(d, 10))
        assert got == [(1, e, e, 0) for e in range(0, 101, 10)]

    def test_trunc_toward_zero_negative(self, spark):
        """Westward hop: interpolation truncates toward zero (the
        sign-decomposed div), e.g. -99 * 50 / 100 -> -49, not -50."""
        from geospark.operators.events import traj_resample
        d = self._pts(spark, [(1, 1, 0.0, 0.0, 0),
                              (1, 2, 0.0, -0.000099, 100)])
        got = {r[1]: r[2] for r in _rows(traj_resample(d, 50))}
        assert got[50] == -49
        assert got[100] == -99

    def test_same_bucket_pair_no_phantom_epochs(self, spark):
        """A pair inside one grid bucket emits nothing (guards
        Spark's DESCENDING sequence() on empty ranges); duplicate
        timestamps emit nothing."""
        from geospark.operators.events import traj_resample
        d = self._pts(spark, [(1, 1, 0.0, 0.0, 3),
                              (1, 2, 0.0, 0.000050, 7),
                              (1, 3, 0.0, 0.000050, 7),
                              (1, 4, 0.0, 0.000090, 12)])
        got = _rows(traj_resample(d, 10))
        # only epoch 10 exists (inside pair (7, 12]):
        # x = 50 + trunc(40 * 3 / 5) = 74
        assert got == [(1, 10, 74, 0)]

    def test_matches_sql_twin(self, spark):
        import duckdb

        from geospark.operators.events import (traj_resample,
                                               traj_resample_sql)
        rows = []
        for u in range(6):
            for i in range(15):
                rows.append((u, u * 100 + i,
                             ((u * 31 + i * 17) % 120) / 2 - 30.0,
                             ((u * 53 + i * 29) % 300) / 2 - 75.0,
                             i * 37 + (u * 13) % 11))
        d = self._pts(spark, rows)
        got = _rows(traj_resample(d, 25))
        con = duckdb.connect()
        con.execute("CREATE TABLE p (user_id BIGINT, event_id "
                    "BIGINT, lat DOUBLE, lon DOUBLE, us BIGINT)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(traj_resample_sql(
            "SELECT user_id, event_id, lat, lon, us FROM p", 25))
            .fetchall())
        assert got == want


class TestCellTheilSen:
    def test_median_slope(self, spark):
        """Series [1, 5, 3]: pairwise slopes 4, 1, -2 -> median 1
        -> 1_000_000 upm."""
        from geospark.operators.tiles import cell_theil_sen
        pts = _day_series_pts(spark, {(0, 1): [1, 5, 3]})
        got = _rows(cell_theil_sen(pts, 2))
        assert got == [(_mk(2, 0, 1), 9, 1_000_000)]

    def test_lower_median_even_pairs(self, spark):
        """[0, 2, 0, 2]: sorted slopes -2, 0, 0, 2/3, 2, 2; lower
        median (rank 3 of 6) = 0. A zero-count day requires the
        dense fill, so day 0 uses count 0 via... day0 has 0 events
        -> the cell must still exist: give it 1 event on day 0 and
        shift: [1, 3, 1, 3] has the same slope multiset shape."""
        from geospark.operators.tiles import cell_theil_sen
        pts = _day_series_pts(spark, {(0, 1): [1, 3, 1, 3]})
        got = _rows(cell_theil_sen(pts, 2))
        assert got == [(_mk(2, 0, 1), 8, 0)]

    def test_outlier_robust(self, spark):
        """[1, 1, 1, 100]: median slope 0 — the spike cannot yank
        Theil-Sen (an OLS line through this rises steeply)."""
        from geospark.operators.tiles import cell_theil_sen
        pts = _day_series_pts(spark, {(0, 1): [1, 1, 1, 100]})
        got = _rows(cell_theil_sen(pts, 2))
        assert got == [(_mk(2, 0, 1), 103, 0)]

    def test_matches_sql_twin(self, spark):
        import duckdb

        from geospark.operators.tiles import (
            cell_theil_sen, cell_theil_sen_sql_for_span)
        series = {(x, y): [(x * 5 + y * 7 + d * d * (x % 3)) % 9
                           for d in range(5)]
                  for x in range(4) for y in range(3)}
        pts = _day_series_pts(spark, series, res=3)
        got = _rows(cell_theil_sen(pts, 3))
        rows = [tuple(r) for r in pts.collect()]
        con = duckdb.connect()
        con.execute("CREATE TABLE p (lat DOUBLE, lon DOUBLE, "
                    "us BIGINT)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(
            cell_theil_sen_sql_for_span(
                "SELECT lat, lon, us FROM p", 3, 5)).fetchall())
        assert got == want


class TestHtBreaks:
    def _t(self, spark, counts):
        return _tiles(spark, [(_mk(6, i, 10), n)
                              for i, n in enumerate(counts)])

    def test_two_level_hierarchy(self, spark):
        """[1,1,1,10]: mean 3.25 cuts {10} into the head; the head's
        own mean (10) is not strictly beaten -> 10 stops at level 1."""
        from geospark.operators.tiles import ht_breaks
        got = {r[1]: r[2] for r in _rows(
            ht_breaks(self._t(spark, [1, 1, 1, 10]), 3,
                      count_col="n_pts"))}
        assert got == {1: 0, 10: 1}

    def test_all_equal_level_zero(self, spark):
        from geospark.operators.tiles import ht_breaks
        got = _rows(ht_breaks(self._t(spark, [5, 5, 5]), 4,
                              count_col="n_pts"))
        assert [r[2] for r in got] == [0, 0, 0]

    def test_heavy_tail_ladder(self, spark):
        """[1,2,3,4,100,200]: cut 1 at 51.67 -> {100, 200}; cut 2 at
        150 -> {200}; cut 3: 200 == its own mean -> stops at 2."""
        from geospark.operators.tiles import ht_breaks
        got = {r[1]: r[2] for r in _rows(
            ht_breaks(self._t(spark, [1, 2, 3, 4, 100, 200]), 4,
                      count_col="n_pts"))}
        assert got == {1: 0, 2: 0, 3: 0, 4: 0, 100: 1, 200: 2}

    def test_matches_sql_twin(self, spark):
        import duckdb

        from geospark.operators.tiles import ht_breaks, ht_breaks_sql
        rows = [(_mk(6, x, y), (x * x * y) % 97 + 1)
                for x in range(12) for y in range(8)]
        t = _tiles(spark, rows)
        got = _rows(ht_breaks(t, 4, count_col="n_pts"))
        con = duckdb.connect()
        con.execute("CREATE TABLE c (cell BIGINT, n_pts BIGINT)")
        con.executemany("INSERT INTO c VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(
            ht_breaks_sql("SELECT cell, n_pts FROM c", 4,
                          count_col="n_pts")).fetchall())
        assert got == want


class TestStreamResample:
    def test_matches_batch_across_microbatches(self, spark, tmp_path):
        """Chunked replay through the per-user last-position state
        equals the batch traj_resample output row for row — the
        interpolated epochs spanning the FILE BOUNDARY come from
        state, and the on-grid first event self-emits exactly once."""
        import datetime as dt

        from pyspark.sql import functions as F

        from geospark.operators.events import traj_resample
        from geospark.streaming.stream import stream_resample
        base = dt.datetime(2024, 1, 1)
        step = 10_000_000  # 10 s grid
        rows = [
            (0, base, 1, 0.0, 0.0),
            (1, base + dt.timedelta(seconds=25), 1, 0.0, 0.000100),
            # duplicate timestamp: chains state, owns no epochs
            (2, base + dt.timedelta(seconds=25), 1, 0.0, 0.000100),
            # --- file boundary ---
            (3, base + dt.timedelta(seconds=45), 1, 0.0, 0.000200),
        ]
        schema = ("event_id long, ts timestamp_ntz, user_id long, "
                  "lat double, lon double")
        src = str(tmp_path / "rs_src")
        spark.createDataFrame(rows[:3], schema).coalesce(1) \
            .write.mode("overwrite").parquet(src)
        spark.createDataFrame(rows[3:], schema).coalesce(1) \
            .write.mode("append").parquet(src)

        sdf = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
        out = stream_resample(sdf, step)
        q = (out.writeStream.format("memory")
             .queryName("rs_stream").outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        got = _rows(spark.sql(
            "SELECT user_id, epoch_us, ix, iy FROM rs_stream"))

        e = spark.read.parquet(src)
        pts = e.select("user_id", "event_id", "lat", "lon",
                       F.expr("timestampdiff(MICROSECOND, "
                              "TIMESTAMP_NTZ '2024-01-01 00:00:00', "
                              "ts)").alias("us"))
        want = _rows(traj_resample(pts, step))
        assert got == want
        # epoch 0 (on-grid first event), 10/20 s inside file 1,
        # 30/40 s across the file boundary via state
        assert got == [(1, 0, 0, 0), (1, 10_000_000, 40, 0),
                       (1, 20_000_000, 80, 0),
                       (1, 30_000_000, 125, 0),
                       (1, 40_000_000, 175, 0)]


class TestPPSSample:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_exactly_k_hits_total(self, spark):
        """The systematic grid has exactly k points in (0, W]:
        sum(n_hits) == k regardless of the weight profile."""
        from pyspark.sql import functions as F

        from geospark.operators.pack import pps_sample
        rows = [(i, " ".join(["tok"] * (i % 13 + 1)))
                for i in range(80)]
        out = pps_sample(self._docs(spark, rows), 17)
        assert out.agg(F.sum("n_hits")).collect()[0][0] == 17

    def test_heavy_doc_multiplicity(self, spark):
        """A doc carrying most of the mass straddles several grid
        points and is emitted once with n_hits > 1."""
        from geospark.operators.pack import pps_sample
        rows = [(1, " ".join(["tok"] * 90)),
                (2, "tok tok"), (3, "tok")]
        got = {r["doc_id"]: r["n_hits"] for r in
               pps_sample(self._docs(spark, rows), 10).collect()}
        # doc 1 holds 90/93 of the mass -> at least 8 of 10 hits
        assert got[1] >= 8
        assert sum(got.values()) == 10

    def test_matches_sql_twin(self, spark):
        import duckdb

        from geospark.operators.pack import pps_sample, pps_sample_sql
        rows = [(i, " ".join(["w"] * ((i * 7) % 29 + 1)))
                for i in range(120)]
        got = _rows(pps_sample(self._docs(spark, rows), 23))
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, "
                    "text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in
                      con.execute(pps_sample_sql(23)).fetchall())
        assert got == want


class TestActiveCoverage:
    def _pts(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, event_id long, us long")

    def test_merge_and_gap(self, spark):
        """Two overlapping windows merge into one block; a third
        past the gap opens a second block: covered counts the union,
        not 3 x dur."""
        from geospark.operators.events import active_coverage
        d = self._pts(spark, [(1, 1, 0), (1, 2, 50), (1, 3, 500)])
        got = _rows(active_coverage(d, 100))
        # block 1: [0, 150) = 150; block 2: [500, 600) = 100
        assert got == [(1, 3, 2, 250)]

    def test_burst_counts_once(self, spark):
        """100 events in one instant cover exactly one window."""
        from geospark.operators.events import active_coverage
        d = self._pts(spark, [(1, i, 5) for i in range(100)])
        got = _rows(active_coverage(d, 1000))
        assert got == [(1, 100, 1, 1000)]

    def test_touching_intervals_merge(self, spark):
        """[0,100) then start=100: s > pmax is FALSE at equality ->
        touching intervals merge (closed-union semantics)."""
        from geospark.operators.events import active_coverage
        d = self._pts(spark, [(1, 1, 0), (1, 2, 100)])
        got = _rows(active_coverage(d, 100))
        assert got == [(1, 2, 1, 200)]

    def test_matches_sql_twin_with_dup_timestamps(self, spark):
        import duckdb

        from geospark.operators.events import (active_coverage,
                                               active_coverage_sql)
        rows = []
        for u in range(5):
            for i in range(40):
                # duplicate timestamps on purpose (i // 2): block
                # boundaries land on equal-s pairs
                rows.append((u, u * 100 + i,
                             ((i // 2) * 37 + u * 11) % 700))
        d = self._pts(spark, rows)
        got = _rows(active_coverage(d, 25))
        con = duckdb.connect()
        con.execute("CREATE TABLE p (user_id BIGINT, event_id "
                    "BIGINT, us BIGINT)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(
            active_coverage_sql(
                "SELECT user_id, event_id, us, 0 AS lat, 0 AS lon "
                "FROM p", 25)).fetchall())
        assert got == want


class TestAccessibility2SFCA:
    def _run(self, spark, dem, sup, r):
        from geospark.operators.joins import accessibility_2sfca
        d = spark.createDataFrame(dem,
                                  "d_id long, lat double, lon double")
        s = spark.createDataFrame(
            sup, "s_id long, cap long, s_lat double, s_lon double")
        return {row[0]: (row[1], row[2]) for row in
                _rows(accessibility_2sfca(d, s, r))}

    def test_congestion_splits_capacity(self, spark):
        """Two patients share clinic A (cap 6 -> ratio 3e6 each...
        no: ratio = cap*1e6 div n_demand = 3_000_000, each patient
        SUMS the ratio once); a third patient alone at clinic B
        (cap 2) gets the full 2_000_000."""
        dem = [(1, 0.0, 0.0), (2, 0.0, 0.5), (3, 50.0, 50.0)]
        sup = [(10, 6, 0.0, 0.25), (20, 2, 50.0, 50.0)]
        got = self._run(spark, dem, sup, 1.0)
        assert got == {1: (1, 3_000_000), 2: (1, 3_000_000),
                       3: (1, 2_000_000)}

    def test_overlapping_catchments_sum(self, spark):
        """A demand point reaching two suppliers sums both ratios;
        each supplier's ratio divides by ITS OWN demand count."""
        dem = [(1, 0.0, 0.0), (2, 0.0, 0.9)]
        sup = [(10, 4, 0.0, -0.5), (20, 9, 0.0, 0.5)]
        # supplier 10 reaches only d1 (d2 at 1.4): ratio 4e6
        # supplier 20 reaches d1 and d2: ratio 4.5e6
        got = self._run(spark, dem, sup, 1.0)
        assert got == {1: (2, 8_500_000), 2: (1, 4_500_000)}

    def test_unreachable_absent(self, spark):
        dem = [(1, 0.0, 0.0), (2, 80.0, 170.0)]
        sup = [(10, 1, 0.0, 0.5)]
        got = self._run(spark, dem, sup, 1.0)
        assert got == {1: (1, 1_000_000)}

    def test_matches_sql_twin(self, spark):
        import duckdb

        from geospark.operators.joins import (accessibility_2sfca,
                                              accessibility_2sfca_sql)
        dem = [(i, (i * 37) % 60 - 30.0, (i * 53) % 80 - 40.0)
               for i in range(150)]
        sup = [(j, j % 5 + 1, (j * 29) % 60 - 30.0,
                (j * 41) % 80 - 40.0) for j in range(20)]
        d = spark.createDataFrame(dem,
                                  "d_id long, lat double, lon double")
        s = spark.createDataFrame(
            sup, "s_id long, cap long, s_lat double, s_lon double")
        got = _rows(accessibility_2sfca(d, s, 8.0))
        con = duckdb.connect()
        con.execute("CREATE TABLE d (d_id BIGINT, lat DOUBLE, "
                    "lon DOUBLE)")
        con.execute("CREATE TABLE s (s_id BIGINT, cap BIGINT, "
                    "s_lat DOUBLE, s_lon DOUBLE)")
        con.executemany("INSERT INTO d VALUES (?, ?, ?)", dem)
        con.executemany("INSERT INTO s VALUES (?, ?, ?, ?)", sup)
        want = sorted(tuple(r) for r in con.execute(
            accessibility_2sfca_sql(
                "SELECT d_id, lat, lon FROM d",
                "SELECT s_id, cap, s_lat, s_lon FROM s",
                8.0)).fetchall())
        assert got == want
