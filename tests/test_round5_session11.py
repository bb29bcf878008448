"""Round-5 session-11 operator tests: per-cell CUSUM changepoint
scan and lag-1 autocorrelation over the dense daily calendar."""

from __future__ import annotations

_DAY = 86_400_000_000


def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _center(y, x, res):
    n = 1 << res
    return (-90.0 + (y + 0.5) * 180.0 / n,
            -180.0 + (x + 0.5) * 360.0 / n)


def _day_pts(spark, series):
    """series: {(y, x): [day-0 count, day-1 count, ...]} at res 4."""
    rows = []
    for (y, x), counts in series.items():
        lat, lon = _center(y, x, 4)
        for day, c in enumerate(counts):
            rows += [(lat, lon, day * _DAY + 1)] * c
    return spark.createDataFrame(rows,
                                 "lat double, lon double, us long")


def _cell(y, x, res=4):
    return (res << 56) | (y << res) | x


class TestCellCusum:
    def _run(self, spark, series):
        from geospark.operators.tiles import cell_cusum
        out = cell_cusum(_day_pts(spark, series), 4)
        return {r["cell"]: (r["n_total"], r["max_abs_s"],
                            r["cp_day"], r["cp_sign"])
                for r in out.collect()}

    def test_step_up_and_step_down(self, spark):
        """[0,0,4,4] (m=4, T=8): S = 4*cum - i*8 = -8,-16,-8,0 ->
        max |S| 16 at day 1, sign -1 (traffic RISES after the cp);
        the mirrored [4,4,0,0] peaks +16 at the same day."""
        got = self._run(spark, {(5, 5): [0, 0, 4, 4],
                                (8, 8): [4, 4, 0, 0]})
        assert got[_cell(5, 5)] == (8, 16, 1, -1)
        assert got[_cell(8, 8)] == (8, 16, 1, 1)

    def test_uniform_is_zero_at_earliest_day(self, spark):
        """A perfectly uniform series nets S = 0 everywhere; the
        earliest-day tie-break pins cp_day to the span start."""
        got = self._run(spark, {(5, 5): [2, 2, 2, 2]})
        assert got[_cell(5, 5)] == (8, 0, 0, 0)

    def test_tie_breaks_to_earliest_day(self, spark):
        """[1,0,0,1]: S = 2,0,-2,0 — |S| = 2 at days 0 and 2;
        the earlier day wins and carries ITS sign (+1)."""
        got = self._run(spark, {(5, 5): [1, 0, 0, 1]})
        assert got[_cell(5, 5)] == (2, 2, 0, 1)

    def test_dense_zero_fill_is_load_bearing(self, spark):
        """A cell active only on the span's last day still scans the
        zero-filled prefix (the span comes from ANOTHER cell): with
        m=3 and T=1, S = -1,-2,0 -> max 2 at day 1, sign -1."""
        got = self._run(spark, {(5, 5): [0, 0, 1],
                                (8, 8): [1, 1, 1]})
        assert got[_cell(5, 5)] == (1, 2, 1, -1)
        assert got[_cell(8, 8)] == (3, 0, 0, 0)

    def test_single_day_span(self, spark):
        """A 1-day span is valid (unlike cell_mk's P=0): S_1 = 0."""
        got = self._run(spark, {(5, 5): [7]})
        assert got[_cell(5, 5)] == (7, 0, 0, 0)

    def test_empty_input(self, spark):
        from geospark.operators.tiles import cell_cusum
        d = spark.createDataFrame([],
                                  "lat double, lon double, us long")
        out = cell_cusum(d, 4)
        assert out.count() == 0
        assert out.columns == ["cell", "n_total", "max_abs_s",
                               "cp_day", "cp_sign"]

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import (cell_cusum,
                                              cell_cusum_sql)
        rng = np.random.default_rng(911)
        rows = [(float(a), float(b), int(d) * _DAY + int(o))
                for a, b, d, o in zip(
                    rng.uniform(-80, 80, 900).round(1),
                    rng.uniform(-170, 170, 900).round(1),
                    rng.integers(0, 9, 900),
                    rng.integers(0, 1000, 900))]
        d = spark.createDataFrame(rows,
                                  "lat double, lon double, us long")
        got = _rows(cell_cusum(d, 3))
        con = duckdb.connect()
        con.execute("CREATE TABLE p (lat DOUBLE, lon DOUBLE, "
                    "us BIGINT)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(cell_cusum_sql(
            "SELECT lat, lon, us FROM p", 3)).fetchall())
        assert got == want and len(got) > 10


class TestCellAutocorr:
    def _run(self, spark, series):
        from geospark.operators.tiles import cell_autocorr
        out = cell_autocorr(_day_pts(spark, series), 4)
        return {r["cell"]: (r["n_total"], r["num"], r["den"],
                            r["r1_ppm"])
                for r in out.collect()}

    def test_alternating_is_negative(self, spark):
        """[3,1,3,1] (m=4, T=8): d = 4x-8 = 4,-4,4,-4; num = -48,
        den = 64 -> r1 = -750000 ppm exactly."""
        got = self._run(spark, {(5, 5): [3, 1, 3, 1]})
        assert got[_cell(5, 5)] == (8, -48, 64, -750_000)

    def test_trend_is_positive(self, spark):
        """[0,1,2,3] (T=6): d = -6,-2,2,6; num = 12-4+12 = 20,
        den = 80 -> 250000 ppm."""
        got = self._run(spark, {(5, 5): [0, 1, 2, 3],
                                (8, 8): [3, 2, 1, 0]})
        assert got[_cell(5, 5)] == (6, 20, 80, 250_000)
        # the mirrored decline has the SAME d sequence negated:
        # identical num/den/r1 (ACF is sign-blind to direction)
        assert got[_cell(8, 8)] == (6, 20, 80, 250_000)

    def test_constant_series_is_null(self, spark):
        """All deviations zero -> den = 0 -> NULL (not a crash,
        not 0 — 'no variance' is distinct from 'no persistence')."""
        got = self._run(spark, {(5, 5): [2, 2, 2, 2],
                                (8, 8): [1, 2, 1, 2]})
        assert got[_cell(5, 5)] == (8, 0, 0, None)
        assert got[_cell(8, 8)] == (6, -12, 16, -750_000)

    def test_truncation_toward_zero(self, spark):
        """[1,0,0,1] (T=2): d = 2,-2,-2,2; num = -4+4-4 = -4,
        den = 16 -> trunc(-4e6/16) = -250000; and [2,0,1,1] (T=4):
        d = 4,-4,0,0; num = -16, den = 32 -> -500000."""
        got = self._run(spark, {(5, 5): [1, 0, 0, 1],
                                (8, 8): [2, 0, 1, 1]})
        assert got[_cell(5, 5)] == (2, -4, 16, -250_000)
        assert got[_cell(8, 8)] == (4, -16, 32, -500_000)

    def test_single_day_span_empty(self, spark):
        from geospark.operators.tiles import cell_autocorr
        d = spark.createDataFrame([(10.0, 10.0, 5 * _DAY)],
                                  "lat double, lon double, us long")
        assert cell_autocorr(d, 4).count() == 0

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import (cell_autocorr,
                                              cell_autocorr_sql)
        rng = np.random.default_rng(912)
        rows = [(float(a), float(b), int(d) * _DAY + int(o))
                for a, b, d, o in zip(
                    rng.uniform(-80, 80, 900).round(1),
                    rng.uniform(-170, 170, 900).round(1),
                    rng.integers(0, 9, 900),
                    rng.integers(0, 1000, 900))]
        d = spark.createDataFrame(rows,
                                  "lat double, lon double, us long")
        got = _rows(cell_autocorr(d, 3))
        con = duckdb.connect()
        con.execute("CREATE TABLE p (lat DOUBLE, lon DOUBLE, "
                    "us BIGINT)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(
            cell_autocorr_sql("SELECT lat, lon, us FROM p",
                              3)).fetchall())
        assert got == want and len(got) > 10


class TestSpearmanRho:
    def _run(self, spark, rows):
        from geospark.operators.textstats import spearman_rho
        d = spark.createDataFrame(rows, "g string, x long, y long")
        return {r["g"]: (r["n"], r["srho2_ppm"])
                for r in spearman_rho(d, "x", "y",
                                      group_col="g").collect()}

    def test_perfect_monotone_both_signs(self, spark):
        rows = ([("up", i, 10 * i) for i in (1, 2, 3)]
                + [("dn", i, -7 * i) for i in (1, 2, 3)])
        got = self._run(spark, rows)
        assert got["up"] == (3, 1_000_000)
        assert got["dn"] == (3, -1_000_000)

    def test_midranks_classic_quarter(self, spark):
        """x=[1,1,2], y=[1,2,2] -> rho = 0.5 via midranks ->
        +250000 ppm (hand-derived: num=3, dx=dy=6)."""
        got = self._run(spark, [("g", 1, 1), ("g", 1, 2),
                                ("g", 2, 2)])
        assert got["g"] == (3, 250_000)

    def test_swapped_pairs_point_six(self, spark):
        """x=[1,2,3,4], y=[2,1,4,3] -> classic rho = 0.6 ->
        360000 ppm; the reversed-halves y=[3,4,1,2] mirrors to
        -360000 (sign decomposition, not floor)."""
        got = self._run(spark, [("a", i, y) for i, y in
                                zip((1, 2, 3, 4), (2, 1, 4, 3))]
                        + [("b", i, y) for i, y in
                           zip((1, 2, 3, 4), (3, 4, 1, 2))])
        assert got["a"] == (4, 360_000)
        assert got["b"] == (4, -360_000)

    def test_degenerate_null(self, spark):
        """All-tied x (den 0) and singleton groups -> NULL."""
        got = self._run(spark, [("t", 5, 1), ("t", 5, 2),
                                ("t", 5, 3), ("s", 1, 1)])
        assert got["t"] == (3, None)
        assert got["s"] == (1, None)

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.textstats import (spearman_rho,
                                                  spearman_rho_sql)
        rng = np.random.default_rng(913)
        rows = [(f"s{int(g)}", int(x), int(y)) for g, x, y in zip(
            rng.integers(0, 4, 800), rng.integers(0, 25, 800),
            rng.integers(0, 25, 800))]
        d = spark.createDataFrame(rows, "g string, x long, y long")
        got = _rows(spearman_rho(d, "x", "y", group_col="g"))
        con = duckdb.connect()
        con.execute("CREATE TABLE t (g VARCHAR, x BIGINT, y BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(spearman_rho_sql(
            "SELECT g, x, y FROM t", group_col="g")).fetchall())
        assert got == want and len(got) == 4


class TestLinkPred:
    def _run(self, spark, edges, k=10):
        from geospark.operators.graph import link_pred
        e = spark.createDataFrame(edges, "id_a long, id_b long")
        return [tuple(r) for r in link_pred(e, k).collect()]

    def test_diamond_closes(self, spark):
        """1-2,1-3,2-3,2-4,3-4: the only missing pair is (1,4),
        with N(1) == N(4) == {2,3} -> Jaccard 1.0; adjacent pairs
        sharing neighbors (e.g. 2-3) must NOT appear."""
        got = self._run(spark, [(1, 2), (1, 3), (2, 3),
                                (2, 4), (3, 4)])
        assert got == [(1, 4, 2, 2, 2, 1_000_000)]

    def test_star_ties_and_cut(self, spark):
        """Star 0-{1,2,3}: all three leaf pairs score 1.0; the
        deterministic (id_a, id_b) tie-break makes k=2 cut to
        (1,2),(1,3) in both engines."""
        got = self._run(spark, [(0, 1), (0, 2), (0, 3)], k=2)
        assert got == [(1, 2, 1, 1, 1, 1_000_000),
                       (1, 3, 1, 1, 1, 1_000_000)]

    def test_floor_ppm_and_duplicate_edges(self, spark):
        """Path 1-2-3 plus spurs 1-5, 3-6: pair (1,3) has cn=1,
        deg 2+2 -> union 3 -> floor(1e6/3) = 333333; duplicated
        input edge rows must not inflate cn or degrees."""
        edges = [(1, 2), (2, 3), (1, 5), (3, 6), (1, 2), (2, 3)]
        got = self._run(spark, edges)
        assert (1, 3, 1, 2, 2, 333_333) in got
        # (5,2): via neighbor 1 -> cn=1, deg(5)=1, deg(2)=2 -> 500000
        assert (2, 5, 1, 2, 1, 500_000) in got

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.graph import link_pred, link_pred_sql
        rng = np.random.default_rng(914)
        edges = sorted({(int(min(a, b)), int(max(a, b)))
                        for a, b in zip(rng.integers(0, 60, 300),
                                        rng.integers(0, 60, 300))
                        if a != b})
        d = spark.createDataFrame(edges, "id_a long, id_b long")
        got = [tuple(r) for r in
               __import__("geospark.operators.graph",
                          fromlist=["link_pred"])
               .link_pred(d, 25).collect()]
        con = duckdb.connect()
        con.execute("CREATE TABLE e (id_a BIGINT, id_b BIGINT)")
        con.executemany("INSERT INTO e VALUES (?, ?)", edges)
        want = [tuple(r) for r in con.execute(link_pred_sql(
            "SELECT id_a, id_b FROM e", 25)).fetchall()]
        assert got == want and len(got) == 25
