"""Round-5 session-13 operator tests: Benford first-digit audit and
bivariate Moran's I spatial cross-correlation."""

from __future__ import annotations

from fractions import Fraction

RES = 4


def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _cell(y, x, res=RES):
    return (res << 56) | (y << res) | x


def _trunc(q: Fraction):
    return int(q) if q >= 0 else -int(-q)


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

class TestBenford:
    def _run(self, spark, rows):
        from geospark.operators.textstats import benford_digits
        d = spark.createDataFrame(rows, "source string, v long")
        return _rows(benford_digits(d, "v"),
                     ["source", "digit", "n_obs", "obs_ppm",
                      "exp_ppm", "dev_ppm"])

    def test_known_fixture_dense_grid(self, spark):
        """Values 1,19,23,2,111 in one group: digits 1x3, 2x2; the
        grid is dense (9 rows), absent digits read observed 0 with
        dev_ppm = -exp_ppm, and exp_ppm carries the shared literal
        table (301030 ppm at digit 1)."""
        import math
        got = self._run(spark, [("a", 1), ("a", 19), ("a", 23),
                                ("a", 2), ("a", 111)])
        assert len(got) == 9
        by_d = {r[1]: r for r in got}
        assert by_d[1][2:] == (3, 600000, 301030, 298970)
        assert by_d[2][2:] == (2, 400000, 176091, 223909)
        for d in range(3, 10):
            exp = round(math.log10(1 + 1 / d) * 1e6)
            assert by_d[d][2:] == (0, 0, exp, -exp)

    def test_nonpositive_excluded(self, spark):
        """Zero and negative values leave the audit population:
        only the positive row counts (t = 1)."""
        got = self._run(spark, [("a", 0), ("a", -17), ("a", 7)])
        by_d = {r[1]: r[2] for r in got}
        assert by_d[7] == 1 and sum(by_d.values()) == 1
        assert {r[3] for r in got} == {0, 1_000_000}

    def test_groups_independent(self, spark):
        """Two groups audit independently — 9 rows each, totals
        normalized per group."""
        got = self._run(spark, [("a", 5), ("a", 55),
                                ("b", 9)] )
        assert len(got) == 18
        a5 = [r for r in got if r[0] == "a" and r[1] == 5][0]
        b9 = [r for r in got if r[0] == "b" and r[1] == 9][0]
        assert a5[2:4] == (2, 1_000_000)
        assert b9[2:4] == (1, 1_000_000)

    def test_inline_oracle_parity(self, spark):
        import duckdb

        from geospark.operators.textstats import (benford_digits,
                                                  benford_digits_sql)
        rows = [(f"s{i % 3}", (i * i * 37 + i) % 5000 - 50)
                for i in range(600)]
        d = spark.createDataFrame(rows, "source string, v long")
        got = _rows(benford_digits(d, "v"))
        con = duckdb.connect()
        con.execute("CREATE TABLE t (source VARCHAR, v BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(
            benford_digits_sql("SELECT source, v FROM t")).fetchall())
        assert got == want and len(got) == 27


# ---------------------------------------------------------------------------
# Bivariate Moran's I
# ---------------------------------------------------------------------------

def _bimoran_ref(cells, xs, ys):
    """Independent exact re-derivation (queen ring-1, interior
    cells): the two composed spatial-lag slopes and their ppm
    product, truncation toward zero at every division."""
    n = len(cells)
    tx, ty = sum(xs), sum(ys)
    devx = {c: n * v - tx for c, v in zip(cells, xs)}
    devy = {c: n * v - ty for c, v in zip(cells, ys)}
    s = w = 0
    for ci in cells:
        for cj in cells:
            if ci == cj:
                continue
            if max(abs(ci[0] - cj[0]), abs(ci[1] - cj[1])) == 1:
                w += 1
                s += devx[ci] * devy[cj]
    m2x = sum(d * d for d in devx.values())
    m2y = sum(d * d for d in devy.values())
    lagx = (_trunc(Fraction(1_000_000 * n * s, w * m2x))
            if w and m2x else None)
    lagy = (_trunc(Fraction(1_000_000 * n * s, w * m2y))
            if w and m2y else None)
    if lagx is None or lagy is None:
        sq = None
    else:
        sq = (1 if s >= 0 else -1) * (abs(lagx) * abs(lagy)
                                      // 1_000_000)
    return w, lagx, lagy, sq


class TestBivariateMoran:
    def _run(self, spark, cells, xs, ys):
        from geospark.operators.tiles import bivariate_moran
        rows = [(_cell(y, x), a, b)
                for (y, x), a, b in zip(cells, xs, ys)]
        d = spark.createDataFrame(rows, "cell long, x long, y long")
        r = bivariate_moran(d, RES, x_col="x", y_col="y").collect()[0]
        return (r["n_cells"], r["w_pairs"], r["lagx_ppm"],
                r["lagy_ppm"], r["bimoran2_ppm"])

    def test_x_equals_y_reduces_to_moran(self, spark):
        """With x == y the statistic collapses to univariate Moran:
        both slopes equal I, bimoran2 = sign * I^2 in ppm — checked
        against the exact Fraction re-derivation."""
        cells = [(5, 5), (5, 6), (6, 5), (6, 6),
                 (5, 8), (5, 9), (6, 8), (6, 9)]
        v = [9, 9, 9, 9, 1, 1, 1, 1]
        w, lagx, lagy, sq = _bimoran_ref(cells, v, v)
        assert lagx == lagy
        assert self._run(spark, cells, v, v) == (8, w, lagx, lagy, sq)

    def test_anticorrelated_surfaces_negative(self, spark):
        """x hot where y is cold on adjacent blocks: the spatial
        cross-correlation is negative and matches the exact
        re-derivation."""
        cells = [(5, 5), (5, 6), (6, 5), (6, 6),
                 (5, 7), (5, 8), (6, 7), (6, 8)]
        xs = [9, 9, 9, 9, 1, 1, 1, 1]
        ys = [1, 1, 1, 1, 9, 9, 9, 9]
        w, lagx, lagy, sq = _bimoran_ref(cells, xs, ys)
        got = self._run(spark, cells, xs, ys)
        assert got == (8, w, lagx, lagy, sq) and got[4] < 0

    def test_constant_y_surface(self, spark):
        """Constant y: M2y = 0 -> lagy and the product are NULL, but
        lagx stays defined (S = 0 -> slope 0)."""
        cells = [(5, 5), (5, 6), (6, 5)]
        got = self._run(spark, cells, [1, 5, 9], [4, 4, 4])
        assert got == (3, 6, 0, None, None)

    def test_isolated_cells_all_null(self, spark):
        """No occupied neighbors anywhere: W = 0 -> every statistic
        NULL (not a division blowup)."""
        cells = [(2, 2), (8, 8), (12, 4)]
        got = self._run(spark, cells, [1, 5, 9], [2, 3, 4])
        assert got == (3, 0, None, None, None)

    def test_inline_oracle_parity(self, spark):
        import duckdb

        from geospark.operators.tiles import (bivariate_moran,
                                              bivariate_moran_sql)
        rows = [(_cell(2 + (i * 7) % 12, 2 + (i * 5) % 12),
                 (i * i) % 23, (i * 3 + 1) % 17)
                for i in range(80)]
        # dedup cells (grid aggregates are unique per cell)
        seen, uniq = set(), []
        for c, a, b in rows:
            if c not in seen:
                seen.add(c)
                uniq.append((c, a, b))
        d = spark.createDataFrame(uniq, "cell long, x long, y long")
        got = _rows(bivariate_moran(d, RES, x_col="x", y_col="y"))
        con = duckdb.connect()
        con.execute("CREATE TABLE c (cell BIGINT, x BIGINT, y BIGINT)")
        con.executemany("INSERT INTO c VALUES (?, ?, ?)", uniq)
        want = sorted(tuple(r) for r in con.execute(
            bivariate_moran_sql("SELECT cell, x, y FROM c",
                                RES)).fetchall())
        assert got == want and got[0][4] is not None
