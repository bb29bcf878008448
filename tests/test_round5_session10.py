"""Round-5 session-10 operator tests: quadrat index-of-dispersion
(complete-spatial-randomness test) over the full tile grid."""

from __future__ import annotations


def _pts(spark, rows):
    """rows: [(lat, lon)] -> a points frame."""
    return spark.createDataFrame(rows, "lat double, lon double")


def _one(df):
    out = df.collect()
    assert len(out) == 1
    return tuple(out[0])


class TestQuadratCSR:
    def test_all_in_one_quadrat(self, spark):
        """4 points in one of 4 res-1 quadrats: counts (4,0,0,0),
        T=4, sum c^2=16 -> vmr = 1e6*(4*16-16)/(3*4) = 4_000_000
        (maximal clumping at this T and N)."""
        from geospark.operators.tiles import quadrat_csr
        p = _pts(spark, [(-45.0, -90.0)] * 4)
        assert _one(quadrat_csr(p, 1)) == (4, 4, 4_000_000)

    def test_perfectly_regular(self, spark):
        """One point per res-1 quadrat: variance 0 -> vmr 0."""
        from geospark.operators.tiles import quadrat_csr
        p = _pts(spark, [(-45.0, -90.0), (-45.0, 90.0),
                         (45.0, -90.0), (45.0, 90.0)])
        assert _one(quadrat_csr(p, 1)) == (4, 4, 0)

    def test_empty_input_empty_frame(self, spark):
        """T = 0: no pattern, no verdict — empty output, not a
        division error."""
        from geospark.operators.tiles import quadrat_csr
        p = _pts(spark, []).filter("lat > 999")
        assert quadrat_csr(p, 3).count() == 0

    def test_inexact_division_floors(self, spark):
        """counts (2,1,0,0): T=3, sum c^2=5, num=1e6*(20-9)=11e6,
        den=9 -> floor(11e6/9)=1_222_222 — exercises the div==floor
        identity on a non-exact quotient (numerator nonnegative by
        Cauchy-Schwarz, so BIGINT div and HUGEINT // agree)."""
        from geospark.operators.tiles import quadrat_csr
        p = _pts(spark, [(-45.0, -90.0), (-45.0, -91.0),
                         (45.0, 90.0)])
        assert _one(quadrat_csr(p, 1)) == (4, 3, 1_222_222)

    def test_empty_quadrats_priced_into_constant(self, spark):
        """Same clump at res 2 (16 quadrats): the 12 extra empties
        enter only through N — counts (4,0,...): T=4, sum c^2=16,
        vmr = 1e6*(16*16-16)/(15*4) = 4_000_000; at res 3 (64):
        1e6*(64*16-16)/(63*4) = 4_000_000. The pure-clump VMR is
        T*1e6 regardless of grid size, a good closed-form probe."""
        from geospark.operators.tiles import quadrat_csr
        p = _pts(spark, [(-45.0, -90.0)] * 4)
        assert _one(quadrat_csr(p, 2)) == (16, 4, 4_000_000)
        assert _one(quadrat_csr(p, 3)) == (64, 4, 4_000_000)

    def test_matches_sql_twin(self, spark):
        """Spark output == DuckDB twin on a deterministic scatter
        with heavy-tailed per-cell counts."""
        import duckdb

        from geospark.operators.tiles import (quadrat_csr,
                                              quadrat_csr_sql)
        rows = []
        for i in range(200):
            lat = ((i * 37) % 160) - 80 + (i % 7) * 0.01
            lon = ((i * i * 13) % 340) - 170 + (i % 5) * 0.01
            for _ in range((i % 11) // 3 + 1):
                rows.append((float(lat), float(lon)))
        got = _one(quadrat_csr(_pts(spark, rows), 4))
        con = duckdb.connect()
        con.execute("CREATE TABLE p (lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?)", rows)
        sql = quadrat_csr_sql("SELECT lat, lon FROM p", 4)
        want = con.execute(sql).fetchall()
        assert len(want) == 1 and got == tuple(want[0])

    def test_plan_is_python_free(self, spark):
        """The whole test is two JVM aggregates — no Python UDF, no
        join, no window in the plan."""
        from geospark.operators.tiles import quadrat_csr
        p = _pts(spark, [(1.0, 2.0)])
        plan = quadrat_csr(p, 5)._jdf.queryExecution().executedPlan() \
            .toString()
        for bad in ("BatchEvalPython", "ArrowEvalPython", "Join",
                    "Window"):
            assert bad not in plan, plan
