"""Round-5 session-12 operator tests: degree assortativity over the
proximity graph (Newman's endpoint-degree Pearson as signed
r-squared ppm)."""

from __future__ import annotations


class TestDegreeAssort:
    def _run(self, spark, edges):
        from geospark.operators.graph import degree_assort
        e = spark.createDataFrame(edges, "id_a long, id_b long")
        return [tuple(r) for r in degree_assort(e).collect()]

    def test_star_is_perfectly_disassortative(self, spark):
        """Star 0-{1,2,3,4}: every directed edge pairs degree 4 with
        degree 1, so endpoint degrees are perfectly anticorrelated
        (r = -1 -> -1_000_000 ppm) over 8 directed edges."""
        got = self._run(spark, [(0, 1), (0, 2), (0, 3), (0, 4)])
        assert got == [(8, -1_000_000)]

    def test_equal_degree_components_are_assortative(self, spark):
        """Triangle (all deg 2) + K4 (all deg 3), disjoint: every
        edge joins equal degrees, x == y on all 18 directed edges
        -> r = +1 -> +1_000_000 ppm."""
        tri = [(1, 2), (2, 3), (1, 3)]
        k4 = [(4, 5), (4, 6), (4, 7), (5, 6), (5, 7), (6, 7)]
        got = self._run(spark, tri + k4)
        assert got == [(18, 1_000_000)]

    def test_regular_graph_is_null(self, spark):
        """4-cycle: every node has degree 2, both degree variances
        are zero -> assort_ppm NULL (not a division blowup)."""
        got = self._run(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
        assert got == [(8, None)]

    def test_duplicate_edges_do_not_inflate(self, spark):
        """Duplicated input rows are deduped before symmetrization:
        the star result is unchanged."""
        e = [(0, 1), (0, 2), (0, 3), (0, 4), (0, 1), (0, 4)]
        got = self._run(spark, e)
        assert got == [(8, -1_000_000)]

    def test_path_is_disassortative_not_minus_one(self, spark):
        """Path 1-2-3-4: ends deg 1, middle deg 2. Directed edges
        (x,y): (1,2),(2,1),(2,2),(2,2),(2,1),(1,2). n=6, Sx=Sy=10,
        Sxx=Syy=18, Sxy=16 -> num=-4, d=8 -> r^2 ppm = 16e6/64 =
        250000, sign negative."""
        got = self._run(spark, [(1, 2), (2, 3), (3, 4)])
        assert got == [(6, -250_000)]

    def test_empty_input_is_null(self, spark):
        got = self._run(spark, [])
        assert got == [(0, None)]

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.graph import (degree_assort,
                                              degree_assort_sql)
        rng = np.random.default_rng(915)
        edges = sorted({(int(min(a, b)), int(max(a, b)))
                        for a, b in zip(rng.integers(0, 80, 400),
                                        rng.integers(0, 80, 400))
                        if a != b})
        d = spark.createDataFrame(edges, "id_a long, id_b long")
        got = [tuple(r) for r in degree_assort(d).collect()]
        con = duckdb.connect()
        con.execute("CREATE TABLE e (id_a BIGINT, id_b BIGINT)")
        con.executemany("INSERT INTO e VALUES (?, ?)", edges)
        want = [tuple(r) for r in con.execute(degree_assort_sql(
            "SELECT id_a, id_b FROM e")).fetchall()]
        assert got == want and got[0][1] is not None
