"""Round-5 session-12 operator tests: degree assortativity over the
proximity graph, and the engine-exact sketch trilogy (HyperLogLog
distinct audit, count-min heavy hitters, Bloom membership audit)."""

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


class TestHllDistinct:
    def _run(self, spark, rows):
        from geospark.operators.sketch import hll_distinct
        d = spark.createDataFrame(rows, "cell long, user long")
        return sorted(tuple(r) for r in
                      hll_distinct(d, "user", "cell").collect())

    def test_single_key_linear_counting_is_exact(self, spark):
        """One distinct key sets one register -> V=63, linear
        counting floor(64*ln(64/63)) = 1: exact, err 0."""
        assert self._run(spark, [(7, 42)]) == [(7, 1, 1, 0)]

    def test_duplicates_cannot_move_registers(self, spark):
        """Registers fold MAX over the DISTINCT (group, key) set, so
        repeating rows changes nothing."""
        rows = [(1, k) for k in range(100)]
        assert self._run(spark, rows) == self._run(spark, rows * 5)

    def test_small_range_accuracy_envelope(self, spark):
        """Linear counting at n=100 (V stays high) lands within a
        few percent of exact — and err_ppm reports exactly the
        realized signed error."""
        got = self._run(spark, [(1, k * 13) for k in range(100)])
        (cell, n_exact, n_hll, err), = got
        assert (cell, n_exact) == (1, 100)
        assert abs(n_hll - 100) <= 10
        sign = 1 if n_hll >= n_exact else -1
        assert err == sign * (abs(n_hll - n_exact) * 10**6 // 100)

    def test_inline_oracle_parity(self, spark):
        import duckdb

        from geospark.operators.sketch import (hll_distinct,
                                               hll_distinct_sql)
        rows = [(g, (g * 37 + i * i) % (50 + 400 * g))
                for g in range(4) for i in range(3000)]
        d = spark.createDataFrame(rows, "cell long, user long")
        got = sorted(tuple(r) for r in
                     hll_distinct(d, "user", "cell").collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE pts (cell BIGINT, u BIGINT)")
        con.executemany("INSERT INTO pts VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(hll_distinct_sql(
            "SELECT cell AS g, u AS k FROM pts")).fetchall())
        assert got == want and len(got) == 4
        # both estimator branches exercised: group 0 is small-range
        # (linear counting), group 3 has ~1000+ distincts (raw path)
        assert any(r[1] < 160 for r in got)
        assert any(r[1] > 400 for r in got)


class TestCmsTopk:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")

    def test_no_collision_vocab_is_exact(self, spark):
        """A vocabulary far under the 4x512 counter table can still
        collide per-row, but MIN over 4 independent rows makes a
        3-term corpus exact: over_ppm all 0, exact counts right."""
        from geospark.operators.sketch import cms_topk
        d = self._docs(spark, ["aa bb aa", "bb cc", "aa"])
        got = [tuple(r) for r in cms_topk(d, 10).collect()]
        assert got == [("aa", 3, 3, 0), ("bb", 2, 2, 0),
                       ("cc", 1, 1, 0)]

    def test_estimate_never_underestimates(self, spark):
        """CMS is an upper bound: n_cms >= n_exact (over_ppm >= 0)
        for every reported term, even on a colliding vocabulary."""
        from geospark.operators.sketch import cms_topk
        texts = [f"tok{i % 997} tok{i % 13} filler" for i in range(500)]
        got = cms_topk(self._docs(spark, texts), 20).collect()
        assert len(got) == 20
        assert all(r["n_cms"] >= r["n_exact"] and r["over_ppm"] >= 0
                   for r in got)

    def test_inline_oracle_parity(self, spark):
        import duckdb

        from geospark.operators.sketch import cms_topk, cms_topk_sql
        texts = [("alpha beta " * (i % 4 + 1)) + f"tok{i % 211}"
                 for i in range(400)]
        d = self._docs(spark, texts)
        got = [tuple(r) for r in cms_topk(d, 15).collect()]
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, "
                    "text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)",
                        [(i, t) for i, t in enumerate(texts)])
        want = [tuple(r) for r in con.execute(
            cms_topk_sql(15)).fetchall()]
        assert got == want and len(got) == 15


class TestBloomProbe:
    def _run(self, spark, build, probe):
        from geospark.operators.sketch import bloom_probe
        b = spark.createDataFrame([(k,) for k in build], "k long")
        p = spark.createDataFrame([(k,) for k in probe], "k long")
        return [tuple(r) for r in bloom_probe(
            b, p, build_col="k", probe_col="k").collect()]

    def test_members_always_pass(self, spark):
        """No false negatives ever: probing the build set itself
        passes everything, and with zero non-members fp_ppm is
        NULL (not 0/0)."""
        ks = list(range(0, 400, 3))
        got = self._run(spark, ks, ks)
        n = len(ks)
        assert got == [(n, n, n, n, 0, None)]

    def test_duplicate_keys_counted_once(self, spark):
        """Both sides dedup before building/probing: key multiplicity
        cannot change any audit count."""
        ks = list(range(50))
        assert (self._run(spark, ks * 3, ks * 2)
                == self._run(spark, ks, ks))

    def test_known_fixture_with_false_positive(self, spark):
        """The pinned smoke fixture: 2500 even build keys, probe
        1000..3999 -> 1500 true members all pass, exactly one false
        positive at 131072 bits (engine-exact, so this is stable)."""
        got = self._run(spark, range(0, 5000, 2), range(1000, 4000))
        assert got == [(2500, 3000, 1501, 1500, 1, 666)]

    def test_inline_oracle_parity(self, spark):
        import duckdb

        from geospark.operators.sketch import (bloom_probe,
                                               bloom_probe_sql)
        b = spark.createDataFrame(
            [(i * 7,) for i in range(1200)], "k long")
        p = spark.createDataFrame(
            [(i * 3,) for i in range(2000)], "k long")
        got = [tuple(r) for r in bloom_probe(
            b, p, build_col="k", probe_col="k").collect()]
        con = duckdb.connect()
        want = [tuple(r) for r in con.execute(bloom_probe_sql(
            "SELECT unnest(range(0, 8400, 7)) AS k",
            "SELECT unnest(range(0, 6000, 3)) AS k")).fetchall()]
        assert got == want
