"""Round-5 session-7 operator tests: nearest-neighbor-distance
ladder, revisit-interval histogram, per-doc bigram novelty."""

from __future__ import annotations


def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(r) for r in df.select(*cols).collect())


class TestNNRadius:
    def _d(self, spark, pts):
        return spark.createDataFrame(
            [(i, la, lo) for i, (la, lo) in enumerate(pts)],
            "id long, lat double, lon double")

    def test_ladder_and_isolated(self, spark):
        """Pair 10-20 µdeg apart, a third point 3e6 away: the pair's
        NN is each other (2 points at rung 1e6), the far point's NN
        is 3e6 (cumulative at 5e6 = 3), nothing isolated; shrink the
        ladder and the far point becomes the isolated sentinel."""
        from geospark.operators.tiles import nn_radius
        d = self._d(spark, [(0.0, 0.0), (0.0, 0.00002), (0.0, 3.0)])
        got = {r["r_udeg"]: r["n_points"] for r in nn_radius(
            d, [1_000_000, 5_000_000]).collect()}
        assert got == {1_000_000: 2, 5_000_000: 3, -1: 0}
        got2 = {r["r_udeg"]: r["n_points"] for r in nn_radius(
            d, [1_000_000]).collect()}
        assert got2 == {1_000_000: 2, -1: 1}

    def test_closed_boundary_min_semantics(self, spark):
        """NN distance is the MIN over candidates and dist == r
        counts (closed): 3 collinear points 1e6 apart — the middle
        one has two candidates at the same min."""
        from geospark.operators.tiles import nn_radius
        d = self._d(spark, [(0.0, 0.0), (0.0, 1.0), (0.0, 2.0)])
        got = {r["r_udeg"]: r["n_points"] for r in nn_radius(
            d, [1_000_000]).collect()}
        assert got == {1_000_000: 3, -1: 0}

    def test_blocking_res_invariance(self, spark):
        """The cover-ring join finds the true NN at any blocking res,
        including points straddling cell borders."""
        import numpy as np

        from geospark.operators.tiles import nn_radius
        rng = np.random.default_rng(211)
        pts = [(float(a), float(b)) for a, b in zip(
            rng.uniform(-60, 60, 300).round(3),
            rng.uniform(-120, 120, 300).round(3))]
        d = self._d(spark, pts)
        radii = [1_000_000, 4_000_000]
        runs = [
            {r["r_udeg"]: r["n_points"]
             for r in nn_radius(d, radii, res=rr).collect()}
            for rr in (4, 5, 6)]
        assert runs[0] == runs[1] == runs[2]
        assert runs[0][4_000_000] > 0

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import nn_radius, nn_radius_sql
        rng = np.random.default_rng(213)
        rows = [(int(i), float(a), float(b)) for i, (a, b) in
                enumerate(zip(rng.uniform(-85, 85, 400).round(2),
                              rng.uniform(-175, 175, 400).round(2)))]
        d = spark.createDataFrame(rows,
                                  "id long, lat double, lon double")
        radii = [500_000, 2_000_000, 6_000_000]
        got = _rows(nn_radius(d, radii, res=5))
        con = duckdb.connect()
        con.execute("CREATE TABLE src (id BIGINT, lat DOUBLE, "
                    "lon DOUBLE)")
        con.executemany("INSERT INTO src VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(nn_radius_sql(
            "SELECT id, lat, lon FROM src", radii)).fetchall())
        assert got == want
        assert sum(n for _, n in got) >= 400  # every point lands


class TestRevisitHist:
    def _d(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, event_id long, lat double, "
                  "lon double, us long")

    def test_same_cell_gaps_log2_buckets(self, spark):
        """One user, one cell, visits at 0s/1s/5s/5s: gaps 1s
        (bucket 1), 4s (bucket 3), 0s (bucket 0)."""
        from geospark.operators.events import revisit_hist
        d = self._d(spark, [
            (1, 1, 10.0, 10.0, 0),
            (1, 2, 10.0, 10.0, 1_000_000),
            (1, 3, 10.0, 10.0, 5_000_000),
            (1, 4, 10.0, 10.0, 5_000_000)])
        got = {r["bucket"]: r["n_gaps"]
               for r in revisit_hist(d, 2).collect()}
        assert got == {0: 1, 1: 1, 3: 1}

    def test_interleaved_visit_does_not_break_pair(self, spark):
        """A visit to ANOTHER cell between two same-cell visits does
        not reset the gap (cell-keyed LAG), and users are isolated
        from each other."""
        from geospark.operators.events import revisit_hist
        d = self._d(spark, [
            (1, 1, 10.0, 10.0, 0),
            (1, 2, -40.0, 120.0, 1_000_000),   # elsewhere
            (1, 3, 10.0, 10.0, 2_000_000),     # gap 2s -> bucket 2
            (2, 4, 10.0, 10.0, 9_000_000)])    # other user: no gap
        got = {r["bucket"]: r["n_gaps"]
               for r in revisit_hist(d, 2).collect()}
        assert got == {2: 1}

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.events import (revisit_hist,
                                               revisit_hist_sql)
        rng = np.random.default_rng(307)
        rows = [(int(rng.integers(1, 40)), int(i),
                 round(float(rng.uniform(-80, 80)), 2),
                 round(float(rng.uniform(-170, 170)), 2),
                 int(rng.integers(0, 3_600_000_000)))
                for i in range(2_000)]
        d = self._d(spark, rows)
        got = _rows(revisit_hist(d, 1))
        con = duckdb.connect()
        con.execute("CREATE TABLE src (user_id BIGINT, "
                    "event_id BIGINT, lat DOUBLE, lon DOUBLE, "
                    "us BIGINT)")
        con.executemany("INSERT INTO src VALUES (?, ?, ?, ?, ?)",
                        rows)
        want = sorted(tuple(r) for r in con.execute(revisit_hist_sql(
            "SELECT user_id, us, event_id, lat, lon FROM src",
            1)).fetchall())
        assert got == want and len(got) > 3


class TestLMNovelty:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")

    def test_known_vs_novel_exact(self, spark):
        """'a b' appears in 3 docs (known at min_count=2); 'x y'
        only once (novel). Doc 3 = half known, half novel ->
        novelty exactly 500000 ppm."""
        from geospark.operators.textstats import lm_novelty
        d = self._docs(spark, ["a b", "a b", "a b x y"])
        got = {r["doc_id"]: (r["n_bigrams"], r["n_known"],
                             r["novelty_ppm"])
               for r in lm_novelty(d, min_count=2).collect()}
        # doc 2 bigrams: (a,b) known, (b,x) novel, (x,y) novel
        assert got[0] == (1, 1, 0) and got[1] == (1, 1, 0)
        assert got[2] == (3, 1, 666666)

    def test_short_docs_excluded_floor_ppm(self, spark):
        """Docs with <2 tokens emit no row; floor division is
        toward zero (1/3 novel -> 333333)."""
        from geospark.operators.textstats import lm_novelty
        d = self._docs(spark, ["solo", "", "p q r z", "p q r w",
                               "p q"])
        out = lm_novelty(d, min_count=2).collect()
        ids = {r["doc_id"] for r in out}
        assert ids == {2, 3, 4}
        by = {r["doc_id"]: r["novelty_ppm"] for r in out}
        # docs 2/3: (p,q),(q,r) known; (r,z)/(r,w) novel -> 1/3
        assert by[2] == by[3] == 333333 and by[4] == 0

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.textstats import (lm_novelty,
                                                  lm_novelty_sql)
        rng = np.random.default_rng(401)
        vocab = [f"w{i}" for i in range(30)]
        texts = [" ".join(rng.choice(vocab,
                                     size=rng.integers(0, 25)))
                 for _ in range(300)]
        d = self._docs(spark, texts)
        got = _rows(lm_novelty(d, min_count=3))
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, "
                    "text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)",
                        [(i, t) for i, t in enumerate(texts)])
        want = sorted(tuple(r) for r in con.execute(
            lm_novelty_sql(min_count=3)).fetchall())
        assert got == want and len(got) > 200
        assert any(r[3] > 0 for r in got)  # novelty populated
