"""Round-5 session-7 operator tests: nearest-neighbor-distance
ladder, revisit-interval histogram, per-doc bigram novelty, discrete
Voronoi counts, radius of gyration, path motifs, vocab growth."""

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


class TestVoronoiCounts:
    def _seeds(self, spark, rows):
        return spark.createDataFrame(
            rows, "seed_id long, lat double, lon double")

    def _pts(self, spark, pts):
        return spark.createDataFrame(pts, "lat double, lon double")

    def test_assignment_and_trunc_mean(self, spark):
        """Two seeds on the equator; three points split 2/1; mean_d2
        truncates toward zero."""
        from geospark.operators.tiles import voronoi_counts
        seeds = self._seeds(spark, [(1, 0.0, 0.0), (2, 0.0, 10.0)])
        pts = self._pts(spark, [(0.0, 1.0), (0.0, 2.0), (0.0, 9.0)])
        got = {r["seed_id"]: (r["n_pts"], r["mean_d2"])
               for r in voronoi_counts(pts, seeds).collect()}
        # seed1: d2 = 1e12, 4e12 -> mean 2.5e12 trunc
        assert got[1] == (2, 2_500_000_000_000)
        assert got[2] == (1, 1_000_000_000_000)

    def test_tie_goes_to_smallest_seed(self, spark):
        """Point equidistant from two seeds -> smaller seed_id."""
        from geospark.operators.tiles import voronoi_counts
        seeds = self._seeds(spark, [(7, 0.0, 0.0), (3, 0.0, 2.0)])
        pts = self._pts(spark, [(0.0, 1.0)])
        got = voronoi_counts(pts, seeds).collect()
        assert len(got) == 1 and got[0]["seed_id"] == 3

    def test_map_only_plan_no_point_shuffle(self, spark):
        """The point stream must not hit an exchange before the
        seed-cardinality agg: exactly ONE exchange in the plan (the
        final groupBy), none keyed on a per-point id."""
        from geospark.operators.tiles import voronoi_counts
        seeds = self._seeds(spark, [(1, 0.0, 0.0), (2, 0.0, 10.0)])
        pts = self._pts(spark, [(0.0, 1.0), (0.0, 9.0)])
        plan = voronoi_counts(pts, seeds)._jdf.queryExecution() \
            .executedPlan().toString()
        n_ex = plan.count("Exchange hashpartitioning")
        assert n_ex == 1, plan

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import (voronoi_counts,
                                              voronoi_counts_sql)
        rng = np.random.default_rng(503)
        prow = [(round(float(a), 3), round(float(b), 3)) for a, b in
                zip(rng.uniform(-80, 80, 500),
                    rng.uniform(-170, 170, 500))]
        srow = [(int(i), round(float(a), 2), round(float(b), 2))
                for i, (a, b) in enumerate(zip(
                    rng.uniform(-70, 70, 12),
                    rng.uniform(-160, 160, 12)))]
        got = _rows(voronoi_counts(self._pts(spark, prow),
                                   self._seeds(spark, srow)))
        con = duckdb.connect()
        con.execute("CREATE TABLE p (lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?)", prow)
        con.execute("CREATE TABLE s (seed_id BIGINT, lat DOUBLE, "
                    "lon DOUBLE)")
        con.executemany("INSERT INTO s VALUES (?, ?, ?)", srow)
        want = sorted(tuple(r) for r in con.execute(
            voronoi_counts_sql("SELECT lat, lon FROM p",
                               "SELECT seed_id, lat, lon FROM s"))
            .fetchall())
        assert got == want and sum(r[1] for r in got) == 500


class TestGyration:
    def _d(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, lat double, lon double")

    def test_exact_identity(self, spark):
        """Two points 2e6 µdeg apart: centroid at the midpoint, each
        deviates 1e6 -> rg2 = 1e12 exactly; a stationary user -> 0."""
        from geospark.operators.events import gyration
        d = self._d(spark, [(1, 0.0, 0.0), (1, 0.0, 2.0),
                            (2, 5.0, 5.0), (2, 5.0, 5.0)])
        got = {r["user_id"]: (r["n_pts"], r["rg2"])
               for r in gyration(d).collect()}
        assert got[1] == (2, 1_000_000_000_000)
        assert got[2] == (2, 0)

    def test_floor_on_fractional_variance(self, spark):
        """Three collinear points at 0, 1, 5 µdeg-millions: exact
        rg2 = (3*26e12 - 36e12)/9 = 4.666...e12 -> floor."""
        from geospark.operators.events import gyration
        d = self._d(spark, [(1, 0.0, 0.0), (1, 0.0, 1.0),
                            (1, 0.0, 5.0)])
        got = gyration(d).collect()[0]
        assert (got["n_pts"], got["rg2"]) == (3, 4_666_666_666_666)

    def test_antipodal_sum_overflow_guard(self, spark):
        """200 alternating near-antipodal points per user — the d2
        sums overflow BIGINT; the DECIMAL path must stay exact (rg2
        == the closed form for an even split of +/-x)."""
        from geospark.operators.events import gyration
        rows = [(1, 0.0, -179.9999999 if i % 2 else 179.9999999)
                for i in range(200)]
        d = self._d(spark, rows)
        got = gyration(d).collect()[0]
        # ix = +/-179999999 (floor of 179.9999999e6 and -180e6+1...)
        import math
        xs = [math.floor((-179.9999999 if i % 2 else 179.9999999)
                         * 1e6) for i in range(200)]
        n = len(xs)
        rg2 = (n * sum(x * x for x in xs) - sum(xs) ** 2) // (n * n)
        assert (got["n_pts"], got["rg2"]) == (n, rg2)

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.events import gyration, gyration_sql
        rng = np.random.default_rng(509)
        rows = [(int(rng.integers(1, 30)),
                 round(float(rng.uniform(-85, 85)), 3),
                 round(float(rng.uniform(-175, 175)), 3))
                for _ in range(1_000)]
        got = _rows(gyration(self._d(spark, rows)))
        con = duckdb.connect()
        con.execute("CREATE TABLE src (user_id BIGINT, lat DOUBLE, "
                    "lon DOUBLE)")
        con.executemany("INSERT INTO src VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(gyration_sql(
            "SELECT user_id, lat, lon FROM src")).fetchall())
        assert got == want and len(got) == 29


class TestPathMotifs:
    def _d(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, event_id long, lat double, "
                  "lon double, us long")

    def _cells(self, res):
        # centers of three distinct res cells on one row
        n = 1 << res
        return [(-90.0 + 0.5 * 180.0 / n,
                 -180.0 + (x + 0.5) * 360.0 / n) for x in range(n)]

    def test_collapse_and_min_count(self, spark):
        """A->A->B->C collapses to A->B->C; two users tracing the
        same corridor push the motif past min_count=2, a one-off
        detour stays out."""
        from geospark.operators.events import path_motifs
        c = self._cells(2)
        a, b, cc, dd = c[0], c[1], c[2], c[3]
        rows = []
        for u in (1, 2):
            for i, (la, lo) in enumerate([a, a, b, cc]):
                rows.append((u, i, la, lo, i * 1_000_000))
        rows += [(3, 0, dd[0], dd[1], 0), (3, 1, a[0], a[1], 1),
                 (3, 2, b[0], b[1], 2)]  # D->A->B once: below min
        got = path_motifs(self._d(spark, rows), 2,
                          min_count=2).collect()
        assert len(got) == 1 and got[0]["n"] == 2

    def test_dwell_is_one_step(self, spark):
        """A->B->B->B->A yields exactly the A->B->A motif (repeats
        collapse), not zero and not B->B->*."""
        from geospark.operators.events import path_motifs
        c = self._cells(2)
        a, b = c[0], c[1]
        seq = [a, b, b, b, a]
        rows = [(1, i, la, lo, i * 1_000_000)
                for i, (la, lo) in enumerate(seq)]
        got = path_motifs(self._d(spark, rows), 2,
                          min_count=1).collect()
        assert len(got) == 1
        r = got[0]
        assert r["c1"] != r["c2"] and r["c2"] != r["c3"]
        assert r["c1"] == r["c3"] and r["n"] == 1

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.events import (path_motifs,
                                               path_motifs_sql)
        rng = np.random.default_rng(521)
        rows = [(int(rng.integers(1, 25)), int(i),
                 round(float(rng.uniform(-80, 80)), 1),
                 round(float(rng.uniform(-170, 170)), 1),
                 int(rng.integers(0, 10_000_000)))
                for i in range(3_000)]
        got = _rows(path_motifs(self._d(spark, rows), 1,
                                min_count=2))
        con = duckdb.connect()
        con.execute("CREATE TABLE src (user_id BIGINT, "
                    "event_id BIGINT, lat DOUBLE, lon DOUBLE, "
                    "us BIGINT)")
        con.executemany("INSERT INTO src VALUES (?, ?, ?, ?, ?)",
                        rows)
        want = sorted(tuple(r) for r in con.execute(path_motifs_sql(
            "SELECT user_id, us, event_id, lat, lon FROM src", 1,
            min_count=2)).fetchall())
        assert got == want and len(got) > 10


class TestVocabGrowth:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")

    def test_first_doc_identity_exact(self, spark):
        """Vocab counts a term at its FIRST doc only; tokens and
        docs accumulate per checkpoint."""
        from geospark.operators.textstats import vocab_growth
        d = self._docs(spark, ["a b a", "b c", "c d e", ""])
        got = {r["checkpoint_doc"]: (r["n_docs"], r["n_tokens"],
                                     r["vocab"])
               for r in vocab_growth(d, [0, 1, 3]).collect()}
        assert got[0] == (1, 3, 2)        # a, b
        assert got[1] == (2, 5, 3)        # + c
        assert got[3] == (4, 8, 5)        # + d, e; empty doc counted
    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.textstats import (vocab_growth,
                                                  vocab_growth_sql)
        rng = np.random.default_rng(601)
        vocab = [f"t{i}" for i in range(200)]
        texts = [" ".join(rng.choice(
            vocab, size=rng.integers(0, 30),
            p=np.arange(200, 0, -1) / np.arange(200, 0, -1).sum()))
            for _ in range(400)]
        d = self._docs(spark, texts)
        cps = [10, 50, 150, 399]
        got = _rows(vocab_growth(d, cps))
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, "
                    "text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)",
                        [(i, t) for i, t in enumerate(texts)])
        want = sorted(tuple(r) for r in con.execute(
            vocab_growth_sql(cps)).fetchall())
        assert got == want
        # the curve is monotone in every component
        by = sorted(got)
        for a, b in zip(by, by[1:]):
            assert a[1] <= b[1] and a[2] <= b[2] and a[3] <= b[3]


class TestContactGraph:
    def _d(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, event_id long, lat double, "
                  "lon double, us long")

    def test_tau_window_closed_and_counted_once(self, spark):
        """Contacts at Δt = 0, τ, and τ+1: the first two qualify
        (closed window), the third doesn't; each qualifying event
        pair counts exactly once despite the two-bucket explode."""
        from geospark.operators.events import contact_graph
        tau = 1_000_000
        d = self._d(spark, [
            (1, 1, 10.0, 10.0, 0),
            (2, 2, 10.0, 10.0, 0),            # Δt=0
            (2, 3, 10.0, 10.0, tau),          # Δt=τ
            (2, 4, 10.0, 10.0, tau + 1)])     # Δt=τ+1: out
        got = contact_graph(d, 2, tau).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["user_a"], r["user_b"], r["n_contacts"]) == (1, 2, 2)

    def test_cross_bucket_pair_found(self, spark):
        """A pair straddling a τ-bucket boundary (l at 0.9τ, r at
        1.1τ) is found via the exploded b+1 copy."""
        from geospark.operators.events import contact_graph
        tau = 1_000_000
        d = self._d(spark, [
            (1, 1, 10.0, 10.0, 900_000),
            (2, 2, 10.0, 10.0, 1_100_000)])
        got = contact_graph(d, 2, tau).collect()
        assert len(got) == 1 and got[0]["n_contacts"] == 1

    def test_self_and_cross_cell_excluded_cap(self, spark):
        """Same-user pairs never count; different cells never pair;
        an over-cap (cell, bucket) drops whole — mirrored semantics
        with the oracle."""
        from geospark.operators.events import contact_graph
        tau = 1_000_000
        rows = [(1, 1, 10.0, 10.0, 0), (1, 2, 10.0, 10.0, 10),
                (2, 3, -40.0, 120.0, 0)]
        # hot bucket: 5 users in one (cell, bucket) with cap 4
        rows += [(10 + u, 10 + u, 60.0, 60.0, 100) for u in range(5)]
        got = contact_graph(self._d(spark, rows), 2, tau,
                            max_bucket=4).collect()
        assert got == []

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.events import (contact_graph,
                                               contact_graph_sql)
        rng = np.random.default_rng(701)
        rows = [(int(rng.integers(1, 30)), int(i),
                 round(float(rng.uniform(-45, 45)), 1),
                 round(float(rng.uniform(-90, 90)), 1),
                 int(rng.integers(0, 50_000_000)))
                for i in range(1_500)]
        d = self._d(spark, rows)
        tau = 5_000_000
        got = _rows(contact_graph(d, 1, tau, max_bucket=200))
        con = duckdb.connect()
        con.execute("CREATE TABLE src (user_id BIGINT, "
                    "event_id BIGINT, lat DOUBLE, lon DOUBLE, "
                    "us BIGINT)")
        con.executemany("INSERT INTO src VALUES (?, ?, ?, ?, ?)",
                        rows)
        want = sorted(tuple(r) for r in con.execute(contact_graph_sql(
            "SELECT user_id, us, event_id, lat, lon FROM src", 1,
            tau, max_bucket=200)).fetchall())
        assert got == want and len(got) > 20


class TestCellFano:
    def _d(self, spark, rows):
        return spark.createDataFrame(
            rows, "lat double, lon double, us long")

    def test_exact_fraction_and_gap_fill(self, spark):
        """One cell with daily counts [3, 0, 3] over a 3-day span
        (the middle day only exists via the dense fill):
        S=6, Q=18, fano_ppm = 1e6*(3*18-36)//(2*6) = 1_500_000."""
        from geospark.operators.tiles import cell_fano
        day = 86_400_000_000
        rows = ([(10.0, 10.0, 0)] * 3
                + [(10.0, 10.0, 2 * day + 5)] * 3)
        got = cell_fano(self._d(spark, rows), 2).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["n_days"], r["total"], r["fano_ppm"]) == \
            (3, 6, 1_500_000)

    def test_poisson_metronome_extremes(self, spark):
        """A perfectly constant cell (1/day) has variance 0 ->
        fano 0; the global span stretches every cell's calendar."""
        from geospark.operators.tiles import cell_fano
        day = 86_400_000_000
        rows = [(10.0, 10.0, i * day) for i in range(5)]
        # second cell active on day 0 only: counts [5,0,0,0,0]
        rows += [(-40.0, 120.0, 10)] * 5
        got = {r["cell"]: (r["n_days"], r["fano_ppm"])
               for r in cell_fano(self._d(spark, rows), 2).collect()}
        vals = sorted(got.values())
        # constant cell: S=5,Q=5,n=5 -> (25-25)=0
        # bursty cell: S=5,Q=25,n=5 -> 1e6*(125-25)//(4*5)=5e6
        assert vals == [(5, 0), (5, 5_000_000)]

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import cell_fano, cell_fano_sql
        rng = np.random.default_rng(811)
        day = 86_400_000_000
        rows = [(round(float(rng.uniform(-60, 60)), 1),
                 round(float(rng.uniform(-120, 120)), 1),
                 int(rng.integers(0, 30 * day)))
                for _ in range(2_000)]
        got = _rows(cell_fano(self._d(spark, rows), 2))
        con = duckdb.connect()
        con.execute("CREATE TABLE src (lat DOUBLE, lon DOUBLE, "
                    "us BIGINT)")
        con.executemany("INSERT INTO src VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(cell_fano_sql(
            "SELECT lat, lon, us FROM src", 2)).fetchall())
        assert got == want and len(got) > 5


class TestCellGini:
    def _d(self, spark, rows):
        return spark.createDataFrame(rows, "lat double, lon double")

    def test_uniform_is_zero_concentrated_is_high(self, spark):
        """Equal counts over 4 cells -> gini 0; all-but-one in a
        single cell -> the exact rank-identity value."""
        from geospark.operators.tiles import cell_gini

        def centers(xs):
            n = 1 << 2
            return [(-90.0 + 0.5 * 180.0 / n,
                     -180.0 + (x + 0.5) * 360.0 / n) for x in xs]
        eq = [c for x in range(4) for c in [centers([x])[0]] * 5]
        r0 = cell_gini(self._d(spark, eq), 2).collect()[0]
        assert (r0["n_cells"], r0["total"], r0["gini_ppm"]) == \
            (4, 20, 0)
        # counts [1, 9] ascending: num = 2*(1*1+2*9)-3*10 = 8,
        # den = 2*10 -> 400000
        skew = [centers([0])[0]] + [centers([1])[0]] * 9
        r1 = cell_gini(self._d(spark, skew), 2).collect()[0]
        assert (r1["n_cells"], r1["total"], r1["gini_ppm"]) == \
            (2, 10, 400_000)

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import cell_gini, cell_gini_sql
        rng = np.random.default_rng(823)
        rows = [(round(float(rng.normal(20, 15)), 2),
                 round(float(rng.normal(-40, 30)), 2))
                for _ in range(3_000)]
        rows = [(max(-89.0, min(89.0, a)), max(-179.0, min(179.0, b)))
                for a, b in rows]
        got = _rows(cell_gini(self._d(spark, rows), 4))
        con = duckdb.connect()
        con.execute("CREATE TABLE src (lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO src VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(cell_gini_sql(
            "SELECT lat, lon FROM src", 4)).fetchall())
        assert got == want
        assert 0 < got[0][2] < 1_000_000  # clustered normals


class TestTypeTransitions:
    def _d(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, event_id long, event_type string, "
                  "us long")

    def test_conditionals_sum_and_prune_after(self, spark):
        """a->b, a->b, a->c: P(b|a)=666666, P(c|a)=333333;
        min_count=2 prunes a->c but leaves P(b|a) unchanged."""
        from geospark.operators.events import type_transitions
        rows = [(1, 1, "a", 0), (1, 2, "b", 1), (1, 3, "a", 2),
                (1, 4, "b", 3), (2, 5, "a", 0), (2, 6, "c", 1)]
        got = {(r["t1"], r["t2"]): (r["n"], r["cond_ppm"])
               for r in type_transitions(self._d(spark, rows))
               .collect()}
        assert got[("a", "b")] == (2, 666666)
        assert got[("a", "c")] == (1, 333333)
        assert got[("b", "a")] == (1, 1_000_000)
        pruned = {(r["t1"], r["t2"]): r["cond_ppm"]
                  for r in type_transitions(self._d(spark, rows),
                                            min_count=2).collect()}
        assert pruned == {("a", "b"): 666666}

    def test_user_isolation(self, spark):
        """The last event of user 1 and the first of user 2 never
        form a transition."""
        from geospark.operators.events import type_transitions
        rows = [(1, 1, "x", 0), (2, 2, "y", 1)]
        assert type_transitions(self._d(spark, rows)).collect() == []

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.events import (type_transitions,
                                               type_transitions_sql)
        rng = np.random.default_rng(829)
        types = ["view", "click", "buy", "idle"]
        rows = [(int(rng.integers(1, 20)), int(i),
                 str(rng.choice(types)),
                 int(rng.integers(0, 10_000_000)))
                for i in range(2_000)]
        got = _rows(type_transitions(self._d(spark, rows)))
        con = duckdb.connect()
        con.execute("CREATE TABLE src (user_id BIGINT, "
                    "event_id BIGINT, event_type VARCHAR, us BIGINT)")
        con.executemany("INSERT INTO src VALUES (?, ?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(
            type_transitions_sql(
                "SELECT user_id, event_id, event_type, us FROM src"))
            .fetchall())
        assert got == want and len(got) == 16


class TestProximityEdgesTriangles:
    def _pts(self, spark, pts):
        return spark.createDataFrame(
            [(i, la, lo) for i, (la, lo) in enumerate(pts)],
            "id long, lat double, lon double")

    def _edges(self, spark, pairs):
        return spark.createDataFrame(
            pairs, "user_a long, user_b long")

    def test_edges_once_closed_boundary(self, spark):
        """Each unordered pair once, dist == r included, the far
        point isolated."""
        from geospark.operators.tiles import proximity_edges
        d = self._pts(spark, [(0.0, 0.0), (0.0, 1.0), (0.0, 2.0),
                              (0.0, 50.0)])
        got = sorted((r["id_a"], r["id_b"]) for r in proximity_edges(
            d, 1_000_000).collect())
        assert got == [(0, 1), (1, 2)]

    def test_triangle_and_cc_exact(self, spark):
        """K3 plus a pendant: the three clique nodes have one
        triangle each; the hub (degree 3) has cc = 2*1/(3*2) ->
        333333; the pendant (degree 1) emits no row."""
        from geospark.operators.events import triangles
        e = self._edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
        got = {r["node"]: (r["degree"], r["n_tri"], r["cc_ppm"])
               for r in triangles(e).collect()}
        assert got[1] == (2, 1, 1_000_000)
        assert got[2] == (2, 1, 1_000_000)
        assert got[3] == (3, 1, 333_333)
        assert 4 not in got

    def test_duplicate_reversed_self_edges_collapse(self, spark):
        """(a,b), (b,a), a second (a,b), and a self-loop must count
        as ONE edge — K3 still yields one triangle per node."""
        from geospark.operators.events import triangles
        e = self._edges(spark, [(1, 2), (2, 1), (1, 2), (2, 3),
                                (1, 3), (2, 2)])
        got = {r["node"]: r["n_tri"] for r in triangles(e).collect()}
        assert got == {1: 1, 2: 1, 3: 1}

    def test_square_no_triangles(self, spark):
        """C4 has wedges but no closures: every node degree 2,
        n_tri 0, cc 0."""
        from geospark.operators.events import triangles
        e = self._edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
        got = {r["node"]: (r["degree"], r["n_tri"], r["cc_ppm"])
               for r in triangles(e).collect()}
        assert got == {i: (2, 0, 0) for i in (1, 2, 3, 4)}

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.events import triangles, triangles_sql
        from geospark.operators.tiles import (proximity_edges,
                                              proximity_edges_sql)
        rng = np.random.default_rng(907)
        rows = [(int(i), round(float(a), 2), round(float(b), 2))
                for i, (a, b) in enumerate(zip(
                    rng.uniform(-40, 40, 300),
                    rng.uniform(-80, 80, 300)))]
        d = spark.createDataFrame(rows,
                                  "id long, lat double, lon double")
        from pyspark.sql import functions as F
        e = proximity_edges(d, 6_000_000, res=4).select(
            F.col("id_a").alias("user_a"),
            F.col("id_b").alias("user_b"))
        got = _rows(triangles(e))
        con = duckdb.connect()
        con.execute("CREATE TABLE src (id BIGINT, lat DOUBLE, "
                    "lon DOUBLE)")
        con.executemany("INSERT INTO src VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(triangles_sql(
            "SELECT id_a AS user_a, id_b AS user_b FROM ("
            + proximity_edges_sql("SELECT id, lat, lon FROM src",
                                  6_000_000) + ")")).fetchall())
        assert got == want and len(got) > 50
        assert any(r[2] > 0 for r in got)


def _center7(y, x, res):
    n = 1 << res
    return (-90.0 + (y + 0.5) * 180.0 / n,
            -180.0 + (x + 0.5) * 360.0 / n)


class TestStreamRevisitGaps:
    RES = 4

    def test_matches_batch_across_microbatches(self, spark, tmp_path):
        """Chunked replay through the state store equals the batch
        revisit_hist histogram exactly — including a gap whose two
        endpoints land in DIFFERENT microbatch files (the last-visit
        timestamp must survive the boundary), an interleaved
        other-cell visit that must not reset the gap, and a
        same-second revisit (bucket 0)."""
        import datetime as dt

        from pyspark.sql import functions as F

        from geospark.operators.events import revisit_hist
        from geospark.streaming.stream import stream_revisit_gaps
        base = dt.datetime(2024, 1, 1)
        a, b = _center7(5, 5, self.RES), _center7(0, 0, self.RES)
        # user 1: A at 0s, B at 30s, A at 90s (gap 90 across files),
        #         A at 90s again via +0s dup (bucket 0)
        # user 2: A at 10s | A at 74s (gap 64 -> bucket 7)
        rows = [
            (0, base, 1, *a),
            (1, base + dt.timedelta(seconds=30), 1, *b),
            (2, base + dt.timedelta(seconds=10), 2, *a),
            # --- file boundary ---
            (3, base + dt.timedelta(seconds=90), 1, *a),
            (4, base + dt.timedelta(seconds=90), 1, *a),
            (5, base + dt.timedelta(seconds=74), 2, *a),
        ]
        schema = ("event_id long, ts timestamp_ntz, user_id long, "
                  "lat double, lon double")
        src = str(tmp_path / "revisit_src")
        spark.createDataFrame(rows[:3], schema).coalesce(1) \
            .write.mode("overwrite").parquet(src)
        spark.createDataFrame(rows[3:], schema).coalesce(1) \
            .write.mode("append").parquet(src)

        sdf = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
        out = stream_revisit_gaps(sdf, self.RES)
        q = (out.writeStream.format("memory")
             .queryName("revisit_stream").outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        gaps = spark.sql("SELECT * FROM revisit_stream").collect()
        got_hist = {}
        for r in gaps:
            got_hist[r["bucket"]] = got_hist.get(r["bucket"], 0) + 1

        e = spark.read.parquet(src)
        pts = e.select("user_id", "event_id", "lat", "lon",
                       F.expr("timestampdiff(MICROSECOND, "
                              "TIMESTAMP_NTZ '2024-01-01 00:00:00', "
                              "ts)").alias("us"))
        want_hist = {r["bucket"]: r["n_gaps"]
                     for r in revisit_hist(pts, self.RES).collect()}
        assert got_hist == want_hist
        # gap 90 (bucket 7), gap 0 (bucket 0), gap 64 (bucket 7)
        assert got_hist == {7: 2, 0: 1}
        gs = sorted(r["gap_s"] for r in gaps)
        assert gs == [0, 64, 90]


class TestBoundedPaths:
    def _e(self, spark, rows):
        return spark.createDataFrame(rows,
                                     "id_a long, id_b long, w long")

    def _s(self, spark, ids):
        return spark.createDataFrame([(i,) for i in ids], "id long")

    def test_detour_beats_direct_edge(self, spark):
        """1-2 direct costs 10; 1-3-2 costs 2+3=5: the 2-hop detour
        wins — the case unit-hop BFS gets wrong."""
        from geospark.operators.graph import bounded_paths
        e = self._e(spark, [(1, 2, 10), (1, 3, 2), (3, 2, 3)])
        got = {r["node"]: r["cost"] for r in bounded_paths(
            e, self._s(spark, [1]), 2).collect()}
        assert got == {1: 0, 2: 5, 3: 2}

    def test_hop_bound_is_exact(self, spark):
        """A 3-hop-only node is unreachable at k=2 and costed at
        k=3; k=1 sees only direct neighbors."""
        from geospark.operators.graph import bounded_paths
        e = self._e(spark, [(1, 2, 1), (2, 3, 1), (3, 4, 1)])
        s = self._s(spark, [1])
        for k, want in ((1, {1: 0, 2: 1}),
                        (2, {1: 0, 2: 1, 3: 2}),
                        (3, {1: 0, 2: 1, 3: 2, 4: 3})):
            got = {r["node"]: r["cost"]
                   for r in bounded_paths(e, s, k).collect()}
            assert got == want, k

    def test_multi_seed_min_and_undirected(self, spark):
        """Two seeds: each node takes the cheaper source; edges
        relax in BOTH directions; an isolated seed reports 0."""
        from geospark.operators.graph import bounded_paths
        e = self._e(spark, [(1, 2, 4), (3, 2, 1)])
        got = {r["node"]: r["cost"] for r in bounded_paths(
            e, self._s(spark, [1, 3, 99]), 2).collect()}
        assert got == {1: 0, 3: 0, 99: 0, 2: 1}

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.graph import (bounded_paths,
                                              bounded_paths_sql)
        rng = np.random.default_rng(1013)
        edges = set()
        while len(edges) < 400:
            a, b = sorted(rng.integers(0, 120, 2).tolist())
            if a != b:
                edges.add((int(a), int(b)))
        rows = [(a, b, int(rng.integers(1, 1000)))
                for a, b in sorted(edges)]
        seeds = [0, 17, 54]
        got = _rows(bounded_paths(self._e(spark, rows),
                                  self._s(spark, seeds), 3))
        con = duckdb.connect()
        con.execute("CREATE TABLE e (id_a BIGINT, id_b BIGINT, "
                    "w BIGINT)")
        con.executemany("INSERT INTO e VALUES (?, ?, ?)", rows)
        con.execute("CREATE TABLE s (id BIGINT)")
        con.executemany("INSERT INTO s VALUES (?)",
                        [(i,) for i in seeds])
        want = sorted(tuple(r) for r in con.execute(bounded_paths_sql(
            "SELECT id_a, id_b, w FROM e", "SELECT id FROM s",
            3)).fetchall())
        assert got == want and len(got) > 100
