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


from fractions import Fraction


def _center(y, x, res):
    n = 1 << res
    return (-90.0 + (y + 0.5) * 180.0 / n,
            -180.0 + (x + 0.5) * 360.0 / n)


def _lattice(spark, cells, res, counts):
    rows = []
    for (y, x), c in zip(cells, counts):
        lat, lon = _center(y, x, res)
        rows += [(lat, lon)] * c
    return spark.createDataFrame(rows, "lat double, lon double")


def _geary_ppm_ref(cells, counts):
    """Independent exact re-derivation of Geary's C (queen ring-1,
    interior fixtures only), truncated toward zero at ppm."""
    n = len(cells)
    t = sum(counts)
    dev = {c: n * x - t for c, x in zip(cells, counts)}
    sd = w = 0
    for ci in cells:
        for cj in cells:
            if ci == cj:
                continue
            if max(abs(ci[0] - cj[0]), abs(ci[1] - cj[1])) == 1:
                w += 1
                sd += (dev[ci] - dev[cj]) ** 2
    m2 = sum(d * d for d in dev.values())
    if w == 0 or m2 == 0:
        return None, w
    return int(Fraction(1_000_000 * (n - 1) * sd, 2 * w * m2)), w


class TestGearyC:
    RES = 4

    def _run(self, spark, cells, counts):
        from geospark.operators.tiles import geary_c
        d = _lattice(spark, cells, self.RES, counts)
        row = geary_c(d, self.RES).collect()[0]
        return row["n_cells"], row["w_pairs"], row["geary_ppm"]

    def test_two_cell_hand_value(self, spark):
        """Counts (3,1) side by side: dev=(2,-2), SD=2*16=32, M2=8,
        W=2 -> C = 1e6*1*32/(2*2*8) = exactly 1_000_000."""
        nc, wp, ppm = self._run(spark, [(5, 5), (5, 6)], [3, 1])
        assert (nc, wp, ppm) == (2, 2, 1_000_000)

    def test_clustered_below_one(self, spark):
        """Hot 2x2 block beside a cold 2x2 block: like borders
        like -> C < 1 (ppm < 1e6); exact Fraction re-derivation."""
        cells = [(5, 5), (5, 6), (6, 5), (6, 6),
                 (5, 8), (5, 9), (6, 8), (6, 9)]
        counts = [9, 9, 9, 9, 1, 1, 1, 1]
        want, w = _geary_ppm_ref(cells, counts)
        nc, wp, ppm = self._run(spark, cells, counts)
        assert (nc, wp) == (8, w) and ppm == want and ppm < 1_000_000

    def test_checkerboard_above_one(self, spark):
        """Alternating high/low 3x3: every neighbor differs ->
        C > 1 (ppm > 1e6)."""
        cells = [(y, x) for y in (5, 6, 7) for x in (5, 6, 7)]
        counts = [9 if (y + x) % 2 == 0 else 1 for (y, x) in cells]
        want, w = _geary_ppm_ref(cells, counts)
        nc, wp, ppm = self._run(spark, cells, counts)
        assert (nc, wp) == (9, w) and ppm == want and ppm > 1_000_000

    def test_constant_surface_null(self, spark):
        """M2 = 0 -> NULL, matching moran_i's convention."""
        nc, wp, ppm = self._run(spark, [(5, 5), (5, 6), (6, 5)],
                                [4, 4, 4])
        assert nc == 3 and wp > 0 and ppm is None

    def test_isolated_cells_null(self, spark):
        """W = 0 -> NULL."""
        nc, wp, ppm = self._run(spark, [(2, 2), (8, 8), (12, 4)],
                                [1, 5, 9])
        assert nc == 3 and wp == 0 and ppm is None

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import geary_c, geary_c_sql
        rng = np.random.default_rng(84)
        rows = [(float(a), float(b)) for a, b in zip(
            rng.uniform(-80, 80, 800).round(1),
            rng.uniform(-170, 170, 800).round(1))]
        d = spark.createDataFrame(rows, "lat double, lon double")
        got = sorted(tuple(r) for r in geary_c(d, 3).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE p (lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(
            geary_c_sql("SELECT lat, lon FROM p", 3)).fetchall())
        assert got == want and got[0][2] is not None


class TestJoinCounts:
    RES = 4

    def _run(self, spark, cells, counts):
        from geospark.operators.tiles import join_counts
        d = _lattice(spark, cells, self.RES, counts)
        r = join_counts(d, self.RES).collect()[0]
        return tuple(r)

    def test_alternating_row_all_hl(self, spark):
        """Counts (3,1,3) in a row, mean 7/3: HIGH/LOW/HIGH -> the
        two adjacencies are both cross pairs: hh=ll=0, hl=2."""
        got = self._run(spark, [(5, 5), (5, 6), (5, 7)], [3, 1, 3])
        assert got == (3, 2, 0, 0, 2, 2)

    def test_blocked_row_one_of_each(self, spark):
        """Counts (5,5,1,1) in a row: HH | HL | LL -> one pair of
        each kind."""
        got = self._run(spark, [(5, 5), (5, 6), (5, 7), (5, 8)],
                        [5, 5, 1, 1])
        assert got == (4, 2, 1, 1, 1, 3)

    def test_queen_diagonal_is_adjacent(self, spark):
        """Two HIGH cells touching only diagonally still join:
        (5,5) and (6,6) high, a far LOW cell breaks the tie ->
        hh=1, w=1."""
        got = self._run(spark, [(5, 5), (6, 6), (10, 10)],
                        [5, 5, 1])
        assert got == (3, 2, 1, 0, 0, 1)

    def test_no_adjacency_zero_pairs(self, spark):
        got = self._run(spark, [(2, 2), (8, 8)], [3, 1])
        assert got == (2, 1, 0, 0, 0, 0)

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import (join_counts,
                                              join_counts_sql)
        rng = np.random.default_rng(85)
        rows = [(float(a), float(b)) for a, b in zip(
            rng.uniform(-80, 80, 800).round(1),
            rng.uniform(-170, 170, 800).round(1))]
        d = spark.createDataFrame(rows, "lat double, lon double")
        got = sorted(tuple(r) for r in join_counts(d, 3).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE p (lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(
            join_counts_sql("SELECT lat, lon FROM p", 3)).fetchall())
        assert got == want and got[0][5] > 0


class TestFuzzyPairs:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")

    def _run(self, spark, texts, **kw):
        from geospark.operators.dedup import fuzzy_pairs
        return sorted(tuple(r) for r in
                      fuzzy_pairs(self._docs(spark, texts),
                                  **kw).collect())

    def test_single_edit_found_exact_dist(self, spark):
        """One substitution inside the title -> dist 1."""
        got = self._run(spark, ["the quick brown fox jumps",
                                "the quick brewn fox jumps",
                                "zzz unrelated zzz zzz zzz"],
                        d=3, title_len=24, prefix_len=8)
        assert got == [(0, 1, 1)]

    def test_cross_block_pair_invisible(self, spark):
        """Identical tails but different 8-char prefixes: blocking
        semantics say NO pair — the documented coverage cap."""
        got = self._run(spark, ["alpha one two three four",
                                "bravo one two three four"],
                        d=20, title_len=24, prefix_len=8)
        assert got == []

    def test_hot_block_dropped(self, spark):
        """A block larger than max_block is dropped whole; a cold
        block beside it still pairs."""
        hot = [f"same start {i:013d}" for i in range(4)]
        cold = ["cold start aaaa", "cold start aaab"]
        got = self._run(spark, hot + cold, d=8, title_len=24,
                        prefix_len=8, max_block=3)
        assert got == [(4, 5, 1)]
        # raising the cap admits the hot block's pairs too
        got2 = self._run(spark, hot + cold, d=8, title_len=24,
                         prefix_len=8, max_block=4)
        assert len(got2) == 6 + 1

    def test_distance_boundary(self, spark):
        """dist == d kept, dist == d+1 dropped: titles differing in
        exactly 3 / exactly 4 substitutions at d=3."""
        base = "prefix__ then the tail ok"
        three = "prefix__ thXn Xhe tXil ok"
        four = "prefix__ thXn Xhe tXiX ok"
        assert self._run(spark, [base, three], d=3) == [(0, 1, 3)]
        assert self._run(spark, [base, four], d=3) == []

    def test_title_truncation_is_the_key(self, spark):
        """Edits PAST title_len are invisible: same first 24 chars
        -> dist 0 pair regardless of the tails."""
        got = self._run(spark, ["shared twenty-four chars AAAA",
                                "shared twenty-four chars BBBB"],
                        d=2, title_len=24, prefix_len=8)
        assert got == [(0, 1, 0)]

    def test_inline_oracle_parity(self, spark):
        import duckdb

        from geospark.operators.dedup import (fuzzy_pairs,
                                              fuzzy_pairs_sql)
        vocab = ["data", "query", "spark", "tile", "cell", "join"]
        texts = []
        for i in range(120):
            w = [vocab[(i * 7 + k) % 6] for k in range(6)]
            t = " ".join(w)
            if i % 3 == 0:
                t = t[:10] + "X" + t[11:]
            texts.append(t)
        docs = self._docs(spark, texts)
        got = sorted(tuple(r) for r in fuzzy_pairs(
            docs, d=4, title_len=20, prefix_len=6,
            max_block=80).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, "
                    "text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)",
                        list(enumerate(texts)))
        want = sorted(tuple(r) for r in con.execute(
            fuzzy_pairs_sql(4, 20, 6, 80)).fetchall())
        assert got == want and len(got) > 0

    def test_plan_jvm_side_and_partitioned(self, spark):
        """The DP distance runs JVM-side (no Python eval) and the
        self-join reuses one explicit block-key exchange."""
        from geospark.operators.dedup import fuzzy_pairs
        docs = self._docs(spark, ["aaaa bbbb", "aaaa bbbc"])
        plan = fuzzy_pairs(docs)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "levenshtein" in plan
        for bad in ("BatchEvalPython", "ArrowEvalPython"):
            assert bad not in plan, plan


class TestSDEllipse:
    M2 = 10 ** 12  # 1 degree = 1e6 µdeg, so 1 deg^2 = 1e12 µdeg^2

    def _run(self, spark, pts):
        """pts: [(user, lat_deg, lon_deg)] — integer degrees, so the
        µdeg scaling is float-exact."""
        from geospark.operators.events import sd_ellipse
        d = spark.createDataFrame(
            [(u, float(la), float(lo)) for u, la, lo in pts],
            "user_id long, lat double, lon double")
        return {r["user_id"]: (r["n_pts"], r["var_x"], r["var_y"],
                               r["cov_xy"], r["orient"])
                for r in sd_ellipse(d).collect()}

    def test_diagonal_ne(self, spark):
        """(0,0) and (2,2) deg: Sxx=Syy=Sxy=4e12, n^2=4 ->
        var=cov=1e12, orient NE."""
        got = self._run(spark, [(1, 0, 0), (1, 2, 2)])
        assert got[1] == (2, self.M2, self.M2, self.M2, "NE")

    def test_antidiagonal_nw_negative_cov(self, spark):
        got = self._run(spark, [(1, 2, 0), (1, 0, 2)])
        assert got[1] == (2, self.M2, self.M2, -self.M2, "NW")

    def test_axis_aligned_ew_ns(self, spark):
        got = self._run(spark, [(1, 0, 0), (1, 0, 2),
                                (2, 0, 0), (2, 2, 0)])
        assert got[1] == (2, self.M2, 0, 0, "EW")
        assert got[2] == (2, 0, self.M2, 0, "NS")

    def test_single_point_circular(self, spark):
        got = self._run(spark, [(7, 45, 120)])
        assert got[7] == (1, 0, 0, 0, "CIRCULAR")

    def test_negative_cov_truncates_toward_zero(self, spark):
        """x=(0,1,5), y=(5,1,0) deg: Sxy = 3*1e12 - 36e12 = -33e12,
        n^2 = 9 -> cov = trunc(-33e12/9) = -3_666_666_666_666 (floor
        would be one lower) — pins Spark's decimal div semantics."""
        got = self._run(spark, [(1, 5, 0), (1, 1, 1), (1, 0, 5)])
        assert got[1][3] == -3_666_666_666_666

    def test_inline_oracle_parity(self, spark):
        import duckdb

        from geospark.operators.events import (sd_ellipse,
                                               sd_ellipse_sql)
        rows = []
        for i in range(300):
            u = i % 9
            lat = ((i * 31 + u * 7) % 1700) / 10.0 - 85.0
            lon = ((i * i * 17) % 3500) / 10.0 - 175.0
            rows.append((u, lat, lon))
        d = spark.createDataFrame(
            rows, "user_id long, lat double, lon double")
        got = sorted(tuple(r) for r in sd_ellipse(d).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE p (user_id BIGINT, lat DOUBLE, "
                    "lon DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(sd_ellipse_sql(
            "SELECT user_id, lat, lon FROM p")).fetchall())
        assert got == want and len(got) == 9
        # the scatter should produce at least one negative cov
        assert any(r[4] < 0 for r in got)

    def test_plan_single_groupby_no_python(self, spark):
        from geospark.operators.events import sd_ellipse
        d = spark.createDataFrame([(1, 1.0, 2.0)],
                                  "user_id long, lat double, "
                                  "lon double")
        plan = sd_ellipse(d)._jdf.queryExecution().executedPlan() \
            .toString()
        for bad in ("BatchEvalPython", "ArrowEvalPython", "Join",
                    "Window"):
            assert bad not in plan, plan


class TestCostDistance:
    RES = 4

    def _run(self, spark, cells, counts, rounds, minpts):
        from geospark.operators.cluster import cost_distance
        d = _lattice(spark, cells, self.RES, counts)
        return {r["cell"]: r["cost"] for r in
                cost_distance(d, self.RES, rounds,
                              min_seed_pts=minpts).collect()}

    def _mk(self, y, x):
        return (self.RES << 56) | (y << self.RES) | x

    def test_routes_around_congestion(self, spark):
        """Seed at (8,8) (the only count >= minpts 5); the direct
        middle cell costs 4, the diagonal detour cell costs 1 ->
        target reached at cost 2, not 5."""
        cells = [(8, 8), (8, 9), (9, 9), (7, 9), (8, 10)]
        counts = [5, 4, 1, 2, 1]
        got = self._run(spark, cells, counts, 4, 5)
        assert got[self._mk(8, 8)] == 0
        assert got[self._mk(9, 9)] == 1
        assert got[self._mk(7, 9)] == 2
        assert got[self._mk(8, 9)] == 4
        assert got[self._mk(8, 10)] == 2

    def test_round_budget_bounds_reach(self, spark):
        """A 3-hop-only target vanishes at rounds=2 and appears at
        rounds=3 with the exact chain cost."""
        cells = [(8, 8), (8, 9), (8, 10), (8, 11)]
        counts = [5, 2, 2, 2]
        near = self._run(spark, cells, counts, 2, 3)
        far = self._run(spark, cells, counts, 3, 3)
        assert self._mk(8, 11) not in near
        assert far[self._mk(8, 11)] == 6

    def test_early_exit_matches_excess_rounds(self, spark):
        """rounds far past convergence returns the identical map."""
        cells = [(8, 8), (8, 9), (9, 9), (7, 9), (8, 10)]
        counts = [5, 9, 1, 2, 1]
        assert (self._run(spark, cells, counts, 4, 3)
                == self._run(spark, cells, counts, 12, 3))

    def test_multi_seed_min(self, spark):
        """Two seeds, a shared middle cell takes the cheaper side."""
        cells = [(8, 8), (8, 9), (8, 10)]
        counts = [5, 2, 7]
        got = self._run(spark, cells, counts, 2, 5)
        assert got[self._mk(8, 8)] == 0 and got[self._mk(8, 10)] == 0
        assert got[self._mk(8, 9)] == 2

    def test_gap_blocks_path(self, spark):
        """Occupied cells separated by an empty ring are unreachable
        at any budget — paths never leave the raster."""
        cells = [(8, 8), (12, 12)]
        counts = [5, 1]
        got = self._run(spark, cells, counts, 6, 3)
        assert got == {self._mk(8, 8): 0}

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.cluster import (cost_distance,
                                                cost_distance_sql)
        rng = np.random.default_rng(86)
        rows = [(float(a), float(b)) for a, b in zip(
            rng.uniform(-60, 60, 600).round(1),
            rng.uniform(-170, 170, 600).round(1))]
        d = spark.createDataFrame(rows, "lat double, lon double")
        got = sorted(tuple(r) for r in
                     cost_distance(d, 4, 3, min_seed_pts=4).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE p (lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(cost_distance_sql(
            "SELECT lat, lon FROM p", 4, 3, 4)).fetchall())
        assert got == want and len(got) > 10


_HR = 3_600_000_000  # one hour in microseconds


class TestHourProfile:
    """Diurnal chi-square concentration per cell (r5.39)."""

    def _pts(self, spark, rows):
        """rows: [(lat, lon, us)]."""
        return spark.createDataFrame(
            rows, "lat double, lon double, us long")

    def _one(self, df):
        out = df.select("n_pts", "n_hours", "chi2_ppm",
                        "peak_hour").collect()
        assert len(out) == 1
        return tuple(out[0])

    def test_single_hour_spike(self, spark):
        """T events in one hour: sum c^2 = T^2, chi2_ppm =
        1e6*(24T^2 - T^2)/T = 23e6*T — the maximal-concentration
        closed form."""
        from geospark.operators.events import hour_profile
        p = self._pts(spark, [(-45.0, -90.0, 5 * _HR + i)
                              for i in range(4)])
        assert self._one(hour_profile(p, 1)) == (4, 1, 92_000_000, 5)

    def test_uniform_profile_scores_zero(self, spark):
        """One event in each of the 24 hours: chi2 0, peak-hour tie
        resolves to the lowest hour."""
        from geospark.operators.events import hour_profile
        p = self._pts(spark, [(-45.0, -90.0, h * _HR)
                              for h in range(24)])
        assert self._one(hour_profile(p, 1)) == (24, 24, 0, 0)

    def test_inexact_division_floors(self, spark):
        """counts (5,1,1): T=7, sum c^2=27, num = (648-49)e6 —
        599e6/7 floors to 85_571_428 in both engines (numerator
        nonnegative by Cauchy-Schwarz)."""
        from geospark.operators.events import hour_profile
        p = self._pts(spark, [(-45.0, -90.0, 2 * _HR + i)
                              for i in range(5)]
                      + [(-45.0, -90.0, 7 * _HR),
                         (-45.0, -90.0, 9 * _HR)])
        assert self._one(hour_profile(p, 1)) == (7, 3, 85_571_428, 2)

    def test_hour_wraps_across_days(self, spark):
        """us at 25h and 49h land in hour-1 alongside 1h — one
        bucket of 3, not three buckets."""
        from geospark.operators.events import hour_profile
        p = self._pts(spark, [(-45.0, -90.0, 1 * _HR),
                              (-45.0, -90.0, 25 * _HR),
                              (-45.0, -90.0, 49 * _HR)])
        assert self._one(hour_profile(p, 1)) == (3, 1, 69_000_000, 1)

    def test_peak_tiebreak_lowest_hour(self, spark):
        """counts (2@h7, 2@h3, 1@h5): tied peak -> hour 3."""
        from geospark.operators.events import hour_profile
        p = self._pts(spark, [(-45.0, -90.0, 7 * _HR),
                              (-45.0, -90.0, 7 * _HR + 1),
                              (-45.0, -90.0, 3 * _HR),
                              (-45.0, -90.0, 3 * _HR + 1),
                              (-45.0, -90.0, 5 * _HR)])
        got = self._one(hour_profile(p, 1))
        assert got[0] == 5 and got[1] == 3 and got[3] == 3

    def test_cells_profile_independently(self, spark):
        from geospark.operators.events import hour_profile
        p = self._pts(spark, [(-45.0, -90.0, 5 * _HR),
                              (-45.0, -90.0, 5 * _HR + 1),
                              (45.0, 90.0, 8 * _HR)])
        got = {r["cell"]: (r["n_pts"], r["peak_hour"])
               for r in hour_profile(p, 1).collect()}
        assert sorted(got.values()) == [(1, 8), (2, 5)]

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.events import (hour_profile,
                                               hour_profile_sql)
        rng = np.random.default_rng(87)
        rows = [(float(a), float(b), int(u)) for a, b, u in zip(
            rng.uniform(-60, 60, 800).round(1),
            rng.uniform(-170, 170, 800).round(1),
            rng.integers(0, 96 * _HR, 800))]
        d = spark.createDataFrame(rows, "lat double, lon double, us long")
        got = sorted(tuple(r) for r in hour_profile(d, 2).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE p (lat DOUBLE, lon DOUBLE, us BIGINT)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(hour_profile_sql(
            "SELECT lat, lon, us FROM p", 2)).fetchall())
        assert got == want and len(got) > 10


_DAY = 86_400_000_000  # one day in microseconds


class TestODGravity:
    """Gravity-model flow lift over the OD matrix (r5.39)."""

    # four quadrant anchors -> four distinct res-1 cells
    _Q = {"A": (-45.0, -90.0), "X": (-45.0, 90.0),
          "B": (45.0, -90.0), "Y": (45.0, 90.0)}

    def _trips(self, spark, flows):
        """flows: [(o_label, d_label, n)] -> a points frame where
        each trip is one (user, day) with a morning event at the
        origin and an evening event at the destination."""
        rows, uid = [], 0
        for o, d, n in flows:
            (olat, olon), (dlat, dlon) = self._Q[o], self._Q[d]
            for _ in range(n):
                uid += 1
                day0 = uid * _DAY
                rows.append((uid, 2 * uid, olat, olon, day0))
                rows.append((uid, 2 * uid + 1, dlat, dlon,
                             day0 + 3_600_000_000))
        return spark.createDataFrame(
            rows, "user_id long, event_id long, lat double, "
                  "lon double, us long")

    def _lifts(self, spark, flows):
        from geospark.operators.events import od_gravity
        out = od_gravity(self._trips(spark, flows), 1).collect()
        return sorted((r["n_trips"], r["o_out"], r["d_in"],
                       r["lift_ppm"]) for r in out)

    def test_single_corridor_unit_lift(self, spark):
        """One OD pair: n == O == D == T -> lift exactly 1e6."""
        assert self._lifts(spark, [("A", "X", 3)]) == [
            (3, 3, 3, 1_000_000)]

    def test_independence_null_all_unit(self, spark):
        """Flows exactly proportional to the marginals: every lift
        1e6 — A->X 2, A->Y 2, B->X 1, B->Y 1 (O_A=4, O_B=2,
        D_X=D_Y=3, T=6; E(A,X)=2 etc.)."""
        got = self._lifts(spark, [("A", "X", 2), ("A", "Y", 2),
                                  ("B", "X", 1), ("B", "Y", 1)])
        assert [g[3] for g in got] == [1_000_000] * 4

    def test_concentrated_corridors_lift_up(self, spark):
        """Disjoint corridors: A->X 2 (O=D=2, T=3 -> 1.5e6) and
        B->Y 1 (O=D=1 -> 3e6)."""
        assert self._lifts(spark, [("A", "X", 2), ("B", "Y", 1)]) \
            == [(1, 1, 1, 3_000_000), (2, 2, 2, 1_500_000)]

    def test_inexact_division_floors(self, spark):
        """A->X 2, A->Y 1, B->X 2, B->Y 2: lift(A,X) =
        1e6*2*7/(3*4) = 1_166_666.67 -> floors to 1_166_666."""
        got = self._lifts(spark, [("A", "X", 2), ("A", "Y", 1),
                                  ("B", "X", 2), ("B", "Y", 2)])
        assert (2, 3, 4, 1_166_666) in got

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.events import (od_gravity,
                                               od_gravity_sql)
        rng = np.random.default_rng(88)
        n = 900
        rows = [(int(u), int(e), float(a), float(b), int(t))
                for u, e, a, b, t in zip(
                    rng.integers(1, 60, n), range(n),
                    rng.uniform(-60, 60, n).round(1),
                    rng.uniform(-170, 170, n).round(1),
                    rng.integers(0, 20 * _DAY, n))]
        d = spark.createDataFrame(
            rows, "user_id long, event_id long, lat double, "
                  "lon double, us long")
        got = sorted(tuple(r) for r in od_gravity(d, 2).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE p (user_id BIGINT, event_id BIGINT,"
                    " lat DOUBLE, lon DOUBLE, us BIGINT)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(od_gravity_sql(
            "SELECT user_id, event_id, lat, lon, us FROM p",
            2)).fetchall())
        assert got == want and len(got) > 20


class TestTokenDrift:
    """Per-group token-distribution chi-square drift (r5.39)."""

    def _docs(self, spark, rows):
        """rows: [(host, text)]."""
        return spark.createDataFrame(rows, "host string, text string")

    def _run(self, spark, rows):
        from geospark.operators.textstats import token_drift
        out = token_drift(self._docs(spark, rows)).collect()
        return {r["host"]: (r["n_tokens"], r["n_terms"],
                            r["chi2_ppm"]) for r in out}

    def test_single_group_zero_drift(self, spark):
        """One host IS the corpus: chi2 exactly 0 whatever it says."""
        got = self._run(spark, [("h1", "the quick brown fox the")])
        assert got == {"h1": (5, 4, 0)}

    def test_identical_distributions_zero(self, spark):
        """Two hosts with the same term mix: both exactly 0."""
        got = self._run(spark, [("h1", "a a b"), ("h2", "a a b")])
        assert got == {"h1": (3, 2, 0), "h2": (3, 2, 0)}

    def test_disjoint_vocab_closed_form(self, spark):
        """g1='a a', g2='b b': each host's chi2 = (2-1)^2/1 +
        (0-1)^2/1 = 2 -> 2e6 ppm (the zero cell enters through the
        identity, never through a cross-product row)."""
        got = self._run(spark, [("h1", "a a"), ("h2", "b b")])
        assert got == {"h1": (2, 1, 2_000_000),
                       "h2": (2, 1, 2_000_000)}

    def test_per_term_flooring(self, spark):
        """g1='a b b', g2='a a a b' (c_a=4, c_b=3, T=7): floored
        per-term ppm gives chi2 694_444 / 520_833 — exercises the
        deterministic floor-then-sum convention."""
        got = self._run(spark, [("h1", "a b b"), ("h2", "a a a b")])
        assert got == {"h1": (3, 2, 694_444),
                       "h2": (4, 2, 520_833)}

    def test_tokenless_group_absent(self, spark):
        """A host whose text has no [a-z0-9] tokens emits no row."""
        got = self._run(spark, [("h1", "a a"), ("h2", "!!! ???")])
        assert set(got) == {"h1"}

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.textstats import (token_drift,
                                                  token_drift_sql)
        rng = np.random.default_rng(89)
        vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
        rows = []
        for i in range(300):
            h = f"h{int(rng.integers(0, 12))}"
            # skewed per-host vocab so drift is non-trivial
            p = rng.dirichlet(np.ones(len(vocab)) * (1 + i % 3))
            words = rng.choice(vocab, size=int(rng.integers(3, 30)),
                               p=p)
            rows.append((h, " ".join(words)))
        d = spark.createDataFrame(rows, "host string, text string")
        got = sorted(tuple(r) for r in token_drift(d).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE docs (host VARCHAR, text VARCHAR)")
        con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(token_drift_sql(
            "SELECT host, text FROM docs")).fetchall())
        assert got == want and len(got) == 12


class TestViewshedK:
    """Bounded viewshed over the count-as-elevation raster (r5.39)."""

    RES = 4

    def _mk(self, y, x, res=None):
        r = self.RES if res is None else res
        return (r << 56) | (y << r) | x

    def _run(self, spark, cells, heights, k, res=None):
        from geospark.operators.tiles import viewshed_k
        r = self.RES if res is None else res
        rows = [(self._mk(y, x, r), int(h))
                for (y, x), h in zip(cells, heights)]
        d = spark.createDataFrame(rows, "cell long, n_docs long")
        return {row["cell"]: row["n_visible"]
                for row in viewshed_k(d, r, k).collect()}

    def test_adjacent_always_visible(self, spark):
        """Two adjacent towers: no intermediates, both see each
        other regardless of heights."""
        got = self._run(spark, [(5, 5), (5, 6)], [3, 1], 2)
        assert got == {self._mk(5, 5): 1, self._mk(5, 6): 1}

    def test_high_intermediate_blocks(self, spark):
        """Heights 1,5,2 along +x: the 5 sees both ends, each end
        sees only the 5 (cross-multiplied strict test: (5-1)*2=8 >=
        (2-1)*1=1 blocks the far pair both ways)."""
        got = self._run(spark, [(5, 4), (5, 5), (5, 6)],
                        [1, 5, 2], 2)
        assert got == {self._mk(5, 4): 1, self._mk(5, 5): 2,
                       self._mk(5, 6): 1}

    def test_convex_staircase_all_visible(self, spark):
        """Doubling heights 1,2,4,8 along +x keep a convex-up
        skyline: the base of the staircase sees all three above."""
        got = self._run(spark, [(5, 4), (5, 5), (5, 6), (5, 7)],
                        [1, 2, 4, 8], 3)
        assert got[self._mk(5, 4)] == 3

    def test_plateau_grazing_blocks(self, spark):
        """Equal heights: the grazing angle equals the target angle
        -> blocked (strict inequality); everyone sees only their
        immediate neighbors."""
        got = self._run(spark, [(5, 4), (5, 5), (5, 6)],
                        [1, 1, 1], 2)
        assert got == {self._mk(5, 4): 1, self._mk(5, 5): 2,
                       self._mk(5, 6): 1}

    def test_unoccupied_gap_never_blocks(self, spark):
        """Diagonal pair at Chebyshev distance 2 with an empty cell
        between: visible (height-0 gaps cannot occlude)."""
        got = self._run(spark, [(5, 5), (7, 7)], [1, 1], 2)
        assert got == {self._mk(5, 5): 1, self._mk(7, 7): 1}

    def test_k_bounds_the_ray(self, spark):
        """Same pair at step 3 with k=2: out of range, invisible."""
        got = self._run(spark, [(5, 5), (5, 8)], [1, 1], 2)
        assert got == {self._mk(5, 5): 0, self._mk(5, 8): 0}

    def test_wrap_dedup_and_self_exclusion(self, spark):
        """res 2 (4x4, lon wraps): x=0 and x=3 meet at s=1 westward
        AND s=3 eastward — one DISTINCT visible cell each, and the
        s=4 wrap onto the origin itself is excluded."""
        got = self._run(spark, [(2, 0), (2, 3)], [1, 1], 4, res=2)
        assert got == {self._mk(2, 0, 2): 1, self._mk(2, 3, 2): 1}

    def test_lat_clamp_no_polar_wrap(self, spark):
        """A cell on the bottom row looking south finds nothing —
        rays clamp at the lat edge instead of wrapping."""
        got = self._run(spark, [(0, 5)], [7], 3)
        assert got == {self._mk(0, 5): 0}

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import (viewshed_k,
                                              viewshed_k_sql)
        rng = np.random.default_rng(90)
        n = 1 << 3
        occ = rng.random((n, n)) < 0.55
        rows = [(self._mk(y, x, 3), int(rng.integers(1, 9)))
                for y in range(n) for x in range(n) if occ[y, x]]
        d = spark.createDataFrame(rows, "cell long, n_docs long")
        got = sorted(tuple(r) for r in viewshed_k(d, 3, 4).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE t (cell BIGINT, n_docs BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(viewshed_k_sql(
            "SELECT cell, n_docs FROM t", 3, 4)).fetchall())
        assert got == want and len(got) > 20


class TestHuffShares:
    """Huff gravity market capture (r5.39)."""

    def _run(self, spark, pts, seeds):
        from geospark.operators.tiles import huff_shares
        p = spark.createDataFrame(pts, "lat double, lon double")
        s = spark.createDataFrame(
            seeds, "seed_id long, w long, lat double, lon double")
        return {r["seed_id"]: (r["w"], r["n_top"], r["share_ppm"])
                for r in huff_shares(p, s).collect()}

    def test_single_seed_takes_everything(self, spark):
        """One facility: every point's share is exactly 1e6."""
        got = self._run(spark, [(0.0, 0.0), (10.0, 10.0)],
                        [(7, 3, 5.0, 5.0)])
        assert got == {7: (3, 2, 2_000_000)}

    def test_equidistant_equal_weight_splits_half(self, spark):
        """A point dead-centre between equal twins: 500000 ppm each,
        top choice to the smaller seed id (tie rule)."""
        got = self._run(spark, [(0.0, 0.0)],
                        [(2, 1, 0.0, 1.0), (1, 1, 0.0, -1.0)])
        assert got[1] == (1, 1, 500_000)
        assert got[2] == (1, 0, 500_000)

    def test_weight_dominance_four_to_one(self, spark):
        """Equidistant seeds at w=4 vs w=1: ~800000 vs ~200000 ppm
        (exact up to the two floor steps), top to the heavy one."""
        got = self._run(spark, [(0.0, 0.0)],
                        [(1, 4, 0.0, 1.0), (2, 1, 0.0, -1.0)])
        (w1, t1, s1), (w2, t2, s2) = got[1], got[2]
        assert (w1, t1) == (4, 1) and (w2, t2) == (1, 0)
        assert abs(s1 - 800_000) <= 1 and abs(s2 - 200_000) <= 1
        assert s1 + s2 <= 1_000_000

    def test_far_mall_outdraws_near_kiosk(self, spark):
        """The Huff-vs-Voronoi separator: w=1 at d2=1e6 loses the
        top choice to w=5 at d2=4e6 (q = 1e12 vs 1.25e12) even
        though Voronoi would assign the point to the kiosk."""
        got = self._run(spark, [(0.0, 0.0)],
                        [(1, 1, 0.0, 0.001), (2, 5, 0.0, 0.002)])
        assert got[1][1] == 0 and got[2][1] == 1
        assert got[2][2] > got[1][2]

    def test_floored_shares_sum_within_budget(self, spark):
        """Across many points and seeds, sum(share_ppm) <= 1e6 *
        n_pts and n_top sums to n_pts exactly."""
        pts = [(float(a) / 7.0, float(b) / 11.0)
               for a in range(-3, 4) for b in range(-3, 4)]
        seeds = [(i, i % 3 + 1, i * 13.0 - 26.0, i * 31.0 - 62.0)
                 for i in range(5)]
        got = self._run(spark, pts, seeds)
        assert sum(v[1] for v in got.values()) == len(pts)
        assert 0 < sum(v[2] for v in got.values()) \
            <= 1_000_000 * len(pts)

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import (huff_shares,
                                              huff_shares_sql)
        rng = np.random.default_rng(91)
        pts = [(float(a), float(b)) for a, b in zip(
            rng.uniform(-60, 60, 700).round(2),
            rng.uniform(-170, 170, 700).round(2))]
        seeds = [(i, int(rng.integers(1, 6)),
                  round(float(rng.uniform(-60, 60)), 2),
                  round(float(rng.uniform(-170, 170)), 2))
                 for i in range(8)]
        p = spark.createDataFrame(pts, "lat double, lon double")
        s = spark.createDataFrame(
            seeds, "seed_id long, w long, lat double, lon double")
        got = sorted(tuple(r) for r in huff_shares(p, s).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE p (lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?)", pts)
        con.execute("CREATE TABLE s (seed_id BIGINT, w BIGINT, "
                    "lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO s VALUES (?, ?, ?, ?)", seeds)
        want = sorted(tuple(r) for r in con.execute(huff_shares_sql(
            "SELECT lat, lon FROM p",
            "SELECT seed_id, w, lat, lon FROM s")).fetchall())
        assert got == want and len(got) == 8


def _sorted_rows(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(r) for r in df.select(*cols).collect())


class TestStreamODTrips:
    """Stateful streaming OD trips, day-close emission (r5.39)."""

    C = 1 << 56  # res-1 cell base: quadrant cells C+0..C+3

    def _replay(self, spark, tmp_path, files, res=1):
        """files: list of row lists; each list becomes one microbatch
        file. Rows: (event_id, ts, user_id, lat, lon). Returns the
        aggregated (o_cell, d_cell, n_trips) rows."""
        from pyspark.sql import functions as F

        from geospark.functions.cells import cell_encode
        from geospark.streaming.stream import stream_od_trips
        schema = ("event_id long, ts timestamp_ntz, user_id long, "
                  "lat double, lon double")
        src = str(tmp_path / "od_src")
        mode = "overwrite"
        for rows in files:
            spark.createDataFrame(rows, schema).coalesce(1) \
                .write.mode(mode).parquet(src)
            mode = "append"
        sdf = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
        d = sdf.select("user_id", "event_id",
                       F.expr("timestampdiff(MICROSECOND, "
                              "TIMESTAMP_NTZ '2024-01-01 00:00:00', "
                              "ts)").alias("us"),
                       cell_encode("lat", "lon", res).alias("cell"))
        q = (stream_od_trips(d).writeStream.format("memory")
             .queryName("od_stream").outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        got = _sorted_rows(
            spark.sql("SELECT o_cell, d_cell, COUNT(*) AS n FROM "
                      "od_stream GROUP BY 1, 2"))
        spark.catalog.dropTempView("od_stream")
        return got

    def test_day_close_across_file_boundary(self, spark, tmp_path):
        """User 1's day-0 trip (A->B) closes only when the day-1
        event arrives in the SECOND file — the trip must come out of
        the state store; day 1 (C->C single event) closes at day 2;
        day 2 stays open and never emits. User 2 has one open day ->
        nothing."""
        import datetime as dt
        b = dt.datetime(2024, 1, 1)
        day = dt.timedelta(days=1)
        hr = dt.timedelta(hours=1)
        A, X, B2, Y = (-45.0, -90.0), (-45.0, 90.0), \
            (45.0, -90.0), (45.0, 90.0)
        f1 = [(0, b + hr, 1, *A), (1, b + 2 * hr, 1, *X),
              (2, b + hr, 2, *Y)]
        f2 = [(3, b + day + hr, 1, *B2),
              (4, b + 2 * day + hr, 1, *Y),
              (5, b + 2 * hr, 2, *Y)]
        got = self._replay(spark, tmp_path, [f1, f2])
        assert got == [(self.C + 0, self.C + 1, 1),   # A -> X
                       (self.C + 2, self.C + 2, 1)]   # B2 -> B2

    def test_tie_order_matches_batch_argminmax(self, spark, tmp_path):
        """Equal timestamps inside a day: first/last resolve by
        event_id, matching od_matrix's (us, tie) struct order."""
        import datetime as dt
        b = dt.datetime(2024, 1, 1)
        day = dt.timedelta(days=1)
        A, X = (-45.0, -90.0), (-45.0, 90.0)
        f1 = [(2, b, 1, *X), (1, b, 1, *A),  # tie: id 1 is first
              (3, b + day, 1, *A)]           # closes day 0
        got = self._replay(spark, tmp_path, [f1])
        assert got == [(self.C + 0, self.C + 1, 1)]   # A -> X

    def test_inline_oracle_parity(self, spark, tmp_path):
        """Random two-file replay equals the closed-day batch SQL."""
        import datetime as dt

        import duckdb
        import numpy as np

        from geospark.operators.events import od_matrix_closed_sql
        rng = np.random.default_rng(92)
        b = dt.datetime(2024, 1, 1)
        n = 600
        rows = sorted(
            ((int(e), b + dt.timedelta(
                microseconds=int(rng.integers(0, 6 * 86_400_000_000))),
              int(rng.integers(1, 40)),
              round(float(rng.uniform(-60, 60)), 2),
              round(float(rng.uniform(-170, 170)), 2))
             for e in range(n)), key=lambda r: (r[1], r[0]))
        cut = n // 2  # sorted by ts: per-user order holds per file
        got = self._replay(spark, tmp_path, [rows[:cut], rows[cut:]],
                           res=2)
        con = duckdb.connect()
        con.execute("CREATE TABLE e (event_id BIGINT, us BIGINT, "
                    "user_id BIGINT, lat DOUBLE, lon DOUBLE)")
        con.executemany(
            "INSERT INTO e VALUES (?, ?, ?, ?, ?)",
            [(e, int((t - b).total_seconds() * 1_000_000), u, la, lo)
             for e, t, u, la, lo in rows])
        want = sorted(tuple(r) for r in con.execute(
            od_matrix_closed_sql(
                "SELECT user_id, event_id, lat, lon, us FROM e",
                2)).fetchall())
        assert got == want and len(got) > 10


class TestRRFFuse:
    """Reciprocal-rank fusion top-k (r5.39)."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, n_chars long")

    def test_hand_scores_and_order(self, spark):
        """5 docs, longest-first + highest-id-first rankers, k=3:
        id4 (ranks 2,2 -> 32258) beats id2 (1,4 -> 32018) beats
        id5 (5,1 -> 31777) — consistent mid-ranks outscore one
        first place, the RRF signature."""
        from geospark.operators.textstats import rrf_fuse
        d = self._docs(spark, [(1, 100), (2, 300), (3, 200),
                               (4, 300), (5, 50)])
        got = [tuple(r) for r in
               rrf_fuse(d, ["-n_chars", "-doc_id"], 3).collect()]
        assert got == [(4, 2, 2, 32258), (2, 1, 4, 32018),
                       (5, 5, 1, 31777)]

    def test_fused_tie_breaks_by_id(self, spark):
        """Mirror-symmetric ranks (1,2) vs (2,1): equal scores,
        smaller id first."""
        from geospark.operators.textstats import rrf_fuse
        d = self._docs(spark, [(1, 300), (2, 100)])
        got = [tuple(r) for r in
               rrf_fuse(d, ["-n_chars", "-doc_id"], 2).collect()]
        assert got[0][0] == 1 and got[1][0] == 2
        assert got[0][3] == got[1][3]

    def test_completeness_guard_raises(self, spark):
        """m too small for the provable top-k bound -> assert."""
        import pytest

        from geospark.operators.textstats import rrf_fuse
        d = self._docs(spark, [(1, 1)])
        with pytest.raises(AssertionError):
            rrf_fuse(d, ["-n_chars", "-doc_id"], 10, m=10)

    def test_plan_has_no_global_window(self, spark):
        """The scale contract: no Window operator (no global
        row_number sort) and no Python in the plan."""
        from geospark.operators.textstats import rrf_fuse
        d = self._docs(spark, [(1, 10), (2, 20)])
        plan = rrf_fuse(d, ["-n_chars", "-doc_id"], 2) \
            ._jdf.queryExecution().executedPlan().toString()
        for bad in ("Window", "BatchEvalPython", "ArrowEvalPython"):
            assert bad not in plan, plan

    def test_inline_oracle_parity_past_candidate_cap(self, spark):
        """500 docs > m=256: the pruned-candidate Spark plan equals
        the full-window DuckDB ranking — the completeness proof
        exercised, not assumed."""
        import duckdb
        import numpy as np

        from geospark.operators.textstats import (rrf_fuse,
                                                  rrf_fuse_sql)
        rng = np.random.default_rng(93)
        rows = [(i, int(rng.integers(1, 400))) for i in range(500)]
        d = self._docs(spark, rows)
        exprs = ["-n_chars", "-(doc_id % 64)"]
        got = [tuple(r) for r in rrf_fuse(d, exprs, 10).collect()]
        con = duckdb.connect()
        con.execute("CREATE TABLE docs (doc_id BIGINT, n_chars BIGINT)")
        con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
        want = [tuple(r) for r in con.execute(rrf_fuse_sql(
            "SELECT doc_id, n_chars FROM docs", exprs, 10)).fetchall()]
        assert got == want and len(got) == 10


def _gi2_ppm_ref(cells, counts):
    """Independent exact re-derivation of the signed Gi* z^2 ppm
    (queen ring-1 INCLUDING self, interior fixtures only)."""
    n = len(cells)
    t = sum(counts)
    q = sum(c * c for c in counts)
    cnt = dict(zip(cells, counts))
    out = {}
    for ci in cells:
        nb = [cj for cj in cells
              if max(abs(ci[0] - cj[0]), abs(ci[1] - cj[1])) <= 1]
        w, s = len(nb), sum(cnt[cj] for cj in nb)
        den = (n * q - t * t) * w * (n - w)
        if den == 0:
            out[ci] = (w, s, None)
            continue
        nnum = n * s - w * t
        sign = (nnum > 0) - (nnum < 0)
        out[ci] = (w, s, sign * int(Fraction(
            10**6 * (n - 1) * nnum * nnum, den)))
    return out


class TestGiStar:
    """Getis-Ord Gi* signed z^2 ppm per cell (r5.39)."""

    RES = 4

    def _run(self, spark, cells, counts):
        from geospark.operators.tiles import gi_star
        d = _lattice(spark, cells, self.RES, counts)
        rows = gi_star(d, self.RES).collect()
        assert len(rows) == len(cells)
        got = {}
        for r in rows:
            got[r["cell"]] = (r["n_pts"], r["w_i"], r["s_i"],
                              r["gi2_ppm"])
        return got

    def _cells_of(self, spark, cells):
        from geospark.functions.cells import cell_encode_sql
        ids = {}
        for (y, x) in cells:
            lat, lon = _center(y, x, self.RES)
            cid = spark.sql(
                "SELECT " + cell_encode_sql(repr(lat), repr(lon),
                                            self.RES)).collect()[0][0]
            ids[(y, x)] = cid
        return ids

    def test_two_blocks_signs_and_exact_values(self, spark):
        """Hot 2x2 block far from a cold 2x2 block: hot cells
        strictly positive, cold strictly negative, every (w, s,
        gi2_ppm) equal to the Fraction re-derivation."""
        cells = [(5, 5), (5, 6), (6, 5), (6, 6),
                 (5, 9), (5, 10), (6, 9), (6, 10)]
        counts = [9, 9, 9, 9, 1, 1, 1, 1]
        want = _gi2_ppm_ref(cells, counts)
        got = self._run(spark, cells, counts)
        ids = self._cells_of(spark, cells)
        for (yx, c) in zip(cells, counts):
            w, s, ppm = want[yx]
            assert got[ids[yx]] == (c, w, s, ppm)
        assert all(want[yx][2] > 0 for yx in cells[:4])
        assert all(want[yx][2] < 0 for yx in cells[4:])

    def test_neighborhood_swallows_all_null(self, spark):
        """Two adjacent cells: W_i = N for both -> zero variance of
        the neighborhood sum -> NULL (the star-variant guard)."""
        got = self._run(spark, [(5, 5), (5, 6)], [3, 1])
        assert [v[3] for v in got.values()] == [None, None]

    def test_constant_surface_null(self, spark):
        """Equal counts everywhere: N*Q = T^2 -> NULL even where
        W_i < N."""
        got = self._run(spark, [(5, 5), (5, 6), (9, 9)], [4, 4, 4])
        assert [v[3] for v in got.values()] == [None, None, None]

    def test_isolated_cells_exact(self, spark):
        """Singleton neighborhoods (W_i = 1): Gi* reduces to the
        cell's own standardized count; exact vs the re-derivation."""
        cells = [(2, 2), (8, 8), (12, 4)]
        counts = [1, 5, 9]
        want = _gi2_ppm_ref(cells, counts)
        got = self._run(spark, cells, counts)
        ids = self._cells_of(spark, cells)
        for yx, c in zip(cells, counts):
            w, s, ppm = want[yx]
            assert got[ids[yx]] == (c, w, s, ppm)

    def test_matches_float_zscore(self, spark):
        """|gi2_ppm| == trunc(1e6 * z^2) of the textbook float Gi*
        z-score (binary weights incl self), sign == sign(z) — the
        algebraic identity exercised end to end."""
        import numpy as np
        cells = [(5, 5), (5, 6), (6, 5), (7, 7), (7, 8), (9, 9),
                 (3, 3), (3, 4)]
        counts = [12, 7, 3, 1, 2, 30, 4, 4]
        got = self._run(spark, cells, counts)
        ids = self._cells_of(spark, cells)
        x = np.array(counts, dtype=float)
        n, xbar, s = len(x), x.mean(), x.std()
        for i, ci in enumerate(cells):
            nb = [j for j, cj in enumerate(cells)
                  if max(abs(ci[0] - cj[0]), abs(ci[1] - cj[1])) <= 1]
            w = float(len(nb))
            z = ((x[nb].sum() - xbar * w)
                 / (s * np.sqrt(w * (n - w) / (n - 1))))
            ppm = got[ids[ci]][3]
            assert ppm is not None
            assert (ppm > 0) == (z > 0) or z == 0
            assert abs(abs(ppm) - int(1e6 * z * z)) <= 1

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import gi_star, gi_star_sql
        rng = np.random.default_rng(85)
        rows = [(float(a), float(b)) for a, b in zip(
            rng.uniform(-80, 80, 800).round(1),
            rng.uniform(-170, 170, 800).round(1))]
        d = spark.createDataFrame(rows, "lat double, lon double")
        got = sorted(tuple(r) for r in gi_star(d, 3).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE p (lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(
            gi_star_sql("SELECT lat, lon FROM p", 3)).fetchall())
        assert got == want and len(got) > 50


class TestLQCells:
    """Location quotient per (cell, category) (r5.39)."""

    RES = 4

    def _run(self, spark, placed):
        """placed: list of ((y, x), ftype, count)."""
        from geospark.operators.tiles import lq_cells
        rows = []
        for (y, x), t, c in placed:
            lat, lon = _center(y, x, self.RES)
            rows += [(lat, lon, t)] * c
        d = spark.createDataFrame(
            rows, "lat double, lon double, ftype string")
        out = {}
        for r in lq_cells(d, self.RES).collect():
            out[(r["cell"], r["ftype"])] = (r["n_events"],
                                            r["cell_total"],
                                            r["lq_ppm"])
        return out

    def test_hand_values_symmetric(self, spark):
        """3/1 vs 1/3 across two cells: LQ 1.5 and 0.5 exactly."""
        got = self._run(spark, [((5, 5), "x", 3), ((5, 5), "y", 1),
                                ((9, 9), "x", 1), ((9, 9), "y", 3)])
        ppms = sorted(v[2] for v in got.values())
        assert ppms == [500_000, 500_000, 1_500_000, 1_500_000]
        assert all(v[1] == 4 for v in got.values())

    def test_uniform_is_exactly_one(self, spark):
        """Same mix everywhere -> every LQ exactly 1e6 ppm."""
        placed = [((y, x), t, c) for (y, x) in [(5, 5), (7, 7), (9, 2)]
                  for t, c in (("a", 2), ("b", 4), ("c", 6))]
        got = self._run(spark, placed)
        assert len(got) == 9
        assert all(v[2] == 1_000_000 for v in got.values())

    def test_exclusive_type_concentration(self, spark):
        """Each type lives in exactly one cell: LQ = N / N_k,
        truncated ppm."""
        got = self._run(spark, [((5, 5), "only_a", 2),
                                ((9, 9), "only_b", 6)])
        vals = {k[1]: v for k, v in got.items()}
        assert vals["only_a"][2] == 4_000_000   # (2/2)/(2/8)
        assert vals["only_b"][2] == 1_333_333   # (6/6)/(6/8) trunc

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import lq_cells, lq_cells_sql
        rng = np.random.default_rng(86)
        rows = [(float(a), float(b), f"t{int(k)}") for a, b, k in zip(
            rng.uniform(-80, 80, 900).round(1),
            rng.uniform(-170, 170, 900).round(1),
            rng.integers(0, 5, 900))]
        d = spark.createDataFrame(rows,
                                  "lat double, lon double, ftype string")
        got = sorted(tuple(r) for r in lq_cells(d, 3).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE p (lat DOUBLE, lon DOUBLE, "
                    "ftype VARCHAR)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(lq_cells_sql(
            "SELECT lat, lon, ftype FROM p", 3)).fetchall())
        assert got == want and len(got) > 100


class TestScoreAuc:
    """Mann-Whitney ROC-AUC with exact doubled-unit tie handling
    (operators/textstats.score_auc)."""

    def _run(self, spark, rows):
        d = spark.createDataFrame(
            rows, "source string, score long, label int")
        from geospark.operators.textstats import score_auc
        return {r["source"]: (r["n_pos"], r["n_neg"], r["auc_ppm"])
                for r in score_auc(d, "score", "label").collect()}

    def test_perfect_separation(self, spark):
        """All positives strictly above all negatives -> 1e6."""
        got = self._run(spark, [("a", 10, 1), ("a", 11, 1),
                                ("a", 1, 0), ("a", 2, 0)])
        assert got == {"a": (2, 2, 1_000_000)}

    def test_perfect_inversion_zero(self, spark):
        """All positives strictly below all negatives -> 0."""
        got = self._run(spark, [("a", 1, 1), ("a", 2, 1),
                                ("a", 10, 0), ("a", 11, 0)])
        assert got == {"a": (2, 2, 0)}

    def test_all_tied_is_half(self, spark):
        """Every row shares one score: pure ties -> exactly
        500_000 regardless of class balance."""
        got = self._run(spark, [("a", 7, 1), ("a", 7, 1),
                                ("a", 7, 0), ("a", 7, 0), ("a", 7, 0)])
        assert got == {"a": (2, 3, 500_000)}

    def test_hand_mixed_ties(self, spark):
        """scores pos={1,2,2}, neg={2,3}: u2 = sum over values of
        p*(2*nb+ng): v=1: 1*(0+0)=0; v=2: 2*(0+1)=2; v=3: 0.
        auc = 2 / (2*3*2) = 1/6 -> 166_666 ppm truncated."""
        got = self._run(spark, [("a", 1, 1), ("a", 2, 1), ("a", 2, 1),
                                ("a", 2, 0), ("a", 3, 0)])
        assert got == {"a": (3, 2, 166_666)}

    def test_single_class_null(self, spark):
        """A group with no negatives (or no positives) has no
        ranking question to answer -> NULL, not a crash."""
        got = self._run(spark, [("p", 5, 1), ("p", 6, 1),
                                ("n", 5, 0)])
        assert got == {"p": (2, 0, None), "n": (0, 1, None)}

    def test_groups_independent(self, spark):
        """Two groups with opposite orderings score 1e6 and 0 —
        no cross-group leakage through the shared score values."""
        got = self._run(spark, [("up", 9, 1), ("up", 1, 0),
                                ("dn", 1, 1), ("dn", 9, 0)])
        assert got["up"] == (1, 1, 1_000_000)
        assert got["dn"] == (1, 1, 0)

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.textstats import score_auc, score_auc_sql
        rng = np.random.default_rng(87)
        rows = [(f"s{int(g)}", int(s), int(l)) for g, s, l in zip(
            rng.integers(0, 4, 1200),
            rng.integers(0, 40, 1200),      # heavy ties on purpose
            rng.integers(0, 2, 1200))]
        d = spark.createDataFrame(
            rows, "source string, score long, label int")
        got = sorted(tuple(r) for r in
                     score_auc(d, "score", "label").collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE t (source VARCHAR, score BIGINT, "
                    "label INT)")
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(score_auc_sql(
            "SELECT source, score, label FROM t")).fetchall())
        assert got == want and len(got) == 4
        # sanity: random labels vs random scores hovers near 1/2
        assert all(300_000 < r[3] < 700_000 for r in got)


class TestKSStat:
    """Two-sample KS drift on the union value grid
    (operators/textstats.ks_stat)."""

    def _run(self, spark, rows):
        d = spark.createDataFrame(rows, "source string, v long")
        from geospark.operators.textstats import ks_stat
        return {r["source"]: (r["n"], r["n_rest"], r["ks_ppm"])
                for r in ks_stat(d, "v").collect()}

    def test_disjoint_supports_full(self, spark):
        """No overlap between a group and the rest -> 1e6 both
        ways."""
        got = self._run(spark, [("a", 5), ("b", 1), ("b", 1),
                                ("b", 1)])
        assert got == {"a": (1, 3, 1_000_000),
                       "b": (3, 1, 1_000_000)}

    def test_hand_symmetric_half(self, spark):
        """a={1,2} vs b={2,3}: sup |2*C_a - 2*C_b| = 2 at v=1
        -> 500_000 for both groups by symmetry."""
        got = self._run(spark, [("a", 1), ("a", 2), ("b", 2),
                                ("b", 3)])
        assert got == {"a": (2, 2, 500_000), "b": (2, 2, 500_000)}

    def test_max_at_rest_only_jump(self, spark):
        """a={0,10,10,10}, b={5,5}: the sup for group a sits at
        v=5 — a value group a NEVER takes (d=6 there vs 2 and 0 at
        its own jumps): |2*1 - 4*2| = 6 -> 750_000. Evaluating only
        at the group's own values would return 250_000 — the union
        grid is load-bearing."""
        got = self._run(spark, [("a", 0), ("a", 10), ("a", 10),
                                ("a", 10), ("b", 5), ("b", 5)])
        assert got["a"] == (4, 2, 750_000)

    def test_identical_scaled_distributions_zero(self, spark):
        """b is a doubled copy of a's distribution: every
        cross-multiplied CDF difference cancels -> 0."""
        rows = [("a", v) for v in (1, 2, 3)]
        rows += [("b", v) for v in (1, 1, 2, 2, 3, 3)]
        got = self._run(spark, rows)
        assert got == {"a": (3, 6, 0), "b": (6, 3, 0)}

    def test_single_group_null(self, spark):
        """One group owns the whole corpus: n_rest = 0 -> NULL."""
        got = self._run(spark, [("a", 1), ("a", 2)])
        assert got == {"a": (2, 0, None)}

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.textstats import ks_stat, ks_stat_sql
        rng = np.random.default_rng(88)
        rows = [(f"s{int(g)}", int(v)) for g, v in zip(
            rng.integers(0, 5, 1500),
            rng.integers(0, 60, 1500) ** 2 // 7)]   # lumpy values
        d = spark.createDataFrame(rows, "source string, v long")
        got = sorted(tuple(r) for r in ks_stat(d, "v").collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE t (source VARCHAR, v BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(ks_stat_sql(
            "SELECT source, v FROM t")).fetchall())
        assert got == want and len(got) == 5
        # random groups from one distribution: small but nonzero D
        assert all(0 < r[3] < 200_000 for r in got)


class TestKendallTau:
    """Exact tau-a over contingency cells
    (operators/textstats.kendall_tau)."""

    def _run(self, spark, rows):
        d = spark.createDataFrame(rows, "source string, x long, y long")
        from geospark.operators.textstats import kendall_tau
        return {r["source"]: (r["n"], r["conc"], r["disc"],
                              r["tau_ppm"])
                for r in kendall_tau(d, "x", "y").collect()}

    def test_perfect_concordance(self, spark):
        got = self._run(spark, [("a", 1, 1), ("a", 2, 2),
                                ("a", 3, 3)])
        assert got == {"a": (3, 3, 0, 1_000_000)}

    def test_perfect_discordance(self, spark):
        got = self._run(spark, [("a", 1, 3), ("a", 2, 2),
                                ("a", 3, 1)])
        assert got == {"a": (3, 0, 3, -1_000_000)}

    def test_ties_dilute_not_crash(self, spark):
        """x-tied and y-tied pairs contribute 0 to the numerator
        but stay in the n(n-1)/2 denominator (tau-a)."""
        got = self._run(spark, [("xt", 1, 1), ("xt", 1, 2),
                                ("xt", 2, 3),
                                ("yt", 1, 5), ("yt", 2, 5),
                                ("yt", 3, 6)])
        assert got["xt"] == (3, 2, 0, 666_666)
        assert got["yt"] == (3, 2, 0, 666_666)

    def test_negative_truncates_toward_zero(self, spark):
        """C=1, D=2, denom 3: tau = -(1e6*1 div 3) = -333_333 —
        floor division would give -333_334; this pins the
        sign-decomposed trunc convention in both engines."""
        got = self._run(spark, [("a", 1, 3), ("a", 2, 4),
                                ("a", 3, 1)])
        assert got == {"a": (3, 1, 2, -333_333)}

    def test_cell_multiplicities(self, spark):
        """(1,1)x2 and (2,2)x3: C = 2*3 = 6 pairs from one cell
        pair, denom = 10 -> 600_000."""
        rows = [("a", 1, 1)] * 2 + [("a", 2, 2)] * 3
        got = self._run(spark, rows)
        assert got == {"a": (5, 6, 0, 600_000)}

    def test_single_row_null(self, spark):
        got = self._run(spark, [("a", 1, 1)])
        assert got == {"a": (1, 0, 0, None)}

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.textstats import (kendall_tau,
                                                  kendall_tau_sql)
        rng = np.random.default_rng(89)
        xs = rng.integers(0, 25, 1200)
        rows = [(f"s{int(g)}", int(x), int(x // 3 + e))
                for g, x, e in zip(rng.integers(0, 4, 1200), xs,
                                   rng.integers(-2, 3, 1200))]
        d = spark.createDataFrame(rows, "source string, x long, y long")
        got = sorted(tuple(r) for r in
                     kendall_tau(d, "x", "y").collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE t (source VARCHAR, x BIGINT, "
                    "y BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(kendall_tau_sql(
            "SELECT source, x, y FROM t")).fetchall())
        assert got == want and len(got) == 4
        # y tracks x with noise: strong positive concordance
        assert all(r[4] > 400_000 for r in got)
