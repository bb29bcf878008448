"""Round-5 session-6 operator tests: Moran's I spatial
autocorrelation, per-cell Mann-Kendall trend, heading-octant
histogram."""

from __future__ import annotations

from fractions import Fraction


def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _center(y, x, res):
    n = 1 << res
    return (-90.0 + (y + 0.5) * 180.0 / n,
            -180.0 + (x + 0.5) * 360.0 / n)


def _pts(spark, cells, res, counts):
    rows = []
    for (y, x), c in zip(cells, counts):
        lat, lon = _center(y, x, res)
        rows += [(lat, lon)] * c
    return spark.createDataFrame(rows, "lat double, lon double")


def _moran_ppm_ref(cells, counts):
    """Independent exact re-derivation of Moran's I (queen ring-1,
    interior cells only — callers keep fixtures off the grid edges so
    wrap/clamp never fires), truncated toward zero at ppm."""
    n = len(cells)
    t = sum(counts)
    dev = {c: n * x - t for c, x in zip(cells, counts)}
    s = w = 0
    for (yi, xi) in cells:
        for (yj, xj) in cells:
            if (yi, xi) == (yj, xj):
                continue
            if max(abs(yi - yj), abs(xi - xj)) == 1:
                w += 1
                s += dev[(yi, xi)] * dev[(yj, xj)]
    m2 = sum(d * d for d in dev.values())
    if w == 0 or m2 == 0:
        return None, w
    q = Fraction(1_000_000 * n * s, w * m2)
    ppm = int(q) if q >= 0 else -int(-q)
    return ppm, w


class TestMoranI:
    RES = 4

    def _run(self, spark, cells, counts):
        from geospark.operators.tiles import moran_i
        d = _pts(spark, cells, self.RES, counts)
        row = moran_i(d, self.RES).collect()[0]
        return row["n_cells"], row["w_pairs"], row["moran_ppm"]

    def test_clustered_positive(self, spark):
        """A hot 2x2 block beside a cold 2x2 block: like borders like,
        I > 0; value matches the exact Fraction re-derivation."""
        cells = [(5, 5), (5, 6), (6, 5), (6, 6),
                 (5, 8), (5, 9), (6, 8), (6, 9)]
        counts = [9, 9, 9, 9, 1, 1, 1, 1]
        want, w = _moran_ppm_ref(cells, counts)
        nc, wp, ppm = self._run(spark, cells, counts)
        assert (nc, wp) == (8, w) and ppm == want and ppm > 0

    def test_checkerboard_negative(self, spark):
        """Alternating high/low on a 3x3 block: every neighbor differs
        -> I < 0, exact value from the re-derivation."""
        cells = [(y, x) for y in (5, 6, 7) for x in (5, 6, 7)]
        counts = [9 if (y + x) % 2 == 0 else 1
                  for (y, x) in cells]
        want, w = _moran_ppm_ref(cells, counts)
        nc, wp, ppm = self._run(spark, cells, counts)
        assert (nc, wp) == (9, w) and ppm == want and ppm < 0

    def test_constant_surface_null(self, spark):
        """Equal counts everywhere: M2 = 0, no autocorrelation to
        measure -> NULL (not 0, which would claim 'random')."""
        cells = [(5, 5), (5, 6), (6, 5)]
        nc, wp, ppm = self._run(spark, cells, [4, 4, 4])
        assert nc == 3 and wp > 0 and ppm is None

    def test_isolated_cells_null(self, spark):
        """No two occupied cells adjacent: W = 0 -> NULL."""
        cells = [(2, 2), (8, 8), (12, 4)]
        nc, wp, ppm = self._run(spark, cells, [1, 5, 9])
        assert nc == 3 and wp == 0 and ppm is None

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import moran_i, moran_i_sql
        rng = np.random.default_rng(83)
        rows = [(float(a), float(b)) for a, b in zip(
            rng.uniform(-80, 80, 800).round(1),
            rng.uniform(-170, 170, 800).round(1))]
        d = spark.createDataFrame(rows, "lat double, lon double")
        got = _rows(moran_i(d, 3))
        con = duckdb.connect()
        con.execute("CREATE TABLE p (lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(
            moran_i_sql("SELECT lat, lon FROM p", 3)).fetchall())
        assert got == want and got[0][2] is not None


_DAY = 86_400_000_000


def _day_pts(spark, series):
    """series: {(y, x): [count_day0, count_day1, ...]} at res 4."""
    rows = []
    for (y, x), counts in series.items():
        lat, lon = _center(y, x, 4)
        for day, c in enumerate(counts):
            rows += [(lat, lon, day * _DAY + 1)] * c
    return spark.createDataFrame(rows,
                                 "lat double, lon double, us long")


class TestCellMK:
    def _run(self, spark, series):
        from geospark.operators.tiles import cell_mk
        out = cell_mk(_day_pts(spark, series), 4)
        return {r["cell"]: (r["n_total"], r["s_mk"], r["tau_ppm"])
                for r in out.collect()}

    def test_monotonic_and_flat(self, spark):
        """Strictly increasing daily counts -> S = P, tau = 1e6;
        a cell active on first and last day only (dense zeros
        between) nets S = 0."""
        got = self._run(spark, {(5, 5): [1, 2, 3, 4],
                                (8, 8): [1, 0, 0, 1]})
        assert got[(4 << 56) | (5 << 4) | 5] == (10, 6, 1_000_000)
        # [1,0,0,1]: pairs 1>0 twice (-), 0<1 twice (+), ties 0
        assert got[(4 << 56) | (8 << 4) | 8] == (2, 0, 0)

    def test_negative_truncates_toward_zero(self, spark):
        """S = -1 over P = 6 pairs: trunc(-1e6/6) = -166666 — a
        floored division would give -166667."""
        # [2, 1, 1, 2]: pairs (2,1)-, (2,1)-, (2,2)0, (1,1)0,
        # (1,2)+, (1,2)+ -> S = 0... use [1, 0, 1, 1]:
        # (1,0)-, (1,1)0, (1,1)0, (0,1)+, (0,1)+, (1,1)0 -> S = +1;
        # mirror to [0, 1, 0, 0] for S = -1.
        got = self._run(spark, {(5, 5): [0, 1, 0, 0],
                                (8, 8): [1, 1, 1, 1]})
        # the (5,5) cell has a zero day-0 count: only days 1..3 emit
        # points, but the DENSE span still covers day 0 via (8,8)
        assert got[(4 << 56) | (5 << 4) | 5] == (1, -1, -166666)
        assert got[(4 << 56) | (8 << 4) | 8] == (4, 0, 0)

    def test_single_day_span_empty(self, spark):
        from geospark.operators.tiles import cell_mk
        d = spark.createDataFrame([(10.0, 10.0, 5 * _DAY)],
                                  "lat double, lon double, us long")
        assert cell_mk(d, 4).count() == 0

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import cell_mk, cell_mk_sql
        rng = np.random.default_rng(89)
        rows = [(float(a), float(b), int(d) * _DAY + int(o))
                for a, b, d, o in zip(
                    rng.uniform(-80, 80, 900).round(1),
                    rng.uniform(-170, 170, 900).round(1),
                    rng.integers(0, 9, 900),
                    rng.integers(0, 1000, 900))]
        d = spark.createDataFrame(rows,
                                  "lat double, lon double, us long")
        got = _rows(cell_mk(d, 3))
        con = duckdb.connect()
        con.execute("CREATE TABLE p (lat DOUBLE, lon DOUBLE, "
                    "us BIGINT)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(cell_mk_sql(
            "SELECT lat, lon, us FROM p", 3)).fetchall())
        assert got == want and len(got) > 10


class TestBearingHist:
    def _run(self, spark, hops):
        """hops: list of (lat, lon) per-event positions for one
        user, 1 second apart."""
        from geospark.operators.events import bearing_hist
        rows = [("u", i * 1_000_000, i, lat, lon)
                for i, (lat, lon) in enumerate(hops)]
        d = spark.createDataFrame(
            rows, "user_id string, us long, event_id long, "
                  "lat double, lon double")
        return {r["octant"]: (r["n_hops"], r["mean_d2"])
                for r in bearing_hist(d).collect()}

    def test_sector_boundaries_and_stationary(self, spark):
        """Due east (a sector LOWER boundary) lands in ENE, the exact
        NE diagonal closes NNE's lower edge, interiors go where the
        angle says, and a zero hop is dropped."""
        got = self._run(spark, [
            (0.0, 0.0), (0.0, 2.0),    # dy=0, dx=2e6: theta 0 -> ENE
            (0.0, 2.0), (0.0, 2.0),    # stationary — dropped
            (1.0, 3.0),                # dy = dx = 1e6: theta 45 -> NNE
            (3.0, 3.5),                # dy 2e6 > dx .5e6: ~76deg -> NNE
            (2.0, 1.0),                # dy -1e6, dx -2.5e6: ~202 -> WSW
            (1.0, 0.0),                # dy = dx = -1e6: theta 225 -> SSW
            (2.0, 0.0),                # dy 1e6, dx 0: theta 90 -> NNW
            (0.0, 0.0),                # dy -2e6, dx 0: theta 270 -> SSE
        ])
        assert got["ENE"] == (1, 4_000_000_000_000)
        # NNE holds d2 = 2e12 and 4.25e12 -> truncated mean 3.125e12
        assert got["NNE"] == (2, 3_125_000_000_000)
        assert got["WSW"][0] == 1
        assert got["SSW"] == (1, 2_000_000_000_000)
        assert got["NNW"] == (1, 1_000_000_000_000)
        assert got["SSE"] == (1, 4_000_000_000_000)
        assert set(got) == {"ENE", "NNE", "WSW", "SSW", "NNW", "SSE"}

    def test_all_eight_sectors_partition_the_circle(self, spark):
        """16 hops at 22.5-degree spacing: exactly 2 per sector —
        the sectors are equal and exhaustive."""
        import math
        hops = [(0.0, 0.0)]
        pos = (0.0, 0.0)
        for k in range(16):
            th = math.radians(22.5 * k + 10.0)
            pos = (pos[0] + 2.0 * math.sin(th),
                   pos[1] + 2.0 * math.cos(th))
            hops.append(pos)
        got = self._run(spark, hops)
        assert sorted(got) == ["ENE", "ESE", "NNE", "NNW",
                               "SSE", "SSW", "WNW", "WSW"]
        assert all(v[0] == 2 for v in got.values())

    def test_users_independent(self, spark):
        """The lag window is per-user: the 'hop' between two users'
        rows never appears."""
        from geospark.operators.events import bearing_hist
        rows = [("a", 0, 0, 0.0, 0.0), ("a", 1, 1, 0.0, 1.0),
                ("b", 2, 2, 50.0, 50.0), ("b", 3, 3, 51.0, 50.0)]
        d = spark.createDataFrame(
            rows, "user_id string, us long, event_id long, "
                  "lat double, lon double")
        got = {r["octant"]: r["n_hops"]
               for r in bearing_hist(d).collect()}
        assert got == {"ENE": 1, "NNW": 1}

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.events import (bearing_hist,
                                               bearing_hist_sql)
        rng = np.random.default_rng(97)
        rows = [(f"u{int(u)}", int(t), int(i), float(a), float(b))
                for i, (u, t, a, b) in enumerate(zip(
                    rng.integers(0, 40, 1200),
                    rng.integers(0, 10**9, 1200),
                    rng.uniform(-80, 80, 1200).round(2),
                    rng.uniform(-170, 170, 1200).round(2)))]
        d = spark.createDataFrame(
            rows, "user_id string, us long, event_id long, "
                  "lat double, lon double")
        got = _rows(bearing_hist(d))
        con = duckdb.connect()
        con.execute("CREATE TABLE src (user_id VARCHAR, us BIGINT, "
                    "event_id BIGINT, lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO src VALUES (?, ?, ?, ?, ?)",
                        rows)
        want = sorted(tuple(r) for r in con.execute(bearing_hist_sql(
            "SELECT user_id, us, event_id, lat, lon FROM src"))
            .fetchall())
        assert got == want and 5 <= len(got) <= 8


def _lisa_ref(cells, counts):
    """Independent exact LISA re-derivation (interior cells only)."""
    n = len(cells)
    t = sum(counts)
    dev = {c: n * x - t for c, x in zip(cells, counts)}
    m2 = sum(d * d for d in dev.values())
    out = {}
    for (yi, xi) in cells:
        lag = sum(dev[(yj, xj)] for (yj, xj) in cells
                  if (yj, xj) != (yi, xi)
                  and max(abs(yi - yj), abs(xi - xj)) == 1)
        has_nb = any((yj, xj) != (yi, xi)
                     and max(abs(yi - yj), abs(xi - xj)) == 1
                     for (yj, xj) in cells)
        if not has_nb:
            continue
        di = dev[(yi, xi)]
        if di == 0 or lag == 0:
            quad = None
        elif di > 0 and lag > 0:
            quad = "HH"
        elif di < 0 and lag < 0:
            quad = "LL"
        elif di > 0:
            quad = "HL"
        else:
            quad = "LH"
        if m2 == 0:
            ppm = None
        else:
            q = Fraction(1_000_000 * n * di * lag, m2)
            ppm = int(q) if q >= 0 else -int(-q)
        out[(yi, xi)] = (quad, ppm)
    return out


class TestLisaCells:
    RES = 4

    def _run(self, spark, cells, counts):
        from geospark.operators.tiles import lisa_cells
        d = _pts(spark, cells, self.RES, counts)
        return {r["cell"]: (r["quadrant"], r["lisa_ppm"])
                for r in lisa_cells(d, self.RES).collect()}

    def test_blocks_label_hh_ll_and_match_ref(self, spark):
        """Hot block cells sit in hot neighborhoods (HH), cold block
        cells in cold ones (LL); exact ppm values match the Fraction
        re-derivation cell by cell."""
        cells = [(5, 5), (5, 6), (6, 5), (6, 6),
                 (5, 8), (5, 9), (6, 8), (6, 9)]
        counts = [9, 9, 9, 9, 1, 1, 1, 1]
        want = {(y, x): v for (y, x), v in
                _lisa_ref(cells, counts).items()}
        got = self._run(spark, cells, counts)
        assert len(got) == 8
        for (y, x), v in want.items():
            assert got[(4 << 56) | (y << 4) | x] == v
        quads = [v[0] for v in got.values()]
        assert quads.count("HH") == 4 and quads.count("LL") == 4

    def test_spatial_outlier_hl_lh(self, spark):
        """A lone hot cell in a cold field is an HL outlier; its
        immediate neighbors flag LH (cold next to hot)."""
        cells = [(y, x) for y in (5, 6, 7) for x in (5, 6, 7)]
        counts = [17 if (y, x) == (6, 6) else 1 for (y, x) in cells]
        want = _lisa_ref(cells, counts)
        got = self._run(spark, cells, counts)
        assert got[(4 << 56) | (6 << 4) | 6][0] == "HL"
        assert want[(6, 6)][0] == "HL"
        for (y, x), v in want.items():
            assert got[(4 << 56) | (y << 4) | x] == v

    def test_isolated_cell_dropped(self, spark):
        """A cell with no occupied neighbor has no spatial lag."""
        cells = [(5, 5), (5, 6), (12, 12)]
        got = self._run(spark, cells, [3, 1, 8])
        assert (4 << 56) | (12 << 4) | 12 not in got
        assert len(got) == 2

    def test_sum_identity_with_global(self, spark):
        """sum_i I_i == W * I_global exactly in rationals; with
        per-cell truncation the BIGINT sums agree within n_cells."""
        from geospark.operators.tiles import moran_i
        cells = [(y, x) for y in (4, 5, 6) for x in (4, 5, 6, 7)]
        counts = [((y * 7 + x * 3) % 5) + 1 for (y, x) in cells]
        d = _pts(spark, cells, self.RES, counts)
        g = moran_i(d, self.RES).collect()[0]
        lisa_sum = sum(v[1] for v in
                       self._run(spark, cells, counts).values())
        assert abs(lisa_sum - g["w_pairs"] * g["moran_ppm"]) \
            <= len(cells) * 1_000_000

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import lisa_cells, lisa_cells_sql
        rng = np.random.default_rng(101)
        rows = [(float(a), float(b)) for a, b in zip(
            rng.uniform(-80, 80, 700).round(1),
            rng.uniform(-170, 170, 700).round(1))]
        d = spark.createDataFrame(rows, "lat double, lon double")
        got = _rows(lisa_cells(d, 3))
        con = duckdb.connect()
        con.execute("CREATE TABLE src (lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO src VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(
            lisa_cells_sql("SELECT lat, lon FROM src", 3)).fetchall())
        assert got == want and len(got) > 20


class TestBigramLM:
    def _d(self, spark, texts):
        return spark.createDataFrame([(t,) for t in texts],
                                     "text string")

    def test_conditionals_and_floor(self, spark):
        """P(w2|w1) in floor ppm; per-w1 rows sum to ~1e6."""
        from geospark.operators.textstats import bigram_lm
        d = self._d(spark, ["the cat the dog the cat",
                            "a b", "solo"])
        got = {(r["w1"], r["w2"]): (r["n"], r["cond_ppm"])
               for r in bigram_lm(d).collect()}
        # 'the' starts 3 bigrams: cat x2, dog x1
        assert got[("the", "cat")] == (2, 666666)
        assert got[("the", "dog")] == (1, 333333)
        assert got[("cat", "the")] == (1, 1_000_000)
        assert got[("a", "b")] == (1, 1_000_000)
        # the single-token doc contributes nothing
        assert not any(w1 == "solo" or w2 == "solo"
                       for (w1, w2) in got)

    def test_min_count_prunes_after_denominator(self, spark):
        """Pruning the tail must NOT renormalize survivors."""
        from geospark.operators.textstats import bigram_lm
        d = self._d(spark, ["x a x a x b"])
        got = {(r["w1"], r["w2"]): r["cond_ppm"]
               for r in bigram_lm(d, min_count=2).collect()}
        # x->a survives with its original 2/3, x->b (n=1) pruned
        assert got == {("x", "a"): 666666, ("a", "x"): 1_000_000}

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.textstats import (bigram_lm,
                                                  bigram_lm_sql)
        rng = np.random.default_rng(103)
        vocabulary = ["alpha", "beta", "gamma", "delta", "x9"]
        texts = [" ".join(rng.choice(vocabulary,
                                     size=rng.integers(0, 30)))
                 for _ in range(120)]
        d = self._d(spark, texts)
        got = _rows(bigram_lm(d, min_count=2))
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?)",
                        [(t,) for t in texts])
        want = sorted(tuple(r) for r in con.execute(
            bigram_lm_sql(min_count=2)).fetchall())
        assert got == want and len(got) > 15


class TestPairCounts:
    def _d(self, spark, pts):
        return spark.createDataFrame(
            [(i, la, lo) for i, (la, lo) in enumerate(pts)],
            "id long, lat double, lon double")

    def test_ladder_cumulative_exact(self, spark):
        """Three points on a line 1 and 2 microdeg-millions apart:
        the ladder counts pairs cumulatively."""
        from geospark.operators.tiles import pair_counts
        d = self._d(spark, [(0.0, 0.0), (0.0, 1.0), (0.0, 3.0)])
        got = {r["r_udeg"]: r["n_pairs"] for r in pair_counts(
            d, [1_000_000, 2_000_000, 3_000_000]).collect()}
        # d(0,1)=1e6, d(1,2)=2e6, d(0,2)=3e6
        assert got == {1_000_000: 1, 2_000_000: 2, 3_000_000: 3}

    def test_closed_boundary_and_coincident(self, spark):
        """dist == r matches (closed); coincident distinct ids pair
        at every radius; self-pairs never count."""
        from geospark.operators.tiles import pair_counts
        d = self._d(spark, [(5.0, 5.0), (5.0, 5.0), (5.0, 6.0)])
        got = {r["r_udeg"]: r["n_pairs"] for r in pair_counts(
            d, [500_000, 1_000_000]).collect()}
        assert got == {500_000: 1, 1_000_000: 3}

    def test_blocking_res_invariance(self, spark):
        """The blocked join finds exactly the brute-force pairs at
        any res — including points straddling cell borders."""
        import numpy as np

        from geospark.operators.tiles import pair_counts
        rng = np.random.default_rng(107)
        pts = [(float(a), float(b)) for a, b in zip(
            rng.uniform(-60, 60, 300).round(3),
            rng.uniform(-120, 120, 300).round(3))]
        d = self._d(spark, pts)
        radii = [2_000_000, 5_000_000]
        runs = [
            {r["r_udeg"]: r["n_pairs"]
             for r in pair_counts(d, radii, res=rr).collect()}
            for rr in (4, 5, 6)]
        assert runs[0] == runs[1] == runs[2]
        assert runs[0][5_000_000] > 0

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import (pair_counts,
                                              pair_counts_sql)
        rng = np.random.default_rng(109)
        rows = [(int(i), float(a), float(b)) for i, (a, b) in
                enumerate(zip(rng.uniform(-85, 85, 400).round(2),
                              rng.uniform(-175, 175, 400).round(2)))]
        d = spark.createDataFrame(rows,
                                  "id long, lat double, lon double")
        radii = [1_000_000, 3_000_000, 8_000_000]
        got = _rows(pair_counts(d, radii, res=5))
        con = duckdb.connect()
        con.execute("CREATE TABLE src (id BIGINT, lat DOUBLE, "
                    "lon DOUBLE)")
        con.executemany("INSERT INTO src VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(pair_counts_sql(
            "SELECT id, lat, lon FROM src", radii)).fetchall())
        assert got == want and got[-1][1] > 0
