"""Round-5 session-13 operator tests: Benford first-digit audit,
bivariate Moran's I, HITS hubs/authorities, the Kaplan-Meier return-
hazard life table, per-cell circular flow concentration, and region
shape metrics."""

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


# ---------------------------------------------------------------------------
# HITS hubs & authorities
# ---------------------------------------------------------------------------

def _hits_ref(edges, nodes, iters=4):
    """Independent re-derivation of the max-normalized integer HITS
    recurrence (floor division everywhere)."""
    edges = sorted(set(edges))
    h = {v: 10**6 for v in nodes}
    a = {v: 0 for v in nodes}
    for _ in range(iters):
        raw = {v: 0 for v in nodes}
        for u, v in edges:
            raw[v] += h[u]
        mx = max(raw.values()) if nodes else 0
        a = {v: (r * 10**6 // mx if mx else 0)
             for v, r in raw.items()}
        raw = {v: 0 for v in nodes}
        for u, v in edges:
            raw[u] += a[v]
        mx = max(raw.values()) if nodes else 0
        h = {v: (r * 10**6 // mx if mx else 0)
             for v, r in raw.items()}
    return sorted((v, a[v], h[v]) for v in nodes)


class TestHits:
    def _run(self, spark, edges, nodes, iters=4):
        from geospark.operators.graph import hits
        e = spark.createDataFrame(edges, "src long, dst long")
        n = spark.createDataFrame([(v,) for v in nodes],
                                  "doc_id long")
        return _rows(hits(e, n, iters=iters))

    def test_star_separates_hub_from_authority(self, spark):
        """1,2,3 -> 0: node 0 is the pure authority (auth 1e6,
        hub 0), the pointers are pure equal hubs (hub 1e6, auth 0)."""
        got = self._run(spark, [(1, 0), (2, 0), (3, 0)], range(4))
        assert got == [(0, 10**6, 0), (1, 0, 10**6),
                       (2, 0, 10**6), (3, 0, 10**6)]

    def test_unbalanced_bipartite_matches_ref(self, spark):
        """Hub 0 points at both authorities, hub 1 at one: scores
        match the independent floor-arithmetic re-derivation, the
        stronger hub and stronger authority pin at 1e6."""
        edges = [(0, 2), (0, 3), (1, 2)]
        nodes = range(4)
        got = self._run(spark, edges, nodes)
        assert got == _hits_ref(edges, nodes)
        assert got[0][2] == 10**6 and got[2][1] == 10**6

    def test_no_edges_all_zero(self, spark):
        """Empty graph: the max-0 guard yields all-zero scores, not a
        division error."""
        from geospark.operators.graph import hits
        e = spark.createDataFrame([], "src long, dst long")
        n = spark.createDataFrame([(v,) for v in range(3)],
                                  "doc_id long")
        assert _rows(hits(e, n)) == [(0, 0, 0), (1, 0, 0), (2, 0, 0)]

    def test_duplicate_edges_collapse(self, spark):
        """Edge multiplicity is ignored (DISTINCT before the
        recurrence): duplicating an edge changes nothing."""
        edges = [(0, 2), (0, 3), (1, 2)]
        assert (self._run(spark, edges * 3, range(4))
                == self._run(spark, edges, range(4)))

    def test_inline_oracle_parity(self, spark):
        import duckdb

        from geospark.operators.graph import hits, hits_sql
        edges = [(i, (i * 7 + 13 * j + 1) % 60)
                 for i in range(60) for j in range(3)]
        edges = [(u, v) for u, v in edges if u != v]
        nodes = range(60)
        got = self._run(spark, edges, nodes)
        assert got == _hits_ref(edges, nodes)
        con = duckdb.connect()
        con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
        con.executemany("INSERT INTO e VALUES (?, ?)", edges)
        want = sorted(tuple(r) for r in con.execute(hits_sql(
            "SELECT src, dst FROM e",
            "SELECT unnest(range(60)) AS id")).fetchall())
        assert got == want


# ---------------------------------------------------------------------------
# Discrete-time return-hazard life table
# ---------------------------------------------------------------------------

class TestKmHazard:
    HOUR = 3_600_000_000

    def _run(self, spark, rows):
        from datetime import datetime, timedelta

        from geospark.operators.events import km_hazard
        base = datetime(2024, 1, 1)
        data = [(u, base + timedelta(hours=h)) for u, h in rows]
        d = spark.createDataFrame(data, "user_id long, ts timestamp")
        return _rows(km_hazard(d),
                     ["dur", "n_risk", "n_events", "n_censored",
                      "hazard_ppm"])

    def test_hand_worked_life_table(self, spark):
        """user 1 at hours 0,1,3; user 2 at 0,5. Complete spells
        {1,2,5}, censored {2,0} (horizon = hour 5). Risk sets 5,4,3,1
        down the grid; rows only where a return happened."""
        got = self._run(spark, [(1, 0), (1, 1), (1, 3),
                                (2, 0), (2, 5)])
        assert got == [(1, 4, 1, 0, 250_000),
                       (2, 3, 1, 1, 333_333),
                       (5, 1, 1, 0, 1_000_000)]

    def test_censoring_inflates_risk_not_events(self, spark):
        """A single-event user adds one censored spell (never a
        return): every hazard at or below its censor time drops, and
        no new output row appears."""
        base = [(1, 0), (1, 1), (1, 3), (2, 0), (2, 5)]
        got = self._run(spark, base + [(3, 0)])  # censored at dur 5
        assert got == [(1, 5, 1, 0, 200_000),
                       (2, 4, 1, 1, 250_000),
                       (5, 2, 1, 1, 500_000)]

    def test_tied_timestamps_are_zero_spells(self, spark):
        """Two events at the same instant: a complete dur-0 spell —
        counted, deterministic under any tie order."""
        got = self._run(spark, [(1, 0), (1, 0), (1, 2)])
        # spells: complete {0, 2}, censored {0}; risk 3 then 1
        assert got == [(0, 3, 1, 1, 333_333),
                       (2, 1, 1, 0, 1_000_000)]

    def test_inline_oracle_parity(self, spark):
        from datetime import datetime, timedelta

        import duckdb

        from geospark.operators.events import km_hazard, km_hazard_sql
        base = datetime(2024, 1, 1)
        rows = [(i % 17, base + timedelta(
                    minutes=(i * i * 31 + 7 * i) % 10000))
                for i in range(400)]
        d = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = _rows(km_hazard(d))
        con = duckdb.connect()
        con.execute("CREATE TABLE ev (u BIGINT, ts TIMESTAMP)")
        con.executemany("INSERT INTO ev VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(
            km_hazard_sql("SELECT u, ts FROM ev")).fetchall())
        assert got == want and len(got) > 5


# ---------------------------------------------------------------------------
# Per-cell circular flow concentration (Rayleigh resultant)
# ---------------------------------------------------------------------------

class TestRayleighCells:
    def _run(self, spark, pts, res=4, min_hops=5):
        from geospark.operators.events import rayleigh_cells
        d = spark.createDataFrame(
            pts, "user_id long, us long, event_id long, "
                 "lat double, lon double")
        return _rows(rayleigh_cells(d, res, min_hops=min_hops),
                     ["cell", "n_hops", "sx", "sy", "r2_ppm"])

    @staticmethod
    def _walk(user, lons, lat=10.0):
        return [(user, k, k, lat, lon) for k, lon in enumerate(lons)]

    def test_aligned_flow_is_fully_concentrated(self, spark):
        """Six due-east hops from one cell: every hop lands in the
        ENE sector, the resultant is the full unit vector, r2 pins at
        1e6 (the +1 is the literal table's rounding, truncated back
        by the div)."""
        pts = self._walk(1, [10.0 + 0.001 * k for k in range(7)])
        got = self._run(spark, pts)
        assert len(got) == 1
        cell, n, sx, sy, r2 = got[0]
        assert (n, sx, sy) == (6, 6 * 923880, 6 * 382683)
        assert r2 == 1_000_000

    def test_opposing_flows_cancel(self, spark):
        """Alternating east/west hops: ENE and WSW center vectors are
        exact opposites, the resultant vanishes, r2 = 0."""
        lons = [10.0, 10.001] * 4  # 7 hops: 4 east... make even
        lons = [10.0, 10.001, 10.0, 10.001, 10.0, 10.001, 10.0]
        pts = self._walk(1, lons)  # 3 east + 3 west
        got = self._run(spark, pts)
        assert got[0][1:] == (6, 0, 0, 0)

    def test_min_hops_suppresses_noise_cells(self, spark):
        """4 hops in a cell: below min_hops=5 -> no row; a 5th hop
        makes the cell appear."""
        pts4 = self._walk(1, [10.0 + 0.001 * k for k in range(5)])
        assert self._run(spark, pts4) == []
        pts5 = self._walk(1, [10.0 + 0.001 * k for k in range(6)])
        assert len(self._run(spark, pts5)) == 1

    def test_stationary_hops_dropped(self, spark):
        """Repeated identical positions carry no direction: only the
        moving hops count."""
        lons = [10.0, 10.0, 10.001, 10.001, 10.002, 10.002, 10.003,
                10.003, 10.004, 10.004, 10.005]
        got = self._run(spark, self._walk(1, lons))
        assert got[0][1] == 5  # 5 moving hops, 5 stationary dropped

    def test_inline_oracle_parity(self, spark):
        import duckdb

        from geospark.operators.events import (rayleigh_cells,
                                               rayleigh_cells_sql)
        pts = []
        for u in range(8):
            lat, lon = 5.0 + 9 * u - 40, -60.0 + 15 * u
            for k in range(50):
                lat += ((u * 31 + k * k * 7) % 11 - 5) * 0.003
                lon += ((u * 17 + k * 13) % 9 - 4) * 0.003
                pts.append((u, k * 1000, k, round(lat, 6),
                            round(lon, 6)))
        got = self._run(spark, pts, res=3, min_hops=5)
        con = duckdb.connect()
        con.execute("CREATE TABLE p (user_id BIGINT, us BIGINT, "
                    "event_id BIGINT, lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?, ?, ?)", pts)
        want = sorted(tuple(r) for r in con.execute(rayleigh_cells_sql(
            "SELECT user_id, us, event_id, lat, lon FROM p",
            3, min_hops=5)).fetchall())
        assert got == want and len(got) >= 4


# ---------------------------------------------------------------------------
# Region shape metrics (area / perimeter / Polsby-Popper)
# ---------------------------------------------------------------------------

class TestRegionShape:
    def _run(self, spark, assign, res=RES):
        from geospark.operators.cluster import region_shape
        rows = [(_cell(y, x, res), rid) for (y, x), rid in assign]
        d = spark.createDataFrame(rows, "cell long, region_id long")
        return _rows(region_shape(d, res),
                     ["region_id", "area_cells", "perimeter",
                      "pp_ppm"])

    def test_square_hits_raster_ceiling(self, spark):
        """A 1-cell and a 2x2 region both score exactly pi/4 =
        785398 ppm — Polsby-Popper is scale-free on squares."""
        one = self._run(spark, [((5, 5), 1)])
        assert one == [(1, 1, 4, 785398)]
        sq = self._run(spark, [((5, 5), 1), ((5, 6), 1),
                               ((6, 5), 1), ((6, 6), 1)])
        assert sq == [(1, 4, 8, 785398)]

    def test_ribbon_scores_below_square(self, spark):
        """A 1x3 ribbon: area 3, perimeter 8 -> 589048 ppm, strictly
        less compact than any square."""
        got = self._run(spark, [((5, 5), 1), ((5, 6), 1),
                                ((5, 7), 1)])
        assert got == [(1, 3, 8, 589048)]

    def test_longitude_wraps_latitude_clamps(self, spark):
        """Cells (y=5, x=15) and (y=5, x=0) at res 4 are rook
        neighbors across the antimeridian (perimeter 6, not 8); a
        cell on the polar row y=0 keeps its off-grid edge exposed
        (perimeter still 4)."""
        wrap = self._run(spark, [((5, 15), 1), ((5, 0), 1)])
        assert wrap == [(1, 2, 6, 698131)]
        polar = self._run(spark, [((0, 3), 7)])
        assert polar == [(7, 1, 4, 785398)]

    def test_regions_do_not_leak(self, spark):
        """Two touching cells in DIFFERENT regions share no
        perimeter reduction — each stays a 4-edge singleton."""
        got = self._run(spark, [((5, 5), 1), ((5, 6), 2)])
        assert got == [(1, 1, 4, 785398), (2, 1, 4, 785398)]

    def test_inline_oracle_parity(self, spark):
        import duckdb

        from geospark.operators.cluster import (region_shape,
                                                region_shape_sql)
        assign = [((2 + (i * 7) % 12, (i * 5) % 16),
                   (i * 3) % 4) for i in range(90)]
        seen, uniq = set(), []
        for c, r in assign:
            if c not in seen:
                seen.add(c)
                uniq.append((c, r))
        got = self._run(spark, uniq)
        con = duckdb.connect()
        con.execute("CREATE TABLE r (cell BIGINT, region_id BIGINT)")
        con.executemany("INSERT INTO r VALUES (?, ?)",
                        [(_cell(y, x), rid)
                         for (y, x), rid in uniq])
        want = sorted(tuple(r) for r in con.execute(region_shape_sql(
            "SELECT cell, region_id FROM r", RES)).fetchall())
        assert got == want and len(got) == 4


# ---------------------------------------------------------------------------
# Distinctive-term odds ratios per source
# ---------------------------------------------------------------------------

class TestTermContrast:
    def _run(self, spark, rows, k=10, min_docs=1):
        from geospark.operators.textstats import term_contrast
        d = spark.createDataFrame(
            rows, "doc_id long, source string, text string")
        return _rows(term_contrast(d, k=k, min_docs=min_docs),
                     ["source", "term", "n_in", "n_out", "or_ppm",
                      "rank"])

    def test_hand_worked_odds_ratios(self, spark):
        """3 'apple the' docs in A vs 3 'banana the' docs in B:
        apple in A has a=3,b=0,c=0,d=3 -> (7*7)/(1*1) = 49e6 ppm;
        'the' is everywhere -> exactly 1e6 (no signal). Ranks follow."""
        rows = ([(i, "A", "apple the") for i in range(3)]
                + [(i + 3, "B", "banana the") for i in range(3)])
        got = self._run(spark, rows)
        by = {(r[0], r[1]): r for r in got}
        assert by[("A", "apple")] == ("A", "apple", 3, 0,
                                      49_000_000, 1)
        assert by[("A", "the")] == ("A", "the", 3, 3, 1_000_000, 2)
        assert by[("B", "banana")][4] == 49_000_000
        assert len(got) == 4  # apple absent from B's rows (a=0 < 1)

    def test_document_frequency_not_token_frequency(self, spark):
        """A doc repeating a term 50 times counts once: the spam doc
        cannot crown its term."""
        rows = [(0, "A", "spam " * 50), (1, "A", "real talk"),
                (2, "B", "other words")]
        got = self._run(spark, rows)
        spam = [r for r in got if r[1] == "spam"][0]
        assert spam[2] == 1  # n_in = 1 doc, not 50

    def test_min_docs_gate(self, spark):
        """min_docs=2 drops single-doc terms from the ranking
        entirely."""
        rows = [(0, "A", "rare common"), (1, "A", "common"),
                (2, "B", "noise")]
        got = self._run(spark, rows, min_docs=2)
        assert {r[1] for r in got if r[0] == "A"} == {"common"}

    def test_inline_oracle_parity(self, spark):
        import duckdb

        from geospark.operators.textstats import (term_contrast,
                                                  term_contrast_sql)
        vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
        rows = []
        for i in range(120):
            g = f"s{i % 3}"
            words = [vocab[(i * 7 + j * (i % 3 + 1)) % 6]
                     for j in range(5)]
            rows.append((i, g, " ".join(words)))
        got = self._run(spark, rows, k=4, min_docs=3)
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, "
                    "source VARCHAR, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?, ?)",
                        rows)
        want = sorted(tuple(r) for r in con.execute(term_contrast_sql(
            k=4, min_docs=3)).fetchall())
        assert got == want and len(got) == 10


# ---------------------------------------------------------------------------
# Per-cell diurnal phase vector
# ---------------------------------------------------------------------------

class TestDiurnalVector:
    HOUR = 3_600_000_000

    def _run(self, spark, rows, res=3):
        from geospark.operators.events import diurnal_vector
        d = spark.createDataFrame(rows,
                                  "us long, lat double, lon double")
        return _rows(diurnal_vector(d, res),
                     ["cell", "n_pts", "sx", "sy", "r2_ppm"])

    def test_single_hour_spike_pins_at_one(self, spark):
        """All events in hour 3: resultant = n * unit(45 deg),
        r2 = 1e6 exactly (the double-rounding in the literal table
        truncates back out)."""
        rows = [(3 * self.HOUR + k, 10.0, 10.0) for k in range(5)]
        got = self._run(spark, rows)
        assert got[0][1:] == (5, 5 * 707107, 5 * 707107, 1_000_000)

    def test_uniform_clock_is_zero(self, spark):
        """One event in every hour: the 24 unit vectors cancel
        exactly (the literal table is rounding-symmetric), r2 = 0."""
        rows = [(h * self.HOUR, 10.0, 10.0) for h in range(24)]
        got = self._run(spark, rows)
        assert got[0][1:] == (24, 0, 0, 0)

    def test_antipodal_hours_cancel(self, spark):
        """Equal mass at 00:00 and 12:00: exactly opposite phases,
        r2 = 0 even though the chi-square profile is maximally
        spiky — the statistic diurnal_vector adds over
        hour_profile."""
        rows = ([(0, 10.0, 10.0)] * 3
                + [(12 * self.HOUR, 10.0, 10.0)] * 3)
        got = self._run(spark, rows)
        assert got[0][1:] == (6, 0, 0, 0)

    def test_inline_oracle_parity(self, spark):
        import duckdb

        from geospark.operators.events import (diurnal_vector,
                                               diurnal_vector_sql)
        rows = [((i * i * 7 + i * 131) % 200 * self.HOUR // 2,
                 -60.0 + (i * 13) % 120, -150.0 + (i * 29) % 300)
                for i in range(500)]
        got = self._run(spark, rows, res=3)
        con = duckdb.connect()
        con.execute("CREATE TABLE p (us BIGINT, lat DOUBLE, "
                    "lon DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(diurnal_vector_sql(
            "SELECT us, lat, lon FROM p", 3)).fetchall())
        assert got == want and len(got) > 10


# ---------------------------------------------------------------------------
# Markov stationary mix
# ---------------------------------------------------------------------------

def _markov_ref(seqs, iters=8):
    """Independent re-derivation: floor-ppm conditionals, per-term
    floor power steps, dangling leak."""
    trans = {}
    for seq in seqs:
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    out_tot = {}
    for (a, _), n in trans.items():
        out_tot[a] = out_tot.get(a, 0) + n
    cp = {(a, b): 1_000_000 * n // out_tot[a]
          for (a, b), n in trans.items()}
    states = sorted({a for a, _ in trans} | {b for _, b in trans})
    x = {s: 1_000_000 // len(states) for s in states}
    for _ in range(iters):
        nx = {s: 0 for s in states}
        for (a, b), p in cp.items():
            nx[b] += (x[a] * p) // 1_000_000
        x = nx
    return sorted(x.items())


class TestMarkovStationary:
    def _run(self, spark, seqs, iters=8):
        from geospark.operators.events import markov_stationary
        rows = []
        for u, seq in enumerate(seqs):
            for k, t in enumerate(seq):
                rows.append((u, k * 1000, k, t))
        d = spark.createDataFrame(
            rows, "user_id long, us long, event_id long, "
                  "event_type string")
        return _rows(markov_stationary(d, iters=iters))

    def test_two_state_cycle_stays_uniform(self, spark):
        """A<->B deterministic cycle: the uniform start is already
        stationary, every step swaps the equal halves."""
        got = self._run(spark, [list("ABABABABA")])
        assert got == [("A", 500_000), ("B", 500_000)]

    def test_dangling_state_leaks_all_mass(self, spark):
        """A -> B with B absorbing-and-dangling: by iteration 2 all
        mass has left the chain (the pagerank dangling convention,
        pinned so the twin can't diverge)."""
        got = self._run(spark, [["A", "B"]])
        assert got == [("A", 0), ("B", 0)]

    def test_self_loop_dominance_matches_ref(self, spark):
        """Heavy A self-loop vs a B detour: steady state concentrates
        on A; exact values match the independent floor
        re-derivation."""
        seqs = [list("AAAABA" * 3)]
        got = self._run(spark, seqs)
        want = _markov_ref(seqs)
        assert got == want and got[0][1] > got[1][1]

    def test_inline_oracle_parity(self, spark):
        import duckdb

        from geospark.operators.events import (markov_stationary,
                                               markov_stationary_sql)
        types = "ABCDE"
        seqs = [[types[(u * 3 + k * k) % 5] for k in range(40)]
                for u in range(12)]
        got = self._run(spark, seqs)
        assert got == _markov_ref(seqs)
        rows = []
        for u, seq in enumerate(seqs):
            for k, t in enumerate(seq):
                rows.append((u, k * 1000, k, t))
        con = duckdb.connect()
        con.execute("CREATE TABLE ev (user_id BIGINT, us BIGINT, "
                    "event_id BIGINT, event_type VARCHAR)")
        con.executemany("INSERT INTO ev VALUES (?, ?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(
            markov_stationary_sql(
                "SELECT user_id, us, event_id, event_type FROM ev"
            )).fetchall())
        assert got == want


# ---------------------------------------------------------------------------
# Spatial concentration (Lorenz) decile curve
# ---------------------------------------------------------------------------

class TestLorenzCells:
    def _run(self, spark, cells, counts, res=RES):
        from geospark.operators.tiles import lorenz_cells
        rows = []
        n = 1 << res
        for (y, x), c in zip(cells, counts):
            lat = -90.0 + (y + 0.5) * 180.0 / n
            lon = -180.0 + (x + 0.5) * 360.0 / n
            rows += [(lat, lon)] * c
        d = spark.createDataFrame(rows, "lat double, lon double")
        return _rows(lorenz_cells(d, res),
                     ["pct", "n_cells", "cum_events", "share_ppm"])

    def test_hand_worked_curve(self, spark):
        """10 cells with counts 10,9,...,1 (T=55): decile i cuts at
        the top i cells; shares are the exact triangular prefix
        ratios."""
        cells = [(5, x) for x in range(10)]
        counts = list(range(10, 0, -1))
        got = sorted(self._run(spark, cells, counts))
        pre = 0
        want = []
        for i in range(1, 11):
            pre += counts[i - 1]
            want.append((i * 10, i, pre, pre * 1_000_000 // 55))
        assert got == sorted(want)

    def test_fewer_cells_than_deciles_repeats_cutoffs(self, spark):
        """3 cells: the output is STILL exactly 10 rows — adjacent
        deciles repeat a cutoff (ceil semantics), the last row is
        always (100, C, T, 1e6)."""
        got = self._run(spark, [(5, 5), (5, 6), (5, 7)], [6, 3, 1])
        assert len(got) == 10
        assert got[-1] == (100, 3, 10, 1_000_000)
        assert got[0] == (10, 1, 6, 600_000)

    def test_uniform_surface_is_diagonal(self, spark):
        """Equal counts everywhere: the curve is the diagonal —
        share_ppm == pct * 1e4 at every decile."""
        cells = [(5, x) for x in range(10)]
        got = self._run(spark, cells, [4] * 10)
        assert all(r[3] == r[0] * 10_000 for r in got)

    def test_inline_oracle_parity(self, spark):
        import duckdb

        from geospark.operators.tiles import (lorenz_cells,
                                              lorenz_cells_sql)
        pts = [(-60.0 + (i * i * 13) % 120, -150.0 + (i * 37) % 300)
               for i in range(800)]
        d = spark.createDataFrame(pts, "lat double, lon double")
        got = _rows(lorenz_cells(d, 3))
        con = duckdb.connect()
        con.execute("CREATE TABLE p (lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?)", pts)
        want = sorted(tuple(r) for r in con.execute(lorenz_cells_sql(
            "SELECT lat, lon FROM p", 3)).fetchall())
        assert got == want and len(got) == 10
