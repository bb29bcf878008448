"""Round-5 session-8 operator tests: colocation pattern mining
(participation index), exact segment-crossing join, hop-segment
derivation, proximity-edge attribute carry."""

from __future__ import annotations


def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(r) for r in df.select(*cols).collect())


class TestProximityEdgesCarry:
    def test_carry_both_sides(self, spark):
        """Carried attributes land as {c}_a for the smaller id and
        {c}_b for the larger, matching the emitting points."""
        from geospark.operators.tiles import proximity_edges
        d = spark.createDataFrame(
            [(1, 0.0, 0.0, "x"), (2, 0.0, 0.000003, "y"),
             (3, 50.0, 50.0, "z")],
            "id long, lat double, lon double, tag string")
        got = _rows(proximity_edges(d, 10, res=6, carry=("tag",)))
        assert got == [(1, 2, "x", "y")]


class TestColocationPI:
    def _d(self, spark, rows):
        return spark.createDataFrame(
            rows, "id long, ftype string, lat double, lon double")

    def test_participation_counts_exact(self, spark):
        """3 As, 2 Bs on a line 1 µdeg apart at r=1: a1-b1, a2-b1,
        a2-b2 are the cross pairs -> part(A)=2 of 3, part(B)=2 of 2,
        pi = min(666666, 1000000) = 666666 ppm."""
        from geospark.operators.tiles import colocation_pi
        d = self._d(spark, [
            (1, "A", 0.0, 0.000001), (2, "B", 0.0, 0.000002),
            (3, "A", 0.0, 0.000003), (4, "B", 0.0, 0.000004),
            (5, "A", 0.0, 0.000009)])
        got = _rows(colocation_pi(d, 1, res=6))
        assert got == [("A", "B", 3, 2, 2, 2, 666666)]

    def test_same_type_pairs_ignored_absent_pair_omitted(self, spark):
        """Two As adjacent, one C far away: no cross-type neighbor
        pair exists at all -> empty result (absent pairs are not
        zero-filled)."""
        from geospark.operators.tiles import colocation_pi
        d = self._d(spark, [(1, "A", 0.0, 0.0),
                            (2, "A", 0.0, 0.000001),
                            (3, "C", 40.0, 40.0)])
        assert colocation_pi(d, 1, res=6).count() == 0

    def test_distinct_participants_not_pair_count(self, spark):
        """One A with TWO B neighbors participates once: part_a=1
        (not 2), part_b=2."""
        from geospark.operators.tiles import colocation_pi
        d = self._d(spark, [(1, "A", 0.0, 0.000001),
                            (2, "B", 0.0, 0.0),
                            (3, "B", 0.0, 0.000002)])
        got = _rows(colocation_pi(d, 1, res=6))
        assert got == [("A", "B", 1, 2, 1, 2, 1000000)]

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import (colocation_pi,
                                              colocation_pi_sql)
        rng = np.random.default_rng(815)
        rows = [(i, "TUVW"[int(rng.integers(0, 4))],
                 float(rng.uniform(-5, 5)),
                 float(rng.uniform(-5, 5)))
                for i in range(400)]
        got = _rows(colocation_pi(self._d(spark, rows), 500_000,
                                  res=6))
        con = duckdb.connect()
        con.execute("CREATE TABLE p (id BIGINT, ftype VARCHAR, "
                    "lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(
            colocation_pi_sql("SELECT * FROM p", 500_000)
        ).fetchall())
        assert got == want and len(got) == 6


class TestUserSegments:
    def test_hops_and_gap_filter(self, spark):
        """Per-user consecutive hops ordered by (us, tie); the
        teleport hop past max_d2 is dropped; first event of a user
        emits no segment."""
        from geospark.operators.events import user_segments
        d = spark.createDataFrame(
            [(7, 100, 1, 0.0, 0.0), (7, 200, 2, 0.0, 0.000002),
             (7, 300, 3, 50.0, 50.0), (9, 100, 4, 1.0, 1.0)],
            "user_id long, us long, event_id long, "
            "lat double, lon double")
        got = _rows(user_segments(d, max_d2=100))
        assert got == [(2, 0, 0, 2, 0)]


class TestSegCrossings:
    def _d(self, spark, rows):
        return spark.createDataFrame(
            rows, "id long, ax long, ay long, bx long, by long")

    def test_proper_cross_detected(self, spark):
        """An X: diagonal up vs diagonal down cross at the middle."""
        from geospark.operators.tiles import seg_crossings
        d = self._d(spark, [(1, 0, 0, 10, 10), (2, 0, 10, 10, 0)])
        assert _rows(seg_crossings(d)) == [(1, 2)]

    def test_touch_collinear_zero_length_excluded(self, spark):
        """Shared endpoint (consecutive hops), T-touch (endpoint on
        interior), collinear overlap, and a zero-length segment on
        another's interior are all NOT proper crossings."""
        from geospark.operators.tiles import seg_crossings
        d = self._d(spark, [
            (1, 0, 0, 10, 0),     # base
            (2, 10, 0, 20, 10),   # shares endpoint (10,0) with 1
            (3, 5, 0, 5, 10),     # T: endpoint (5,0) ON 1's interior
            (4, 2, 0, 8, 0),      # collinear overlap with 1
            (5, 3, 0, 3, 0)])     # zero-length ON 1's interior
        assert seg_crossings(d).count() == 0

    def test_exactly_once_across_cells(self, spark):
        """Two long segments whose bboxes share MANY lattice cells
        still report their crossing exactly once (reference-point
        dedup) — and at two different resolutions."""
        from geospark.operators.tiles import seg_crossings
        d = self._d(spark, [
            (1, -60_000_000, -50_000_000, 60_000_000, 50_000_000),
            (2, -60_000_000, 50_000_000, 60_000_000, -50_000_000)])
        for res in (2, 3, 5):
            assert _rows(seg_crossings(d, res=res)) == [(1, 2)], res

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import (seg_crossings,
                                              seg_crossings_sql)
        rng = np.random.default_rng(3001)
        rows = []
        for i in range(300):
            ax, ay = (int(rng.integers(-170_000_000, 170_000_000)),
                      int(rng.integers(-80_000_000, 80_000_000)))
            rows.append((i, ax, ay,
                         ax + int(rng.integers(-40_000_000,
                                               40_000_000)),
                         ay + int(rng.integers(-40_000_000,
                                               40_000_000))))
        got = _rows(seg_crossings(self._d(spark, rows), res=3))
        con = duckdb.connect()
        con.execute("CREATE TABLE s (id BIGINT, ax BIGINT, "
                    "ay BIGINT, bx BIGINT, by BIGINT)")
        con.executemany("INSERT INTO s VALUES (?, ?, ?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(
            seg_crossings_sql("SELECT * FROM s")).fetchall())
        assert got == want and len(got) > 200


class TestKcorePeel:
    def _e(self, spark, rows):
        return spark.createDataFrame(rows, "id_a long, id_b long")

    def test_triangle_keeps_pendant_drops(self, spark):
        """K3 plus a pendant at k=2: the pendant (deg 1) peels in
        round 1, the triangle survives with deg 2 each."""
        from geospark.operators.graph import kcore_peel
        e = self._e(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
        got = _rows(kcore_peel(e, 2, 2))
        assert got == [(1, 2), (2, 2), (3, 2)]

    def test_star_collapses_round_one(self, spark):
        """A star at k=2: leaves peel, every hub edge loses its
        other endpoint — the edge filter empties the graph in ONE
        round even though the hub's degree passed the test."""
        from geospark.operators.graph import kcore_peel
        e = self._e(spark, [(0, i) for i in range(1, 6)])
        assert kcore_peel(e, 2, 1).count() == 0

    def test_chain_peels_inward_per_round(self, spark):
        """Path 1-2-3-4 at k=2: round 1 drops the endpoints leaving
        edge (2,3); round 2 drops that too — the bounded round count
        is observable."""
        from geospark.operators.graph import kcore_peel
        e = self._e(spark, [(1, 2), (2, 3), (3, 4)])
        assert _rows(kcore_peel(e, 2, 1)) == [(2, 1), (3, 1)]
        assert kcore_peel(e, 2, 2).count() == 0

    def test_dup_reversed_self_edges_normalized(self, spark):
        """Duplicate, reversed and self-loop edges collapse before
        round 1: degree counts DISTINCT neighbors."""
        from geospark.operators.graph import kcore_peel
        e = self._e(spark, [(1, 2), (2, 1), (1, 2), (3, 3), (1, 1)])
        got = _rows(kcore_peel(e, 1, 1))
        assert got == [(1, 1), (2, 1)]

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.graph import kcore_peel, kcore_peel_sql
        rng = np.random.default_rng(42)
        rows = sorted({(int(a), int(b)) for a, b in
                       rng.integers(0, 80, (500, 2)) if a != b})
        got = _rows(kcore_peel(self._e(spark, rows), 5, 3))
        con = duckdb.connect()
        con.execute("CREATE TABLE g (id_a BIGINT, id_b BIGINT)")
        con.executemany("INSERT INTO g VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(kcore_peel_sql(
            "SELECT id_a, id_b FROM g", 5, 3)).fetchall())
        assert got == want and 0 < len(got) < 80


class TestCollocations:
    def _d(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")

    def test_lift_exact(self, spark):
        """Marginal-normalized lift: (x,z) and (w,y) pair rare-with-
        rare (lift 1.5e6), (x,y) pairs common-with-common (750k)."""
        from geospark.operators.textstats import collocations
        d = self._d(spark, ["x y", "x z", "w y"])
        got = _rows(collocations(d, min_count=1))
        assert got == [("w", "y", 1, 1500000),
                       ("x", "y", 1, 750000),
                       ("x", "z", 1, 1500000)]

    def test_prune_after_marginals(self, spark):
        """min_count=2 keeps only (a,b) but its lift still uses the
        FULL corpus marginals (N=4, n1s(a)=3, n2e(b)=3 -> 888888),
        not the post-prune ones (which would give 1e6)."""
        from geospark.operators.textstats import collocations
        d = self._d(spark, ["a b", "a b", "a c", "d b"])
        got = _rows(collocations(d, min_count=2))
        assert got == [("a", "b", 2, 888888)]

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.textstats import (collocations,
                                                  collocations_sql)
        rng = np.random.default_rng(77)
        vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
        texts = [" ".join(vocab[i] for i in rng.integers(0, 6, 30))
                 for _ in range(40)]
        got = _rows(collocations(self._d(spark, texts), min_count=2))
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, "
                    "text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)",
                        list(enumerate(texts)))
        want = sorted(tuple(r) for r in con.execute(
            collocations_sql(min_count=2)).fetchall())
        assert got == want and len(got) > 20


class TestKnoxStat:
    def _d(self, spark, rows):
        return spark.createDataFrame(
            rows, "id long, lat double, lon double, us long")

    def test_counts_exact_closed_boundaries(self, spark):
        """4 points, tau=1000, r=2: (1,2) is close in BOTH (d2 at
        the boundary counts, dt == tau counts, and crosses a
        tau-bucket edge); 3 is time-close only; 4 space-close only.
        n_space=3, n_time=3, n_both=1 -> assoc = 1e6*1*6/(3*3)."""
        from geospark.operators.events import knox_stat
        d = self._d(spark, [
            (1, 0.0, 0.0, 0), (2, 0.0, 0.000001, 1000),
            (3, 0.0, 50.0, 1), (4, 0.0, 0.000002, 10000)])
        row = knox_stat(d, 2, 1000, res=6).collect()[0]
        assert (row["n_pairs"], row["n_space"], row["n_time"],
                row["n_both"]) == (6, 3, 3, 1)
        assert row["assoc_ppm"] == 666666

    def test_null_assoc_when_marginal_empty(self, spark):
        """No space-close pair -> assoc_ppm NULL, counts still
        exact."""
        from geospark.operators.events import knox_stat
        d = self._d(spark, [(1, 0.0, 0.0, 0), (2, 0.0, 90.0, 10)])
        row = knox_stat(d, 1, 1000, res=6).collect()[0]
        assert (row["n_pairs"], row["n_space"], row["n_time"],
                row["n_both"]) == (1, 0, 1, 0)
        assert row["assoc_ppm"] is None

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.events import knox_stat, knox_stat_sql
        rng = np.random.default_rng(99)
        rows = [(i, float(rng.uniform(-2, 2)),
                 float(rng.uniform(-2, 2)),
                 int(rng.integers(0, 10_000_000)))
                for i in range(500)]
        got = _rows(knox_stat(self._d(spark, rows), 300_000,
                              500_000, res=7))
        con = duckdb.connect()
        con.execute("CREATE TABLE k (id BIGINT, lat DOUBLE, "
                    "lon DOUBLE, us BIGINT)")
        con.executemany("INSERT INTO k VALUES (?, ?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(knox_stat_sql(
            "SELECT * FROM k", 300_000, 500_000)).fetchall())
        assert got == want and got[0][3] > 0


class TestContainmentPairs:
    def _d(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, source string, text string")

    def test_quote_full_containment(self, spark):
        """A short doc fully embedded in a long one: containment is
        exactly 1e6 even though Jaccard is far below the ngram_pairs
        bar — the asymmetric case this operator exists for."""
        from geospark.operators.dedup import (containment_pairs,
                                              ngram_pairs)
        quote = "the quick brown fox jumps"
        rows = [(1, "s", quote),
                (2, "s", "padding padding " + quote
                 + " more totally different tail content here")]
        got = _rows(containment_pairs(self._d(spark, rows),
                                      min_cont_ppm=900_000))
        assert len(got) == 1 and got[0][:2] == (1, 2)
        assert got[0][5] == 1_000_000
        assert ngram_pairs(self._d(spark, rows),
                           threshold=0.9).count() == 0

    def test_threshold_and_blocking(self, spark):
        """Pairs below min_cont_ppm drop; docs in different blocks
        never pair."""
        from geospark.operators.dedup import containment_pairs
        rows = [(1, "s", "aaaa bbbb cccc"),
                (2, "s", "dddd eeee ffff"),
                (3, "t", "aaaa bbbb cccc")]
        assert containment_pairs(self._d(spark, rows),
                                 min_cont_ppm=500_000).count() == 0

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.dedup import (containment_pairs,
                                              containment_pairs_sql)
        rng = np.random.default_rng(321)
        base = ("lorem ipsum dolor sit amet consectetur adipiscing "
                "elit sed do eiusmod tempor incididunt ut labore")
        words = base.split()
        texts = []
        for i in range(60):
            k = int(rng.integers(3, 10))
            s = int(rng.integers(0, len(words) - k + 1))
            texts.append(" ".join(words[s:s + k]))
        rows = [(i, f"s{i % 2}", t) for i, t in enumerate(texts)]
        got = _rows(containment_pairs(self._d(spark, rows),
                                      min_cont_ppm=600_000))
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, "
                    "source VARCHAR, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?, ?)",
                        rows)
        want = sorted(tuple(r) for r in con.execute(
            containment_pairs_sql(min_cont_ppm=600_000)).fetchall())
        assert got == want and len(got) > 50


class TestStreamSpeedFlags:
    def test_matches_batch_across_microbatches(self, spark, tmp_path):
        """Chunked replay through the per-user last-position state
        equals the batch speed_flags output byte for byte — including
        a teleport whose two endpoints land in DIFFERENT microbatch
        files, a plausible slow hop that must NOT flag, and a dt=0
        teleport (lim 0 < any displacement)."""
        import datetime as dt

        from pyspark.sql import functions as F

        from geospark.operators.events import speed_flags
        from geospark.streaming.stream import stream_speed_flags
        base = dt.datetime(2024, 1, 1)
        vmax = 25_000  # µdeg/s
        rows = [
            # user 1: slow crawl (no flag), then cross-file teleport
            (0, base, 1, 0.0, 0.0),
            (1, base + dt.timedelta(seconds=10), 1, 0.0, 0.001),
            # user 2: two events same ts, 1 degree apart (dt=0 flag)
            (2, base + dt.timedelta(seconds=5), 2, 10.0, 10.0),
            (3, base + dt.timedelta(seconds=5), 2, 10.0, 11.0),
            # --- file boundary ---
            (4, base + dt.timedelta(seconds=20), 1, 40.0, 40.0),
            (5, base + dt.timedelta(seconds=30), 2, 10.0, 11.001),
        ]
        schema = ("event_id long, ts timestamp_ntz, user_id long, "
                  "lat double, lon double")
        src = str(tmp_path / "speed_src")
        spark.createDataFrame(rows[:4], schema).coalesce(1) \
            .write.mode("overwrite").parquet(src)
        spark.createDataFrame(rows[4:], schema).coalesce(1) \
            .write.mode("append").parquet(src)

        sdf = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
        out = stream_speed_flags(sdf, vmax)
        q = (out.writeStream.format("memory")
             .queryName("speed_stream").outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        got = _rows(spark.sql(
            "SELECT user_id, us, dt_us, d2 FROM speed_stream"))

        e = spark.read.parquet(src)
        pts = e.select("user_id", "event_id", "lat", "lon",
                       F.expr("timestampdiff(MICROSECOND, "
                              "TIMESTAMP_NTZ '2024-01-01 00:00:00', "
                              "ts)").alias("us"))
        want = _rows(speed_flags(pts, vmax_udeg_s=vmax))
        assert got == want
        # exactly: u2 dt=0 teleport, u1 cross-file 56-degree jump,
        # u2 second flag after the boundary is NOT plausible either
        # (1 mdeg in 25 s at vmax 25k µdeg/s is fine -> not flagged)
        assert len(got) == 2
        assert {(r[0], r[2]) for r in got} == {(2, 0),
                                               (1, 10_000_000)}


def _cell(spark, res, x, y):
    from geospark.functions.cells import _RES_SHIFT
    return (res << _RES_SHIFT) + (y << res) + x


class TestPeakCells:
    def _t(self, spark, res, cells):
        return spark.createDataFrame(
            [(_cell(spark, res, x, y), n) for x, y, n in cells],
            "cell long, n_pts long")

    def test_isolated_peak_and_strict_plateau(self, spark):
        """An isolated cell is a peak (max_nbr 0); adjacent unequal
        cells keep only the larger; an equal plateau keeps neither."""
        from geospark.operators.tiles import peak_cells
        res = 6
        t = self._t(spark, res, [
            (10, 10, 5),            # isolated -> peak
            (20, 20, 7), (21, 20, 3),   # pair -> only the 7
            (40, 40, 4), (41, 40, 4)])  # plateau -> neither
        got = _rows(peak_cells(t, res, count_col="n_pts"))
        assert got == sorted([
            (_cell(spark, res, 10, 10), 5, 0),
            (_cell(spark, res, 20, 20), 7, 3)])

    def test_longitude_wrap_adjacency(self, spark):
        """x=0 and x=2^res-1 are neighbors: the smaller loses its
        peak even across the antimeridian."""
        from geospark.operators.tiles import peak_cells
        res = 4
        t = self._t(spark, res, [(0, 5, 9), (15, 5, 2)])
        got = _rows(peak_cells(t, res, count_col="n_pts"))
        assert got == [(_cell(spark, res, 0, 5), 9, 2)]

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import peak_cells, peak_cells_sql
        rng = np.random.default_rng(14)
        res = 5
        seen = {}
        for _ in range(300):
            x, y = int(rng.integers(0, 32)), int(rng.integers(0, 32))
            seen[(x, y)] = int(rng.integers(1, 50))
        rows = [(_cell(spark, res, x, y), n)
                for (x, y), n in seen.items()]
        got = _rows(peak_cells(
            spark.createDataFrame(rows, "cell long, n_pts long"),
            res, count_col="n_pts"))
        con = duckdb.connect()
        con.execute("CREATE TABLE t (cell BIGINT, n_pts BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(peak_cells_sql(
            "SELECT * FROM t", res, count_col="n_pts")).fetchall())
        assert got == want and 0 < len(got) < len(rows)


class TestD8Flow:
    def _t(self, spark, res, cells):
        return spark.createDataFrame(
            [(_cell(spark, res, x, y), n) for x, y, n in cells],
            "cell long, n_pts long")

    def test_sink_needs_full_occupied_ring(self, spark):
        """3x3 block, center 1 surrounded by 2s: the center is a
        SINK (no strict descent); every ring cell drains to an
        unoccupied 0-neighbor."""
        from geospark.operators.tiles import d8_flow
        res = 6
        cells = [(x, y, 2) for x in (10, 11, 12) for y in (10, 11, 12)
                 if (x, y) != (11, 11)] + [(11, 11, 1)]
        got = {r["cell"]: (r["down_n"], r["is_sink"]) for r in
               d8_flow(self._t(spark, res, cells), res,
                       count_col="n_pts").collect()}
        center = _cell(spark, res, 11, 11)
        assert got[center] == (2, 1)
        assert all(v == (0, 0) for c, v in got.items() if c != center)

    def test_deterministic_tiebreak_smallest_cell(self, spark):
        """Two occupied neighbors at the same minimum: the smaller
        CELL ID wins in both engines (two-stage argmin, no min_by)."""
        from geospark.operators.tiles import d8_flow
        res = 6
        # isolated trio: center flows to an unoccupied neighbor; all
        # 0-count neighbors tie, so down = smallest neighbor cell id
        t = self._t(spark, res, [(30, 30, 5)])
        row = d8_flow(t, res, count_col="n_pts").collect()[0]
        assert row["down_n"] == 0 and row["is_sink"] == 0
        assert row["down_cell"] == _cell(spark, res, 29, 29)

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import d8_flow, d8_flow_sql
        rng = np.random.default_rng(27)
        res = 5
        seen = {}
        for _ in range(250):
            x, y = int(rng.integers(0, 32)), int(rng.integers(0, 32))
            seen[(x, y)] = int(rng.integers(1, 9))
        rows = [(_cell(spark, res, x, y), n)
                for (x, y), n in seen.items()]
        got = _rows(d8_flow(
            spark.createDataFrame(rows, "cell long, n_pts long"),
            res, count_col="n_pts"))
        con = duckdb.connect()
        con.execute("CREATE TABLE t (cell BIGINT, n_pts BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(d8_flow_sql(
            "SELECT * FROM t", res, count_col="n_pts")).fetchall())
        assert got == want and len(got) == len(rows)


class TestCentroidDrift:
    def test_floor_mean_negative_coords_and_gap_day(self, spark):
        """Floor-mean semantics on NEGATIVE sums (the div-vs-//
        trap): mean of iy {-1, 0} is -1 (floor), not 0 (trunc).
        Day 0 -> NULL drift; day 2 (day 1 absent) measures from the
        previous OBSERVED day."""
        from geospark.operators.events import centroid_drift
        day = 86_400_000_000
        d = spark.createDataFrame(
            [(0, -0.000001, 0.0), (1, 0.0, 0.0),
             (2 * day, 0.0, 0.000002)],
            "us long, lat double, lon double")
        got = {r["day"]: (r["n"], r["cx"], r["cy"], r["d2_prev"])
               for r in centroid_drift(d).collect()}
        assert got[0] == (2, 0, -1, None)
        assert got[2] == (1, 2, 0, 4 + 1)

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.events import (centroid_drift,
                                               centroid_drift_sql)
        rng = np.random.default_rng(55)
        rows = [(int(rng.integers(0, 10 * 86_400_000_000)),
                 float(rng.uniform(-80, 80)),
                 float(rng.uniform(-170, 170))) for _ in range(2000)]
        d = spark.createDataFrame(rows, "us long, lat double, "
                                  "lon double")
        got = _rows(centroid_drift(d))
        con = duckdb.connect()
        con.execute("CREATE TABLE p (us BIGINT, lat DOUBLE, "
                    "lon DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(
            centroid_drift_sql("SELECT * FROM p")).fetchall())
        assert got == want and len(got) == 10


class TestD8Basins:
    def _t(self, spark, res, cells):
        return spark.createDataFrame(
            [(_cell(spark, res, x, y), n) for x, y, n in cells],
            "cell long, n_pts long")

    def test_paths_follow_flow_and_sink_self_roots(self, spark):
        """Basin labels equal the Python-side pointer walk over
        d8_flow's edges for EVERY cell of a 5x5 count pyramid (the
        center resolves a multi-hop interior chain: center -> ring1
        -> ring2 -> unoccupied terminal); a surrounded local-minimum
        sink labels to ITSELF."""
        from geospark.operators.tiles import d8_basins, d8_flow
        res = 6
        pyramid = [(10 + dx, 10 + dy, 10 - max(abs(dx), abs(dy)))
                   for dx in range(-2, 3) for dy in range(-2, 3)]
        t = self._t(spark, res, pyramid)
        flow = {r["cell"]: (r["down_cell"], r["is_sink"])
                for r in d8_flow(t, res, count_col="n_pts").collect()}

        def walk(c):
            while c in flow and flow[c][1] == 0:
                c = flow[c][0]
            return c
        got = {r["cell"]: r["basin"] for r in d8_basins(
            t, res, 3, count_col="n_pts").collect()}
        assert got == {c: walk(c) for c in flow}
        center = _cell(spark, res, 10, 10)
        assert got[center] not in flow  # resolves to unoccupied
        assert flow[center][0] in flow  # via an occupied first hop
        ring = [(x, y, 2) for x in (20, 21, 22) for y in (20, 21, 22)
                if (x, y) != (21, 21)] + [(21, 21, 1)]
        got2 = {r["cell"]: r["basin"] for r in d8_basins(
            self._t(spark, res, ring), res, 3,
            count_col="n_pts").collect()}
        center2 = _cell(spark, res, 21, 21)
        assert got2[center2] == center2

    def test_rounds_convergence(self, spark):
        """rounds=4 equals rounds=5 on a random raster (chains are
        bounded by distinct count levels) — the bounded-round
        convergence check."""
        import numpy as np

        from geospark.operators.tiles import d8_basins
        rng = np.random.default_rng(8)
        res = 5
        seen = {}
        for _ in range(200):
            x, y = int(rng.integers(0, 32)), int(rng.integers(0, 32))
            seen[(x, y)] = int(rng.integers(1, 30))
        t = self._t(spark, res, [(x, y, n)
                                 for (x, y), n in seen.items()])
        r4 = _rows(d8_basins(t, res, 4, count_col="n_pts"))
        r5 = _rows(d8_basins(t, res, 5, count_col="n_pts"))
        assert r4 == r5 and len(r4) == len(seen)

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import d8_basins, d8_basins_sql
        rng = np.random.default_rng(88)
        res = 5
        seen = {}
        for _ in range(250):
            x, y = int(rng.integers(0, 32)), int(rng.integers(0, 32))
            seen[(x, y)] = int(rng.integers(1, 12))
        rows = [(_cell(spark, res, x, y), n)
                for (x, y), n in seen.items()]
        got = _rows(d8_basins(
            spark.createDataFrame(rows, "cell long, n_pts long"),
            res, 3, count_col="n_pts"))
        con = duckdb.connect()
        con.execute("CREATE TABLE t (cell BIGINT, n_pts BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(d8_basins_sql(
            "SELECT * FROM t", res, 3, count_col="n_pts")).fetchall())
        assert got == want and len(got) == len(rows)


class TestZeroRoundBoundaries:
    """Review fix: the chained-CTE SQL twins emitted a dangling comma
    at k/rounds = 0 while the Spark loops handled 0 fine — the
    engine-parity contract must hold at the boundary value too."""

    def test_bounded_paths_k0(self, spark):
        import duckdb

        from geospark.operators.graph import (bounded_paths,
                                              bounded_paths_sql)
        e = spark.createDataFrame([(1, 2, 5)],
                                  "id_a long, id_b long, w long")
        s = spark.createDataFrame([(1,)], "id long")
        got = _rows(bounded_paths(e, s, 0))
        assert got == [(1, 0)]
        con = duckdb.connect()
        want = sorted(tuple(r) for r in con.execute(bounded_paths_sql(
            "SELECT 1 AS id_a, 2 AS id_b, 5 AS w",
            "SELECT 1 AS id", 0)).fetchall())
        assert got == want

    def test_kcore_rounds0_and_basins_rounds0(self, spark):
        import duckdb

        from geospark.operators.graph import kcore_peel, kcore_peel_sql
        from geospark.operators.tiles import d8_basins, d8_basins_sql
        e = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        got = _rows(kcore_peel(e, 2, 0))
        con = duckdb.connect()
        want = sorted(tuple(r) for r in con.execute(kcore_peel_sql(
            "SELECT 1 AS id_a, 2 AS id_b", 2, 0)).fetchall())
        assert got == want == [(1, 1), (2, 1)]
        t = spark.createDataFrame(
            [(_cell(spark, 6, 10, 10), 3)], "cell long, n_pts long")
        got2 = _rows(d8_basins(t, 6, 0, count_col="n_pts"))
        want2 = sorted(tuple(r) for r in con.execute(d8_basins_sql(
            f"SELECT {_cell(spark, 6, 10, 10)} AS cell, 3 AS n_pts",
            6, 0, count_col="n_pts")).fetchall())
        assert got2 == want2 and len(got2) == 1


class TestCrossK:
    def _d(self, spark, rows):
        return spark.createDataFrame(
            rows, "id long, ftype string, lat double, lon double")

    def test_ladder_cumulative_and_zero_rungs(self, spark):
        """A-B pairs at lattice distances 1 and 3: rung r=1 counts
        one pair, r=3 counts both (cumulative); a type pair with
        pairs only at the LARGEST radius still emits ZERO rows for
        the smaller rungs; same-type pairs never count."""
        from geospark.operators.tiles import cross_k
        d = self._d(spark, [
            (1, "A", 0.0, 0.000000), (2, "B", 0.0, 0.000001),
            (3, "B", 0.0, 0.000003),
            (4, "A", 0.0, 0.000004),  # A-A with 1: same type
            (5, "C", 10.0, 10.0), (6, "D", 10.0, 10.000003)])
        got = _rows(cross_k(d, [1, 3], res=6))
        assert (("A", "B", 1, 2) in got)  # pairs (1,2) d=1, (3,4) d=1
        assert (("A", "B", 3, 4) in got)  # + (1,3) d=3, (2,4) d=3
        assert (("C", "D", 1, 0) in got)  # zero rung below its pair
        assert (("C", "D", 3, 1) in got)
        assert all(r[0] != r[1] for r in got)

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import cross_k, cross_k_sql
        rng = np.random.default_rng(4040)
        rows = [(i, "PQ"[int(rng.integers(0, 2))],
                 float(rng.uniform(-3, 3)), float(rng.uniform(-3, 3)))
                for i in range(300)]
        got = _rows(cross_k(self._d(spark, rows),
                            [200_000, 600_000], res=6))
        con = duckdb.connect()
        con.execute("CREATE TABLE p (id BIGINT, ftype VARCHAR, "
                    "lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(cross_k_sql(
            "SELECT * FROM p", [200_000, 600_000])).fetchall())
        assert got == want and len(got) == 2 and got[0][3] > 0


class TestThresholdAlerts:
    def _d(self, spark, rows):
        # (us, lat, lon): one point per event at a fixed location
        return spark.createDataFrame(rows,
                                     "us long, lat double, lon double")

    def _mk(self, counts, win=100):
        """counts[i] events in window i at one location."""
        rows = []
        for i, n in enumerate(counts):
            rows += [(i * win + j, 10.0, 10.0) for j in range(n)]
        return rows

    def test_hysteresis_holds_between_thresholds(self, spark):
        """Counts 5,3,1,3,5 at hi=4/lo=2: raise at w0 (5>=4), HOLD
        through 3 (in [2,4)), clear at w2 (1<2), hold through 3,
        raise at w4 — but w4 is the final observed window so it is
        NOT evaluated. A plain n>=4 filter would flap."""
        from geospark.operators.events import threshold_alerts
        d = self._d(spark, self._mk([5, 3, 1, 3, 5]))
        got = [(r["w"], r["n"], r["alert"]) for r in
               threshold_alerts(d, 4, 100, 4, 2)
               .orderBy("w").collect()]
        assert got == [(0, 5, 1), (2, 1, 0)]

    def test_gap_windows_do_not_clear(self, spark):
        """Observed-window semantics: windows 0 and 50 both at 4 —
        the 49 empty windows between them neither clear nor raise,
        so there is exactly ONE raise (w0) and no clear."""
        from geospark.operators.events import threshold_alerts
        d = self._d(spark, self._mk([4] + [0] * 49 + [4]))
        got = [(r["w"], r["alert"]) for r in
               threshold_alerts(d, 4, 100, 4, 2).collect()]
        assert got == [(0, 1)]

    def test_stream_matches_batch_across_microbatches(
            self, spark, tmp_path):
        """Replay through the per-cell (window, count, alert) state
        equals the batch operator — including a window whose COUNT
        accumulates across two microbatch files and a raise
        evaluated only when the next file's event closes it."""
        import datetime as dt

        from pyspark.sql import functions as F

        from geospark.operators.events import threshold_alerts
        from geospark.streaming.stream import stream_threshold_alerts
        base = dt.datetime(2024, 1, 1)
        win_us = 60_000_000
        rows = []
        eid = 0
        # w0: 5 events, 3 in file 1 + 2 in file 2 (split window);
        # w1: 1 event (clear); w2: 1 event (closes w1)
        for k in range(3):
            rows.append((eid, base + dt.timedelta(seconds=k), 1,
                         10.0, 10.0)); eid += 1
        cut = len(rows)
        for k in range(3, 5):
            rows.append((eid, base + dt.timedelta(seconds=k), 1,
                         10.0, 10.0)); eid += 1
        rows.append((eid, base + dt.timedelta(seconds=70), 1,
                     10.0, 10.0)); eid += 1
        rows.append((eid, base + dt.timedelta(seconds=130), 1,
                     10.0, 10.0)); eid += 1
        schema = ("event_id long, ts timestamp_ntz, user_id long, "
                  "lat double, lon double")
        src = str(tmp_path / "ta_src")
        spark.createDataFrame(rows[:cut], schema).coalesce(1) \
            .write.mode("overwrite").parquet(src)
        spark.createDataFrame(rows[cut:], schema).coalesce(1) \
            .write.mode("append").parquet(src)
        sdf = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
        out = stream_threshold_alerts(sdf, 4, win_us, 4, 2)
        q = (out.writeStream.format("memory")
             .queryName("ta_stream").outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        got = _rows(spark.sql(
            "SELECT cell, w, n, alert FROM ta_stream"))
        e = spark.read.parquet(src)
        pts = e.select("lat", "lon",
                       F.expr("timestampdiff(MICROSECOND, "
                              "TIMESTAMP_NTZ '2024-01-01 00:00:00', "
                              "ts)").alias("us"))
        want = _rows(threshold_alerts(pts, 4, win_us, 4, 2))
        assert got == want
        assert [(r[1], r[2], r[3]) for r in got] == [(0, 5, 1),
                                                     (1, 1, 0)]


class TestBasinStats:
    def test_mass_conserved_and_interior_flag(self, spark):
        """Every occupied cell lands in exactly one basin (totals
        conserve the event mass and n_cells sums to the cell count);
        a surrounded local-minimum basin is INTERIOR, edge-draining
        basins are not."""
        from geospark.operators.tiles import basin_stats
        res = 6
        cells = ([(x, y, 2) for x in (10, 11, 12) for y in (10, 11, 12)
                  if (x, y) != (11, 11)] + [(11, 11, 1)]
                 + [(40, 40, 7)])
        t = spark.createDataFrame(
            [(_cell(spark, res, x, y), n) for x, y, n in cells],
            "cell long, n_pts long")
        got = basin_stats(t, res, 3, count_col="n_pts").collect()
        assert sum(r["n_cells"] for r in got) == len(cells)
        assert sum(r["total"] for r in got) == sum(n for _, _, n
                                                   in cells)
        center = _cell(spark, res, 21 - 10, 21 - 10)  # placeholder
        interior = [r for r in got if r["interior"] == 1]
        assert len(interior) == 1
        assert interior[0]["basin"] == _cell(spark, res, 11, 11)
        assert interior[0]["total"] == 1

    def test_inline_oracle_parity(self, spark):
        import duckdb
        import numpy as np

        from geospark.operators.tiles import basin_stats, basin_stats_sql
        rng = np.random.default_rng(99)
        res = 5
        seen = {}
        for _ in range(220):
            x, y = int(rng.integers(0, 32)), int(rng.integers(0, 32))
            seen[(x, y)] = int(rng.integers(1, 15))
        rows = [(_cell(spark, res, x, y), n)
                for (x, y), n in seen.items()]
        got = _rows(basin_stats(
            spark.createDataFrame(rows, "cell long, n_pts long"),
            res, 3, count_col="n_pts"))
        con = duckdb.connect()
        con.execute("CREATE TABLE t (cell BIGINT, n_pts BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute(basin_stats_sql(
            "SELECT * FROM t", res, 3, count_col="n_pts")).fetchall())
        assert got == want and len(got) > 10
