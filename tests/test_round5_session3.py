"""Round-5 session-3 operator tests: interval-overlap join, kNN
similarity graph, dense-calendar freshness decay."""

from __future__ import annotations

import math


def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(r) for r in df.select(*cols).collect())


class TestOverlapJoin:
    def _left(self, spark, rows):
        return spark.createDataFrame(
            rows, "lid long, l_start_us long, l_end_us long")

    def _right(self, spark, rows):
        return spark.createDataFrame(
            rows, "rid long, r_start_us long, r_end_us long")

    def test_hand_cases(self, spark):
        """Overlap semantics on half-open intervals, bucket_us=10:
        partial overlap, containment, touching (NOT overlapping),
        disjoint, and a pair sharing multiple buckets (must appear
        exactly once)."""
        from geospark.operators.events import overlap_join
        left = self._left(spark, [
            (1, 0, 25),     # spans buckets 0-2
            (2, 30, 35),
            (3, 40, 50),
        ])
        right = self._right(spark, [
            (10, 5, 100),   # overlaps 1 (20us), 2 (5us), 3 (10us)
            (11, 25, 30),   # touches 1 at 25 and 2 at 30 -> neither
            (12, 200, 300),  # disjoint
        ])
        got = _rows(overlap_join(left, right, bucket_us=10),
                    ["lid", "rid", "overlap_us"])
        assert got == [(1, 10, 20), (2, 10, 5), (3, 10, 10)]

    def test_multibucket_pair_once(self, spark):
        """Two long intervals sharing 10 buckets join in exactly the
        first shared bucket — one output row, no distinct needed."""
        from geospark.operators.events import overlap_join
        left = self._left(spark, [(1, 0, 100)])
        right = self._right(spark, [(10, 5, 105)])
        out = overlap_join(left, right, bucket_us=10)
        assert _rows(out, ["lid", "rid", "overlap_us"]) == [(1, 10, 95)]
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Deduplicate" not in plan and "Distinct" not in plan

    def test_empty_and_inverted_intervals(self, spark):
        from geospark.operators.events import overlap_join
        left = self._left(spark, [(1, 10, 10), (2, 20, 5)])
        right = self._right(spark, [(10, 0, 100)])
        assert overlap_join(left, right, bucket_us=10).count() == 0

    def test_no_nested_loop_join(self, spark):
        """The decomposition's point: the physical plan is a bucket
        equi-join, never BroadcastNestedLoop/Cartesian."""
        from geospark.operators.events import overlap_join
        left = self._left(spark, [(1, 0, 25)])
        right = self._right(spark, [(10, 5, 100)])
        plan = (overlap_join(left, right, bucket_us=10)
                ._jdf.queryExecution().executedPlan().toString())
        assert "NestedLoop" not in plan
        assert "Cartesian" not in plan

    def test_matches_brute_force_random(self, spark):
        import random
        from pyspark.sql import functions as F
        from geospark.operators.events import overlap_join
        rng = random.Random(7)
        lrows = [(i, s, s + rng.randrange(1, 40))
                 for i, s in ((i, rng.randrange(0, 200))
                              for i in range(60))]
        rrows = [(i, s, s + rng.randrange(1, 60))
                 for i, s in ((i, rng.randrange(0, 200))
                              for i in range(40))]
        got = _rows(overlap_join(self._left(spark, lrows),
                                 self._right(spark, rrows),
                                 bucket_us=16),
                    ["lid", "rid", "overlap_us"])
        want = sorted(
            (li, ri, min(le, re_) - max(ls, rs))
            for (li, ls, le) in lrows for (ri, rs, re_) in rrows
            if min(le, re_) - max(ls, rs) > 0)
        assert got == want


class TestFreshnessDecay:
    def test_dense_calendar_and_decay(self, spark):
        """Zero-arrival days are present and decay the score by
        exactly half per day over the horizon."""
        from geospark.operators.textstats import freshness_decay
        df = spark.createDataFrame(
            [("a", 0), ("a", 0), ("a", 2), ("b", 1)],
            "source string, day long")
        out = _rows(freshness_decay(df, n_days=4, horizon=3),
                    ["source", "day", "n_docs", "freshness"])
        # a: n = [2, 0, 1, 0]; score = n(d) + n(d-1)/2 + n(d-2)/4
        # b: n = [0, 1, 0, 0]
        assert out == [
            ("a", 0, 2, 2.0), ("a", 1, 0, 1.0),
            ("a", 2, 1, 1.5), ("a", 3, 0, 0.5),
            ("b", 0, 0, 0.0), ("b", 1, 1, 1.0),
            ("b", 2, 0, 0.5), ("b", 3, 0, 0.25),
        ]

    def test_grid_is_sources_times_days(self, spark):
        from geospark.operators.textstats import freshness_decay
        df = spark.createDataFrame(
            [("a", 5), ("b", 0), ("c", 63)], "source string, day long")
        assert freshness_decay(df, n_days=64).count() == 3 * 64

    def test_dyadic_exactness(self, spark):
        """Every freshness value is a dyadic rational k/2^(horizon-1)
        — the property that makes the cross-engine hash safe."""
        from geospark.operators.textstats import freshness_decay
        df = spark.createDataFrame(
            [("s", i % 8) for i in range(100)], "source string, day long")
        for r in freshness_decay(df, n_days=8, horizon=8).collect():
            scaled = r.freshness * 128.0
            assert scaled == math.floor(scaled)


class TestKnnGraph:
    def _emb(self, spark, vecs):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>")

    def test_topk_within_buckets(self, spark):
        """On vectors engineered into one shared bucket, the graph is
        the exact brute-force top-k with nbr-asc tiebreaks."""
        from geospark.operators.similarity import knn_graph
        # all-positive 8-dim vectors -> identical sign buckets
        vecs = [[1, 1, 1, 1, 1, 1, 1, 1],
                [2, 2, 2, 2, 2, 2, 2, 2],   # sim 1.0 with vec 0
                [1, 2, 1, 2, 1, 2, 1, 2],
                [2, 1, 2, 1, 2, 1, 2, 1]]
        out = knn_graph(self._emb(spark, vecs), k=2, dim=8,
                        n_bits=4, n_tables=2)
        rows = {(r.vec_id, r.rank): (r.nbr_id, r.sim)
                for r in out.collect()}
        # vec 0's best is vec 1 (cos 1.0); tie between 2 and 3 at the
        # same rounded sim resolves to the lower id
        assert rows[(0, 1)][0] == 1 and rows[(0, 1)][1] == 1.0
        assert rows[(0, 2)][0] == 2
        assert all(rank <= 2 for (_, rank) in rows)

    def test_k_bounds_outdegree(self, spark):
        from geospark.operators.similarity import knn_graph
        import random
        rng = random.Random(3)
        vecs = [[rng.uniform(-1, 1) for _ in range(8)]
                for _ in range(30)]
        out = knn_graph(self._emb(spark, vecs), k=3, dim=8,
                        n_bits=3, n_tables=2).collect()
        from collections import Counter
        deg = Counter(r.vec_id for r in out)
        assert deg and max(deg.values()) <= 3
        for r in out:
            assert r.vec_id != r.nbr_id

    def test_max_bucket_drops_degenerate(self, spark):
        """A degenerate bucket larger than max_bucket is dropped
        entirely rather than self-joined quadratically."""
        from geospark.operators.similarity import knn_graph
        vecs = [[1.0] * 8 for _ in range(12)]
        out = knn_graph(self._emb(spark, vecs), k=2, dim=8,
                        n_bits=4, n_tables=2, max_bucket=10)
        assert out.count() == 0

    def test_oracle_parity_small(self, spark):
        """Cross-engine hash parity on a real slice (the check_oracle
        protocol, inline)."""
        import duckdb
        from geospark.operators.similarity import knn_graph, \
            knn_graph_sql
        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        got = _rows(knn_graph(e, k=3),
                    ["vec_id", "nbr_id", "sim", "rank"])
        con = duckdb.connect()
        con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                    "'/root/testdata/sf0.001/embeddings.parquet'")
        want = sorted(tuple(r) for r in
                      con.execute(knn_graph_sql(3)).fetchall())
        assert [(a, b, round(s, 9), r) for a, b, s, r in got] == \
            [(a, b, round(s, 9), r) for a, b, s, r in want]


class TestPeakConcurrency:
    def _iv(self, spark, rows):
        return spark.createDataFrame(
            rows, "day long, start_us long, end_us long")

    def test_hand_sweep(self, spark):
        """Peak of overlapping spans; back-to-back half-open intervals
        (a ends at t, b starts at t) never double-count."""
        from geospark.operators.events import peak_concurrency
        iv = self._iv(spark, [
            (0, 0, 10), (0, 5, 15), (0, 8, 12),   # 3 live at [8,10)
            (0, 10, 20),                          # starts AS the 1st ends
            (1, 0, 5), (1, 5, 10),                # back-to-back: peak 1
            (2, 3, 3),                            # empty: excluded
            (2, 1, 4),
        ])
        got = _rows(peak_concurrency(iv, key_col="day",
                                     start_col="start_us",
                                     end_col="end_us"))
        assert got == [(0, 3, 4), (1, 1, 2), (2, 1, 1)]

    def test_simultaneous_starts_tie_group(self, spark):
        """Three intervals starting at the same instant count as 3
        (the RANGE tie-group step) — not 1, not order-dependent."""
        from geospark.operators.events import peak_concurrency
        iv = self._iv(spark, [(0, 5, 9), (0, 5, 8), (0, 5, 7)])
        got = _rows(peak_concurrency(iv, key_col="day",
                                     start_col="start_us",
                                     end_col="end_us"))
        assert got == [(0, 3, 3)]

    def test_matches_brute_force_random(self, spark):
        import random
        from geospark.operators.events import peak_concurrency
        rng = random.Random(11)
        rows = [(rng.randrange(3), s, s + rng.randrange(1, 30))
                for s in (rng.randrange(0, 100) for _ in range(120))]
        got = {r[0]: r[1] for r in _rows(
            peak_concurrency(self._iv(spark, rows), key_col="day",
                             start_col="start_us", end_col="end_us"),
            ["day", "peak"])}
        for day in (0, 1, 2):
            spans = [(s, e) for d, s, e in rows if d == day]
            want = max(sum(1 for s, e in spans if s <= t < e)
                       for t in range(0, 135))
            assert got[day] == want


class TestRobotsFilter:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, url string")

    def _rules(self, spark, rows):
        return spark.createDataFrame(
            rows, "host string, path_prefix string")

    def test_prefix_and_host_scoping(self, spark):
        """A rule blocks by PREFIX on its own host only; other hosts
        keep matching paths."""
        from geospark.operators.dedup import robots_filter
        docs = self._docs(spark, [
            (1, "http://a.com/page/1"),     # blocked: /page/1 on a.com
            (2, "http://a.com/page/10"),    # blocked: prefix semantics
            (3, "http://a.com/page/2"),     # kept
            (4, "http://b.com/page/1"),     # kept: rule is a.com-only
        ])
        rules = self._rules(spark, [("a.com", "/page/1")])
        got = _rows(robots_filter(docs, rules), ["doc_id"])
        assert got == [(3,), (4,)]

    def test_canonicalization_feeds_the_match(self, spark):
        """Mixed-case scheme/host variants canonicalize BEFORE the
        host/prefix match — the raw string never reaches the rules."""
        from geospark.operators.dedup import robots_filter
        docs = self._docs(spark, [
            (1, "HTTP://A.com/page/7"),
            (2, "https://www.a.com/page/7"),
            (3, "http://a.com/other"),
        ])
        rules = self._rules(spark, [("a.com", "/page/")])
        got = _rows(robots_filter(docs, rules), ["doc_id", "host"])
        assert got == [(3, "a.com")]

    def test_anti_join_is_broadcast_no_udf(self, spark):
        from geospark.operators.dedup import robots_filter
        docs = self._docs(spark, [(1, "http://a.com/x")])
        rules = self._rules(spark, [("a.com", "/y")])
        plan = (robots_filter(docs, rules)
                ._jdf.queryExecution().executedPlan().toString())
        assert "LeftAnti" in plan
        assert "Python" not in plan and "Cartesian" not in plan


class TestCellAnomalies:
    def _pts(self, spark, day_counts, lat=10.3, lon=20.7):
        """One fixed cell; day_counts[i] events on day i (us in-day)."""
        rows = [(float(lat), float(lon), d * 100 + j)
                for d, c in enumerate(day_counts) for j in range(c)]
        return spark.createDataFrame(
            rows, "lat double, lon double, us long")

    def test_hand_spike_and_threshold(self, spark):
        """Baseline [1,1,1,1,1,1,1] (s=7, q=7, var=0): any exceedance
        flags; a quiet day doesn't; output starts only at the first
        full-window day."""
        from geospark.operators.tiles import cell_anomalies
        # days 0-6 baseline of 1s; day 7 spike of 9; day 8 quiet 1
        out = cell_anomalies(self._pts(spark, [1] * 7 + [9, 1]),
                             2, window_days=7, k=3, day_us=100)
        rows = {r.day: r for r in out.collect()}
        assert sorted(rows) == [7, 8]          # full windows only
        assert rows[7].is_spike is True        # 9 > 1, var 0
        assert rows[7].base_sum == 7 and rows[7].base_sumsq == 7
        assert rows[8].is_spike is False       # 1 == mean

    def test_threshold_strictness(self, spark):
        """Sub-threshold deviation is NOT a spike, above-threshold is
        — decided by the integer algebra, not float rounding. The
        calendar is data-driven (lo = first day WITH events), so day 0
        is made non-empty. Baseline [2,0,2,0,2,0,0]: s=6, q=12, n=7;
        n*q-s^2=48. x=2: dev=8, 64 < k^2*48=192 -> no. Day 14 over
        baseline [2,0,0,0,0,0,0] (s=2, q=4, n*q-s^2=24): x=4, dev=26,
        676 > 96 -> yes."""
        from geospark.operators.tiles import cell_anomalies
        base = [2, 0, 2, 0, 2, 0, 0]
        out = cell_anomalies(self._pts(spark, base + [2, 0, 0, 0, 0, 0,
                                                      0, 4]),
                             2, window_days=7, k=2, day_us=100)
        rows = {r.day: r.is_spike for r in out.collect()}
        assert rows[7] is False
        assert rows[14] is True

    def test_zero_days_enter_baseline(self, spark):
        """Gap days count as 0 in the baseline — a sparse rollup
        would shrink the window and miss the spike."""
        from geospark.operators.tiles import cell_anomalies
        # one event on day 0, nothing on 1-6, burst on day 7
        out = cell_anomalies(self._pts(spark, [1, 0, 0, 0, 0, 0, 0, 5]),
                             2, window_days=7, k=2, day_us=100)
        r7 = [r for r in out.collect() if r.day == 7][0]
        assert r7.base_sum == 1 and r7.base_sumsq == 1
        assert r7.is_spike is True

    def test_single_exchange_no_join_after_fill(self, spark):
        """Both window sums ride ONE cell-keyed exchange; no
        self-join anywhere."""
        from geospark.operators.tiles import cell_anomalies
        plan = (cell_anomalies(self._pts(spark, [1] * 9), 2,
                               window_days=7, day_us=100)
                ._jdf.queryExecution().executedPlan().toString())
        # the only join is the dense-calendar left fill
        assert plan.count("SortMergeJoin") + plan.count(
            "BroadcastHashJoin") <= 1
        assert "Cartesian" not in plan


class TestReviewFixes:
    """Round-5.21 inline-review findings, each pinned by a test."""

    def test_knn_graph_rejects_overflowing_sign_bits(self, spark):
        """n_tables*n_bits > dim would silently fold past-the-end
        element_at NULLs to bit 0 (degenerate buckets, recall loss);
        the config is rejected up front instead."""
        import pytest
        from geospark.operators.similarity import knn_graph
        e = spark.createDataFrame([(0, [1.0] * 8)],
                                  "vec_id long, embedding array<float>")
        with pytest.raises(ValueError, match="sign bits exceed"):
            knn_graph(e, k=2, dim=8, n_bits=6, n_tables=4)

    def test_knn_graph_single_source_scan(self, spark):
        """The bucket table comes from ONE posexplode pass, not an
        n_tables-way union re-scanning the embeddings source."""
        from geospark.operators.similarity import knn_graph
        e = spark.createDataFrame(
            [(i, [float(i + j) for j in range(8)]) for i in range(4)],
            "vec_id long, embedding array<float>")
        plan = (knn_graph(e, k=2, dim=8, n_bits=4, n_tables=2)
                ._jdf.queryExecution().optimizedPlan().toString())
        assert "Union" not in plan

    def test_cell_anomalies_empty_input(self, spark):
        """A fully-filtered source yields an EMPTY result with the
        full schema, not a driver TypeError on the span collect."""
        from geospark.operators.tiles import cell_anomalies
        pts = spark.createDataFrame(
            [], "lat double, lon double, us long")
        out = cell_anomalies(pts, 2, window_days=7, day_us=100)
        assert out.columns == ["cell", "day", "n_events", "base_sum",
                               "base_sumsq", "is_spike"]
        assert out.count() == 0

    def test_rolling_and_anomaly_share_one_fill(self, spark):
        """The dense-fill prologue exists once (_dense_daily_counts);
        both calendar operators consume it — drift-proof by
        construction."""
        import inspect
        from geospark.operators import tiles
        src_roll = inspect.getsource(tiles.cell_rolling_counts)
        src_anom = inspect.getsource(tiles.cell_anomalies)
        assert "_dense_daily_counts(" in src_roll
        assert "_dense_daily_counts(" in src_anom
        assert "groupBy" not in src_roll  # the fill owns the agg
        assert "groupBy" not in src_anom
