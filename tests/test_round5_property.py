"""Property tests for the round-5 session operators: the dual-dialect
Hilbert generator, Hamilton apportionment invariants, and randomized
brute-force parity for the interval join and stay points (seeded — the
oracle gate pins cross-engine equality; these pin the MATH)."""

from __future__ import annotations

import random

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


class TestHilbertProperties:
    @settings(max_examples=50, deadline=None)
    @given(st.integers(1, 10))
    def test_bijective_on_full_grid(self, order):
        from geospark.functions.cells import hilbert_d_np
        n = 1 << order
        xs, ys = np.meshgrid(np.arange(n), np.arange(n))
        d = hilbert_d_np(xs.ravel(), ys.ravel(), order)
        assert sorted(d) == list(range(n * n))

    @settings(max_examples=20, deadline=None)
    @given(st.integers(2, 10), st.randoms(use_true_random=False))
    def test_unit_step_adjacency_sampled(self, order, rnd):
        """d and d+1 always map to grid neighbors — the locality
        property Morton lacks; sampled windows of the curve."""
        from geospark.functions.cells import hilbert_d_np
        n = 1 << order
        xs, ys = np.meshgrid(np.arange(n), np.arange(n))
        d = hilbert_d_np(xs.ravel(), ys.ravel(), order)
        pos = np.empty((n * n, 2), dtype=np.int64)
        pos[d] = np.stack([xs.ravel(), ys.ravel()], 1)
        start = rnd.randrange(0, n * n - 64) if n * n > 64 else 0
        seg = pos[start:start + 64]
        assert (np.abs(np.diff(seg, axis=0)).sum(1) == 1).all()

    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.tuples(
        st.floats(-90, 90, allow_nan=False),
        st.floats(-180, 180, allow_nan=False)), min_size=1,
        max_size=50))
    def test_duckdb_twin_matches_numpy(self, pts):
        import duckdb

        from geospark.functions.cells import hilbert_d_np, hilbert_sql
        con = duckdb.connect()
        con.execute("CREATE TABLE p (i INT, lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?, ?)",
                        [(i, la, lo) for i, (la, lo) in enumerate(pts)])
        got = [r[-1] for r in con.execute(
            hilbert_sql("lat", "lon", "SELECT * FROM p", order=8)
            + " ORDER BY i").fetchall()]
        n = 1 << 8
        lat = np.array([p[0] for p in pts])
        lon = np.array([p[1] for p in pts])
        x = np.clip(np.floor((lon + 180) / 360 * n), 0, n - 1)
        y = np.clip(np.floor((lat + 90) / 180 * n), 0, n - 1)
        ref = hilbert_d_np(x.astype("int64"), y.astype("int64"), 8)
        assert got == list(ref)


class TestApportionmentProperties:
    @settings(max_examples=100, deadline=None)
    @given(st.dictionaries(st.text("abcdef", min_size=1, max_size=4),
                           st.integers(1, 10 ** 9),
                           min_size=1, max_size=20),
           st.integers(0, 10 ** 6))
    def test_hamilton_invariants(self, weights, budget):
        """Pure-Python mirror of the SQL twin: exact sum, and every
        alloc is its floor quota or floor+1 (no other value is
        reachable under largest remainder)."""
        total = sum(weights.values())
        q = {k: (w * budget) // total for k, w in weights.items()}
        rem = {k: (w * budget) % total for k, w in weights.items()}
        leftover = budget - sum(q.values())
        order = sorted(weights, key=lambda k: (-rem[k], k))
        alloc = {k: q[k] + (1 if i < leftover else 0)
                 for i, k in enumerate(order)}
        assert sum(alloc.values()) == budget
        assert all(alloc[k] in (q[k], q[k] + 1) for k in weights)
        assert 0 <= leftover < max(len(weights), 1) + 1


class TestRandomizedSparkParity:
    def test_interval_join_matches_bruteforce(self, spark):
        from geospark.operators.events import interval_join
        rnd = random.Random(42)
        events = [(i, rnd.randrange(0, 1000)) for i in range(120)]
        ivs = []
        for j in range(40):
            s = rnd.randrange(-50, 1000)
            ivs.append((j, s, s + rnd.randrange(0, 120)))
        want = sorted((e, j) for e, t in events for j, s, x in ivs
                      if s <= t < x)
        e = spark.createDataFrame(events, ["event_id", "us"])
        iv = spark.createDataFrame(ivs, ["iv_id", "start_us", "end_us"])
        got = sorted((r["event_id"], r["iv_id"]) for r in
                     interval_join(e, iv, bucket_us=64).collect())
        assert got == want

    def test_stay_points_matches_bruteforce(self, spark):
        from geospark.functions.cells import encode_np
        from geospark.operators.events import stay_points
        rnd = random.Random(7)
        rows = []
        for u in range(8):
            for i in range(40):
                rows.append((u, i,
                             rnd.uniform(-89, 89), rnd.uniform(-179, 179),
                             i * 10 + rnd.randrange(0, 5)))
        # brute force: walk each user's ordered events, split on cell
        # change, apply thresholds
        want = set()
        for u in range(8):
            evs = sorted([r for r in rows if r[0] == u],
                         key=lambda r: (r[4], r[1]))
            seg = []
            for r in evs:
                c = int(encode_np(np.array([r[2]]), np.array([r[3]]),
                                  1)[0])
                if seg and seg[-1][0] != c:
                    want |= self._emit(u, seg)
                    seg = []
                seg.append((c, r[4]))
            want |= self._emit(u, seg)
        df = spark.createDataFrame(
            rows, ["user_id", "event_id", "lat", "lon", "us"])
        got = {(r["user_id"], r["cell"], r["n_events"],
                r["start_us"], r["end_us"])
               for r in stay_points(df, 1, min_dwell_us=20,
                                    min_events=2).collect()}
        assert got == want

    @staticmethod
    def _emit(u, seg, min_dwell=20, min_events=2):
        if not seg:
            return set()
        us = [t for _, t in seg]
        if len(seg) >= min_events and max(us) - min(us) >= min_dwell:
            return {(u, seg[0][0], len(seg), min(us), max(us))}
        return set()
