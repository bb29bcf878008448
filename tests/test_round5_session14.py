"""Round-5 session-14 operator tests: KMV bottom-k distinct sketch
(and the rest of the session-14 wave as it lands)."""

from __future__ import annotations

import hashlib


def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# KMV (bottom-k / theta) distinct sketch
# ---------------------------------------------------------------------------

class TestKMVDistinct:
    def _run(self, spark, rows, k):
        from geospark.operators.sketch import kmv_distinct
        d = spark.createDataFrame(rows, "g string, k string")
        return {r[0]: r[1:] for r in _rows(
            kmv_distinct(d, "k", "g", k=k),
            ["g", "n_exact", "theta", "n_kmv", "err_ppm"])}

    def test_small_group_reports_exactly(self, spark):
        """n_exact <= k: the sketch IS the distinct set — estimate
        equals the exact count, err_ppm = 0, theta = max kept hash,
        and duplicates do not inflate the count."""
        got = self._run(spark, [("a", "x"), ("a", "y"), ("a", "x")],
                        k=4)
        theta = max(_h60("x"), _h60("y"))
        assert got["a"] == (2, theta, 2, 0)
        assert got["_ALL_"] == (2, theta, 2, 0)

    def test_estimator_path_known_hashes(self, spark):
        """n_exact > k: n_kmv = (k-1) * 2^60 div theta with theta the
        k-th smallest distinct hash — checked against a from-scratch
        Python replica of the same md5-prefix arithmetic."""
        keys = [f"key{i}" for i in range(20)]
        got = self._run(spark, [("a", s) for s in keys], k=4)
        hs = sorted(_h60(s) for s in keys)
        theta = hs[3]
        est = (3 * (1 << 60)) // theta
        err = (est - 20) * 1_000_000
        err = (1 if err >= 0 else -1) * (abs(err) // 20)
        assert got["a"] == (20, theta, est, err)

    def test_union_row_dedups_across_groups(self, spark):
        """'_ALL_' is the union sketch: a key present in two groups
        counts once — n_exact(_ALL_) < sum of group n_exacts."""
        got = self._run(spark, [("a", "x"), ("a", "y"),
                                ("b", "x"), ("b", "z")], k=8)
        assert got["a"][0] == 2 and got["b"][0] == 2
        assert got["_ALL_"][0] == 3

    def test_union_theta_is_bottom_k_of_merge(self, spark):
        """With k smaller than the union cardinality, the union
        theta is the k-th smallest over ALL distinct hashes — the
        mergeability property (bottom-k of union == bottom-k of
        merged bottom-ks)."""
        rows = ([("a", f"a{i}") for i in range(6)]
                + [("b", f"b{i}") for i in range(6)])
        got = self._run(spark, rows, k=4)
        hs = sorted(_h60(s) for s in
                    [f"a{i}" for i in range(6)]
                    + [f"b{i}" for i in range(6)])
        assert got["_ALL_"][1] == hs[3]
        assert got["_ALL_"][0] == 12

    def test_null_keys_excluded(self, spark):
        """NULL keys hash to NULL and leave the population."""
        got = self._run(spark, [("a", "x"), ("a", None)], k=4)
        assert got["a"][0] == 1

    def test_catalog_query_shapes(self, spark):
        """kmv_reach at sf0.001: one row per event_type plus the
        union row; exact >= any single type's reach; all estimates
        positive."""
        from geospark.queries import QUERIES
        out = _rows(QUERIES["kmv_reach"](spark, "/root/testdata/sf0.001"))
        groups = {r[0] for r in out}
        assert "_ALL_" in groups and len(groups) >= 2
        alln = {r[0]: r[1] for r in out}
        assert alln["_ALL_"] == max(
            alln.values())  # union reach dominates
        assert all(r[3] > 0 for r in out)


# ---------------------------------------------------------------------------
# Week-over-week per-cell audience churn
# ---------------------------------------------------------------------------

WEEK = 7 * 86_400 * 1_000_000


class TestCellChurn:
    def _run(self, spark, rows, res=2):
        from geospark.operators.events import cell_churn
        d = spark.createDataFrame(
            rows, "user_id long, lat double, lon double, us long")
        return _rows(cell_churn(d, res),
                     ["cell", "period", "n_prev", "n_curr",
                      "n_common", "jaccard_ppm"])

    def test_known_overlap(self, spark):
        """Week 0 audience {1,2,3}, week 1 audience {2,3,4} in one
        cell: n_common=2, union=4 -> 500000 ppm."""
        rows = ([(u, 10.0, 10.0, 100) for u in (1, 2, 3)]
                + [(u, 10.0, 10.0, WEEK + 100) for u in (2, 3, 4)])
        got = self._run(spark, rows)
        assert len(got) == 1
        assert got[0][1:] == (1, 3, 3, 2, 500_000)

    def test_duplicate_visits_count_once(self, spark):
        """A user visiting the same cell twice in a week is one
        audience member."""
        rows = [(1, 10.0, 10.0, 0), (1, 10.0, 10.0, 5),
                (1, 10.0, 10.0, WEEK + 1)]
        got = self._run(spark, rows)
        assert got[0][2:] == (1, 1, 1, 1_000_000)

    def test_disjoint_audiences_zero_jaccard(self, spark):
        """Total turnover: overlap-free week pair reports 0, not a
        dropped row."""
        rows = [(1, 10.0, 10.0, 0), (2, 10.0, 10.0, WEEK + 1)]
        got = self._run(spark, rows)
        assert got[0][2:] == (1, 1, 0, 0)

    def test_gap_weeks_produce_no_row(self, spark):
        """A cell occupied in weeks 0 and 2 only has no consecutive
        pair — no row (the join is the existence test)."""
        rows = [(1, 10.0, 10.0, 0), (1, 10.0, 10.0, 2 * WEEK + 1)]
        assert self._run(spark, rows) == []

    def test_cells_independent(self, spark):
        """Users in different cells never cross-count."""
        rows = [(1, 10.0, 10.0, 0), (1, -10.0, -10.0, WEEK + 1)]
        assert self._run(spark, rows) == []


# ---------------------------------------------------------------------------
# Focal majority (mode) filter
# ---------------------------------------------------------------------------

class TestFocalMode:
    def _run(self, spark, rows, res=3):
        from geospark.operators.tiles import focal_mode
        d = spark.createDataFrame(rows, "lat double, lon double, "
                                        "label string")
        return _rows(focal_mode(d, res),
                     ["cell", "mode_label", "n_mode", "n_total",
                      "share_ppm"])

    def test_isolated_cell_keeps_own_label(self, spark):
        """A lone occupied cell's neighborhood is itself."""
        got = self._run(spark, [(0.0, 0.0, "a"), (0.0, 0.0, "a"),
                                (0.0, 0.0, "b")])
        assert len(got) == 1
        assert got[0][1:] == ("a", 2, 3, 666_666)

    def test_neighbor_majority_overrides(self, spark):
        """A single-point 'b' cell surrounded by a heavy adjacent
        'a' cell flips to 'a' (the denoising behavior); the heavy
        cell stays 'a'."""
        # res 3 grid: lat cell height 22.5 deg, lon width 45 deg.
        rows = ([(1.0, 1.0, "a")] * 5
                + [(1.0, 46.0, "b")])  # adjacent cell in x
        got = self._run(spark, rows)
        assert {(r[1]) for r in got} == {"a"}
        by_n = sorted(r[2:4] for r in got)
        assert by_n == [(5, 6), (5, 6)]

    def test_tie_breaks_to_smallest_label(self, spark):
        """Equal mass -> lexicographically smallest label wins."""
        got = self._run(spark, [(0.0, 0.0, "b"), (0.0, 0.0, "a")])
        assert got[0][1:] == ("a", 1, 2, 500_000)

    def test_unoccupied_cells_not_support(self, spark):
        """Cells two steps apart don't interact and no empty cell
        between them emits a row."""
        rows = [(1.0, 1.0, "a"), (1.0, 91.0, "b")]
        got = self._run(spark, rows)
        assert len(got) == 2
        assert {r[1] for r in got} == {"a", "b"}
        assert all(r[2:] == (1, 1, 1_000_000) for r in got)

    def test_longitude_wrap(self, spark):
        """x = 0 and x = 2^res - 1 are adjacent: mass across the
        antimeridian flips the lone west-edge point."""
        rows = [(1.0, -179.0, "b")] + [(1.0, 179.0, "a")] * 3
        got = self._run(spark, rows)
        assert {r[1] for r in got} == {"a"}
        assert all(r[3] == 4 for r in got)


# ---------------------------------------------------------------------------
# Integer-exact dyadic EWMA control chart
# ---------------------------------------------------------------------------

DAY = 86_400_000_000


class TestCellEwma:
    def _run(self, spark, xs, res=2, min_x=5):
        """xs: per-day counts for one cell starting day 0 (0 = gap
        day, realized by simply not emitting points)."""
        from geospark.operators.tiles import cell_ewma
        rows = [(10.0, 10.0, d * DAY + j)
                for d, n in enumerate(xs) for j in range(n)]
        d = spark.createDataFrame(rows,
                                  "lat double, lon double, us long")
        out = cell_ewma(d, res, min_x=min_x)
        return [r[2:] for r in _rows(out, ["cell", "day", "x",
                                           "ewma", "spike"])]

    def test_recurrence_matches_rational_replica(self, spark):
        """ewma_t = floor of the exact rational s_t = (s_{t-1}+x_t)/2
        with s_1 = x_1 — checked against a Fraction replica,
        including zero-filled gap days."""
        from fractions import Fraction
        xs = [8, 0, 4, 16, 1]  # day 1 (index) is a gap day
        got = self._run(spark, xs)
        s = Fraction(xs[0])
        exp = [(xs[0], xs[0])]
        for x in xs[1:]:
            s = (s + x) / 2
            exp.append((x, int(s)))
        assert [(r[0], r[1]) for r in got] == exp

    def test_first_day_never_spikes(self, spark):
        got = self._run(spark, [100])
        assert got == [(100, 100, 0)]

    def test_doubling_spike_fires_exactly_at_threshold(self, spark):
        """Baseline s_1 = 4; day 2 count 8 == 2*s exactly -> spike
        (>=); count 7 -> no spike."""
        assert self._run(spark, [4, 8])[1][2] == 1
        assert self._run(spark, [4, 7])[1][2] == 0

    def test_min_x_floor_suppresses_tiny_spikes(self, spark):
        """1 -> 4 quadruples but stays under min_x=5: no alert."""
        assert self._run(spark, [1, 4])[1][2] == 0
        assert self._run(spark, [1, 5])[1][2] == 1

    def test_gap_days_decay_the_baseline(self, spark):
        """After two zero days the baseline has quartered: 8 -> s=8,
        gaps -> s=2, then 4 >= 2*2 spikes."""
        got = self._run(spark, [8, 0, 0, 4], min_x=1)
        assert got[2][1] == 2  # ewma after two gap days
        assert got[3][2] == 1


# ---------------------------------------------------------------------------
# Per-cell L1 median center
# ---------------------------------------------------------------------------

class TestMedianCenter:
    def _run(self, spark, rows, res=2):
        from geospark.operators.tiles import median_center
        d = spark.createDataFrame(rows, "lat double, lon double")
        return _rows(median_center(d, res),
                     ["cell", "n_pts", "med_lat_udeg",
                      "med_lon_udeg", "tad_udeg"])

    def test_odd_count_exact_median_and_tad(self, spark):
        """lats 1,2,10 / lons 3,4,5 (one cell): med = (2e6, 4e6);
        TAD = (1+0+8 + 1+0+1) * 1e6."""
        rows = [(1.0, 3.0), (2.0, 4.0), (10.0, 5.0)]
        got = self._run(spark, rows)
        assert got == [(got[0][0], 3, 2_000_000, 4_000_000,
                        11_000_000)]

    def test_even_count_lower_median(self, spark):
        """n=4: the (n+1) div 2 = 2nd smallest — the LOWER median."""
        rows = [(1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 4.0)]
        got = self._run(spark, rows)
        assert got[0][2:4] == (2_000_000, 2_000_000)

    def test_coordinates_median_independently(self, spark):
        """The L1 center medians lat and lon separately: it need not
        coincide with any input point."""
        rows = [(1.0, 9.0), (2.0, 8.0), (3.0, 7.0)]
        got = self._run(spark, rows)
        assert got[0][2:4] == (2_000_000, 8_000_000)

    def test_robust_against_outlier_vs_mean(self, spark):
        """One far outlier moves the mean, not the median."""
        rows = [(1.0, 1.0), (1.1, 1.0), (1.2, 1.0), (20.0, 1.0)]
        got = self._run(spark, rows)
        assert got[0][2] == 1_100_000

    def test_negative_coords_floor_not_trunc(self, spark):
        """floor(-1.5e6) = -1500000 on both engines (not trunc):
        single point reads back its own floored microdegrees."""
        got = self._run(spark, [(-1.5, -2.5)])
        assert got[0][2:] == (-1_500_000, -2_500_000, 0)


# ---------------------------------------------------------------------------
# Radiation-model OD flow prediction
# ---------------------------------------------------------------------------

class TestRadiationFlows:
    def _run(self, spark, rows, res=3):
        """rows: (user_id, event_id, lat, lon, us)."""
        from geospark.operators.events import radiation_flows
        d = spark.createDataFrame(
            rows, "user_id long, event_id long, lat double, "
                  "lon double, us long")
        return _rows(radiation_flows(d, res),
                     ["o_cell", "d_cell", "n_trips", "m_o", "m_d",
                      "s_mass", "p_ppm", "t_pred"])

    def test_two_cell_world_no_interveners(self, spark):
        """One user, one trip A->B, nothing between: s = 0 and
        p = m_o*m_d / (m_o * (m_o+m_d)). Masses: A has 1 event,
        B has 1 -> p = 1/(1*2) = 500000 ppm, t_pred = 0 (floor of
        1 * 0.5)."""
        rows = [(1, 1, 1.0, 1.0, 0), (1, 2, 1.0, 50.0, 10)]
        got = self._run(spark, rows)
        assert len(got) == 1
        assert got[0][2:] == (1, 1, 1, 0, 500_000, 0)

    def test_intervening_mass_absorbs(self, spark):
        """A heavy cell strictly between origin and destination
        enters s and shrinks p: with m_o=1, m_d=1, s=10 the
        radiation null gives 1/(11*12) ppm."""
        rows = [(1, 1, 1.0, 1.0, 0), (1, 2, 1.0, 91.0, 10)]
        # 10 events one x-step from origin (strictly inside d_ij=2)
        rows += [(9, 100 + j, 1.0, 46.0, 10**6 + j)
                 for j in range(10)]
        got = self._run(spark, rows)
        trip = [r for r in got if r[2] == 1 and r[4] == 1][0]
        assert trip[5] == 10
        assert trip[6] == 1_000_000 * 1 * 1 // (11 * 12)

    def test_destination_mass_not_in_s(self, spark):
        """The destination's own mass is excluded from s even when
        geometrically inside the circle (it can't be: d < d is
        false) and the origin's is excluded by key."""
        rows = [(1, 1, 1.0, 1.0, 0), (1, 2, 1.0, 50.0, 10),
                (2, 3, 1.0, 50.0, 20), (2, 4, 1.0, 1.0, 30)]
        got = self._run(spark, rows)
        assert all(r[5] == 0 for r in got)

    def test_t_pred_scales_with_outflow(self, spark):
        """Three users making the same A->B trip: t_out = 3,
        t_pred = floor(3 * p)."""
        rows = []
        for u in range(1, 4):
            rows += [(u, 10 * u, 1.0, 1.0, u * 100),
                     (u, 10 * u + 1, 1.0, 50.0, u * 100 + 1)]
        got = self._run(spark, rows)
        assert len(got) == 1
        r = got[0]
        # m_o = m_d = 3, s = 0: p = 9/(3*6) = 0.5
        assert r[2] == 3 and r[6] == 500_000 and r[7] == 1

    def test_stationary_days_excluded(self, spark):
        """A same-cell day creates no corridor row."""
        rows = [(1, 1, 1.0, 1.0, 0), (1, 2, 1.0, 1.0, 10)]
        assert self._run(spark, rows) == []


# ---------------------------------------------------------------------------
# Smallest enclosing cell (extent covering key)
# ---------------------------------------------------------------------------

class TestEnclosingCell:
    def _run(self, spark, boxes, res=8):
        from geospark.functions.cells import enclosing_cell_exprs
        d = spark.createDataFrame(boxes, "xmin double, ymin double, "
                                         "xmax double, ymax double")
        return _rows(d.selectExpr(*enclosing_cell_exprs(
            "xmin", "ymin", "xmax", "ymax", res)),
            ["enc_res", "enc_cell", "nx", "ny"])

    @staticmethod
    def _np_key(xmin, ymin, xmax, ymax, res=8):
        """Independent replica: corner indices + common ancestor."""
        n = 1 << res
        def ix(v, lo, span):
            return min(n - 1, max(0, int(((v + lo) / span) * n) if ((v + lo) / span * n) >= 0 else -1))
        import math
        def idx(v, shift, span):
            return min(n - 1, max(0, math.floor((v + shift) / span * n)))
        x1, x2 = idx(xmin, 180, 360), idx(xmax, 180, 360)
        y1, y2 = idx(ymin, 90, 180), idx(ymax, 90, 180)
        s = max((x1 ^ x2).bit_length(), (y1 ^ y2).bit_length())
        r = res - s
        cell = (r << 56) | ((y1 >> s) << r) | (x1 >> s)
        return r, cell, x2 - x1 + 1, y2 - y1 + 1

    def test_degenerate_box_is_its_own_cell(self, spark):
        """Corners in one res-cell -> enc_res == res, spans 1."""
        got = self._run(spark, [(10.0, 10.0, 10.1, 10.1)])
        assert got[0] == self._np_key(10.0, 10.0, 10.1, 10.1)
        assert got[0][0] == 8 and got[0][2:] == (1, 1)

    def test_worst_case_center_straddle(self, spark):
        """A tiny box straddling the equator/prime-meridian center
        has NO common ancestor below the root: enc_res = 0."""
        got = self._run(spark, [(-0.1, -0.1, 0.1, 0.1)])
        assert got[0][0] == 0
        assert got[0][1] == 0  # root cell id: res 0, y 0, x 0

    def test_parent_alignment_levels(self, spark):
        """Boxes sized to span 2 cells at res 8 land at enc_res 7
        when aligned, lower when straddling a coarser boundary."""
        # one res-8 x-cell is 360/256 = 1.40625 deg wide
        w = 360.0 / 256
        got = self._run(spark, [(0.0, 10.0, 0.0 + 1.5 * w, 10.1)])
        exp = self._np_key(0.0, 10.0, 0.0 + 1.5 * w, 10.1)
        assert got[0] == exp

    def test_matches_replica_on_grid_sweep(self, spark):
        """Replica parity over a deterministic sweep of mixed sizes
        and positions (97 boxes)."""
        boxes = []
        for i in range(97):
            x = -170.0 + (i * 3.57) % 340
            y = -80.0 + (i * 7.13) % 160
            w = 0.05 + (i % 7) * 1.3
            h = 0.05 + (i % 5) * 0.9
            boxes.append((x, y, x + w, y + h))
        got = self._run(spark, boxes)
        exp = sorted(self._np_key(*b) for b in boxes)
        assert got == exp

    def test_containment_invariant(self, spark):
        """The enc cell really contains the box: re-encoding both
        corners at enc_res yields enc_cell (checked via replica
        arithmetic on the sweep)."""
        import math
        boxes = [(-12.3, 4.5, -11.0, 6.7), (100.0, -45.0, 103.0, -44.0)]
        got = self._run(spark, boxes)
        assert got == sorted(self._np_key(*b) for b in boxes)
        for b in boxes:
            r, cell, nx, ny = self._np_key(*b)
            n = 1 << r
            for (vx, vy) in ((b[0], b[1]), (b[2], b[3])):
                xi = min(n - 1, max(0, math.floor((vx + 180) / 360 * n)))
                yi = min(n - 1, max(0, math.floor((vy + 90) / 180 * n)))
                assert (r << 56) | (yi << r) | xi == cell


# ---------------------------------------------------------------------------
# Streaming EWMA control chart (stateful twin of cell_ewma)
# ---------------------------------------------------------------------------

class TestStreamCellEwma:
    def test_matches_batch_across_microbatches(self, spark, tmp_path):
        """Chunked replay through the per-cell dyadic state equals
        batch cell_ewma restricted to closed days (day < the cell's
        last observed day) — gap days spanning the FILE BOUNDARY
        close from state, and a cell first seen mid-stream
        back-fills its zero days from lo_day."""
        import datetime as dt

        from pyspark.sql import functions as F

        from geospark.functions.cells import cell_encode
        from geospark.operators.tiles import cell_ewma
        from geospark.streaming.stream import stream_cell_ewma
        base = dt.datetime(2024, 1, 1)

        def at(day, sec):
            return base + dt.timedelta(days=day, seconds=sec)

        rows = []
        eid = 0
        # cell A (lat 10): days 0(x2), 1(x6 -> spike), 3(x1), 5
        for day, n in ((0, 2), (1, 6), (3, 1)):
            for j in range(n):
                rows.append((eid, at(day, j), 1, 10.0, 10.0))
                eid += 1
        # --- file boundary inside cell A's day-3..5 gap ---
        tail = [(eid, at(5, 0), 1, 10.0, 10.0)]
        eid += 1
        # cell B (lat -40): first seen day 2 -> backfill days 0,1
        tail += [(eid, at(2, 0), 2, -40.0, -40.0),
                 (eid + 1, at(4, 0), 2, -40.0, -40.0)]
        schema = ("event_id long, ts timestamp_ntz, user_id long, "
                  "lat double, lon double")
        src = str(tmp_path / "ew_src")
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(src)
        spark.createDataFrame(tail, schema).coalesce(1) \
            .write.mode("append").parquet(src)

        sdf = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
        out = stream_cell_ewma(sdf.select(
            cell_encode("lat", "lon", 4).alias("cell"),
            F.expr("timestampdiff(MICROSECOND, "
                   "TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)")
            .alias("us")), min_x=5)
        q = (out.writeStream.format("memory")
             .queryName("ew_stream").outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        got = _rows(spark.sql(
            "SELECT cell, day, x, ewma, spike FROM ew_stream"))

        e = spark.read.parquet(src)
        pts = e.select("lat", "lon",
                       F.expr("timestampdiff(MICROSECOND, "
                              "TIMESTAMP_NTZ '2024-01-01 "
                              "00:00:00', ts)").alias("us"))
        batch = cell_ewma(pts, 4, min_x=5)
        mx = (pts.select(cell_encode("lat", "lon", 4).alias("cell"),
                         F.expr("us div 86400000000").alias("day"))
              .groupBy("cell").agg(F.max("day").alias("mx")))
        exp = _rows(batch.join(mx, "cell")
                    .filter("day < mx")
                    .select("cell", "day", "x", "ewma", "spike"))
        assert got == exp
        # the day-1 sextuple doubles the baseline: spike row present
        assert any(r[2] == 6 and r[4] == 1 for r in got)
        # cell B's backfilled zero days made it into the output
        assert sum(1 for r in got if r[2] == 0) >= 3

    def test_open_day_emits_nothing(self, spark, tmp_path):
        """A cell with all events on one day has no closed day: the
        stream emits zero rows while batch would emit the day."""
        import datetime as dt
        from pyspark.sql import functions as F
        from geospark.functions.cells import cell_encode
        from geospark.streaming.stream import stream_cell_ewma
        base = dt.datetime(2024, 1, 1)
        rows = [(0, base, 1, 10.0, 10.0),
                (1, base + dt.timedelta(seconds=9), 1, 10.0, 10.0)]
        schema = ("event_id long, ts timestamp_ntz, user_id long, "
                  "lat double, lon double")
        src = str(tmp_path / "ew1_src")
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(src)
        sdf = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
        out = stream_cell_ewma(sdf.select(
            cell_encode("lat", "lon", 4).alias("cell"),
            F.expr("timestampdiff(MICROSECOND, "
                   "TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)")
            .alias("us")))
        q = (out.writeStream.format("memory")
             .queryName("ew1_stream").outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck1"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        assert spark.sql("SELECT * FROM ew1_stream").count() == 0


# ---------------------------------------------------------------------------
# Simplified silhouette over kmeans_cells
# ---------------------------------------------------------------------------

class TestKmeansSilhouette:
    def _run(self, spark, rows, k, iters=2, res=4):
        from geospark.operators.cluster import kmeans_silhouette
        d = spark.createDataFrame(rows, "lat double, lon double")
        return _rows(kmeans_silhouette(d, res, k, iters),
                     ["cid", "n_cells", "n_pts", "sil_ppm"])

    def test_two_tight_far_clusters_score_high(self, spark):
        """Two compact blobs far apart: every cell's own center is
        near and the other far -> sil near 1e6, overall row too."""
        rows = ([(0.0 + i, -170.0) for i in range(3)]
                + [(0.0 + i, 170.0) for i in range(3)])
        got = self._run(spark, rows, k=2)
        assert len(got) == 3  # 2 clusters + overall
        overall = [r for r in got if r[0] == -1][0]
        assert overall[3] > 800_000
        assert all(r[3] > 800_000 for r in got)

    def test_single_cluster_reads_zero(self, spark):
        """k seeds collapsing to one cluster: b is NULL -> 0 (the
        degeneracy guard, not a crash)."""
        got = self._run(spark, [(10.0, 10.0), (10.0, 10.0)], k=1)
        assert all(r[3] == 0 for r in got)

    def test_weighted_rollup_and_counts(self, spark):
        """n_pts weights the rollup; the overall row sums both
        clusters' cells and points."""
        rows = ([(0.0, -170.0)] * 5 + [(0.0, 170.0)] * 7)
        got = self._run(spark, rows, k=2)
        overall = [r for r in got if r[0] == -1][0]
        assert overall[1] == 2 and overall[2] == 12

    def test_straddle_cell_scores_negative_or_low(self, spark):
        """A lone cell equidistant-ish between two heavy centers
        drags its cluster's silhouette below the tight cluster's."""
        rows = ([(0.0, -170.0)] * 6 + [(0.0, 170.0)] * 6
                + [(0.0, 0.0)])
        got = self._run(spark, rows, k=2)
        per = {r[0]: r[3] for r in got if r[0] != -1}
        assert min(per.values()) < max(per.values())


# ---------------------------------------------------------------------------
# Bounded DTW trajectory pairs
# ---------------------------------------------------------------------------

def _dtw_ref(a, b):
    """Classic O(L^2) DTW replica on (x, y) int sequences."""
    L = len(a)
    INF = float("inf")
    dp = [[INF] * (L + 1) for _ in range(L + 1)]
    dp[0][0] = 0
    for i in range(1, L + 1):
        for j in range(1, L + 1):
            d = ((a[i - 1][0] - b[j - 1][0]) ** 2
                 + (a[i - 1][1] - b[j - 1][1]) ** 2)
            dp[i][j] = d + min(dp[i - 1][j], dp[i][j - 1],
                               dp[i - 1][j - 1])
    return dp[L][L]


class TestDtwPairs:
    def _run(self, spark, rows, L=4):
        from geospark.operators.events import dtw_pairs
        d = spark.createDataFrame(
            rows, "user_id long, event_id long, lat double, "
                  "lon double, us long")
        return _rows(dtw_pairs(d, L=L),
                     ["user_a", "user_b", "block", "dtw"])

    @staticmethod
    def _traj(uid, coords, t0=0):
        return [(uid, 10 * uid + i, la, lo, t0 + i)
                for i, (la, lo) in enumerate(coords)]

    def test_matches_python_dp_replica(self, spark):
        """Engine DP == classic-replica DP on irregular sequences."""
        ca = [(1.0, 1.0), (2.0, 3.0), (5.0, 2.0), (4.0, 8.0)]
        cb = [(1.5, 1.0), (2.0, 2.5), (6.0, 2.0), (3.0, 7.0)]
        got = self._run(spark, self._traj(1, ca) + self._traj(2, cb))
        ia = [(int(lo * 100), int(la * 100)) for la, lo in ca]
        ib = [(int(lo * 100), int(la * 100)) for la, lo in cb]
        assert len(got) == 1
        assert got[0][3] == _dtw_ref(ia, ib)

    def test_time_shifted_loop_scores_zero(self, spark):
        """The DTW point: the same loop traversed at half speed
        (doubled points) aligns with cost 0 against itself; here —
        same 4 positions with a stutter pattern still hits every
        matching coordinate -> cost 0."""
        ca = [(1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 4.0)]
        cb = [(1.0, 1.0), (1.0, 1.0), (3.0, 3.0), (4.0, 4.0)]
        # warp: b's duplicate (1,1) aligns to a's single (1,1); but
        # a's (2,2) must align somewhere -> nonzero. Use exact-equal
        # sequences for the zero case:
        got = self._run(spark, self._traj(1, ca) + self._traj(2, ca))
        assert got[0][3] == 0
        got2 = self._run(spark, self._traj(1, ca) + self._traj(2, cb))
        assert got2[0][3] == _dtw_ref(
            [(int(lo * 100), int(la * 100)) for la, lo in ca],
            [(int(lo * 100), int(la * 100)) for la, lo in cb])

    def test_short_users_dropped(self, spark):
        """A user with fewer than L events forms no pairs."""
        ca = [(1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 4.0)]
        rows = self._traj(1, ca) + self._traj(2, ca[:3])
        assert self._run(spark, rows) == []

    def test_blocks_gate_pairs(self, spark):
        """Users whose FIRST events sit in different res-1 cells
        never pair, however similar their tails."""
        ca = [(10.0, 10.0)] + [(1.0, 1.0)] * 3
        cb = [(10.0, -170.0)] + [(1.0, 1.0)] * 3
        rows = self._traj(1, ca) + self._traj(2, cb)
        assert self._run(spark, rows) == []

    def test_order_sensitivity_vs_jaccard(self, spark):
        """Reversed visits: identical place sets (Jaccard 1) but a
        strictly positive DTW — the discriminator traj_similarity
        lacks."""
        ca = [(1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 4.0)]
        cb = list(reversed(ca))
        # same first-event block required: prepend a shared anchor
        ca2 = [(0.0, 0.0)] + ca[:3]
        cb2 = [(0.0, 0.0)] + cb[:3]
        rows = self._traj(1, ca2) + self._traj(2, cb2)
        got = self._run(spark, rows)
        assert len(got) == 1 and got[0][3] > 0


# ---------------------------------------------------------------------------
# Per-host URL tree fanout
# ---------------------------------------------------------------------------

class TestUrlTree:
    def _run(self, spark, urls):
        from geospark.operators.dedup import url_tree
        d = spark.createDataFrame([(u,) for u in urls], "url string")
        return _rows(url_tree(d),
                     ["host", "depth", "n_nodes", "n_urls",
                      "branch_ppm"])

    def test_known_tree(self, spark):
        """a.com: /x/1, /x/2, /y -> depth1 {x,y} (1 URL ends), depth2
        {x/1, x/2} (2 end); branch 2e6/2 = 1e6; leaf level NULL."""
        got = self._run(spark, ["http://a.com/x/1", "http://a.com/x/2",
                                "http://a.com/y"])
        assert got == [("a.com", 1, 2, 1, 1_000_000),
                       ("a.com", 2, 2, 2, None)]

    def test_hosts_independent_and_lowercased(self, spark):
        got = self._run(spark, ["http://B.com/x", "https://b.COM/y"])
        assert got == [("b.com", 1, 2, 2, None)]

    def test_empty_segments_collapse(self, spark):
        """Double slashes and trailing slash mint no phantom nodes;
        query/fragment never enter the path."""
        got = self._run(spark, ["http://a.com//x//1/?q=2#f"])
        assert got == [("a.com", 1, 1, 0, 1_000_000),
                       ("a.com", 2, 1, 1, None)]

    def test_root_only_urls_dropped(self, spark):
        """A bare host has no path nodes — no rows, no crash."""
        assert self._run(spark, ["http://a.com/", "http://a.com"]) == []

    def test_shared_prefixes_count_once(self, spark):
        """Ten URLs under one directory: depth-1 n_nodes stays 1."""
        got = self._run(spark, [f"http://a.com/d/{i}" for i in
                                range(10)])
        assert got[0][2] == 1 and got[1][2:4] == (10, 10)


# ---------------------------------------------------------------------------
# Pairwise KMV overlap
# ---------------------------------------------------------------------------

class TestKMVOverlap:
    def _run(self, spark, rows, k=4):
        from geospark.operators.sketch import kmv_overlap
        d = spark.createDataFrame(rows, "g string, k string")
        return {(r[0], r[1]): r[2:] for r in _rows(
            kmv_overlap(d, "k", "g", k=k),
            ["g_a", "g_b", "n_a", "n_b", "inter_exact", "inter_kmv",
             "jacc_ppm", "jacc_kmv_ppm"])}

    def test_exhaustive_sketches_are_exact(self, spark):
        """Both groups under k: estimates equal exact everywhere."""
        rows = [("a", "x"), ("a", "y"), ("b", "y"), ("b", "z")]
        got = self._run(spark, rows, k=8)
        assert got[("a", "b")] == (2, 2, 1, 1, 333_333, 333_333)

    def test_disjoint_groups(self, spark):
        rows = [("a", "x"), ("b", "z")]
        got = self._run(spark, rows, k=8)
        assert got[("a", "b")] == (1, 1, 0, 0, 0, 0)

    def test_identical_groups_full_jaccard(self, spark):
        rows = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")]
        got = self._run(spark, rows, k=8)
        assert got[("a", "b")][2:] == (2, 2, 1_000_000, 1_000_000)

    def test_estimator_clamps_at_zero(self, spark):
        """Past-k disjoint groups can estimate a negative
        intersection before the clamp — inter_kmv >= 0 always."""
        rows = ([("a", f"a{i}") for i in range(12)]
                + [("b", f"b{i}") for i in range(12)])
        got = self._run(spark, rows, k=4)
        (n_a, n_b, ix, ik, jp, jk) = got[("a", "b")]
        assert (n_a, n_b, ix, jp) == (12, 12, 0, 0)
        assert ik >= 0 and jk >= 0

    def test_matches_python_replica_past_k(self, spark):
        """Full replica of the merged-sketch inclusion-exclusion on
        overlapping past-k groups."""
        ka = [f"s{i}" for i in range(10)]
        kb = [f"s{i}" for i in range(5, 15)]
        rows = [("a", s) for s in ka] + [("b", s) for s in kb]
        K = 4
        got = self._run(spark, rows, k=K)

        def est(keys):
            hs = sorted(_h60(s) for s in set(keys))
            if len(hs) <= K:
                return len(hs)
            return (K - 1) * (1 << 60) // hs[K - 1]

        def kept(keys):
            return sorted(_h60(s) for s in set(keys))[:K]

        e_a, e_b = est(ka), est(kb)
        merged = sorted(set(kept(ka)) | set(kept(kb)))[:K]
        e_u = (len(merged) if len(merged) <= K
               else (K - 1) * (1 << 60) // merged[K - 1])
        # len(merged) == K here, so the theta path applies
        e_u = (K - 1) * (1 << 60) // merged[K - 1]
        ik = max(0, e_a + e_b - e_u)
        exact_i = len(set(ka) & set(kb))
        exp = (10, 10, exact_i, ik,
               exact_i * 1_000_000 // (20 - exact_i),
               0 if e_a + e_b - ik == 0
               else ik * 1_000_000 // (e_a + e_b - ik))
        assert got[("a", "b")] == exp


# ---------------------------------------------------------------------------
# Trip detour index
# ---------------------------------------------------------------------------

class TestDetourIndex:
    def _run(self, spark, rows):
        from geospark.operators.events import detour_index
        d = spark.createDataFrame(
            rows, "user_id long, event_id long, lat double, "
                  "lon double, us long")
        return _rows(detour_index(d),
                     ["user_id", "day", "n_hops", "path_udeg",
                      "line_udeg", "detour_ppm"])

    def test_straight_line_reads_one(self, spark):
        """Monotone path: detour exactly 1e6."""
        rows = [(1, i, 0.0, float(i), i) for i in range(3)]
        got = self._run(spark, rows)
        assert got == [(1, 0, 2, 2_000_000, 2_000_000, 1_000_000)]

    def test_dogleg_doubles(self, spark):
        """Out-and-back halfway then on: path 2, line 1 -> 2e6."""
        rows = [(1, 0, 0.0, 0.0, 0), (1, 1, 0.0, 0.75, 1),
                (1, 2, 0.0, 0.5, 2)]
        got = self._run(spark, rows)
        assert got[0][3:] == (1_000_000, 500_000, 2_000_000)

    def test_round_trip_null(self, spark):
        """o == d with movement: loop, NULL detour, row kept."""
        rows = [(1, 0, 0.0, 0.0, 0), (1, 1, 0.0, 1.0, 1),
                (1, 2, 0.0, 0.0, 2)]
        got = self._run(spark, rows)
        assert got[0][3:] == (2_000_000, 0, None)

    def test_stationary_day_dropped(self, spark):
        """Zero path: no row; single-event days: no row."""
        rows = [(1, 0, 0.0, 0.0, 0), (1, 1, 0.0, 0.0, 1),
                (2, 2, 5.0, 5.0, 0)]
        assert self._run(spark, rows) == []

    def test_days_split_trips(self, spark):
        """Events across midnight form two trips."""
        day = 86_400_000_000
        rows = [(1, 0, 0.0, 0.0, 0), (1, 1, 0.0, 1.0, 1),
                (1, 2, 0.0, 2.0, day + 1), (1, 3, 0.0, 4.0, day + 2)]
        got = self._run(spark, rows)
        assert [r[1] for r in got] == [0, 1]
        assert got[1][3:] == (2_000_000, 2_000_000, 1_000_000)


# ---------------------------------------------------------------------------
# IPF (Furness) OD matrix balancing
# ---------------------------------------------------------------------------

class TestOdIpf:
    def _run(self, spark, rows, rounds=3, tail_day=21, res=3):
        from geospark.operators.events import od_ipf
        d = spark.createDataFrame(
            rows, "user_id long, event_id long, lat double, "
                  "lon double, us long")
        return _rows(od_ipf(d, res, rounds=rounds,
                            tail_day=tail_day),
                     ["o_cell", "d_cell", "n_obs", "fit_ppm"])

    @staticmethod
    def _trip(uid, day, a, b):
        day_us = 86_400_000_000
        return [(uid, 2 * uid, a[0], a[1], day * day_us + 10),
                (uid, 2 * uid + 1, b[0], b[1], day * day_us + 20)]

    # three well-separated anchor points (res-3 cells)
    A, B, C = (1.0, 1.0), (1.0, 91.0), (40.0, 1.0)

    def test_margins_hit_after_balancing(self, spark):
        """Full period: A->B x2, A->C x2. Tail: A->B x3, A->C x1.
        After IPF the fitted rows match the tail margins: col sums
        ~3e6 and ~1e6 (floor slack < 1 per entry)."""
        rows = []
        uid = 1
        for _ in range(2):
            rows += self._trip(uid, 0, self.A, self.B); uid += 1
            rows += self._trip(uid, 0, self.A, self.C); uid += 1
        for _ in range(3):
            rows += self._trip(uid, 25, self.A, self.B); uid += 1
        rows += self._trip(uid, 25, self.A, self.C); uid += 1
        got = self._run(spark, rows)
        fit = {(r[0], r[1]): r[3] for r in got}
        vals = sorted(fit.values())
        # tail totals: A->B 3+obs? full matrix includes tail trips
        # (days 25 >= 0), so obs = (B:5, C:3), margins R_A=4e6,
        # C_B=3e6, C_C=1e6 -> fitted entries ~3e6 and ~1e6
        assert abs(vals[1] - 3_000_000) <= 3
        assert abs(vals[0] - 1_000_000) <= 3
        obs = {(r[0], r[1]): r[2] for r in got}
        assert sorted(obs.values()) == [3, 5]

    def test_absent_tail_origin_zeroes_row(self, spark):
        """A corridor whose origin vanished from the tail fits 0."""
        rows = (self._trip(1, 0, self.B, self.C)
                + self._trip(2, 25, self.A, self.C))
        got = self._run(spark, rows)
        fit = {(r[0], r[1]): r[3] for r in got}
        assert len(got) == 2 and min(fit.values()) == 0

    def test_identity_when_margins_match(self, spark):
        """Tail == full period: IPF is a fixed point — fit equals
        the observed matrix in ppm exactly (floors take no slack
        when the scale factor is exactly 1)."""
        rows = (self._trip(1, 25, self.A, self.B)
                + self._trip(2, 25, self.A, self.B)
                + self._trip(3, 26, self.B, self.C))
        got = self._run(spark, rows)
        for o, d, n, fit in got:
            assert fit == n * 1_000_000


# ---------------------------------------------------------------------------
# Exponential-histogram quantile sketch
# ---------------------------------------------------------------------------

class TestQhistQuantiles:
    def _run(self, spark, rows, qs=(50, 90, 99)):
        from geospark.operators.sketch import qhist_quantiles
        d = spark.createDataFrame(rows, "g string, v long")
        return {(r[0], r[1]): r[2:] for r in _rows(
            qhist_quantiles(d, "v", "g", qs=qs),
            ["g", "q", "n", "exact_q", "est_q", "err_ppm"])}

    def test_known_exact_and_bucket_bounds(self, spark):
        """Values 1..10: p50 = 5th smallest = 5, bucket blen(5)=3 ->
        est 7; p90 = 9 -> blen 4 -> est 15; p99 = 10 -> est 15."""
        got = self._run(spark, [("a", v) for v in range(1, 11)])
        assert got[("a", 50)] == (10, 5, 7, 400_000)
        assert got[("a", 90)] == (10, 9, 15, 666_666)
        assert got[("a", 99)] == (10, 10, 15, 500_000)

    def test_estimate_is_upper_bound(self, spark):
        """est >= exact always (the bucket ceiling property)."""
        import random
        rng = random.Random(7)
        rows = [("a", rng.randrange(1, 10**6)) for _ in range(200)]
        got = self._run(spark, rows)
        assert all(v[2] >= v[1] and v[3] >= 0 for v in got.values())

    def test_power_of_two_exact_at_ceiling(self, spark):
        """All values = 2^b - 1: sketch is exact, err 0."""
        got = self._run(spark, [("a", 7)] * 5)
        assert all(v[1:] == (7, 7, 0) for v in got.values())

    def test_nonpositive_excluded(self, spark):
        got = self._run(spark, [("a", 0), ("a", -3), ("a", 4)])
        assert got[("a", 50)][0] == 1


# ---------------------------------------------------------------------------
# Rendezvous (HRW) shard placement
# ---------------------------------------------------------------------------

class TestRendezvousShards:
    def _run(self, spark, rows, n_shards=4, res=4):
        from geospark.operators.tiles import rendezvous_shards
        d = spark.createDataFrame(rows, "lat double, lon double")
        return _rows(rendezvous_shards(d, res, n_shards),
                     ["shard", "n_cells", "load_events", "load_ppm",
                      "moved_cells", "moved_load_ppm"])

    @staticmethod
    def _owner(cell, shards):
        return max(range(shards),
                   key=lambda s: (_h60(f"{cell}:{s}"), s))

    def test_matches_python_hrw_replica(self, spark):
        """Owners and loads equal a from-scratch HRW replica over a
        deterministic point sweep."""
        import collections
        import math
        rows = [(float(-80 + 7 * i % 160), float(-170 + 11 * i % 340))
                for i in range(60)]
        got = self._run(spark, rows)
        n = 1 << 4
        loads = collections.Counter()
        cellload = collections.Counter()
        for la, lo in rows:
            x = min(n - 1, max(0, math.floor((lo + 180) / 360 * n)))
            y = min(n - 1, max(0, math.floor((la + 90) / 180 * n)))
            cellload[(4 << 56) | (y << 4) | x] += 1
        exp = collections.Counter()
        expload = collections.Counter()
        for cell, ld in cellload.items():
            o = self._owner(cell, 4)
            exp[o] += 1
            expload[o] += ld
        assert {r[0]: r[1] for r in got} == dict(exp)
        assert {r[0]: r[2] for r in got} == dict(expload)

    def test_reshard_moves_only_to_new_shard(self, spark):
        """Every cell moved under S+1 is claimed BY shard S in the
        replica — the rendezvous minimal-disruption property — and
        unmoved cells keep their owner."""
        import collections
        import math
        rows = [(float(-80 + 13 * i % 160), float(-170 + 17 * i % 340))
                for i in range(80)]
        got = self._run(spark, rows, n_shards=4)
        n = 1 << 4
        cells = set()
        for la, lo in rows:
            x = min(n - 1, max(0, math.floor((lo + 180) / 360 * n)))
            y = min(n - 1, max(0, math.floor((la + 90) / 180 * n)))
            cells.add((4 << 56) | (y << 4) | x)
        moved = collections.Counter()
        for c in cells:
            o4, o5 = self._owner(c, 4), self._owner(c, 5)
            if o4 != o5:
                assert o5 == 4  # only the new shard claims
                moved[o4] += 1
        assert {r[0]: r[4] for r in got} == dict(
            {s: moved.get(s, 0) for s in {r[0] for r in got}})

    def test_load_shares_sum_to_one(self, spark):
        rows = [(10.0, 10.0)] * 9 + [(50.0, 120.0)] * 3
        got = self._run(spark, rows)
        assert sum(r[2] for r in got) == 12
        assert abs(sum(r[3] for r in got) - 1_000_000) < len(got)


# ---------------------------------------------------------------------------
# Space-filling-curve locality audit
# ---------------------------------------------------------------------------

class TestLayoutLocality:
    def _run(self, spark, rows, res=3):
        from geospark.operators.tiles import layout_locality
        d = spark.createDataFrame(rows, "lat double, lon double")
        return {r[0]: r[1:] for r in _rows(
            layout_locality(d, res),
            ["layout", "n_pairs", "total_gap", "max_gap",
             "mean_gap_x1e6"])}

    @staticmethod
    def _full_grid(res):
        """One point per cell of the full res grid."""
        n = 1 << res
        rows = []
        for y in range(n):
            for x in range(n):
                rows.append((-90.0 + (y + 0.5) * 180.0 / n,
                             -180.0 + (x + 0.5) * 360.0 / n))
        return rows

    def test_full_grid_counter_folklore(self, spark):
        """On the full dense grid the REVERSE-locality metric favors
        Morton on both total and worst seam (Hilbert's guarantee is
        the forward direction) — the measurement the audit exists to
        surface against the rule of thumb."""
        got = self._run(spark, self._full_grid(3))
        n = 1 << 3
        assert got["hilbert"][0] == got["morton"][0] == \
            2 * n * (n - 1)
        assert got["morton"][1] < got["hilbert"][1]
        assert got["morton"][2] < got["hilbert"][2]

    def test_matches_python_replica(self, spark):
        """Exact totals vs a from-scratch replica using the repo's
        hilbert_d_np / zorder bit-interleave references."""
        import numpy as np
        from geospark.functions.cells import hilbert_d_np, zorder_np
        res, n = 3, 8
        rows = self._full_grid(3)
        lat = np.array([r[0] for r in rows])
        lon = np.array([r[1] for r in rows])
        z = zorder_np(lat, lon, res)
        x = np.floor((lon + 180) / 360 * n).astype(int)
        y = np.floor((lat + 90) / 180 * n).astype(int)
        h = hilbert_d_np(x, y, res)
        rz = {(int(a), int(b)): r for r, (a, b) in enumerate(
            sorted(zip(x, y), key=lambda p: z[list(zip(x, y)).index(p)]))}
        # simpler: rank arrays
        zr = z.argsort().argsort() + 1
        hr = h.argsort().argsort() + 1
        tz = th = mz = mh = npairs = 0
        idx = {(int(a), int(b)): i for i, (a, b) in
               enumerate(zip(x, y))}
        for (a, b), i in idx.items():
            for (dx, dy) in ((1, 0), (0, 1)):
                j = idx.get((a + dx, b + dy))
                if j is None:
                    continue
                npairs += 1
                gz = abs(int(zr[i]) - int(zr[j]))
                gh = abs(int(hr[i]) - int(hr[j]))
                tz += gz; th += gh
                mz = max(mz, gz); mh = max(mh, gh)
        got = self._run(spark, rows)
        assert got["morton"] == (npairs, tz, mz,
                                 tz * 1_000_000 // npairs)
        assert got["hilbert"] == (npairs, th, mh,
                                  th * 1_000_000 // npairs)

    def test_no_antimeridian_pairs(self, spark):
        """Cells at x = 0 and x = n-1 on the same row are NOT
        neighbors for file layout."""
        rows = [(10.0, -179.0), (10.0, 179.0)]
        assert self._run(spark, rows) == {}


# ---------------------------------------------------------------------------
# Streaming trip detour (stateful twin of detour_index)
# ---------------------------------------------------------------------------

class TestStreamDetour:
    def test_matches_batch_across_microbatches(self, spark, tmp_path):
        """Chunked replay == batch detour restricted to closed days;
        a day whose origin arrives in batch 1 and destination in
        batch 2 closes correctly from state."""
        import datetime as dt

        from pyspark.sql import functions as F

        from geospark.operators.events import detour_index
        from geospark.streaming.stream import stream_detour
        base = dt.datetime(2024, 1, 1)

        def ev(eid, uid, day, sec, lat, lon):
            return (eid, base + dt.timedelta(days=day, seconds=sec),
                    uid, lat, lon)

        head = [ev(0, 1, 0, 0, 0.0, 0.0), ev(1, 1, 0, 10, 0.0, 0.75)]
        # --- file boundary splits day 0's tail and day 1 ---
        tail = [ev(2, 1, 0, 20, 0.0, 0.5),
                ev(3, 1, 1, 0, 1.0, 1.0),   # closes day 0
                ev(4, 1, 2, 0, 2.0, 2.0),   # closes day 1 (1 event
                                            # -> no row)
                ev(5, 2, 0, 5, 5.0, 5.0),
                ev(6, 2, 0, 6, 5.0, 6.0),
                ev(7, 2, 3, 0, 5.0, 7.0)]   # closes user 2 day 0
        schema = ("event_id long, ts timestamp_ntz, user_id long, "
                  "lat double, lon double")
        src = str(tmp_path / "sd_src")
        spark.createDataFrame(head, schema).coalesce(1) \
            .write.mode("overwrite").parquet(src)
        spark.createDataFrame(tail, schema).coalesce(1) \
            .write.mode("append").parquet(src)

        sdf = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
        out = stream_detour(sdf.select(
            "user_id", "event_id",
            F.expr("timestampdiff(MICROSECOND, "
                   "TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)")
            .alias("us"),
            F.floor(F.col("lat") * 1_000_000).cast("long")
            .alias("uy"),
            F.floor(F.col("lon") * 1_000_000).cast("long")
            .alias("ux")))
        q = (out.writeStream.format("memory")
             .queryName("sd_stream").outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        cols = ["user_id", "day", "n_hops", "path_udeg",
                "line_udeg", "detour_ppm"]
        got = _rows(spark.sql(
            f"SELECT {', '.join(cols)} FROM sd_stream"))

        e = spark.read.parquet(src)
        pts = e.select("user_id", "event_id", "lat", "lon",
                       F.expr("timestampdiff(MICROSECOND, "
                              "TIMESTAMP_NTZ '2024-01-01 "
                              "00:00:00', ts)").alias("us"))
        batch = detour_index(pts)
        mx = (pts.groupBy("user_id")
              .agg(F.max(F.expr("us div 86400000000")).alias("mx")))
        exp = _rows(batch.join(mx, "user_id").filter("day < mx")
                    .select(*cols))
        assert got == exp
        # the boundary-spanning trip closed with the full 3-hop path
        assert (1, 0, 2, 1_000_000, 500_000, 2_000_000) in got
        # user 2's straight day closed; the open last days did not
        assert (2, 0, 1, 1_000_000, 1_000_000, 1_000_000) in got
        assert len(got) == 2


# ---------------------------------------------------------------------------
# LCS route overlap
# ---------------------------------------------------------------------------

def _lcs_ref(a, b):
    L = len(a)
    dp = [[0] * (L + 1) for _ in range(L + 1)]
    for i in range(1, L + 1):
        for j in range(1, L + 1):
            dp[i][j] = (dp[i - 1][j - 1] + 1 if a[i - 1] == b[j - 1]
                        else max(dp[i - 1][j], dp[i][j - 1]))
    return dp[L][L]


class TestLcsRoutes:
    def _run(self, spark, rows, L=4, res=3):
        from geospark.operators.events import lcs_routes
        d = spark.createDataFrame(
            rows, "user_id long, event_id long, lat double, "
                  "lon double, us long")
        return _rows(lcs_routes(d, res, L=L),
                     ["user_a", "user_b", "block", "lcs",
                      "overlap_ppm"])

    @staticmethod
    def _traj(uid, coords, t0=0):
        return [(uid, 10 * uid + i, la, lo, t0 + i)
                for i, (la, lo) in enumerate(coords)]

    def test_matches_python_replica(self, spark):
        """Engine LCS == classic replica on cell index sequences;
        res-3 cells are 22.5 x 45 deg, coords chosen per-cell."""
        import math
        ca = [(1.0, 1.0), (1.0, 46.0), (30.0, 1.0), (1.0, 91.0)]
        cb = [(1.0, 1.0), (30.0, 46.0), (30.0, 1.0), (1.0, 91.0)]
        got = self._run(spark, self._traj(1, ca) + self._traj(2, cb))
        def cells(cs):
            n = 8
            return [(math.floor((lo + 180) / 360 * n),
                     math.floor((la + 90) / 180 * n))
                    for la, lo in cs]
        ref = _lcs_ref(cells(ca), cells(cb))
        assert got[0][3] == ref == 3
        assert got[0][4] == ref * 1_000_000 // 4

    def test_order_matters(self, spark):
        """Same cells reversed after the shared anchor: LCS stays
        low where Jaccard would be 1."""
        ca = [(1.0, 1.0), (1.0, 46.0), (30.0, 1.0), (1.0, 91.0)]
        cb = [ca[0]] + list(reversed(ca[1:]))
        got = self._run(spark, self._traj(1, ca) + self._traj(2, cb))
        assert got[0][3] == 2  # anchor + one of the reversed tail

    def test_identical_routes_full_overlap(self, spark):
        ca = [(1.0, 1.0), (1.0, 46.0), (30.0, 1.0), (1.0, 91.0)]
        got = self._run(spark, self._traj(1, ca) + self._traj(2, ca))
        assert got[0][3:] == (4, 1_000_000)

    def test_skip_tolerance_vs_dtw(self, spark):
        """A detour in the middle keeps the shared stops counting —
        the property DTW's no-skip alignment penalizes."""
        ca = [(1.0, 1.0), (1.0, 46.0), (30.0, 1.0), (1.0, 91.0)]
        cb = [ca[0], (60.0, -120.0), ca[1], ca[2]]  # detour then rejoin
        got = self._run(spark, self._traj(1, ca) + self._traj(2, cb))
        assert got[0][3] == 3


# ---------------------------------------------------------------------------
# Bounded harmonic centrality
# ---------------------------------------------------------------------------

class TestHarmonic2:
    def _run(self, spark, edges):
        from geospark.operators.graph import harmonic2
        d = spark.createDataFrame(edges, "id_a long, id_b long")
        return {r[0]: r[1:] for r in _rows(
            harmonic2(d), ["id", "n1", "n2", "harm_x2"])}

    def test_path_graph(self, spark):
        """1-2-3-4: ends see 1 neighbor + 1 two-hop; middles see 2
        neighbors + 1 two-hop."""
        got = self._run(spark, [(1, 2), (2, 3), (3, 4)])
        assert got[1] == (1, 1, 3) and got[4] == (1, 1, 3)
        assert got[2] == (2, 1, 5) and got[3] == (2, 1, 5)

    def test_clique_has_no_two_hop(self, spark):
        """Triangle: everyone is everyone's neighbor — n2 = 0, the
        clique-hub signature."""
        got = self._run(spark, [(1, 2), (2, 3), (1, 3)])
        assert all(v == (2, 0, 4) for v in got.values())

    def test_broker_beats_clique_hub(self, spark):
        """A degree-2 broker bridging two pairs outscores a degree-2
        clique member: same n1, bigger n2."""
        # clique 1-2-3; broker 4 linking 5 and 6 (5,6 not linked)
        got = self._run(spark, [(1, 2), (2, 3), (1, 3),
                                (4, 5), (4, 6)])
        assert got[4] == (2, 0, 4)  # 5,6 are neighbors, no 2-hop
        # 5 reaches 6 via 4: n2 = 1 -> the LEAVES gain reach,
        # while every clique member stays closed at 1 hop
        assert got[5] == (1, 1, 3)
        assert got[1] == (2, 0, 4)

    def test_duplicate_and_reversed_edges_collapse(self, spark):
        got = self._run(spark, [(1, 2), (2, 1), (1, 2)])
        assert got[1] == (1, 0, 2) and got[2] == (1, 0, 2)


# ---------------------------------------------------------------------------
# Cell association rules
# ---------------------------------------------------------------------------

class TestCellRules:
    def _run(self, spark, rows, min_users=2, res=3):
        from geospark.operators.events import cell_rules
        d = spark.createDataFrame(
            rows, "user_id long, lat double, lon double")
        return {(r[0], r[1]): r[2:] for r in _rows(
            cell_rules(d, res, min_users=min_users),
            ["cell_a", "cell_b", "n_a", "n_b", "n_ab",
             "support_ppm", "conf_ppm", "lift_ppm"])}

    A, B, C = (1.0, 1.0), (1.0, 46.0), (30.0, 91.0)

    def test_known_rule_arithmetic(self, spark):
        """4 users: 3 visit A, 2 visit both A and B, 1 visits only
        C + B. N=4, n_A=3, n_B=3, n_AB=2: support 500000, conf(A->B)
        666666, lift = 2*4/(3*3) ppm."""
        rows = ([(u, *self.A) for u in (1, 2, 3)]
                + [(u, *self.B) for u in (1, 2, 4)]
                + [(4, *self.C)])
        got = self._run(spark, rows)
        a = [k for k in got if got[k][2] == 2][0]
        assert got[a] == (3, 3, 2, 500_000, 666_666,
                          2 * 4 * 1_000_000 // 9)
        # both directions present with swapped margins
        assert (a[1], a[0]) in got

    def test_duplicate_visits_collapse(self, spark):
        """Repeat visits don't inflate co-visitor counts."""
        rows = [(1, *self.A), (1, *self.A), (1, *self.B),
                (2, *self.A), (2, *self.B)]
        got = self._run(spark, rows)
        assert all(v[2] == 2 for v in got.values())

    def test_apriori_prune(self, spark):
        """A cell below min_users never appears in any rule."""
        rows = [(1, *self.A), (1, *self.C),
                (2, *self.A), (2, *self.B), (1, *self.B)]
        got = self._run(spark, rows, min_users=2)
        cells = {k[0] for k in got} | {k[1] for k in got}
        assert len(got) == 2  # A<->B only; C pruned (1 visitor)

    def test_lift_above_one_for_correlated(self, spark):
        """Perfectly co-visited pair: lift = N/n ppm > 1e6 when a
        third independent user exists."""
        rows = ([(u, *self.A) for u in (1, 2)]
                + [(u, *self.B) for u in (1, 2)]
                + [(3, *self.C), (3, *self.C)])
        got = self._run(spark, rows)
        assert all(v[5] == 3 * 1_000_000 // 2
                   for v in got.values())


# ---------------------------------------------------------------------------
# Per-cell forecast backtest
# ---------------------------------------------------------------------------

class TestCellBacktest:
    def _run(self, spark, xs, season=3, res=2):
        from geospark.operators.tiles import cell_backtest
        rows = [(10.0, 10.0, d * DAY + j)
                for d, n in enumerate(xs) for j in range(n)]
        d = spark.createDataFrame(rows,
                                  "lat double, lon double, us long")
        return _rows(cell_backtest(d, res, season=season),
                     ["cell", "n_scored", "err_season", "err_naive",
                      "skill_ppm"])

    def test_perfect_seasonality_scores_zero(self, spark):
        """Period-3 series repeats exactly: seasonal error 0,
        persistence pays for every step."""
        xs = [3, 1, 2] * 3
        got = self._run(spark, xs)
        n, es, en, skill = got[0][1:]
        assert n == len(xs) - 3 and es == 0 and en > 0
        assert skill == 0

    def test_flat_series_perfect_baseline_null(self, spark):
        """Constant series: both errors 0 -> NULL skill, no
        division blowup."""
        got = self._run(spark, [2, 2, 2, 2, 2])
        assert got[0][2:] == (0, 0, None)

    def test_shared_scored_days_and_sums(self, spark):
        """Errors accumulate only over days where BOTH models
        forecast (t > season); hand-checked sums."""
        xs = [5, 0, 0, 1, 4]
        got = self._run(spark, xs)
        # scored days: indices 3, 4. season err: |1-5| + |4-0| = 8;
        # naive err: |1-0| + |4-1| = 4 -> skill 2e6
        assert got[0][1:] == (2, 8, 4, 2_000_000)

    def test_short_series_empty(self, spark):
        """Span <= season: empty frame of the right shape."""
        got = self._run(spark, [1, 2, 3])
        assert got == []


# ---------------------------------------------------------------------------
# IDW leave-one-out cross-validation
# ---------------------------------------------------------------------------

class TestIdwLoocv:
    def _run(self, spark, rows, res=3):
        from geospark.operators.interp import idw_loocv
        d = spark.createDataFrame(rows, "lat double, lon double")
        return _rows(idw_loocv(d, res),
                     ["cell", "v_true", "pred", "abs_err"])

    # res-3 cell size: 22.5 lat x 45 lon; centers on a row
    @staticmethod
    def _pt(y, x, k=1):
        return [(-90.0 + (y + 0.5) * 22.5, -180.0 + (x + 0.5) * 45.0)
                ] * k

    def test_lcm_weights_exact(self, spark):
        """Target with an adjacent (d2=1, w=40) and a diagonal-2
        (d2=8, w=5) neighbor: pred = (40*a + 5*b) div 45."""
        rows = (self._pt(3, 3, 2)        # target, v=2
                + self._pt(3, 4, 7)      # d2=1, v=7
                + self._pt(5, 5, 4))     # d2=8, v=4
        got = self._run(spark, rows)
        by = {r[0]: r for r in got}
        t = [r for r in got if r[1] == 2][0]
        assert t[2] == (40 * 7 + 5 * 4) // 45
        assert t[3] == abs(2 - t[2])

    def test_self_excluded(self, spark):
        """An isolated heavy cell has no neighbors: no row — its own
        mass never predicts itself."""
        got = self._run(spark, self._pt(3, 3, 9))
        assert got == []

    def test_perfect_surface_zero_error(self, spark):
        """A constant field cross-validates exactly."""
        rows = []
        for y in range(2, 5):
            for x in range(2, 5):
                rows += self._pt(y, x, 3)
        got = self._run(spark, rows)
        assert len(got) == 9
        assert all(r[1] == 3 and r[2] == 3 and r[3] == 0
                   for r in got)

    def test_ring_limit(self, spark):
        """A neighbor 3 cells away contributes nothing."""
        rows = self._pt(3, 3, 2) + self._pt(3, 6, 5)
        assert self._run(spark, rows) == []


# ---------------------------------------------------------------------------
# Streaming audience churn (array-state twin of cell_churn)
# ---------------------------------------------------------------------------

class TestStreamCellChurn:
    def test_matches_batch_across_microbatches(self, spark, tmp_path):
        """Chunked replay == batch cell_churn restricted to closed
        weeks: an audience split across the FILE BOUNDARY merges in
        the array state, a gap week suppresses the non-consecutive
        pair, and the final open week never emits."""
        import datetime as dt

        from pyspark.sql import functions as F

        from geospark.functions.cells import cell_encode
        from geospark.operators.events import cell_churn
        from geospark.streaming.stream import stream_cell_churn
        base = dt.datetime(2024, 1, 1)

        def ev(eid, uid, week, sec, lat=10.0, lon=10.0):
            return (eid, base + dt.timedelta(weeks=week, seconds=sec),
                    uid, lat, lon)

        head = [ev(0, 1, 0, 0), ev(1, 2, 0, 10)]
        # file boundary splits week 0's audience
        tail = [ev(2, 3, 0, 20),
                ev(3, 2, 1, 0), ev(4, 3, 1, 5), ev(5, 4, 1, 9),
                ev(6, 1, 2, 0),           # closes week 1
                ev(7, 1, 4, 0),           # gap: closes week 2,
                                          # (2,4) pair suppressed
                ev(8, 9, 0, 0, -40.0, -40.0),
                ev(9, 9, 1, 0, -40.0, -40.0),
                ev(10, 9, 2, 0, -40.0, -40.0)]  # second cell chain
        schema = ("event_id long, ts timestamp_ntz, user_id long, "
                  "lat double, lon double")
        src = str(tmp_path / "sc_src")
        spark.createDataFrame(head, schema).coalesce(1) \
            .write.mode("overwrite").parquet(src)
        spark.createDataFrame(tail, schema).coalesce(1) \
            .write.mode("append").parquet(src)

        sdf = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
        out = stream_cell_churn(sdf.select(
            cell_encode("lat", "lon", 4).alias("cell"), "user_id",
            F.expr("timestampdiff(MICROSECOND, "
                   "TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)")
            .alias("us")))
        q = (out.writeStream.format("memory")
             .queryName("sc_stream").outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        cols = ["cell", "period", "n_prev", "n_curr", "n_common",
                "jaccard_ppm"]
        got = _rows(spark.sql(
            f"SELECT {', '.join(cols)} FROM sc_stream"))

        e = spark.read.parquet(src)
        pts = e.select("user_id", "lat", "lon",
                       F.expr("timestampdiff(MICROSECOND, "
                              "TIMESTAMP_NTZ '2024-01-01 "
                              "00:00:00', ts)").alias("us"))
        batch = cell_churn(pts, 4)
        mx = (pts.select(cell_encode("lat", "lon", 4).alias("cell"),
                         F.expr("us div 604800000000").alias("p"))
              .groupBy("cell").agg(F.max("p").alias("mx")))
        exp = _rows(batch.join(mx, "cell").filter("period < mx")
                    .select(*cols))
        assert got == exp
        # week-0 audience {1,2,3} vs week-1 {2,3,4}: the boundary-
        # spanning merge produced the 500000-ppm row
        assert any(r[2:] == (3, 3, 2, 500_000) for r in got)
        # the gap pair (weeks 2 -> 4) is absent; weeks 1 and 2
        # emitted for the main cell
        assert not any(r[1] == 4 for r in got)
        main = sorted(r[1] for r in got if r[2] == 3)
        assert main == [1, 2]
        # the second cell's chain emitted its consecutive pair
        assert any(r[2:] == (1, 1, 1, 1_000_000) for r in got)


# ---------------------------------------------------------------------------
# Coverage holes
# ---------------------------------------------------------------------------

class TestCoverageHoles:
    def _run(self, spark, rows, res=3):
        from geospark.operators.cluster import coverage_holes
        d = spark.createDataFrame(rows, "lat double, lon double")
        return _rows(coverage_holes(d, res),
                     ["region_id", "n_cells", "perim_load"])

    @staticmethod
    def _pt(y, x, k=1, res=3):
        n = 1 << res
        return [(-90.0 + (y + 0.5) * 180.0 / n,
                 -180.0 + (x + 0.5) * 360.0 / n)] * k

    def test_single_hole_with_pressure(self, spark):
        """A 3x3 ring of occupied cells (weights) around one empty
        center: one hole of 1 cell, perim_load = total ring mass."""
        rows = []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if (dy, dx) != (0, 0):
                    rows += self._pt(3 + dy, 3 + dx, 2)
        got = self._run(spark, rows)
        assert got == [(got[0][0], 1, 16)]

    def test_two_separate_holes(self, spark):
        """Two empty cells separated by occupied ground are two
        regions; the bbox keeps the complement finite."""
        rows = []
        # occupied plus shape: row y=3 x in 2..6 except 3 and 5,
        # rows y=2,4 fully occupied x 2..6
        for x in range(2, 7):
            rows += self._pt(2, x) + self._pt(4, x)
        for x in (2, 4, 6):
            rows += self._pt(3, x)
        got = self._run(spark, rows)
        assert len(got) == 2
        assert all(r[1] == 1 for r in got)
        # each hole touches 8 occupied neighbors (weight 1 each)
        assert all(r[2] == 8 for r in got)

    def test_fully_occupied_bbox_no_rows(self, spark):
        rows = []
        for y in (2, 3):
            for x in (2, 3):
                rows += self._pt(y, x)
        assert self._run(spark, rows) == []

    def test_l_shaped_hole_is_one_region(self, spark):
        """8-connectivity merges diagonal hole cells into one
        region."""
        # occupied 4x4 block minus an L of two diagonal cells
        rows = []
        for y in range(2, 6):
            for x in range(2, 6):
                if (y, x) not in ((3, 3), (4, 4)):
                    rows += self._pt(y, x)
        got = self._run(spark, rows)
        assert len(got) == 1 and got[0][1] == 2


# ---------------------------------------------------------------------------
# Directional semivariogram
# ---------------------------------------------------------------------------

class TestAnisoVariogram:
    def _run(self, spark, cells, lags=(1, 2), res=4):
        from geospark.operators.tiles import aniso_variogram
        d = spark.createDataFrame(cells, "cell long, n_pts long")
        return {(r[0], r[1]): r[2:] for r in _rows(
            aniso_variogram(d, res, lags, count_col="n_pts"),
            ["sector", "lag_cells", "n_pairs", "gamma_ppm"])}

    @staticmethod
    def _cell(y, x, res=4):
        return (res << 56) | (y << res) | x

    def test_sector_classification_and_gamma(self, spark):
        """Three cells: an E-W pair (values 1, 5 -> gamma 8e6) and an
        N-S pair (values 1, 3 -> gamma 2e6); the diagonal pair
        between them lands in 'diag'."""
        cells = [(self._cell(4, 4), 1), (self._cell(4, 5), 5),
                 (self._cell(5, 4), 3)]
        got = self._run(spark, cells)
        assert got[("ew", 1)] == (1, 16 * 1_000_000 // 2)
        assert got[("ns", 1)] == (1, 4 * 1_000_000 // 2)
        assert got[("diag", 2)] == (1, (5 - 3) ** 2 * 1_000_000 // 2)

    def test_empty_rungs_emitted(self, spark):
        """Every (sector, lag) rung appears even with one pair."""
        cells = [(self._cell(4, 4), 1), (self._cell(4, 5), 2)]
        got = self._run(spark, cells)
        assert len(got) == 6
        assert got[("ns", 1)] == (0, None)
        assert got[("ew", 1)][0] == 1

    def test_anisotropy_detected(self, spark):
        """A field varying only in y: N-S gamma >> E-W gamma at
        lag 1 — the grain the operator exists to expose."""
        cells = [(self._cell(y, x), 10 * y)
                 for y in range(3, 7) for x in range(3, 7)]
        got = self._run(spark, cells)
        assert got[("ew", 1)][1] == 0
        assert got[("ns", 1)][1] > 0

    def test_matches_isotropic_totals(self, spark):
        """Summing sector pair counts per lag reproduces the
        isotropic semivariogram's n_pairs — same shells, same
        pairs, just classified."""
        from geospark.operators.tiles import semivariogram
        cells = [(self._cell(3 + (i * 7) % 5, 3 + (i * 3) % 5),
                  1 + i % 4) for i in range(12)]
        cells = list({c: v for c, v in cells}.items())
        d = spark.createDataFrame(cells, "cell long, n_pts long")
        from geospark.operators.tiles import aniso_variogram
        a = _rows(aniso_variogram(d, 4, (1, 2), count_col="n_pts"),
                  ["sector", "lag_cells", "n_pairs"])
        s = _rows(semivariogram(d, 4, (1, 2), count_col="n_pts"),
                  ["lag_cells", "n_pairs"])
        from collections import Counter
        tot = Counter()
        for sec, lag, np_ in a:
            tot[lag] += np_
        assert {lag: n for lag, n in s} == dict(tot)


# ---------------------------------------------------------------------------
# Time-in-cell accounting
# ---------------------------------------------------------------------------

HOUR = 3600 * 1_000_000


class TestDwellCells:
    def _run(self, spark, rows, res=2, max_gap_us=6 * HOUR):
        from geospark.operators.events import dwell_cells
        d = spark.createDataFrame(
            rows, "user_id long, event_id long, lat double, "
                  "lon double, us long")
        return _rows(dwell_cells(d, res, max_gap_us=max_gap_us),
                     ["cell", "n_intervals", "dwell_us",
                      "dwell_share_ppm"])

    def test_interval_attribution_to_first_cell(self, spark):
        """User at A for 2h then B for 1h then gone: A gets 2h,
        B gets 1h (the last event owns no interval)."""
        rows = [(1, 0, 10.0, 10.0, 0),
                (1, 1, -40.0, -40.0, 2 * HOUR),
                (1, 2, -40.0, -40.0, 3 * HOUR)]
        got = self._run(spark, rows)
        by = sorted((r[2], r[3]) for r in got)
        assert by == [(1 * HOUR, 333_333), (2 * HOUR, 666_666)]

    def test_censor_long_gaps(self, spark):
        """A 7h gap is censored: the user was unobserved, not
        parked."""
        rows = [(1, 0, 10.0, 10.0, 0),
                (1, 1, 10.0, 10.0, 7 * HOUR),
                (1, 2, 10.0, 10.0, 8 * HOUR)]
        got = self._run(spark, rows)
        assert got[0][1:3] == (1, 1 * HOUR)

    def test_chatty_vs_quiet_sessions(self, spark):
        """10 rapid events in A vs one long stay in B: counts favor
        A 10:2 but dwell favors B — the correction the operator
        exists for."""
        rows = [(1, i, 10.0, 10.0, i * 60_000_000)
                for i in range(10)]
        rows += [(2, 100, -40.0, -40.0, 0),
                 (2, 101, -40.0, -40.0, 5 * HOUR)]
        got = self._run(spark, rows)
        by_cell = {r[0]: r for r in got}
        a = [r for r in got if r[1] == 9][0]
        b = [r for r in got if r[1] == 1][0]
        assert b[2] > a[2]

    def test_users_independent(self, spark):
        """Intervals never span users."""
        rows = [(1, 0, 10.0, 10.0, 0), (2, 1, 10.0, 10.0, HOUR)]
        assert self._run(spark, rows) == []


# ---------------------------------------------------------------------------
# Equal-area cell density
# ---------------------------------------------------------------------------

class TestCellDensity:
    def _run(self, spark, rows, res=3):
        from geospark.operators.tiles import cell_density
        d = spark.createDataFrame(rows, "lat double, lon double")
        return _rows(cell_density(d, res),
                     ["cell", "n_events", "area_km2_x1000",
                      "dens_x1e6"])

    def test_zone_table_matches_sphere(self, spark):
        """The emitted areas sum to the sphere over a full column
        sweep and match an independent spherical-zone replica."""
        import math
        from geospark.operators.tiles import _zone_area_rows
        rows4 = _zone_area_rows(3)
        r2 = 6371.0088 ** 2
        total = sum(a for _, a in rows4) * 8 / 1000.0
        assert abs(total - 4 * math.pi * r2) / (4 * math.pi * r2) \
            < 1e-6
        for y, a in rows4:
            la0 = math.radians(y * 22.5 - 90)
            la1 = math.radians((y + 1) * 22.5 - 90)
            exp = r2 * (math.sin(la1) - math.sin(la0)) * math.pi / 4
            assert a == int(round(exp * 1000))

    def test_polar_cell_out_densifies_equatorial(self, spark):
        """Same raw count near the pole vs the equator: the polar
        cell reads the higher corrected density — the ranking flip
        raw counts hide."""
        rows = [(85.0, 10.0)] * 5 + [(5.0, 10.0)] * 5
        got = self._run(spark, rows)
        polar = max(got, key=lambda r: r[3])
        equat = min(got, key=lambda r: r[3])
        assert polar[1] == equat[1] == 5
        assert polar[2] < equat[2] and polar[3] > equat[3]

    def test_exact_floor(self, spark):
        got = self._run(spark, [(5.0, 10.0)] * 7)
        n, area, dens = got[0][1:]
        assert dens == 7 * 1_000_000_000 // area
