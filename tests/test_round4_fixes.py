"""Round-4 ADVICE fixes: linestring count-word validation in the
npoints fast path, HALF_UP session durations, k-ring wrap-collision
dedup at coarse resolutions, shared _RES_SHIFT in distance_join,
non-finite coordinate formatting parity between the vectorized and
scalar WKT writers."""

from __future__ import annotations

import math
import struct

import numpy as np
import pandas as pd
import pytest


def _le_linestring(coords, claimed=None, dims=2, trailing=b""):
    """Hand-rolled little-endian LINESTRING WKB with a forgeable count
    word (ISO type codes: 2 / 1002 Z / 2002 M / 3002 ZM)."""
    type_code = {2: 2, 3: 1002, 4: 3002}[dims]
    cnt = len(coords) if claimed is None else claimed
    buf = struct.pack("<BII", 1, type_code, cnt)
    for c in coords:
        buf += struct.pack(f"<{dims}d", *c)
    return buf + trailing


class TestNpointsCountWordValidation:
    def _batch(self, rows):
        from geospark.functions.geometry import _st_npoints_batch
        return _st_npoints_batch(pd.Series(rows))

    def test_valid_linestring_still_fast(self):
        wkb = _le_linestring([(0.0, 0.0), (1.0, 1.0), (2.0, 0.0)])
        assert list(self._batch([wkb])) == [3]

    def test_truncated_count_word_raises(self):
        # claims 3 points, contains 1 — must be an error, not 3
        wkb = _le_linestring([(0.0, 0.0)], claimed=3)
        with pytest.raises(ValueError):
            self._batch([wkb])

    def test_inflated_count_word_raises(self):
        # claims 2**20 points, contains 2 — must not be returned verbatim
        wkb = _le_linestring([(0.0, 0.0), (1.0, 1.0)], claimed=1 << 20)
        with pytest.raises(ValueError):
            self._batch([wkb])

    def test_z_linestring_dims_in_bound(self):
        # 2 XYZ points = 9 + 2*3*8 bytes; the same byte length would
        # fit 3 XY points, so the bound must use the header's dims
        wkb = _le_linestring([(0.0, 0.0, 5.0), (1.0, 1.0, 6.0)], dims=3)
        assert list(self._batch([wkb])) == [2]
        short = _le_linestring([(0.0, 0.0, 5.0), (1.0, 1.0, 6.0)],
                               dims=3, claimed=3)
        with pytest.raises(ValueError):
            self._batch([short])


class TestDurSHalfUp:
    def test_half_up_not_bankers(self):
        from geospark.streaming.stream import _dur_s
        # 1500 us -> 0.0015 s: nearest double is just below .0015, so
        # Python round() returns 0.001; decimal HALF_UP (and Spark
        # F.round / DuckDB ROUND) return 0.002
        assert _dur_s(0, 1500) == 0.002
        assert _dur_s(0, 2500) == 0.003
        assert _dur_s(0, 1_234_499) == 1.234
        assert _dur_s(0, 1_234_500) == 1.235
        assert _dur_s(1000, 1000) == 0.0

    def test_matches_decimal_half_up_sweep(self):
        from decimal import ROUND_HALF_UP, Decimal
        from geospark.streaming.stream import _dur_s
        for d_us in list(range(0, 5000, 37)) + [10 ** 9 + 500,
                                                123_456_789]:
            exp = float((Decimal(d_us) / Decimal(1_000_000))
                        .quantize(Decimal("0.001"),
                                  rounding=ROUND_HALF_UP))
            assert _dur_s(0, d_us) == exp, d_us


class TestNeighborsWrapDedup:
    def test_coarse_res_no_duplicate_rows(self, spark):
        from geospark.functions.cells import (cell_neighbors_explode,
                                              encode_np, neighbors_np)
        # res=1 -> 2x2 grid: ring 1 spans the whole width, so naive
        # [-1,1] dx offsets revisit every x-residue twice
        cell = int(encode_np(np.asarray([10.0]), np.asarray([20.0]), 1)[0])
        df = spark.createDataFrame([(cell,)], "cell long")
        rows = cell_neighbors_explode(df, 1, ring=1).collect()
        got = sorted(r._neighbor for r in rows)
        exp = sorted(neighbors_np(cell, 1).tolist())
        assert got == exp  # equality of MULTISETS: no dup rows emitted

    def test_fine_res_unchanged(self, spark):
        from geospark.functions.cells import (cell_neighbors_explode,
                                              encode_np, neighbors_np)
        cell = int(encode_np(np.asarray([10.0]), np.asarray([20.0]), 8)[0])
        df = spark.createDataFrame([(cell,)], "cell long")
        rows = cell_neighbors_explode(df, 8, ring=2).collect()
        got = sorted(r._neighbor for r in rows)
        exp = sorted(neighbors_np(cell, 2).tolist())
        assert got == exp

    def test_sql_twin_matches_coarse(self):
        import duckdb
        from geospark.functions.cells import (cell_neighbors_sql,
                                              encode_np, neighbors_np)
        cell = int(encode_np(np.asarray([-40.0]), np.asarray([170.0]),
                             1)[0])
        sql = cell_neighbors_sql(str(cell), 1, ring=1)
        got = sorted(r[0] for r in duckdb.sql(sql).fetchall())
        exp = sorted(neighbors_np(cell, 1).tolist())
        assert got == exp


class TestDistanceJoinResShift:
    def test_no_hardcoded_shift(self):
        # r5 (VERDICT r4 "What's wrong" #1): scan the WHOLE module, not
        # just distance_join — bbox_join and knn_join also build cell ids.
        import inspect
        from geospark.operators import joins
        src = inspect.getsource(joins)
        assert "_RES_SHIFT" in src
        assert ", 56)" not in src
        assert " 56)" not in src.replace("_RES_SHIFT", "")


class TestNonFiniteWktParity:
    def test_fmt_num_inf(self):
        from geospark.kernels.geom import _fmt_num
        assert _fmt_num(float("inf")) == "inf"
        assert _fmt_num(float("-inf")) == "-inf"
        assert _fmt_num(float("nan")) == "nan"

    def test_fast_and_fallback_agree_on_inf_point(self):
        from geospark.functions.geometry import _st_astext_batch
        le = struct.pack("<BIdd", 1, 1, math.inf, 1.0)   # fast path
        be = struct.pack(">BIdd", 0, 1, math.inf, 1.0)   # fallback
        out = _st_astext_batch(pd.Series([le, be]))
        assert out[0] == out[1] == "POINT (inf 1)"

    def test_fast_and_fallback_agree_on_neg_inf(self):
        from geospark.functions.geometry import _st_astext_batch
        le = struct.pack("<BIdd", 1, 1, 2.0, -math.inf)
        be = struct.pack(">BIdd", 0, 1, 2.0, -math.inf)
        out = _st_astext_batch(pd.Series([le, be]))
        assert out[0] == out[1] == "POINT (2 -inf)"


class TestAnnStrategyGate:
    def test_unrolled_and_fold_bit_equal(self, spark):
        """The size-gated strategy choice must never change results:
        codegen'd unrolled vs interpreted fold execute the same
        left-to-right double arithmetic."""
        from geospark.operators.similarity import ann_topk
        e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        qv = (e.limit(1).collect()[0]["embedding"])
        a = ann_topk(e, qv, 25, unroll=True).toPandas()
        b = ann_topk(e, qv, 25, unroll=False).toPandas()
        assert list(a.vec_id) == list(b.vec_id)
        assert list(a.sim) == list(b.sim)  # exact, not approx

    def test_gate_picks_fold_for_small(self):
        from geospark.operators.similarity import ANN_UNROLL_MIN_ROWS
        from geospark.queries import _parquet_rows
        n = _parquet_rows("/root/testdata/sf0.01/embeddings.parquet")
        assert 0 < n < ANN_UNROLL_MIN_ROWS


def _rand_pts(spark, n, seed, schema):
    rng = np.random.default_rng(seed)
    rows = [(int(i), float(la), float(lo)) for i, (la, lo) in
            enumerate(zip(rng.uniform(-85, 85, n),
                          rng.uniform(-178, 178, n)))]
    return rows, spark.createDataFrame(rows, schema)


class TestKnnFallbackAndCoverage:
    def test_fallback_broadcasts_queries_not_points(self, spark):
        """max_iters=0 forces the brute-force fallback; the broadcast
        side must be the (small) query set — BuildLeft — never the
        points fact table."""
        from geospark.operators.joins import knn_join
        _, pts = _rand_pts(spark, 200, 5,
                           "point_id long, lat double, lon double")
        _, qs = _rand_pts(spark, 10, 6,
                          "query_id long, q_lat double, q_lon double")
        plans = []
        out = knn_join(qs, pts, 3, res=5, max_iters=0,
                       debug_plans=plans)
        assert out.count() == 30
        assert len(plans) == 1
        s = plans[0]._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin BuildLeft" in s
        assert "BuildRight" not in s

    def test_full_coverage_satisfies_without_fallback(self, spark):
        """Antipodal-longitude points under the planar metric: the
        radius guarantee can never be met, but once the ring covers the
        whole grid the candidate set is the whole table and the top-k
        is exact by definition — no brute-force fallback pass."""
        from geospark.operators.joins import knn_join
        pts_rows = [(0, 0.0, 179.5), (1, 0.0, 179.0), (2, 10.0, 178.0)]
        qs_rows = [(0, 0.0, -179.5)]
        pts = spark.createDataFrame(
            pts_rows, "point_id long, lat double, lon double")
        qs = spark.createDataFrame(
            qs_rows, "query_id long, q_lat double, q_lon double")
        plans = []
        got = knn_join(qs, pts, 2, res=2, max_iters=8,
                       debug_plans=plans).collect()
        for p in plans:
            s = p._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastNestedLoopJoin" not in s  # no fallback ran
        # planar metric does NOT wrap: nearest by unwrapped dlon is the
        # one with smallest |(-179.5) - lon|... all ~359 apart; ranks by
        # dlat^2+dlon^2
        exp = sorted(pts_rows, key=lambda r: (
            (0.0 - r[1]) ** 2 + (-179.5 - r[2]) ** 2, r[0]))[:2]
        assert [r.point_id for r in sorted(got, key=lambda r: r.rank)] \
            == [r[0] for r in exp]

    def test_density_stats_memoized(self, spark):
        from geospark.operators import joins
        from geospark.functions.cells import cell_encode
        _, pts = _rand_pts(spark, 300, 7,
                           "point_id long, lat double, lon double")
        p = pts.withColumn("_pcell", cell_encode("lat", "lon", 6))
        joins._DENSITY_CACHE.clear()
        a = joins._density_stats(p, 6)
        assert len(joins._DENSITY_CACHE) == 1
        # second call with an equivalent plan: served from cache
        p2 = pts.withColumn("_pcell", cell_encode("lat", "lon", 6))
        b = joins._density_stats(p2, 6)
        assert a == b
        assert len(joins._DENSITY_CACHE) == 1


class TestIvfIndexInvalidation:
    def test_rewritten_source_forces_rebuild(self, spark, tmp_path):
        """Rewriting embeddings.parquet must invalidate the
        materialized IVF index: the probe reflects the new rows."""
        import shutil
        from pyspark.sql import functions as F
        from geospark import queries as q
        sf = str(tmp_path / "sf")
        (tmp_path / "sf").mkdir()
        src = spark.read.parquet(
            "/root/testdata/sf0.01/embeddings.parquet")
        src.write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")
        p1 = q._ivf_index_path(spark, sf)
        r1 = {r.vec_id for r in q.q_ivf_ann_topk(spark, sf).collect()}
        # rewrite with HALF the rows (drop every even vec_id except 0)
        sub = src.filter((F.col("vec_id") % 2 == 1)
                         | (F.col("vec_id") == 0))
        sub.write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")
        p2 = q._ivf_index_path(spark, sf)
        assert p2 != p1  # new fingerprint -> new index path
        r2 = {r.vec_id for r in q.q_ivf_ann_topk(spark, sf).collect()}
        # every probe hit must exist in the NEW table (no stale rows)
        live = {r.vec_id for r in sub.select("vec_id").collect()}
        assert r2 <= live
        shutil.rmtree(p1, ignore_errors=True)
        shutil.rmtree(p2, ignore_errors=True)


class TestUrlCanonicalization:
    CASES = [
        ("HTTP://WWW.Example.COM/Path/?utm_source=x#frag",
         "https://example.com/Path"),
        ("https://example.com/Path", "https://example.com/Path"),
        ("http://example.com//", "https://example.com"),
        ("https://www.Sub.Host.org/a/b#x", "https://sub.host.org/a/b"),
        ("ftp://Files.Example.com/Data/", "ftp://files.example.com/Data"),
        ("https://example.com", "https://example.com"),
    ]

    def test_policy_cases_spark(self, spark):
        from pyspark.sql import functions as F
        from geospark.operators.dedup import canonical_url
        df = spark.createDataFrame([(u,) for u, _ in self.CASES],
                                   "url string")
        got = [r.c for r in
               df.select(canonical_url(F.col("url")).alias("c"))
               .collect()]
        assert got == [e for _, e in self.CASES]

    def test_sql_twin_matches(self):
        import duckdb
        from geospark.operators.dedup import canonical_url_sql
        for u, e in self.CASES:
            got = duckdb.sql(
                f"SELECT {canonical_url_sql(repr(u))} AS c").fetchone()[0]
            assert got == e, u

    def test_dedup_collapses_variants(self, spark):
        from geospark.operators.dedup import url_dedup
        df = spark.createDataFrame(
            [(1, "http://www.ex.com/a?q=1"),
             (2, "https://EX.com/a/"),
             (3, "https://ex.com/a#top"),
             (4, "https://ex.com/b")],
            "doc_id long, url string")
        out = {r.url: (r.keep_id, r.n_dups)
               for r in url_dedup(df).collect()}
        assert out == {"https://ex.com/a": (1, 3),
                       "https://ex.com/b": (4, 1)}


class TestTopTerms:
    def test_rank_order_exact(self, spark):
        from geospark.operators.textstats import top_terms
        df = spark.createDataFrame(
            [(1, "apple apple banana cherry"),
             (2, "banana banana cherry"),
             (3, "cherry date")],
            "doc_id long, text string")
        out = {(r.doc_id, r.rank): r.term
               for r in top_terms(df, 2).collect()}
        # doc1: apple tf=2 -> rank1; banana/cherry tf=1, banana df=2 <
        # cherry df=3 -> banana rank2
        assert out[(1, 1)] == "apple"
        assert out[(1, 2)] == "banana"
        assert out[(2, 1)] == "banana"
        assert out[(3, 2)] == "date" or out[(3, 1)] == "date"
