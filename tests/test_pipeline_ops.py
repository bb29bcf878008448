"""Checkpoint/resume, multimodal plumbing, streaming convergence, and
dedup/similarity operator properties (Tier 3, SURVEY.md §5.2)."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


# ---------------------------------------------------------------------------
# checkpoint / lineage / resume
# ---------------------------------------------------------------------------

def test_checkpoint_resume(spark, tmp_path):
    from geospark.sources.checkpoint import CheckpointStore, Pipeline
    root = str(tmp_path / "ckpt")
    calls = {"a": 0, "b": 0}

    def build(n):
        def f():
            calls[n] += 1
            return spark.range(100).withColumn("v", F.col("id") * 2)
        return f

    p1 = Pipeline(spark, CheckpointStore(root))
    df_a = p1.stage("a", build("a"))
    df_b = p1.stage("b", build("b"))
    assert calls == {"a": 1, "b": 1}
    rows1 = sorted((r.id, r.v) for r in df_b.collect())

    # resume: nothing reruns, outputs identical
    p2 = Pipeline(spark, CheckpointStore(root))
    df_a2 = p2.stage("a", build("a"))
    df_b2 = p2.stage("b", build("b"))
    assert calls == {"a": 1, "b": 1}
    assert [s["skipped"] for s in p2.report] == [True, True]
    assert sorted((r.id, r.v) for r in df_b2.collect()) == rows1

    # force-rerun upstream invalidates downstream (fingerprint chain)
    p3 = Pipeline(spark, CheckpointStore(root))
    p3.stage("a", build("a"), force=True)
    p3.stage("b", build("b"))
    assert calls == {"a": 2, "b": 2}


def test_checkpoint_lineage_and_manifest(spark, tmp_path):
    from geospark.sources.checkpoint import CheckpointStore
    store = CheckpointStore(str(tmp_path / "ck2"))
    df, manifest, skipped = store.run_stage(
        spark, "s1", lambda: spark.range(1000).repartition(4))
    assert not skipped
    assert manifest["n_rows"] == 1000
    assert manifest["n_bytes"] > 0
    lin = store.lineage(spark, "s1").toPandas()
    assert lin["n_rows"].sum() == 1000
    assert len(lin) >= 2  # multiple partitions recorded
    # uncommitted (torn) manifest is invisible: delete manifest -> rerun
    m = store._manifest_path("s1", manifest["snapshot_id"])
    os.remove(m)
    _, m2, skipped2 = store.run_stage(
        spark, "s1", lambda: spark.range(1000))
    assert not skipped2


def test_diff_pending(spark):
    from geospark.sources.checkpoint import diff_pending
    cur = spark.range(10).withColumnRenamed("id", "k")
    done = spark.createDataFrame([(1,), (3,), (7,)], "k long")
    left = sorted(r.k for r in diff_pending(cur, done, ["k"]).collect())
    assert left == [0, 2, 4, 5, 6, 8, 9]


def test_st_geomfromwkb_normalizes_foreign_wkb(spark):
    import struct
    from pyspark.sql import functions as F
    from geospark.functions.geometry import st_geomfromwkb, st_x, st_y
    big_endian = struct.pack(">BIdd", 0, 1, 30.0, 10.0)
    df = spark.createDataFrame([(big_endian,)], "wkb binary")
    out = df.select(st_geomfromwkb(F.col("wkb")).alias("g")) \
        .select(st_x(F.col("g")).alias("x"), st_y(F.col("g")).alias("y"),
                F.col("g")).collect()[0]
    assert (out.x, out.y) == (30.0, 10.0)
    assert out.g[0] == 1  # canonical little-endian


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def test_multimodal_meta_and_features(spark):
    from geospark.operators import multimodal as mm
    assets = mm.synth_assets_df(spark, 60).cache()
    meta = mm.with_asset_meta(assets).toPandas().sort_values("asset_id")
    assert len(meta) == 60 and meta["valid"].all()
    assert set(meta["kind"]) == {1, 2, 3}
    assert (meta["width"] >= 4).all() and (meta["n_bytes"] > 16).all()

    feats = mm.byte_histogram_features(assets).toPandas()
    assert len(feats) == 60
    fl = np.array(feats["features"].tolist())
    assert fl.shape[1] == 16
    np.testing.assert_allclose(fl.sum(axis=1), 1.0, atol=1e-9)

    frames = mm.frame_sample(assets, every_k=2).toPandas()
    vids = meta[meta["kind"] == mm.KIND_VIDEO]
    exp = int(sum((nf + 1) // 2 for nf in vids["n_frames"]))
    assert len(frames) == exp
    assert (frames["frame_bytes"].map(len) > 0).all()


def test_multimodal_decode_stub_gate(spark):
    from geospark.operators import multimodal as mm
    a = mm.make_asset(7, mm.KIND_IMAGE, 8, 6)
    with pytest.raises(NotImplementedError):
        mm.decode_image(a)
    img = mm.decode_image(a, allow_fake=True)
    assert img.shape == (6, 8) and img.dtype == np.uint8
    # deterministic
    np.testing.assert_array_equal(img, mm.decode_image(a, allow_fake=True))


# ---------------------------------------------------------------------------
# streaming converges to batch
# ---------------------------------------------------------------------------

def test_stream_tile_counts_matches_batch(spark, tmp_path):
    from geospark.sources.synth import pages_df, PAGES_SCHEMA
    from geospark.operators.extract import extract_pages
    from geospark.streaming.stream import (run_available_now,
                                           stream_tile_counts)
    src = str(tmp_path / "pages_src")
    pages = pages_df(spark, 800)
    geo = extract_pages(pages)
    geo.write.mode("overwrite").parquet(src)

    schema = ("url string, warc_ts timestamp, lang string, "
              "lat double, lon double, kind string")
    # update mode: last refinement per (window, cell) == exact batch agg
    sdf = stream_tile_counts(spark, src, schema=schema, res=5,
                             window="1 hour")
    run_available_now(sdf, str(tmp_path / "ck_u"), "stream_tiles_u",
                      output_mode="update")
    got = spark.sql("SELECT cell, SUM(n) AS n FROM ("
                    "SELECT win_start, cell, MAX(n_docs) AS n "
                    "FROM stream_tiles_u GROUP BY 1, 2) GROUP BY cell")
    from geospark.operators.tiles import tile_counts
    exp = tile_counts(spark.read.parquet(src), 5) \
        .withColumnRenamed("n_docs", "n")
    g = {(r.cell, r.n) for r in got.collect()}
    e = {(r.cell, r.n) for r in exp.collect()}
    assert g == e

    # append mode: watermark semantics — emitted rows are a subset of
    # the batch result, each exactly matching its batch count
    sdf2 = stream_tile_counts(spark, src, schema=schema, res=5,
                              window="1 hour")
    run_available_now(sdf2, str(tmp_path / "ck_a"), "stream_tiles_a",
                      output_mode="append")
    got_a = spark.sql("SELECT cell, SUM(n_docs) AS n FROM stream_tiles_a "
                      "GROUP BY cell")
    ga = {r.cell: r.n for r in got_a.collect()}
    eb = {r.cell: r.n for r in exp.collect()}
    assert all(k in eb and ga[k] <= eb[k] for k in ga)


def test_stream_dedup_first(spark, tmp_path):
    """applyInPandasWithState stateful dedup: each url emitted once even
    when re-crawled in later microbatches."""
    from geospark.sources.synth import pages_df
    from geospark.streaming.stream import (run_available_now,
                                           stream_dedup_first)
    src = str(tmp_path / "dups_src")
    pages = pages_df(spark, 200).select("url", "warc_ts", "lang")
    # same 200 urls written twice -> two input files, re-crawl shape
    pages.coalesce(1).write.mode("overwrite").parquet(src)
    pages.coalesce(1).write.mode("append").parquet(src)

    sdf = (spark.readStream
           .schema("url string, warc_ts timestamp, lang string")
           .option("maxFilesPerTrigger", 1).parquet(src))
    out = stream_dedup_first(
        sdf, "url", "url string, warc_ts timestamp, lang string")
    q = (out.writeStream.format("memory").queryName("dedup_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("SELECT url, COUNT(*) AS c FROM dedup_stream "
                    "GROUP BY url")
    rows = got.collect()
    assert len(rows) == 200
    assert all(r.c == 1 for r in rows)


# ---------------------------------------------------------------------------
# dedup / similarity properties
# ---------------------------------------------------------------------------

def test_exact_dedup_keeps_one_per_text(spark):
    from geospark.operators.dedup import exact_dedup
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "ccc"), (5, "bbb")],
        "doc_id long, text string")
    out = exact_dedup(df).toPandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 2, 4]


def test_minhash_lsh_finds_near_dups(spark):
    from geospark.operators.dedup import minhash_pairs
    base = ("the quick brown fox jumps over the lazy dog while data "
            "flows through spark pipelines at massive scale every day")
    docs = [(0, base), (1, base.replace("lazy", "sleepy")),
            (2, "completely different words about unrelated topics "
                "nothing shared here at all in any shingle window ok"),
            (3, base + " with a small suffix added")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {(r.doc_a, r.doc_b)
             for r in minhash_pairs(df, threshold=0.3).collect()}
    assert (0, 1) in pairs and (0, 3) in pairs
    assert not any(2 in p for p in pairs)


def test_lsh_ann_recall_planted(spark):
    """LSH-bucketed ANN recall@10 vs brute force on PLANTED near-dups —
    the guarantee that matters for dedup: strongly correlated vectors
    land in the query's buckets with high probability."""
    from geospark.operators.similarity import cosine_col, lsh_ann_topk
    rng = np.random.default_rng(123)
    q = rng.normal(size=64)
    rows = []
    for i in range(9):  # 9 planted near-dups of the query
        v = q + rng.normal(scale=0.15, size=64)
        rows.append((i + 1, [float(x) for x in v]))
    for i in range(300):  # noise
        rows.append((100 + i,
                     [float(x) for x in rng.normal(size=64)]))
    rows.insert(0, (0, [float(x) for x in q]))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    approx = lsh_ann_topk(e, [float(x) for x in q], 10,
                          n_bits=6, n_tables=4).toPandas()
    planted = set(range(10))
    recall = len(set(approx.vec_id) & planted) / 10.0
    assert recall >= 0.9
    assert approx.vec_id.iloc[0] == 0  # exact self-match ranks first


def test_lsh_ann_isotropic_sanity(spark):
    """On isotropic data the approximate tier still returns the query
    itself and only valid candidates (no exactness claim)."""
    from geospark.operators.similarity import lsh_ann_topk
    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qv = e.filter(F.col("vec_id") == 0).select("embedding") \
        .collect()[0][0]
    approx = lsh_ann_topk(e, qv, 10, n_bits=6, n_tables=4).toPandas()
    assert approx.vec_id.iloc[0] == 0 and approx.sim.iloc[0] == 1.0
    assert approx.sim.is_monotonic_decreasing


# ---------------------------------------------------------------------------
# round 2: real lib-free codecs (BMP / WAV) + feature extraction
# ---------------------------------------------------------------------------

def test_bmp_roundtrip_exact():
    import numpy as np
    from geospark.operators.multimodal import decode_bmp, make_bmp
    rng = np.random.default_rng(3)
    # width 3 exercises the 4-byte row-padding path (3*3=9 -> pad 12)
    for h, w in ((5, 3), (4, 4), (1, 7), (16, 9)):
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        back = decode_bmp(make_bmp(px))
        assert back.shape == (h, w, 3)
        assert np.array_equal(back, px)


def test_decode_image_dispatch():
    import numpy as np
    import pytest
    from geospark.operators.multimodal import (decode_image, make_asset,
                                               make_bmp)
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    assert decode_image(make_bmp(px)).shape == (2, 2, 3)
    # non-BMP without allow_fake still raises (compressed formats)
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n" + b"\x00" * 32)
    # GSMM fake path unchanged
    a = make_asset(1, 1, 4, 3)
    assert decode_image(a, allow_fake=True).shape == (3, 4)


def test_wav_roundtrip_exact():
    import numpy as np
    from geospark.operators.multimodal import decode_wav, make_wav
    s = (np.sin(np.linspace(0, 20, 800)) * 20000).astype(np.int16)
    back, rate = decode_wav(make_wav(s, 8000))
    assert rate == 8000
    assert np.array_equal(back, s)


def test_image_audio_features_spark(spark):
    import numpy as np
    from geospark.operators.multimodal import (audio_features,
                                               image_features, make_bmp,
                                               make_wav)
    rng = np.random.default_rng(5)
    img_rows = [(i, make_bmp(rng.integers(0, 256, size=(8, 6, 3),
                                          dtype=np.uint8)))
                for i in range(4)]
    img_rows.append((99, b"not an image"))
    df = spark.createDataFrame(img_rows, "asset_id long, asset binary")
    feats = {r.asset_id: r.features
             for r in image_features(df).collect()}
    assert set(feats) == {0, 1, 2, 3}      # non-BMP skipped
    assert all(len(v) == 10 for v in feats.values())
    assert all(0.0 <= v[0] <= 255.0 for v in feats.values())

    wav_rows = [(i, make_wav((np.sin(np.linspace(0, 9 + i, 400))
                              * 15000).astype(np.int16), 4000))
                for i in range(3)]
    adf = spark.createDataFrame(wav_rows, "asset_id long, asset binary")
    arows = {r.asset_id: r for r in audio_features(adf).collect()}
    assert set(arows) == {0, 1, 2}
    for r in arows.values():
        assert abs(r.duration_s - 0.1) < 1e-9
        assert 0.0 < r.rms < 1.0 and 0.0 < r.zcr < 1.0


def test_stream_flagship_converges_to_batch(spark, tmp_path):
    """Streaming twin of the EP-RULE flagship: multiple microbatches of
    pages through extract -> PIP join -> per-(zone, cell) partials; the
    rolled-up totals equal the batch pipeline exactly."""
    from pyspark.sql import functions as F
    from geospark.functions.cells import cell_encode
    from geospark.operators.extract import extract_pages
    from geospark.operators.joins import spatial_join
    from geospark.sources.synth import pages_df, zones_df
    from geospark.streaming.stream import flagship_totals, stream_flagship

    src = str(tmp_path / "pages_src")
    pages_df(spark, 1200).repartition(6).write \
        .mode("overwrite").parquet(src)
    zones = zones_df(spark)

    out_dir = str(tmp_path / "partials")
    stream_flagship(spark, src, zones, out_dir,
                    str(tmp_path / "ck_flag"), res=6,
                    max_files_per_trigger=2)  # forces >=3 microbatches

    got = {(r.zone_id, r.cell, r.n_pts)
           for r in flagship_totals(spark, out_dir).collect()}
    batch = (spatial_join(extract_pages(spark.read.parquet(src)),
                          zones, res=6)
             .withColumn("cell", cell_encode("lat", "lon", 6))
             .groupBy("zone_id", "cell")
             .agg(F.count(F.lit(1)).alias("n_pts")))
    exp = {(r.zone_id, r.cell, r.n_pts) for r in batch.collect()}
    assert got == exp
    # partials really were appended across >1 microbatch
    n_batches = (spark.read.parquet(out_dir)
                 .select("batch_id").distinct().count())
    assert n_batches >= 2


def test_stream_flagship_restart_exactly_once(spark, tmp_path):
    """Restart semantics: after draining, new source files arrive and a
    SECOND stream_flagship run with the SAME checkpoint processes ONLY
    the new files — totals still equal the batch result over everything
    (foreachBatch + checkpointLocation = no double counting)."""
    from pyspark.sql import functions as F
    from geospark.functions.cells import cell_encode
    from geospark.operators.extract import extract_pages
    from geospark.operators.joins import spatial_join
    from geospark.sources.synth import pages_df, zones_df
    from geospark.streaming.stream import flagship_totals, stream_flagship

    src = str(tmp_path / "pages_src")
    out = str(tmp_path / "partials")
    ck = str(tmp_path / "ck")
    zones = zones_df(spark)

    all_pages = pages_df(spark, 800)
    first = all_pages.filter(F.col("url") < "https://m")  # ~half
    second = all_pages.subtract(first)
    first.coalesce(2).write.mode("overwrite").parquet(src)
    stream_flagship(spark, src, zones, out, ck, res=6)
    n_partials_1 = spark.read.parquet(out).count()

    second.coalesce(2).write.mode("append").parquet(src)
    stream_flagship(spark, src, zones, out, ck, res=6)

    got = {(r.zone_id, r.cell, r.n_pts)
           for r in flagship_totals(spark, out).collect()}
    batch = (spatial_join(extract_pages(spark.read.parquet(src)),
                          zones, res=6)
             .withColumn("cell", cell_encode("lat", "lon", 6))
             .groupBy("zone_id", "cell")
             .agg(F.count(F.lit(1)).alias("n_pts")))
    exp = {(r.zone_id, r.cell, r.n_pts) for r in batch.collect()}
    assert got == exp
    # the restart appended new partials (processed something) but did
    # not reprocess the first batch (totals would then exceed batch)
    assert spark.read.parquet(out).count() > n_partials_1


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """Stateful streaming sessionization: closed sessions emitted
    across microbatches equal the batch sessionizer's output minus each
    user's final (still-open) session."""
    import datetime as dt
    from pyspark.sql import functions as F
    from geospark.streaming.stream import stream_sessionize

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 3 users, sessions split by >30min gaps, spread over two files
    for uid in (1, 2, 3):
        t = base + dt.timedelta(minutes=uid)
        for sess in range(3):
            for k in range(2 + (uid + sess) % 3):
                rows.append((eid, t, uid))
                eid += 1
                t += dt.timedelta(minutes=5)
            t += dt.timedelta(minutes=45)   # close the session
    half = len(rows) // 2
    src = str(tmp_path / "events_src")
    schema = "event_id long, ts timestamp_ntz, user_id long"
    spark.createDataFrame(rows[:half], schema).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    spark.createDataFrame(rows[half:], schema).coalesce(1) \
        .write.mode("append").parquet(src)

    sdf = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(src))
    out = stream_sessionize(sdf)
    q = (out.writeStream.format("memory").queryName("sess_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    from collections import Counter
    got = Counter((r.user_id, r.n_events, r.dur_s) for r in
                  spark.sql("SELECT * FROM sess_stream").collect())

    # batch reference: same lag/sum sessionizer, drop each user's last
    # (open) session
    from pyspark.sql import Window
    e = spark.read.parquet(src)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.expr("timestampdiff(MICROSECOND, "
                "TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)")
    prev = F.lag(us).over(w)
    nf = F.when(prev.isNull() | (us - prev > 1800 * 1_000_000), 1) \
        .otherwise(0)
    sess = (e.withColumn("_sess", F.sum(nf).over(w)).withColumn("_us", us)
            .groupBy("user_id", "_sess")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round((F.max("_us") - F.min("_us")) / 1e6, 3)
                 .alias("dur_s")))
    wmax = Window.partitionBy("user_id")
    closed = (sess.withColumn("_mx", F.max("_sess").over(wmax))
              .filter(F.col("_sess") < F.col("_mx")))
    exp = Counter((r.user_id, r.n_events, r.dur_s)
                  for r in closed.collect())
    assert got == exp and sum(got.values()) == 6  # 2 closed x 3 users
