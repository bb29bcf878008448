"""Watermarked streaming ingest (SURVEY.md §2.2 streaming row):
readStream over the pages/events table dir -> event-time windowed
per-cell aggregates with late-data handling via watermark.

The batch and streaming paths share the same column expressions
(cell_encode is a plain Column), so streaming results converge to the
batch tile counts — asserted in tests via trigger(availableNow).
"""

from __future__ import annotations

from ..functions.cells import cell_encode


def _dur_s(start_us: int, last_us: int) -> float:
    """Session duration in seconds at ms precision, decimal HALF_UP on
    the exact integer-microsecond difference — the same value the batch
    sessionizer's ``F.round((max_us-min_us)/1e6, 3)`` and the DuckDB
    oracle's ``ROUND(.., 3)`` produce. Python's built-in ``round`` is
    banker's (HALF_EVEN) and flips the cross-engine hash when the
    duration lands on a .0005 s boundary (ADVICE r3)."""
    return ((last_us - start_us + 500) // 1000) / 1000.0


def stream_tile_counts(spark, src_dir: str, schema: str, *,
                       ts_col: str = "warc_ts", lat_col: str = "lat",
                       lon_col: str = "lon", res: int = 6,
                       watermark: str = "1 hour",
                       window: str = "10 minutes"):
    """Returns a streaming DataFrame of windowed per-cell counts."""
    from pyspark.sql import functions as F
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 8)
           .parquet(src_dir))
    return (src
            .withColumn("cell", cell_encode(lat_col, lon_col, res))
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window).alias("w"), "cell")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .select(F.col("w.start").alias("win_start"),
                    F.col("w.end").alias("win_end"), "cell", "n_docs"))


def stream_dedup_first(stream_df, key_col: str, schema: str):
    """Custom stateful operator (applyInPandasWithState): emit only the
    FIRST occurrence of each key across the whole stream — streaming
    exact-dedup, the stream-side twin of operators.dedup.exact_dedup.

    State per key = one long (occurrences seen). Grouping shuffles by
    key once; state lives in the state store, so re-occurrences at any
    later microbatch are suppressed. Scale: state size is O(distinct
    keys) — for web-scale urls swap the key for a 64-bit hash column
    (hash collisions then drop ~2^-64 of docs; acceptable for dedup)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        seen = state.get[0] if state.exists else 0
        first = None
        n = 0
        for pdf in pdfs:
            n += len(pdf)
            if seen == 0 and first is None and len(pdf):
                first = pdf.iloc[[0]]
        state.update((seen + n,))
        if seen == 0 and first is not None:
            yield first

    return (stream_df.groupBy(key_col)
            .applyInPandasWithState(
                fn, outputStructType=schema,
                stateStructType="n long",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def stream_sessionize(stream_df, *, user_col: str = "user_id",
                      ts_col: str = "ts", id_col: str = "event_id",
                      gap_s: int = 1800):
    """Custom stateful streaming operator (applyInPandasWithState):
    gap-based sessionization — the streaming twin of
    queries.q_sessionize. Emits a row per CLOSED session (a newer event
    arrived more than ``gap_s`` after it ended); each user's open
    session lives in the state store across microbatches and is emitted
    only when a later event closes it.

    Contract (documented, tested): within-user event-time order must be
    non-decreasing across microbatches (true for replay/append sources
    like WARC dumps). For arbitrary out-of-order streams use
    :func:`stream_sessionize_ooo`, which buffers against the watermark
    and has no ordering contract. State per user here =
    (session_start_us, last_us, n_events) — O(active users),
    independent of history length."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_s * 1_000_000
    out_schema = (f"{user_col} long, session_start_us long, "
                  f"n_events long, dur_s double")

    def fn(key, pdfs, state):
        (uid,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        closed = []
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, id_col])
            for t in pdf[ts_col]:
                us = int(pd.Timestamp(t).value // 1000)
                if last is not None and us - last > gap_us:
                    closed.append((uid, start, n,
                                   _dur_s(start, last)))
                    start, n = us, 0
                if start is None:
                    start = us
                last = us
                n += 1
        state.update((start, last, n))
        if closed:
            yield pd.DataFrame(closed, columns=[
                user_col, "session_start_us", "n_events", "dur_s"])

    return (stream_df.groupBy(user_col)
            .applyInPandasWithState(
                fn, outputStructType=out_schema,
                stateStructType=("session_start_us long, last_us long, "
                                 "n_events long"),
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def stream_sessionize_ooo(stream_df, *, user_col: str = "user_id",
                          ts_col: str = "ts", id_col: str = "event_id",
                          gap_s: int = 1800, watermark: str = "1 hour"):
    """Out-of-order-tolerant streaming sessionization: a
    watermark-buffered reorder in front of the gap logic removes
    ``stream_sessionize``'s in-order-per-user contract.

    Per user the state holds (a) a buffer of events not yet final —
    event time still ahead of the watermark, so an earlier event could
    in principle arrive — and (b) the open session. Each invocation:
    append new events to the buffer, then drain every buffered event
    with ts <= watermark in (ts, id) order through the same gap rules
    as the batch/in-order paths; sessions also CLOSE when the
    watermark passes their end by more than the gap (no newer event
    needed). An event-time timeout re-invokes idle users as the
    watermark advances, so buffers drain without new data.

    Scale: state per user = open session + O(events inside the
    watermark delay) buffer — bounded by the disorder window, not by
    history. Events later than the watermark delay are dropped by
    Spark's pre-state watermark filter (standard late-data policy)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_s * 1_000_000
    out_schema = (f"{user_col} long, session_start_us long, "
                  f"n_events long, dur_s double")
    state_schema = ("buf_us array<long>, buf_id array<long>, "
                    "start long, last long, n long")

    def fn(key, pdfs, state):
        (uid,) = key
        if state.exists:
            buf_us, buf_id, start, last, n = state.get
            buf_us = list(buf_us) if buf_us is not None else []
            buf_id = list(buf_id) if buf_id is not None else []
        else:
            buf_us, buf_id, start, last, n = [], [], None, None, 0
        for pdf in pdfs:
            for t, eid in zip(pdf[ts_col], pdf[id_col]):
                buf_us.append(int(pd.Timestamp(t).value // 1000))
                buf_id.append(int(eid))
        wm_us = state.getCurrentWatermarkMs() * 1000
        order = sorted(range(len(buf_us)),
                       key=lambda i: (buf_us[i], buf_id[i]))
        closed = []
        keep_us: list[int] = []
        keep_id: list[int] = []
        for i in order:
            us = buf_us[i]
            if us > wm_us:  # not final yet — an earlier event may come
                keep_us.append(us)
                keep_id.append(buf_id[i])
                continue
            if last is not None and us - last > gap_us:
                closed.append((uid, start, n,
                               _dur_s(start, last)))
                start, n = None, 0
            if start is None:
                start = us
            last = us
            n += 1
        # watermark alone can close the open session: nothing at or
        # before last + gap can still arrive
        if last is not None and wm_us - last > gap_us:
            closed.append((uid, start, n, _dur_s(start, last)))
            start, last, n = None, None, 0
        if keep_us or last is not None:
            state.update((keep_us, keep_id, start, last, n))
            # re-invoke when the watermark moves, to drain the buffer /
            # close by gap without requiring new data for this user
            state.setTimeoutTimestamp(wm_us // 1000 + 1)
        else:
            state.remove()
        if closed:
            yield pd.DataFrame(closed, columns=[
                user_col, "session_start_us", "n_events", "dur_s"])

    return (stream_df.withWatermark(ts_col, watermark)
            .groupBy(user_col)
            .applyInPandasWithState(
                fn, outputStructType=out_schema,
                stateStructType=state_schema,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


def stream_flagship(spark, src_dir: str, zones_df, out_dir: str,
                    checkpoint_dir: str, *, res: int = 6,
                    max_files_per_trigger: int = 8):
    """Streaming twin of the EP-RULE flagship pipeline: readStream pages
    -> geometry extraction -> broadcast-then-refine PIP join -> per
    (zone, cell) PARTIAL counts appended per microbatch.

    foreachBatch reuses the exact batch operators (extract_pages,
    spatial_join, cell_encode) — one code path, two execution modes.
    Partials are append-only (no unbounded streaming state; the
    microbatch groupBy is bounded by the batch size), and the exact
    running totals are a cheap rollup over the partials
    (``flagship_totals``) — the classic streaming-lambda shape without
    the second codebase. Runs with availableNow (drain-everything) for
    batch-replay / tests; drop the trigger for continuous tailing.
    Returns the finished StreamingQuery."""
    from pyspark.sql import functions as F

    from ..operators.extract import extract_pages
    from ..operators.joins import spatial_join
    from ..functions.cells import cell_encode
    from ..sources.synth import PAGES_SCHEMA

    def process_batch(batch_df, batch_id: int):
        geo = extract_pages(batch_df)
        joined = spatial_join(geo, zones_df, res=res)
        counts = (joined
                  .withColumn("cell", cell_encode("lat", "lon", res))
                  .groupBy("zone_id", "cell")
                  .agg(F.count(F.lit(1)).alias("n_pts"))
                  .withColumn("batch_id", F.lit(batch_id)))
        counts.write.mode("append").parquet(out_dir)

    src = (spark.readStream.schema(PAGES_SCHEMA)
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .parquet(src_dir))
    q = (src.writeStream
         .foreachBatch(process_batch)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def flagship_totals(spark, out_dir: str):
    """Exact running totals over the streaming partials."""
    from pyspark.sql import functions as F
    return (spark.read.parquet(out_dir)
            .groupBy("zone_id", "cell")
            .agg(F.sum("n_pts").alias("n_pts")))


def run_available_now(stream_df, checkpoint_dir: str, out_table: str,
                      output_mode: str = "append"):
    """Drain everything currently in the source (test/batch-replay mode)
    into an in-memory sink; returns the query after completion.

    Mode semantics (both exercised in tests):
      append — production shape: a window row emits once, when the
        watermark passes its end; windows still open at stream end stay
        in state (not emitted), and data older than the watermark drops.
      update — emits every refinement; since counts are monotone, the
        max per key equals the exact batch result (the convergence
        check)."""
    q = (stream_df.writeStream
         .format("memory")
         .queryName(out_table)
         .outputMode(output_mode)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def stream_batch_dedup(stream_df, existing, *, text_col: str = "text",
                       id_col: str = "doc_id", n_hashes: int = 16,
                       k: int = 4, bands: int = 4):
    """Streaming tier of batch_dedup_status (operators/dedup.py): each
    arriving document is classified 'exact_dup' / 'near_dup' / 'new'
    against a STATIC existing corpus — the online admission check a
    continuous crawl runs before paying storage for a page.

    Same answers as the batch operator (test-pinned equality), but a
    streaming-legal plan: the per-doc MinHash signature is computed
    MAP-ONLY (one md5 pass over the shingle array, then n_hashes
    array_min folds — no groupBy, so no watermark/state), and every
    probe is a stream-static LEFT join against the corpus's digest
    tables (exact md5 + one table per LSH band), marker columns in
    place of the batch semi-joins.  Append mode, zero streaming state;
    the static digest tables are computed once with the batch
    machinery and persist across micro-batches.  Shingle-less docs get
    NULL band keys (never match) — the batch rule."""
    from pyspark.sql import functions as F

    from ..operators.dedup import (_hash64_col, band_rows,
                                   minhash_signature, perm_constants,
                                   shingles_col)
    rpb = n_hashes // bands
    consts = perm_constants(n_hashes)

    # --- static side (batch machinery, one-time) ---
    exh = (existing.select(F.md5(F.col(text_col)).alias("_h"))
           .distinct()
           .withColumn("_exact", F.lit(1)).persist())
    ex_bands = (band_rows(
        minhash_signature(existing, text_col, id_col, n_hashes, k),
        id_col, bands, rpb)
        .select("band", "bh").distinct().persist())
    band_tables = [
        ex_bands.filter(F.col("band") == i)
        .select(F.col("bh").alias(f"_exbh{i}"),
                F.lit(1).alias(f"_near{i}"))
        for i in range(bands)]

    # --- stream side: map-only signature + bands ---
    s = stream_df.withColumn("_hs", F.transform(
        shingles_col(text_col, k), lambda x: _hash64_col(x)))

    def _xored(c):
        # single-arg lambda on purpose: a `lambda h, c=c:` two-parameter
        # signature makes F.transform pass the ELEMENT INDEX as c
        return lambda h: h.bitwiseXOR(F.lit(c))

    sigs = [F.array_min(F.transform("_hs", _xored(c))).alias(f"_m{i}")
            for i, c in enumerate(consts)]
    s = s.select(F.col(id_col), F.md5(F.col(text_col)).alias("_h"),
                 F.size("_hs").alias("_nsh"), *sigs)
    for i in range(bands):
        bh = F.md5(F.concat_ws(",", *[
            F.col(f"_m{i * rpb + j}").cast("string")
            for j in range(rpb)]))
        s = s.withColumn(f"_bh{i}",
                         F.when(F.col("_nsh") > 0, bh))

    # --- stream-static probes (left joins, marker columns) ---
    out = s.join(exh, "_h", "left")
    for i, bt in enumerate(band_tables):
        out = out.join(bt, out[f"_bh{i}"] == bt[f"_exbh{i}"], "left")
    near_any = F.greatest(*[F.coalesce(F.col(f"_near{i}"), F.lit(0))
                            for i in range(bands)])
    return out.select(
        F.col(id_col),
        F.when(F.col("_exact") == 1, F.lit("exact_dup"))
        .when(near_any == 1, F.lit("near_dup"))
        .otherwise(F.lit("new")).alias("status"))


def stream_fence_events(stream_df, fence_cells, res: int, *,
                        user_col: str = "user_id",
                        ts_col: str = "ts", id_col: str = "event_id",
                        lat_col: str = "lat", lon_col: str = "lon"):
    """Streaming geofence alerting (applyInPandasWithState) — the
    real-time twin of operators/events.fence_events: emit an
    enter/exit row the moment a user's event flips their fence
    membership, with the per-user membership bit living in the state
    store across microbatches (O(active users) state, independent of
    history).

    ``fence_cells`` is an iterable of cell ids at ``res`` — a fence is
    aggregate-sized by construction (a covering / dbscan cores /
    hot-tile set), so it ships in the function closure; at a real
    cluster scale it is a few MB broadcast with the task, same cost
    class as the batch operator's broadcast join. Cell assignment
    happens JVM-side BEFORE the stateful step (cell_encode column
    math), so the only Python is the Arrow-batched state function.

    Contract (stream_sessionize's replay contract): within-user
    event-time order non-decreasing across microbatches. Output
    schema == batch fence_events -> (user, us, event, cell), and the
    chunked replay equals the batch operator exactly (tested).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql import functions as F

    from ..functions.cells import cell_encode
    fence = frozenset(int(c) for c in fence_cells)
    d = stream_df.withColumn(
        "_cell", cell_encode(lat_col, lon_col, res))
    out_schema = f"{user_col} long, us long, event string, cell long"

    def fn(key, pdfs, state):
        (uid,) = key
        last = state.get[0] if state.exists else 0
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, id_col])
            for t, cell in zip(pdf[ts_col], pdf["_cell"]):
                inf = 1 if int(cell) in fence else 0
                if inf != last:
                    us = int(pd.Timestamp(t).value // 1000)
                    rows.append((uid, us,
                                 "enter" if inf else "exit",
                                 int(cell)))
                last = inf
        state.update((last,))
        if rows:
            yield pd.DataFrame(
                rows, columns=[user_col, "us", "event", "cell"])

    return (d.groupBy(user_col)
            .applyInPandasWithState(
                fn, outputStructType=out_schema,
                stateStructType="last_in integer",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def stream_revisit_gaps(stream_df, res: int, *,
                        user_col: str = "user_id",
                        ts_col: str = "ts", id_col: str = "event_id",
                        lat_col: str = "lat", lon_col: str = "lon"):
    """Streaming revisit-gap emission (applyInPandasWithState) — the
    real-time twin of operators/events.revisit_hist: the moment a
    user revisits a cell, emit one row with the exact integer-second
    gap since their previous visit and its log2 bucket
    (bit_length == the batch operator's length(bin(gap_s)) on
    positive BIGINTs). The per-(user, cell) last-visit timestamp
    lives in the state store across microbatches — O(active
    user-cells) state, independent of history length; aggregating
    the emitted buckets reproduces the batch histogram exactly
    (tested), so the same alerting/telemetry reads work on the live
    stream.

    Cell assignment happens JVM-side BEFORE the stateful step
    (cell_encode column math); the only Python is the Arrow-batched
    state function. Contract (stream_sessionize's replay contract):
    within-(user, cell) event-time order non-decreasing across
    microbatches. -> (user, cell, gap_s, bucket) per revisit."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..functions.cells import cell_encode
    d = stream_df.withColumn(
        "_cell", cell_encode(lat_col, lon_col, res))
    out_schema = (f"{user_col} long, cell long, gap_s long, "
                  "bucket int")

    def fn(key, pdfs, state):
        uid, cell = key
        last = state.get[0] if state.exists else None
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, id_col])
            for t in pdf[ts_col]:
                us = int(pd.Timestamp(t).value // 1000)
                if last is not None:
                    gap_s = (us - last) // 1_000_000
                    bucket = 0 if gap_s == 0 else gap_s.bit_length()
                    rows.append((uid, int(cell), gap_s, bucket))
                last = us
        state.update((last,))
        if rows:
            yield pd.DataFrame(
                rows, columns=[user_col, "cell", "gap_s", "bucket"])

    return (d.groupBy(user_col, "_cell")
            .applyInPandasWithState(
                fn, outputStructType=out_schema,
                stateStructType="last_us long",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def stream_speed_flags(stream_df, vmax_udeg_s: int, *,
                       user_col: str = "user_id", ts_col: str = "ts",
                       id_col: str = "event_id",
                       lat_col: str = "lat", lon_col: str = "lon"):
    """Streaming implausible-speed alerting (applyInPandasWithState)
    — the real-time twin of operators/events.speed_flags: the moment
    a user's hop implies a speed past ``vmax_udeg_s``, emit the
    flagged arrival (user, us, dt_us, d2) — byte-identical to the
    batch operator's output on the same events (tested under the
    full value-hash replay gate). Per-user state is ONE row (last
    event's µs timestamp + µdeg coords + tie) — O(active users),
    history-independent.

    Identical integer semantics to the batch twin: µdeg floor
    quantization, lim = min((vmax·dt_us) div 1e6, 6e8) with d2 >
    lim² (Python ints are exact at any width); us is µs since
    2024-01-01 (the shared epoch convention) so the OUTPUT column —
    not just the differences — matches the batch SQL. Contract:
    per-user (ts, tie) order non-decreasing across microbatches, and
    equal-ts ties never split across batches (time-sliced replay
    cuts at ts boundaries, so they don't); within a batch the
    function re-sorts, concatenating Arrow chunks first so a group
    spanning chunks still sorts globally.
    -> (user_id, us, dt_us, d2) per flagged hop."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    epoch_us = pd.Timestamp("2024-01-01").value // 1000
    vmax = int(vmax_udeg_s)
    out_schema = f"{user_col} long, us long, dt_us long, d2 long"

    def fn(key, pdfs, state):
        uid = key[0]
        if state.exists:
            last_us, last_ix, last_iy = state.get
        else:
            last_us = last_ix = last_iy = None
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values([ts_col, id_col])
        rows = []
        import math
        for t, la, lo in zip(pdf[ts_col], pdf[lat_col],
                             pdf[lon_col]):
            us = int(pd.Timestamp(t).value // 1000) - epoch_us
            ix = math.floor(lo * 1_000_000.0)
            iy = math.floor(la * 1_000_000.0)
            if last_us is not None:
                dt_us = us - last_us
                d2 = (ix - last_ix) ** 2 + (iy - last_iy) ** 2
                lim = min((vmax * dt_us) // 1_000_000, 600_000_000)
                if d2 > lim * lim:
                    rows.append((uid, us, dt_us, d2))
            last_us, last_ix, last_iy = us, ix, iy
        state.update((last_us, last_ix, last_iy))
        if rows:
            yield pd.DataFrame(
                rows, columns=[user_col, "us", "dt_us", "d2"])

    return (stream_df.groupBy(user_col)
            .applyInPandasWithState(
                fn, outputStructType=out_schema,
                stateStructType=("last_us long, last_ix long, "
                                 "last_iy long"),
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def stream_threshold_alerts(stream_df, res: int, window_us: int,
                            hi: int, lo: int, *,
                            ts_col: str = "ts",
                            id_col: str = "event_id",
                            lat_col: str = "lat",
                            lon_col: str = "lon"):
    """Streaming hysteresis threshold alerting
    (applyInPandasWithState) — the real-time twin of
    operators/events.threshold_alerts: per cell, the tumbling-window
    count accumulates in the state store ((current window, running
    count, alert bit) — ONE row per active cell) and each window is
    EVALUATED when the cell's next activity closes it: raise when a
    closed window reached ``hi`` while un-alerted, clear when it
    dropped below ``lo`` while alerted. Matches the batch operator
    row for row under the replay gate: both use observed-window
    semantics (zero-event windows neither raise nor clear) and both
    never evaluate a cell's final observed window (batch: LEAD(w)
    IS NOT NULL; stream: nothing closes it).

    Cell assignment and window arithmetic are JVM-side before the
    Arrow state fn; us is µs since the shared 2024-01-01 epoch.
    Contract: per-cell event-time order non-decreasing across
    microbatches (equal-ts ties land in one window, so tie order is
    irrelevant). -> (cell, w, n, alert 1/0) per transition."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..functions.cells import cell_encode
    epoch_us = pd.Timestamp("2024-01-01").value // 1000
    win, hi, lo = int(window_us), int(hi), int(lo)
    d = stream_df.withColumn(
        "_cell", cell_encode(lat_col, lon_col, res))
    out_schema = "cell long, w long, n long, alert long"

    def fn(key, pdfs, state):
        cell = key[0]
        if state.exists:
            cur_w, cur_n, alert = state.get
        else:
            cur_w, cur_n, alert = None, 0, 0
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values([ts_col, id_col])
        rows = []
        for t in pdf[ts_col]:
            us = int(pd.Timestamp(t).value // 1000) - epoch_us
            w = us // win
            if cur_w is not None and w > cur_w:
                if alert == 0 and cur_n >= hi:
                    alert = 1
                    rows.append((cell, cur_w, cur_n, 1))
                elif alert == 1 and cur_n < lo:
                    alert = 0
                    rows.append((cell, cur_w, cur_n, 0))
                cur_n = 0
            cur_w = w
            cur_n += 1
        state.update((cur_w, cur_n, alert))
        if rows:
            yield pd.DataFrame(rows,
                               columns=["cell", "w", "n", "alert"])

    return (d.groupBy("_cell")
            .applyInPandasWithState(
                fn, outputStructType=out_schema,
                stateStructType=("cur_w long, cur_n long, "
                                 "alert long"),
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def stream_resample(stream_df, step_us: int, *,
                    user_col: str = "user_id", ts_col: str = "ts",
                    id_col: str = "event_id",
                    lat_col: str = "lat", lon_col: str = "lon"):
    """Streaming trajectory resampling (applyInPandasWithState) —
    the real-time twin of operators/events.traj_resample: the moment
    a user's next event arrives, emit the interpolated grid
    positions for every epoch the new (prev, next] interval covers —
    row-identical to the batch operator on the same events (the
    stream_speed closing-the-gate pattern: same half-open epoch
    ownership, same sign-decomposed trunc interpolation in exact
    Python ints, same on-grid first-event emission — state.exists
    distinguishes a user's true first event from a batch boundary).
    Per-user state is ONE row (last event's µs timestamp + µdeg
    coords) — O(active users), history-independent, which is why the
    batch operator's window+explode translates 1:1.

    Contract (shared with stream_speed_flags): per-user (ts, tie)
    order non-decreasing across microbatches, equal-ts ties never
    split across batches; within a batch Arrow chunks concatenate
    before the sort. Duplicate timestamps chain the state through
    every row but emit nothing (t0 == t1 owns no epochs), exactly
    the batch rule. -> (user_id, epoch_us, ix, iy)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    epoch_off = pd.Timestamp("2024-01-01").value // 1000
    s = int(step_us)
    out_schema = f"{user_col} long, epoch_us long, ix long, iy long"

    def _trunc_div(num, den):
        return num // den if num >= 0 else -((-num) // den)

    def fn(key, pdfs, state):
        uid = key[0]
        if state.exists:
            last_us, last_ix, last_iy = state.get
        else:
            last_us = last_ix = last_iy = None
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values([ts_col, id_col])
        rows = []
        import math
        for t, la, lo in zip(pdf[ts_col], pdf[lat_col],
                             pdf[lon_col]):
            us = int(pd.Timestamp(t).value // 1000) - epoch_off
            ix = math.floor(lo * 1_000_000.0)
            iy = math.floor(la * 1_000_000.0)
            if last_us is None:
                if us % s == 0:
                    rows.append((uid, us, ix, iy))
            elif us > last_us:
                for k in range(last_us // s + 1, us // s + 1):
                    e = k * s
                    gap = us - last_us
                    rows.append((
                        uid, e,
                        last_ix + _trunc_div(
                            (ix - last_ix) * (e - last_us), gap),
                        last_iy + _trunc_div(
                            (iy - last_iy) * (e - last_us), gap)))
            last_us, last_ix, last_iy = us, ix, iy
        state.update((last_us, last_ix, last_iy))
        if rows:
            yield pd.DataFrame(
                rows, columns=[user_col, "epoch_us", "ix", "iy"])

    return (stream_df.groupBy(user_col)
            .applyInPandasWithState(
                fn, outputStructType=out_schema,
                stateStructType=("last_us long, last_ix long, "
                                 "last_iy long"),
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def stream_od_trips(stream_df, day_us: int = 86_400_000_000, *,
                    user_col: str = "user_id", us_col: str = "us",
                    cell_col: str = "cell", tie_col: str = "event_id"):
    """Streaming origin-destination trips (applyInPandasWithState) —
    the real-time twin of operators/events.od_matrix: one trip row
    per (user, day) emitted the moment the day CLOSES (the user's
    first event of a later day arrives), carrying the closed day's
    first and last cell. The state is load-bearing append-mode
    semantics: a day's origin cell may arrive many microbatches
    before its destination, so the trip is constructible only from
    the (day, first_cell, last_cell) state row — and a destination
    is unknowable until the day ends, so day-close is the earliest
    correct emission point. The user's final (never-closed) day
    stays in the state store and is intentionally absent from the
    output — the batch oracle applies the same day < max(day)
    restriction per user.

    Contract (shared with stream_resample / stream_speed_flags):
    per-user (us, tie) order non-decreasing across microbatches,
    equal-ts ties never split across batches; within a batch the
    Arrow chunks concatenate before the sort. ``us`` and ``cell``
    are computed JVM-side upstream with the SAME column expressions
    as the batch operator (cell_encode + timestampdiff), so the
    Python state fn never re-derives lattice math.
    Per-user state is ONE row. -> (user_id, day, o_cell, d_cell)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    d_us = int(day_us)
    out_schema = f"{user_col} long, day long, o_cell long, d_cell long"

    def fn(key, pdfs, state):
        uid = key[0]
        if state.exists:
            day, f_cell, l_cell = state.get
        else:
            day = f_cell = l_cell = None
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values([us_col, tie_col])
        rows = []
        for us, cell in zip(pdf[us_col], pdf[cell_col]):
            d = int(us) // d_us
            if day is None:
                day, f_cell, l_cell = d, int(cell), int(cell)
            elif d > day:
                rows.append((uid, day, f_cell, l_cell))
                day, f_cell, l_cell = d, int(cell), int(cell)
            else:
                l_cell = int(cell)
        state.update((day, f_cell, l_cell))
        if rows:
            yield pd.DataFrame(
                rows, columns=[user_col, "day", "o_cell", "d_cell"])

    return (stream_df.groupBy(user_col)
            .applyInPandasWithState(
                fn, outputStructType=out_schema,
                stateStructType="day long, f_cell long, l_cell long",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def stream_cell_ewma(stream_df, *, lo_day: int = 0,
                     day_us: int = 86_400_000_000, min_x: int = 5,
                     cell_col: str = "cell", us_col: str = "us"):
    """Streaming EWMA control chart (applyInPandasWithState) — the
    real-time twin of operators/tiles.cell_ewma: a cell's daily row
    (x, ewma, spike) is emitted the moment the day CLOSES (a
    later-day event for that cell arrives), computed from the SAME
    dyadic prefix-sum identity in exact Python ints — N_t = N_{t-1}
    + x_t * 2^(t-1) (doubled at t = 1), ewma = N_t >> t, spike when
    3 * x * 2^(t-1) >= 2 * N_t and x >= min_x. Day-close is the
    earliest correct emission point (the day's count is still
    accumulating until then), so the batch oracle is cell_ewma
    restricted to day < the cell's last observed day; gap days
    between a cell's events close in bulk and decay the baseline
    exactly as the batch dense fill does, and a cell's first
    appearance back-fills the zero days from ``lo_day`` (the
    analysis-window start is a plan-time choice in production, a
    data-derived constant in the oracle pair). Per-cell state is ONE
    row (open day, its running count, the closed-prefix numerator) —
    O(occupied cells), history-independent.

    Contract (shared with stream_resample / stream_od_trips):
    per-cell event-time order non-decreasing across microbatches;
    ``cell`` and ``us`` are computed JVM-side upstream with the SAME
    expressions as the batch operator, so the state fn never
    re-derives lattice math. -> (cell, day, x, ewma, spike)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    d_us = int(day_us)
    lo = int(lo_day)
    mx = int(min_x)
    out_schema = "cell long, day long, x long, ewma long, spike long"

    def fn(key, pdfs, state):
        cid = key[0]
        if state.exists:
            cur_day, n_open, nsum = state.get
        else:
            cur_day = None
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            return
        rows = []

        def close(day, x, nsum):
            t = day - lo + 1
            w = x * (1 << (t - 1)) * (2 if t == 1 else 1)
            nsum += w
            spike = 1 if (t >= 2 and x >= mx
                          and 3 * x * (1 << (t - 1)) >= 2 * nsum) \
                else 0
            rows.append((cid, day, x, nsum >> t, spike))
            return nsum

        for us in sorted(int(v) for v in pdf[us_col]):
            d = us // d_us
            if cur_day is None:
                nsum = 0
                for g in range(lo, d):
                    nsum = close(g, 0, nsum)
                cur_day, n_open = d, 1
            elif d == cur_day:
                n_open += 1
            else:
                nsum = close(cur_day, n_open, nsum)
                for g in range(cur_day + 1, d):
                    nsum = close(g, 0, nsum)
                cur_day, n_open = d, 1
        state.update((cur_day, n_open, nsum))
        if rows:
            yield pd.DataFrame(
                rows, columns=["cell", "day", "x", "ewma", "spike"])

    return (stream_df.groupBy(cell_col)
            .applyInPandasWithState(
                fn, outputStructType=out_schema,
                stateStructType="cur_day long, n_open long, "
                                "nsum long",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def stream_detour(stream_df, *, day_us: int = 86_400_000_000,
                  user_col: str = "user_id", us_col: str = "us",
                  tie_col: str = "event_id"):
    """Streaming trip detour (applyInPandasWithState) — the
    real-time twin of operators/events.detour_index: a (user, day)
    trip's (n_hops, path, line, detour_ppm) row emits the moment the
    day CLOSES (the user's first event of a later day arrives),
    accumulated from ONE state row per user: open day, its first and
    last µdeg position, running L1 path sum and event count — O(1)
    state, history-independent, the reason the batch window+agg
    translates 1:1. Same exact integer arithmetic (floor µdeg
    inputs arrive precomputed; |Δ| sums and the ppm floor run in
    Python ints == BIGINT), same drop rules: single-event and
    zero-path days emit nothing, loops emit NULL detour. The batch
    oracle applies the same day < per-user max(day) restriction.

    Contract (shared with stream_od_trips): per-user (us, tie) order
    non-decreasing across microbatches; uy/ux are computed JVM-side
    upstream with the SAME floor expressions as the batch operator.
    -> (user_id, day, n_hops, path_udeg, line_udeg, detour_ppm)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    d_us = int(day_us)
    out_schema = (f"{user_col} long, day long, n_hops long, "
                  "path_udeg long, line_udeg long, detour_ppm long")

    def fn(key, pdfs, state):
        uid = key[0]
        if state.exists:
            day, oy, ox, py, px, path, n = state.get
        else:
            day = None
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values([us_col, tie_col])
        rows = []

        def close():
            if n >= 2 and path > 0:
                line = abs(py - oy) + abs(px - ox)
                rows.append((uid, day, n - 1, path, line,
                             None if line == 0
                             else path * 1_000_000 // line))

        for us, uy, ux in zip(pdf[us_col], pdf["uy"], pdf["ux"]):
            d, uy, ux = int(us) // d_us, int(uy), int(ux)
            if day is None:
                day, oy, ox, py, px, path, n = d, uy, ux, uy, ux, 0, 1
            elif d == day:
                path += abs(uy - py) + abs(ux - px)
                py, px, n = uy, ux, n + 1
            else:
                close()
                day, oy, ox, py, px, path, n = d, uy, ux, uy, ux, 0, 1
        state.update((day, oy, ox, py, px, path, n))
        if rows:
            yield pd.DataFrame(
                rows, columns=[user_col, "day", "n_hops",
                               "path_udeg", "line_udeg",
                               "detour_ppm"])

    return (stream_df.groupBy(user_col)
            .applyInPandasWithState(
                fn, outputStructType=out_schema,
                stateStructType=("day long, oy long, ox long, "
                                 "py long, px long, path long, "
                                 "n long"),
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def stream_cell_churn(stream_df, *, period_us: int = 604_800_000_000,
                      cell_col: str = "cell", us_col: str = "us",
                      user_col: str = "user_id"):
    """Streaming audience churn (applyInPandasWithState) — the
    real-time twin of operators/events.cell_churn and the streaming
    tier's first ARRAY-state operator: per cell the state carries
    the open week's distinct-user set plus the previous CLOSED
    week's set (two bounded arrays — weekly audience per cell, not
    history), and the consecutive-week Jaccard row emits the moment
    a later-week event closes the open week. A week pair with a gap
    before it never emits (consecutive pairs only — the batch join's
    existence test), and a cell's final open week stays in the
    state store, so the batch oracle is cell_churn restricted to
    period < the cell's last observed week. Set arithmetic runs in
    Python over sorted int arrays — exact, order-free, the same
    integers the batch distinct/join sees.

    Contract (shared with stream_cell_ewma): per-cell event-time
    order non-decreasing across microbatches; cell/us are computed
    JVM-side with the SAME expressions as the batch query.
    -> (cell, period, n_prev, n_curr, n_common, jaccard_ppm)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    p_us = int(period_us)
    out_schema = ("cell long, period long, n_prev long, "
                  "n_curr long, n_common long, jaccard_ppm long")

    def fn(key, pdfs, state):
        cid = key[0]
        if state.exists:
            cur_p, cur_users, prev_p, prev_users = state.get
            cur_users = set(cur_users)
            prev_users = set(prev_users or [])
            if prev_p == -1:      # the no-closed-week-yet sentinel
                prev_p = None
        else:
            cur_p = None
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            return
        rows = []
        order = sorted(zip((int(v) for v in pdf[us_col]),
                           (int(u) for u in pdf[user_col])))
        for us, u in order:
            p = us // p_us
            if cur_p is None:
                cur_p, cur_users = p, {u}
                prev_p, prev_users = None, set()
            elif p == cur_p:
                cur_users.add(u)
            else:
                # close cur_p: emit only a CONSECUTIVE pair
                if prev_p is not None and cur_p == prev_p + 1:
                    common = len(prev_users & cur_users)
                    union = len(prev_users) + len(cur_users) - common
                    rows.append((cid, cur_p, len(prev_users),
                                 len(cur_users), common,
                                 common * 1_000_000 // union))
                prev_p, prev_users = cur_p, cur_users
                cur_p, cur_users = p, {u}
        state.update((cur_p, sorted(cur_users),
                      prev_p if prev_p is not None else -1,
                      sorted(prev_users)))
        if rows:
            yield pd.DataFrame(
                rows, columns=["cell", "period", "n_prev", "n_curr",
                               "n_common", "jaccard_ppm"])

    return (stream_df.groupBy(cell_col)
            .applyInPandasWithState(
                fn, outputStructType=out_schema,
                stateStructType=("cur_p long, cur_users array<long>, "
                                 "prev_p long, "
                                 "prev_users array<long>"),
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
