"""Streaming surface: batch/native session equivalence + a real
Structured Streaming run (memory source → watermarked tumbling agg)."""

from __future__ import annotations

import pytest

import datetime as dt

import pyspark.sql.functions as F

from etl_demos_spark.data import load_events
from etl_demos_spark.streaming import windows as win

SF_DIR = "/root/testdata/sf0.001"


def test_session_native_equals_batch(spark):
    ev = load_events(spark, SF_DIR)
    batch = win.session_agg_batch(ev, gap="30 minutes")
    native = win.session_agg_native(ev, gap="30 minutes")
    # same multiset of (user, start, end, n) sessions
    a = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch.collect()
    )
    # native session_window end = last_event + gap → compare starts/counts
    b = sorted(
        (r["user_id"], r["session_start"], r["n_events"]) for r in native.collect()
    )
    assert len(a) == len(b)
    assert [(u, s, n) for u, s, _, n in a] == b


def test_tumbling_counts_match_manual(spark):
    ev = load_events(spark, SF_DIR)
    out = win.tumbling_agg(ev, "ts", "1 hour", ("event_type",))
    manual = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = {(r["window_start"], r["event_type"]): r["n_events"] for r in out.collect()}
    b = {(r["h"], r["event_type"]): r["n"] for r in manual.collect()}
    assert a == b


def test_streaming_tumbling_runs(spark, tmp_path):
    """Real readStream → watermark → window agg → memory sink."""
    src = str(tmp_path / "stream_src")
    load_events(spark, SF_DIR).coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    assert stream.isStreaming
    agg = win.stream_tumbling_counts(stream, watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; at least the early
    # windows must have been finalized
    n = spark.sql("select count(*) as n from tumbling_test").collect()[0]["n"]
    assert n > 0
    q.stop()


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, 100, dt.datetime(2024, 1, 1, 10, 0, 0)),
        (2, 100, dt.datetime(2024, 1, 1, 10, 20, 0)),   # same session (20m)
        (3, 100, dt.datetime(2024, 1, 1, 11, 0, 0)),    # new session (40m)
        (4, 200, dt.datetime(2024, 1, 1, 10, 0, 0)),    # other user
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = win.sessionize_batch(df)
    by_event = {r["event_id"]: r["session_seq"] for r in out.collect()}
    assert by_event[1] == 1 and by_event[2] == 1
    assert by_event[3] == 2
    assert by_event[4] == 1


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Replayed records (same event_id, same event time) collapse; the
    streaming survivors match batch dropDuplicates on the same keys."""
    from etl_demos_spark.streaming.dedup import dedup_stream_within_watermark

    ev = (
        load_events(spark, SF_DIR)
        .limit(300)
        .withColumn("ts", F.col("ts").cast("timestamp"))  # watermark needs tz-aware
    )
    # plant replays: every event delivered twice (at-least-once source)
    doubled = ev.unionAll(ev)
    src = str(tmp_path / "dedup_src")
    doubled.coalesce(1).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    deduped = dedup_stream_within_watermark(stream, ["event_id"], "ts", "2 hours")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select event_id from dedup_test").collect()
    q.stop()
    ids = [r["event_id"] for r in got]
    assert len(ids) == len(set(ids))  # no replay survived
    assert set(ids) == {r["event_id"] for r in ev.collect()}  # nothing lost


def test_rollup_cascade_levels_match_direct_agg(spark):
    import datetime as dt
    import pyspark.sql.functions as F
    from etl_demos_spark.streaming import windows as win

    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(minutes=7 * i), "a" if i % 3 else "b", float(i))
        for i in range(200)
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = win.rollup_cascade(ev, "ts", ("event_type",), "value",
                             ("15 minutes", "1 hour", "6 hours"))
    # coarsest level must equal aggregating raw events directly at 6h
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], float(r["_total"]),
                                               r["min_value"], r["max_value"])
        for r in out.filter(F.col("level") == "6 hours").collect()
    }
    direct = {
        (r["w"]["start"], r["event_type"]): (r["n"], float(r["t"]), r["mn"], r["mx"])
        for r in ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value").cast("decimal(12,2)")).alias("t"),
             F.min("value").alias("mn"), F.max("value").alias("mx"))
        .collect()
    }
    assert got == direct and len(got) >= 4


def test_rollup_cascade_rejects_non_nesting_levels(spark):
    import pytest
    from etl_demos_spark.streaming import windows as win

    ev = spark.createDataFrame([], "ts timestamp, event_type string, value double")
    with pytest.raises(ValueError):
        win.rollup_cascade(ev, levels=("10 minutes", "25 minutes"))


@pytest.mark.slow
def test_stream_rollup_cascade_matches_batch(spark, tmp_path):
    """Every window emitted by the streaming cascade (fine append +
    incremental coarse invalidation/upsert) must carry exactly the batch
    cascade's values; both maintained levels must be non-empty."""
    src = str(tmp_path / "src")
    ev = load_events(spark, SF_DIR).select("ts", "event_type", "value")
    ev.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    base = str(tmp_path / "rollup")
    q = win.stream_rollup_cascade(
        stream, base, levels=("15 minutes", "1 hour"),
        watermark="1 hour", checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)
    q.stop()

    batch = win.rollup_cascade(
        spark.read.parquet(src).withColumn("ts", F.col("ts").cast("timestamp")),
        "ts", ("event_type",), "value", ("15 minutes", "1 hour"),
    )
    for i, level in enumerate(("15 minutes", "1 hour")):
        # __day is the physical day-partitioning of the level tables
        # (merge_upsert_partitioned scope), layout not data — dropped
        # before the value comparison
        got = spark.read.parquet(f"{base}/level_{i}").drop("__day")
        n = got.count()
        assert n > 0, f"level {i} empty"
        expect = batch.filter(F.col("level") == level).drop("level")
        # streamed rows are a subset (open tail windows unemitted) with
        # identical values: anti-join on ALL columns must be empty
        mismatch = got.exceptAll(expect).count()
        assert mismatch == 0, f"level {i}: {mismatch} rows differ from batch"


# ---------------------------------------------------------------------------
# Streaming near-dup dedup (signature store maintained per batch)
# ---------------------------------------------------------------------------


def test_near_dedup_processor_across_batches(spark, tmp_path):
    """Deterministic two-batch drive of the foreachBatch body: survivors
    must equal sequential incremental_minhash_dedup calls."""
    from etl_demos_spark.streaming.dedup import near_dedup_batch_processor

    out = str(tmp_path / "out")
    store = str(tmp_path / "store")
    proc = near_dedup_batch_processor(out, store, threshold=0.5)

    b1 = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (1, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [
            (10, "one two three four five six seven eight nine ten"),  # dup of 1
            (11, "completely novel content words appear here first"),
            (12, "completely novel content words appear here first"),  # dup of 11
        ],
        "doc_id long, text string",
    )
    proc(b1, 0)
    proc(b2, 1)
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {0, 1, 11}
    store_ids = {r["id"] for r in spark.read.parquet(store).collect()}
    assert store_ids == {0, 1, 11}


def test_near_dedup_stream_end_to_end(spark, tmp_path):
    """Stream wiring: availableNow drain over a file source produces a
    deduped output and a populated signature store."""
    from etl_demos_spark.streaming.dedup import run_near_dedup_stream

    src = str(tmp_path / "src")
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "one two three four five six seven eight nine ten"),
        (2, "one two three four five six seven eight nine ten"),  # dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    q = run_near_dedup_stream(
        spark, src, str(tmp_path / "out"), str(tmp_path / "store"),
        schema, str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got == {0, 1}
    store_ids = {r["id"] for r in spark.read.parquet(str(tmp_path / "store")).collect()}
    assert store_ids == {0, 1}


def test_resample_locf_fills_gaps(spark):
    import datetime as dt

    import pyspark.sql.functions as F

    from etl_demos_spark.operators.asof import resample_locf

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        ("a", t0, 10.0),
        ("a", t0 + dt.timedelta(hours=3), 7.0),   # hours 1-2 are gaps
        ("b", t0, 1.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp_ntz, v double")
    out = resample_locf(
        df, "ts", ("k",),
        (F.sum(F.col("v").cast("decimal(12,2)")).cast("double").alias("hv"),),
        step="1 hour", fill_cols=("hv",),
    )
    got = {
        (r["k"], r["bucket_ts"].hour): (r["hv"], r["was_observed"])
        for r in out.collect()
    }
    assert got[("a", 0)] == (10.0, 1)
    assert got[("a", 1)] == (10.0, 0)   # carried
    assert got[("a", 2)] == (10.0, 0)   # carried
    assert got[("a", 3)] == (7.0, 1)
    assert got[("b", 0)] == (1.0, 1)
    assert len([k for k in got if k[0] == "b"]) == 1  # b's grid is one bucket


def test_stream_static_join_matches_batch(spark, tmp_path):
    """Stream-static enrichment (the streaming dim join): a file-source
    stream joined to a static dimension produces the same rows as the
    batch join. The static side re-plans per micro-batch, so dim
    updates between batches are picked up — the standard enrichment
    pattern."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "src")
    rows = [(1, "a"), (2, "b"), (3, "a"), (4, "c")]
    df = spark.createDataFrame(rows, "id long, k string")
    df.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    dim = spark.createDataFrame(
        [("a", 10.0), ("b", 20.0)], "k string, factor double"
    )
    stream = spark.readStream.schema(schema).parquet(src)
    enriched = stream.join(F.broadcast(dim), "k").withColumn(
        "scaled", F.col("id") * F.col("factor")
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("ssj_static")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["id"], r["scaled"])
        for r in spark.sql("SELECT * FROM ssj_static").collect()
    }
    want = {
        (r["id"], r["scaled"])
        for r in df.join(dim, "k")
        .withColumn("scaled", F.col("id") * F.col("factor"))
        .collect()
    }
    assert got == want and len(got) == 3  # 'c' has no dim row


def test_streaming_hll_registers_match_batch(spark, tmp_path):
    """Portable-HLL registers as a STREAMING aggregation: register
    updates are max-ops (insertion-order-independent), so a complete-
    mode streaming max-agg over the same rows must land on EXACTLY the
    batch registers — the per-day-partials-forever pattern running
    live. Uses the same md5 bucket/rho expressions as the batch
    operator, certified byte-equal against it."""
    from etl_demos_spark.operators.dedup import md5_long
    from etl_demos_spark.operators.sketches import hll_registers

    src = str(tmp_path / "hll_src")
    ev = load_events(spark, SF_DIR).select("event_type", "user_id")
    ev.coalesce(2).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = spark.readStream.schema(schema).parquet(src)
    h = md5_long(F.col("user_id").cast("string"))
    rem = F.shiftrightunsigned(h, 8)
    rho = F.when(rem == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin(rem))
    )
    agg = (
        stream.select(
            "event_type",
            (h % 256).cast("long").alias("bucket"),
            rho.cast("long").alias("rho"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_type"], r["bucket"]): r["r"]
        for r in spark.sql("select * from hll_stream").collect()
    }
    q.stop()
    want = {
        (r["event_type"], r["bucket"]): r["r"]
        for r in hll_registers(ev, ("event_type",), "user_id").collect()
    }
    assert got == want


def test_streaming_bloom_words_match_batch(spark, tmp_path):
    """Portable-bloom bitmap as a STREAMING aggregation: word updates
    are bit_or ops (commutative, idempotent, insertion-order-
    independent), so a complete-mode streaming bit_or over the same
    keys must land on EXACTLY the batch bloom_build words — a live
    deny-list/eval-set membership filter that any batch probe (or a
    foreachBatch broadcast) can consume mid-stream."""
    from etl_demos_spark.operators.sketches import _bloom_pos, bloom_build

    src = str(tmp_path / "bloom_src")
    ev = load_events(spark, SF_DIR).select("user_id")
    ev.coalesce(2).write.parquet(src)
    schema = spark.read.parquet(src).schema

    n_bits, n_hashes = 512, 4
    stream = spark.readStream.schema(schema).parquet(src)
    pos = F.explode(
        F.array(
            *[
                _bloom_pos(F.col("user_id"), i, n_bits)
                for i in range(n_hashes)
            ]
        )
    ).alias("p")
    agg = (
        stream.select(pos)
        .select(
            F.shiftright("p", 5).alias("word"),
            F.pow(F.lit(2.0), F.col("p").bitwiseAND(F.lit(31)))
            .cast("long")
            .alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("bloom_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["word"], r["bits"])
        for r in spark.sql("select * from bloom_stream").collect()
    }
    q.stop()
    want = {
        (r["word"], r["bits"])
        for r in bloom_build(
            ev.select(F.col("user_id").alias("k")),
            "k",
            n_bits=n_bits,
            n_hashes=n_hashes,
        ).collect()
    }
    assert got == want


def test_streaming_bottomk_quantile_sample_matches_batch(spark, tmp_path):
    """Bottom-k quantile sample as a STREAM: foreachBatch folds each
    micro-batch's bottom-k into the store via bottomk_merge (set-min
    commutes with union), so the final store — and therefore every
    quantile estimate — must be IDENTICAL to batch-sampling all rows
    at once. The live form of the per-shard rollup."""
    from etl_demos_spark.operators.sketches import (
        bottomk_merge,
        bottomk_sample,
        sample_quantiles,
    )

    src = str(tmp_path / "bk_src")
    ev = load_events(spark, SF_DIR).select("event_type", "event_id", "value")
    ev.coalesce(4).write.parquet(src)
    schema = spark.read.parquet(src).schema

    store = {"df": None}

    def fold(batch_df, batch_id):
        sk = bottomk_sample(batch_df, ("event_type",), "value", "event_id", k=32)
        if store["df"] is None:
            merged = sk
        else:
            merged = bottomk_merge(store["df"], sk, ("event_type",), k=32)
        # materialize the store off the micro-batch plan
        store["df"] = spark.createDataFrame(
            merged.collect(), schema=merged.schema
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(src)
        .writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    want_sample = bottomk_sample(ev, ("event_type",), "value", "event_id", k=32)
    got = {tuple(r) for r in store["df"].select("event_type", "h", "value").collect()}
    want = {tuple(r) for r in want_sample.select("event_type", "h", "value").collect()}
    assert got == want
    got_q = {
        (r["event_type"], r["p"]): r["est"]
        for r in sample_quantiles(
            store["df"], ("event_type",), "value", probs=(0.5, 0.9)
        ).collect()
    }
    want_q = {
        (r["event_type"], r["p"]): r["est"]
        for r in sample_quantiles(
            want_sample, ("event_type",), "value", probs=(0.5, 0.9)
        ).collect()
    }
    assert got_q == want_q


def test_near_dedup_processor_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: replaying the SAME batch_id —
    both before and after the store swap landed — must leave the output
    row set and the signature store unchanged (no appended duplicates,
    no emptied partitions)."""
    from etl_demos_spark.streaming.dedup import near_dedup_batch_processor

    out = str(tmp_path / "out")
    store = str(tmp_path / "store")
    proc = near_dedup_batch_processor(out, store, threshold=0.5)

    b1 = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (0, "alpha beta gamma delta epsilon zeta eta theta"),  # same-batch replay
            (1, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    proc(b1, 0)
    first = sorted(
        (r["doc_id"], r["text"]) for r in spark.read.parquet(out).collect()
    )
    # within-batch physical duplicate collapsed to ONE output row
    assert [d for d, _ in first] == [0, 1]
    # full replay of the same batch AFTER the store swap completed
    proc(b1, 0)
    again = sorted(
        (r["doc_id"], r["text"]) for r in spark.read.parquet(out).collect()
    )
    assert again == first
    store_ids = sorted(r["id"] for r in spark.read.parquet(store).collect())
    assert store_ids == [0, 1]
    # a new batch still dedups against the store
    b2 = spark.createDataFrame(
        [(5, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    proc(b2, 1)
    final = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert final == {0, 1}


@pytest.mark.slow
def test_stream_first_response_matches_batch_join(spark, tmp_path):
    """The stateful CEP operator must emit exactly the batch temporal
    join's (user, a_ts, b_ts) set when events arrive in event-time
    order (the documented contract) — driven here as a sorted file
    source split across several files/micro-batch boundaries."""
    from etl_demos_spark.operators.asof import first_response_join
    from etl_demos_spark.streaming.stateful import stream_first_response

    import glob
    import time

    src = str(tmp_path / "resp_src")
    ev = load_events(spark, SF_DIR).select("user_id", "event_type", "ts")
    # event-time-ordered arrival, written as FOUR sequential files so
    # maxFilesPerTrigger=1 really produces multiple ordered micro-batches
    # and pending state must round-trip through the store (a single
    # coalesce(1) file here would silently collapse the test to one
    # batch — the r6 advisor caught exactly that)
    rows = ev.orderBy("ts").collect()
    n = len(rows)
    for i in range(4):
        chunk = rows[i * n // 4 : (i + 1) * n // 4]
        spark.createDataFrame(chunk, schema=ev.schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(0.2)  # distinct mtimes: FileStreamSource orders by them
    assert len(glob.glob(f"{src}/part-*.parquet")) >= 4
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = stream_first_response(
        stream, first="view", then="purchase", within="2 hours"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("resp_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # drain, don't awaitTermination: availableNow + ProcessingTimeTimeout
    # schedules timeout-check batches indefinitely, so the query may
    # never self-terminate — completeness is a finished 0-input batch
    # (drain_available_now). The old awaitTermination(180) burned the
    # full 180 s every run and compared against whatever had landed.
    from etl_demos_spark.streaming.stateful import drain_available_now

    assert drain_available_now(q, 180), "stream did not drain"
    n_batches = len({p["batchId"] for p in q.recentProgress})
    q.stop()
    assert n_batches >= 4, f"expected >=4 micro-batches, ran {n_batches}"
    got = {
        (r["user_id"], r["a_ts"], r["b_ts"])
        for r in spark.sql("SELECT * FROM resp_stream").collect()
    }
    ev_ts = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    expect = {
        (r["user_id"], r["a_ts"], r["b_ts"])
        for r in first_response_join(
            ev_ts, ("user_id",), "ts", "event_type", "view", "purchase", "2 hours"
        ).collect()
    }
    assert expect, "fixture produced no matches — test is vacuous"
    assert got == expect


def test_response_updater_state_round_trips_across_batches():
    """Deterministic two-batch drive of the stateful updater body with a
    fake GroupState: the packed pending-set must round-trip through
    state (the riskiest path — the end-to-end test's single-file source
    runs one micro-batch and never reads state back), a cross-batch
    match must emit, duplicate same-timestamp 'first' events must
    collapse to one pending entry, and a timed-out key must drop its
    state."""
    import pandas as pd

    from etl_demos_spark.streaming.stateful import _make_response_updater

    class FakeState:
        def __init__(self):
            self._v = None
            self.hasTimedOut = False
            self.timeout_set = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

        def remove(self):
            self._v = None

        def setTimeoutDuration(self, ms):
            self.timeout_set = ms

    upd = _make_response_updater("view", "purchase", 2 * 3600 * 1_000_000)
    st = FakeState()

    def batch(rows):
        return [
            pd.DataFrame(
                {
                    "event_type": [r[0] for r in rows],
                    "ts": pd.to_datetime([r[1] for r in rows]),
                }
            )
        ]

    # batch 1: two duplicate views at t0 + one later view, no purchase
    out1 = list(upd((7,), batch([
        ("view", "2024-01-01 10:00:00"),
        ("view", "2024-01-01 10:00:00"),
        ("view", "2024-01-01 10:30:00"),
    ]), st))
    assert out1 == []  # nothing matched yet
    assert st.exists and st.timeout_set is not None
    assert len(st.get[0].split(",")) == 2  # duplicates collapsed

    # batch 2: purchase within 2h of both pending views → 2 matches
    out2 = list(upd((7,), batch([("purchase", "2024-01-01 11:00:00")]), st))
    got = {
        (str(a), str(b))
        for df in out2
        for a, b in zip(df["a_ts"], df["b_ts"])
    }
    assert got == {
        ("2024-01-01 10:00:00", "2024-01-01 11:00:00"),
        ("2024-01-01 10:30:00", "2024-01-01 11:00:00"),
    }
    assert not st.exists  # all pending matched → state removed

    # batch 3: a lone view, then the key times out idle → state dropped
    list(upd((7,), batch([("view", "2024-01-02 09:00:00")]), st))
    assert st.exists
    st.hasTimedOut = True
    out4 = list(upd((7,), iter([]), st))
    assert out4 == [] and not st.exists


def test_stream_first_response_custom_columns(spark, tmp_path):
    """Review r7: the streaming twin must honor non-default key/event
    column names (the batch join always did) — facade-configured
    user_col/event_col reach the stateful operator and the output keeps
    the caller's key column name and type."""
    from etl_demos_spark.operators.asof import first_response_join
    from etl_demos_spark.streaming.stateful import stream_first_response

    rows = [
        ("c1", "view", "2024-01-01 10:00:00"),
        ("c1", "purchase", "2024-01-01 10:30:00"),
        ("c2", "view", "2024-01-01 11:00:00"),
        ("c2", "purchase", "2024-01-01 14:00:00"),  # outside 2h — no match
    ]
    ev = spark.createDataFrame(
        rows, "customer_id string, action string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    src = str(tmp_path / "src")
    ev.orderBy("ts").coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = stream_first_response(
        stream, "view", "purchase", "2 hours",
        user_col="customer_id", event_col="action",
    )
    assert out.columns == ["customer_id", "a_ts", "b_ts"]
    q = (
        out.writeStream.format("memory").queryName("resp_custom")
        .outputMode("append").trigger(availableNow=True).start()
    )
    from etl_demos_spark.streaming.stateful import drain_available_now

    assert drain_available_now(q, 120), "stream did not drain"
    q.stop()
    got = {
        (r["customer_id"], r["a_ts"], r["b_ts"])
        for r in spark.sql("SELECT * FROM resp_custom").collect()
    }
    expect = {
        (r["customer_id"], r["a_ts"], r["b_ts"])
        for r in first_response_join(
            ev, ("customer_id",), "ts", "action", "view", "purchase", "2 hours"
        ).collect()
    }
    assert got == expect
    assert len(got) == 1 and next(iter(got))[0] == "c1"


def test_drain_available_now_requires_offset_stability():
    """ADVICE r7: two consecutive zero-input batches are NOT exhaustion
    when the source is still advancing (two adjacent empty files under
    maxFilesPerTrigger=1 each complete a zero-row batch while input
    remains). drain_available_now must therefore also require every
    source's endOffset to be unchanged across the two latest progress
    entries — and still report drained when offsets hold still, and
    still honor clean termination / error re-raise."""
    from etl_demos_spark.streaming.stateful import drain_available_now

    def progress(n_rows, end_offset):
        return {
            "numInputRows": n_rows,
            "sources": [{"endOffset": end_offset}],
        }

    class FakeQuery:
        def __init__(self, rp, active=True, exc=None):
            self.recentProgress = rp
            self._active = active
            self._exc = exc

        @property
        def isActive(self):
            return self._active

        def exception(self):
            return self._exc

    # empty-but-advancing: offsets moved between the two zero batches
    advancing = FakeQuery(
        [progress(5, '{"logOffset": 1}'),
         progress(0, '{"logOffset": 2}'),
         progress(0, '{"logOffset": 3}')]
    )
    assert drain_available_now(advancing, timeout_s=0.6) is False

    # exhausted: two zero batches with identical end offsets
    exhausted = FakeQuery(
        [progress(5, '{"logOffset": 3}'),
         progress(0, '{"logOffset": 3}'),
         progress(0, '{"logOffset": 3}')]
    )
    assert drain_available_now(exhausted, timeout_s=0.6) is True

    # clean self-termination wins regardless of progress history
    assert drain_available_now(FakeQuery([], active=False)) is True

    # terminal error re-raises (awaitTermination's contract)
    boom = RuntimeError("stream died")
    try:
        drain_available_now(FakeQuery([], active=False, exc=boom))
    except RuntimeError as e:
        assert e is boom
    else:
        raise AssertionError("expected the query error to re-raise")


def test_image_dedup_processor_across_batches_and_replay(spark, tmp_path):
    """Streaming twin of incremental_image_dedup: survivors across two
    micro-batches equal the sequential first-seen-wins replay, and a
    full replay of a completed batch_id (at-least-once delivery) leaves
    output and store unchanged — the shared crash-safe scaffolding."""
    import numpy as np

    from etl_demos_spark.streaming.dedup import image_dedup_batch_processor

    rng = np.random.default_rng(21)

    def ppm(seed_rng):
        raster = seed_rng.integers(0, 256, size=10 * 8 * 3, dtype=np.uint8)
        return b"P6\n10 8\n255\n" + raster.tobytes()

    a, b = ppm(rng), ppm(rng)
    out = str(tmp_path / "out")
    store = str(tmp_path / "store")
    proc = image_dedup_batch_processor(out, store)

    b1 = spark.createDataFrame(
        [(0, a), (0, a), (1, b)], "id long, content binary"
    )  # same-batch physical replay of id 0
    b2 = spark.createDataFrame(
        [(10, a), (11, ppm(rng))], "id long, content binary"
    )  # 10 = perceptual dup of 0, 11 novel
    proc(b1, 0)
    proc(b2, 1)
    got = {r["id"] for r in spark.read.parquet(out).collect()}
    assert got == {0, 1, 11}
    store_ids = {r["id"] for r in spark.read.parquet(store).collect()}
    assert store_ids == {0, 1, 11}
    # full replay of batch 1 after its store swap: idempotent
    proc(b2, 1)
    again = {r["id"] for r in spark.read.parquet(out).collect()}
    assert again == {0, 1, 11}
    assert {r["id"] for r in spark.read.parquet(store).collect()} == {0, 1, 11}


def test_image_dedup_stream_end_to_end(spark, tmp_path):
    """availableNow drain over a file source: deduped image output and
    a populated signature store."""
    import numpy as np

    from etl_demos_spark.streaming.dedup import run_image_dedup_stream

    rng = np.random.default_rng(22)
    raster = rng.integers(0, 256, size=10 * 8 * 3, dtype=np.uint8).tobytes()
    img = b"P6\n10 8\n255\n" + raster
    other = b"P6\n10 8\n255\n" + rng.integers(
        0, 256, size=10 * 8 * 3, dtype=np.uint8
    ).tobytes()
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(0, img), (1, other), (2, img)], "id long, content binary"
    ).coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    q = run_image_dedup_stream(
        spark, src, str(tmp_path / "out"), str(tmp_path / "store"),
        schema, str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = {r["id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got == {0, 1}
