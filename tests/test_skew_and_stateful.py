"""Tests: salted aggregation/join and the stateful streaming dedup."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F


def test_salted_sum_matches_plain(spark):
    from moz_datapipeline_spark.operators.skew import salted_sum

    df = spark.range(0, 10000).select(
        (F.col("id") % 3).alias("k"), F.col("id").cast("double").alias("v")
    )
    got = {
        r["k"]: r["sum_v"] for r in salted_sum(df, ["k"], "v").collect()
    }
    want = {
        r["k"]: r["s"]
        for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    assert got == want


def test_salted_join_matches_plain(spark):
    from moz_datapipeline_spark.operators.skew import salted_join

    fact = spark.range(0, 5000).select((F.col("id") % 5).alias("k"), "id")
    dim = spark.createDataFrame(
        [(i, f"name{i}") for i in range(5)], "k long, name string"
    )
    got = salted_join(fact, dim, "k").count()
    want = fact.join(dim, "k").count()
    assert got == want == 5000


def test_stateful_dedup_stream(spark, tmp_path):
    """Drive applyInPandasWithState with a real file-based stream: two
    micro-batches; fingerprints repeated across batches must emit once."""
    import json
    import os

    from moz_datapipeline_spark.streaming.stateful import dedup_stream

    src = tmp_path / "stream_in"
    src.mkdir()
    chk = str(tmp_path / "chk")

    def write_batch(name, rows):
        p = src / name
        with open(p, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")

    write_batch("b1.json", [
        {"source": "s1", "fingerprint": 1},
        {"source": "s1", "fingerprint": 2},
        {"source": "s1", "fingerprint": 1},  # dup within batch
        {"source": "s2", "fingerprint": 1},  # same fp, other key → new
    ])

    stream = (
        spark.readStream.schema("source string, fingerprint long")
        .json(str(src))
    )
    q = (
        dedup_stream(stream, "source")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.processAllAvailable()
        first = spark.sql("SELECT * FROM dedup_out").toPandas()
        assert len(first) == 3  # (s1,1), (s1,2), (s2,1)

        # second micro-batch: old fingerprints suppressed by STATE
        write_batch("b2.json", [
            {"source": "s1", "fingerprint": 1},  # seen in batch 1 → dropped
            {"source": "s1", "fingerprint": 3},  # new
        ])
        q.processAllAvailable()
        both = spark.sql("SELECT * FROM dedup_out").toPandas()
        assert len(both) == 4
        s1 = both[both.key == "s1"]["fingerprint"].tolist()
        assert sorted(s1) == [1, 2, 3]
    finally:
        q.stop()


def test_watermark_drops_late_events(spark, tmp_path):
    """Streaming rollup with a watermark: events older than the watermark
    horizon are dropped once the watermark advances past their window."""
    import json

    from moz_datapipeline_spark.streaming.events import hourly_rollup

    src = tmp_path / "wm_in"
    src.mkdir()
    chk = str(tmp_path / "wm_chk")

    def write_batch(name, rows):
        with open(src / name, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema("ts string, event_type string, value double")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "1 hour")
    )
    q = (
        hourly_rollup(stream)
        .writeStream.format("memory")
        .queryName("wm_out")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        write_batch("b1.json", [
            {"ts": "2024-01-01 00:10:00", "event_type": "c", "value": 1.0},
            {"ts": "2024-01-01 00:20:00", "event_type": "c", "value": 2.0},
        ])
        q.processAllAvailable()
        # advance event time far beyond hour 0 + watermark → hour-0 window closes
        write_batch("b2.json", [
            {"ts": "2024-01-01 05:00:00", "event_type": "c", "value": 4.0},
        ])
        q.processAllAvailable()
        closed = spark.sql(
            "SELECT total_value FROM wm_out ORDER BY window_start"
        ).toPandas()
        assert closed["total_value"].tolist() == [3.0]  # hour 0 emitted on close

        # a LATE event for hour 0 (watermark now at 04:00) must be dropped
        write_batch("b3.json", [
            {"ts": "2024-01-01 00:30:00", "event_type": "c", "value": 100.0},
            {"ts": "2024-01-01 06:00:00", "event_type": "c", "value": 8.0},
        ])
        q.processAllAvailable()
        write_batch("b4.json", [
            {"ts": "2024-01-01 09:00:00", "event_type": "c", "value": 16.0},
        ])
        q.processAllAvailable()
        out = spark.sql(
            "SELECT window_start, total_value FROM wm_out ORDER BY window_start"
        ).toPandas()
        # hour 0 stays 3.0 — the late 100.0 never lands anywhere
        assert out["total_value"].tolist()[0] == 3.0
        assert 100.0 not in out["total_value"].tolist()
        assert 103.0 not in out["total_value"].tolist()
    finally:
        q.stop()


def test_session_window_streaming(spark, tmp_path):
    """Native session_window under readStream: events within the gap fuse
    into one session; a gap larger than 30 min splits sessions."""
    import json

    from moz_datapipeline_spark.streaming.events import sessionize_streaming

    src = tmp_path / "sess_in"
    src.mkdir()
    chk = str(tmp_path / "sess_chk")
    rows = [
        {"ts": "2024-01-01 00:00:00", "user_id": 1},
        {"ts": "2024-01-01 00:10:00", "user_id": 1},   # same session
        {"ts": "2024-01-01 02:00:00", "user_id": 1},   # new session (gap 110m)
        {"ts": "2024-01-01 00:05:00", "user_id": 2},
        # watermark driver: pushes event time forward so sessions close
        {"ts": "2024-01-01 09:00:00", "user_id": 99},
    ]
    with open(src / "b1.json", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema("ts string, user_id long")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "10 minutes")
    )
    q = (
        sessionize_streaming(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql(
            "SELECT user_id, n_events FROM sess_out ORDER BY user_id, session_start"
        ).toPandas()
        u1 = out[out.user_id == 1]["n_events"].tolist()
        assert u1 == [2, 1]  # fused session of 2, then a separate 1
        assert out[out.user_id == 2]["n_events"].tolist() == [1]
    finally:
        q.stop()


def test_dedup_batch_twin(spark):
    from moz_datapipeline_spark.streaming.stateful import dedup_batch

    df = spark.createDataFrame(
        [("s1", 1), ("s1", 1), ("s1", 2), ("s2", 1)],
        "source string, fingerprint long",
    )
    out = dedup_batch(df).toPandas()
    assert len(out) == 3


def test_stream_stream_attribution_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join under readStream: clicks
    join same-user views within 15 minutes; the emitted pair set must
    equal the identical plan run in batch over the same rows."""
    import json

    from moz_datapipeline_spark.streaming.events import stream_stream_attribution

    vdir, cdir = tmp_path / "views", tmp_path / "clicks"
    vdir.mkdir()
    cdir.mkdir()
    chk = str(tmp_path / "ssj_chk")

    views = [
        {"user_id": 1, "ts": "2024-01-01 00:00:00"},
        {"user_id": 1, "ts": "2024-01-01 00:10:00"},
        {"user_id": 2, "ts": "2024-01-01 00:00:00"},
        {"user_id": 3, "ts": "2024-01-01 00:30:00"},
    ]
    clicks = [
        {"user_id": 1, "click_id": 100, "ts": "2024-01-01 00:12:00"},
        {"user_id": 2, "click_id": 200, "ts": "2024-01-01 00:20:00"},
        # outside the 15-min horizon of user 3's view
        {"user_id": 3, "click_id": 300, "ts": "2024-01-01 01:00:00"},
    ]
    with open(vdir / "v.json", "w") as fh:
        for r in views:
            fh.write(json.dumps(r) + "\n")
    with open(cdir / "c.json", "w") as fh:
        for r in clicks:
            fh.write(json.dumps(r) + "\n")

    def load(path, schema, stream):
        reader = (
            spark.readStream.schema(schema).json(str(path))
            if stream
            else spark.read.schema(schema).json(str(path))
        )
        return reader.withColumn("ts", F.to_timestamp("ts"))

    vschema = "user_id long, ts string"
    cschema = "user_id long, click_id long, ts string"
    out = stream_stream_attribution(
        load(vdir, vschema, True), load(cdir, cschema, True)
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.click_id, str(r.view_ts))
        for r in spark.table("ssj_out").collect()
    }
    batch = stream_stream_attribution(
        load(vdir, vschema, False), load(cdir, cschema, False)
    )
    want = {(r.click_id, str(r.view_ts)) for r in batch.collect()}
    assert got == want
    # expected joins: click 100 ← both user-1 views; click 200 ← user-2
    # view is 20 min stale (outside); click 300 outside horizon
    assert {c for c, _ in got} == {100}


def test_streaming_funnel_state_across_batches(spark, tmp_path):
    """Ordered funnel via applyInPandasWithState: stage progression
    carries across micro-batches, and on in-order data the final state
    matches the batch funnel_stages fold."""
    import json

    from moz_datapipeline_spark.operators.analytics import funnel_stages
    from moz_datapipeline_spark.streaming.stateful import funnel_stream

    src = tmp_path / "funnel_in"
    src.mkdir()
    chk = str(tmp_path / "funnel_chk")

    def write_batch(name, rows):
        with open(src / name, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")

    batch1 = [
        {"user_id": 1, "ts": 10, "event_type": "view"},
        {"user_id": 1, "ts": 20, "event_type": "click"},
        {"user_id": 2, "ts": 10, "event_type": "click"},  # click first: stuck
        {"user_id": 2, "ts": 20, "event_type": "view"},
    ]
    write_batch("b1.json", batch1)
    stream = (
        spark.readStream.schema("user_id long, ts long, event_type string")
        .json(str(src))
    )
    q = (
        funnel_stream(stream)
        .writeStream.format("memory")
        .queryName("funnel_out")
        .outputMode("update")
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.processAllAvailable()
        s1 = (
            spark.sql("SELECT * FROM funnel_out")
            .toPandas()
            .set_index("user_id")
        )
        assert s1.loc[1, "stages_completed"] == 2  # view+click
        assert s1.loc[2, "stages_completed"] == 1  # view at 20; no later click

        # batch 2: user 1 purchases (advances via STATE from batch 1);
        # user 2 clicks after their view
        batch2 = [
            {"user_id": 1, "ts": 30, "event_type": "purchase"},
            {"user_id": 2, "ts": 30, "event_type": "click"},
        ]
        write_batch("b2.json", batch2)
        q.processAllAvailable()
        out = spark.sql(
            "SELECT user_id, max(stages_completed) AS sc FROM funnel_out "
            "GROUP BY user_id"
        ).toPandas().set_index("user_id")
        assert out.loc[1, "sc"] == 3
        assert out.loc[2, "sc"] == 2
    finally:
        q.stop()

    # batch twin equality on the full in-order replay
    all_events = spark.createDataFrame(
        [(r["user_id"], r["ts"], r["event_type"]) for r in batch1 + batch2],
        "user_id long, ts long, event_type string",
    )
    batch_counts = {
        r["stage_idx"]: r["n_users"] for r in funnel_stages(all_events).collect()
    }
    # streaming end-state: user1 completed 3 stages, user2 completed 2
    assert batch_counts == {1: 2, 2: 2, 3: 1}


def test_ohlc_rollup_streaming_matches_batch(spark, tmp_path):
    """Streaming OHLC bars: closed windows emit once (append mode) and
    equal the batch twin on the same rows — the dual-mode contract."""
    import json

    from moz_datapipeline_spark.streaming.events import ohlc_rollup

    src = tmp_path / "ohlc_in"
    src.mkdir()
    chk = str(tmp_path / "ohlc_chk")

    rows1 = [
        {"ts": "2024-01-01 00:05:00", "event_type": "c", "value": 5.0},
        {"ts": "2024-01-01 00:10:00", "event_type": "c", "value": 9.0},
        {"ts": "2024-01-01 00:50:00", "event_type": "c", "value": 2.0},
        {"ts": "2024-01-01 00:20:00", "event_type": "d", "value": 1.0},
    ]
    rows2 = [  # advances the watermark past hour 0
        {"ts": "2024-01-01 05:00:00", "event_type": "c", "value": 7.0},
    ]
    with open(src / "b1.json", "w") as fh:
        for r in rows1:
            fh.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema("ts string, event_type string, value double")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "1 hour")
    )
    q = (
        ohlc_rollup(stream)
        .writeStream.format("memory")
        .queryName("ohlc_out")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.processAllAvailable()
        with open(src / "b2.json", "w") as fh:
            for r in rows2:
                fh.write(json.dumps(r) + "\n")
        q.processAllAvailable()
        got = {
            (r.event_type, str(r.window_start)): (
                r.open, r.high, r.low, r.close, r.n
            )
            for r in spark.sql("SELECT * FROM ohlc_out").collect()
        }
    finally:
        q.stop()

    # hour-0 windows closed; the hour-5 window is still open
    assert got == {
        ("c", "2024-01-01 00:00:00"): (5.0, 9.0, 2.0, 2.0, 3),
        ("d", "2024-01-01 00:00:00"): (1.0, 1.0, 1.0, 1.0, 1),
    }

    # batch twin over the same closed rows
    batch = spark.createDataFrame(
        [(r["ts"], r["event_type"], r["value"]) for r in rows1],
        "ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    want = {
        (r.event_type, str(r.window_start)): (
            r.open, r.high, r.low, r.close, r.n
        )
        for r in ohlc_rollup(batch).collect()
    }
    assert got == want


def test_dedup_stream_watermarked_bounded_state(spark, tmp_path):
    """Native watermark dedup: in-horizon duplicates drop, and a
    duplicate arriving after the watermark passed its key is
    RE-ADMITTED (state evicted) — the bounded-state trade."""
    import json

    from moz_datapipeline_spark.streaming.stateful import (
        dedup_stream_watermarked,
    )

    src = tmp_path / "wmd_in"
    src.mkdir()
    chk = str(tmp_path / "wmd_chk")

    def write_batch(name, rows):
        with open(src / name, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema("ts string, source string, fingerprint long")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    q = (
        dedup_stream_watermarked(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("wmd_out")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        write_batch("b1.json", [
            {"ts": "2024-01-01 00:00:00", "source": "s", "fingerprint": 1},
            {"ts": "2024-01-01 00:10:00", "source": "s", "fingerprint": 1},
            {"ts": "2024-01-01 00:20:00", "source": "s", "fingerprint": 2},
        ])
        q.processAllAvailable()
        # advance the watermark far past fingerprint 1's state
        write_batch("b2.json", [
            {"ts": "2024-01-01 09:00:00", "source": "s", "fingerprint": 3},
        ])
        q.processAllAvailable()
        # duplicate of fingerprint 1 AFTER eviction: re-admitted
        write_batch("b3.json", [
            {"ts": "2024-01-01 09:30:00", "source": "s", "fingerprint": 1},
        ])
        q.processAllAvailable()
        out = spark.sql(
            "SELECT fingerprint, count(*) AS n FROM wmd_out GROUP BY 1"
        ).collect()
    finally:
        q.stop()
    got = {r.fingerprint: r.n for r in out}
    # fp 1: once from hour 0, once re-admitted after eviction
    assert got == {1: 2, 2: 1, 3: 1}


def test_windowed_topk_stream_vs_batch_twin(spark, tmp_path):
    """Drive the append-mode windowed counts with a real file stream
    (two micro-batches), rank the closed windows, and pin equality
    against windowed_topk_batch on the same rows."""
    import json

    from moz_datapipeline_spark.streaming.events import (
        topk_from_counts,
        windowed_topk_batch,
        windowed_user_counts_stream,
    )

    src = tmp_path / "wt_in"
    src.mkdir()
    chk = str(tmp_path / "wt_chk")
    out = str(tmp_path / "wt_out")

    rows = []
    # hour 0: user 1 x3, user 2 x2, users 3..5 x1 -> top3 = 1,2,3
    for u, n in ((1, 3), (2, 2), (3, 1), (4, 1), (5, 1)):
        for i in range(n):
            rows.append({"ts": f"2026-01-01T00:0{u}:{i:02d}",
                         "event_type": "view", "user_id": u})
    # hour 1: tie between users 7 and 8 -> user asc breaks it
    rows2 = []
    for u in (7, 8, 9):
        for i in range(2):
            rows2.append({"ts": f"2026-01-01T01:1{u - 6}:{i:02d}",
                          "event_type": "view", "user_id": u})

    def write_batch(name, batch):
        with open(src / name, "w") as fh:
            for r in batch:
                fh.write(json.dumps(r) + "\n")

    write_batch("b1.json", rows)
    schema = "ts timestamp, event_type string, user_id long"
    stream = spark.readStream.schema(schema).json(str(src))
    counts = windowed_user_counts_stream(stream, watermark="0 seconds")
    q = (
        counts.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    write_batch("b2.json", rows2)
    q = (
        counts.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append-mode only emits a window once the watermark passes its
    # end: push the watermark beyond hour 1 with a sentinel event in
    # hour 3 (whose own window stays open and never emits)
    write_batch("b3.json", [{"ts": "2026-01-01T03:00:00",
                             "event_type": "view", "user_id": 999}])
    q = (
        counts.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    closed = spark.read.parquet(out)
    got = {
        (r.window_start, r.key, r.rank): (r.user, r.n_events)
        for r in topk_from_counts(closed, k=3).collect()
    }

    # batch twin over the same rows (long-ns ts)
    both = rows + rows2
    ns_rows = []
    for r in both:
        h, m, s = r["ts"][11:13], r["ts"][14:16], r["ts"][17:19]
        epoch = (
            (int(h) * 3600 + int(m) * 60 + int(s)) + 1_767_225_600
        )  # 2026-01-01 UTC
        ns_rows.append((epoch * 1_000_000_000, r["event_type"], r["user_id"]))
    bdf = spark.createDataFrame(
        ns_rows, "ts long, event_type string, user_id long"
    )
    want_raw = windowed_topk_batch(bdf, k=3).collect()
    # the stream's window_start is a timestamp; compare on epoch secs
    import datetime as dt

    norm_got = {
        (int(k[0].replace(tzinfo=dt.timezone.utc).timestamp()), k[1], k[2]): v
        for k, v in got.items()
    }
    want = {
        (r.window_start, r.key, r.rank): (r.user, r.n_events)
        for r in want_raw
    }
    assert norm_got == want
    # hour-1 tie: rank 1 must be user 7 (ascending tie-break), not 8
    hour1 = 1_767_225_600 + 3600
    assert want[(hour1, "view", 1)][0] == 7
    assert want[(hour1, "view", 2)][0] == 8
