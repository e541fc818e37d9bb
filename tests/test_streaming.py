"""Structured Streaming parity: availableNow replay of the events fixture
equals the batch plan (exactly-once), and streaming dedup preserves count."""

from __future__ import annotations

from geospatial_spark.streaming import ingest

SF = "/root/testdata/sf0.001"


def _drain(spark, stream_df, tmp_path, name, output_mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", str(tmp_path / name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


def test_windowed_counts_match_batch(spark, tmp_path):
    stream = ingest.events_stream(spark, SF)
    got = _drain(
        spark, ingest.windowed_counts(stream), tmp_path, "win_out", "complete"
    ).collect()
    events = spark.read.parquet(f"{SF}/events.parquet")
    want = ingest.windowed_counts_batch(events).collect()
    key = lambda r: (r["window_start"], r["event_type"])
    assert sorted(got, key=key) == sorted(want, key=key)
    assert len(got) > 0


def test_stream_dedup_count(spark, tmp_path):
    stream = ingest.events_stream(spark, SF)
    got = _drain(spark, ingest.stream_dedup(stream), tmp_path, "dd_out", "append")
    n_distinct = (
        spark.read.parquet(f"{SF}/events.parquet").select("event_id").distinct().count()
    )
    assert got.count() == n_distinct


def test_stateful_sessionize_stream(spark, tmp_path):
    """applyInPandasWithState gap sessionization: replay the events fixture
    as 4 chronological micro-batches; every session CLOSED BY A GAP (i.e.
    every non-final session of a user) must emit with exactly the batch
    twin's values; nothing may emit that the batch twin doesn't contain.
    Two far-future sentinel batches then advance the watermark past every
    real session's timeout: all those sessions must flush AND their state
    rows must be REMOVED — final state holds exactly the sentinel user's
    open session (round-2 review: the old per-user-ordinal tombstones made
    state grow with users-ever-seen)."""
    from pyspark.sql import functions as F

    from geospatial_spark.streaming import sessions as ssn

    events = spark.read.parquet(f"{SF}/events.parquet")
    src_dir = tmp_path / "events_split"
    (
        events.orderBy("ts")
        .withColumn(
            "part", F.ntile(4).over(__import__("pyspark").sql.Window.orderBy("ts"))
        )
        .repartitionByRange(4, "part")
        .write.partitionBy("part")
        .parquet(str(src_dir))
    )
    # sentinel batches (one event each, same user, ~10 and ~20 years ahead):
    # batch 5 advances the watermark so batch 6 fires every pending timeout
    sentinel = events.orderBy("event_id").limit(1)
    for k, days in ((5, 3650), (6, 7300)):
        (
            sentinel.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {days} DAYS"))
            .withColumn("part", F.lit(k))
            .coalesce(1)
            .write.partitionBy("part")
            .mode("append")
            .parquet(str(src_dir))
        )
    # FileStreamSource orders by modification time (write-task completion
    # order — nondeterministic); pin mtimes to the chronological part order
    # so micro-batches replay in event-time order
    import glob
    import os
    import time as _time

    base = _time.time()
    for k in range(1, 7):
        for f in glob.glob(str(src_dir / f"part={k}") + "/*"):
            os.utime(f, (base + k, base + k))
    stream = (
        spark.readStream.schema(events.withColumn("part", F.lit(1)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    q = (
        ssn.sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_out"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state_rows = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    got_df = spark.sql("SELECT * FROM sess_out")
    sent_user = sentinel.collect()[0]["user_id"]
    got = {
        (r["user_id"], r["session_id"]): (r["start_ts"], r["n_events"], r["cents"])
        for r in got_df.collect()
    }
    ref = ssn.sessionize_batch_reference(events, gap_seconds=1800).collect()
    full = {
        (r["user_id"], r["session_id"]): (r["start_ts"], r["n_events"], r["cents"])
        for r in ref
    }
    last_sid = {}
    for r in ref:
        last_sid[r["user_id"]] = max(last_sid.get(r["user_id"], 0), r["session_id"])
    must_emit = {k for k in full if k[1] < last_sid[k[0]]}

    # the sentinel user's far-future session is legitimately not in `full`
    got_real = {k: v for k, v in got.items() if k in full}
    assert len(got) - len(got_real) <= 1  # at most the first sentinel session
    assert must_emit <= set(got_real)     # every gap-closed session emitted
    for k, v in got_real.items():
        assert v == full[k]               # values exactly equal to the twin
    assert len(got_real) > 0
    # state shrank back to exactly the one open (sentinel) session: every
    # timed-out user's state row was removed, not tombstoned
    assert state_rows, "no stateOperators progress recorded"
    assert state_rows[-1] == 1, f"state rows at end: {state_rows}"
    assert (sent_user, None) not in got  # sanity: no NULL session ids
