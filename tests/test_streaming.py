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
    twin's values; nothing may emit that the batch twin doesn't contain."""
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
    # FileStreamSource orders by modification time (write-task completion
    # order — nondeterministic); pin mtimes to the chronological part order
    # so micro-batches replay in event-time order
    import glob
    import os
    import time as _time

    base = _time.time()
    for k in range(1, 5):
        for f in glob.glob(str(src_dir / f"part={k}") + "/*"):
            os.utime(f, (base + k, base + k))
    stream = (
        spark.readStream.schema(events.withColumn("part", F.lit(1)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    got_df = _drain(
        spark,
        ssn.sessionize_stream(stream, gap_seconds=1800),
        tmp_path,
        "sess_out",
        "append",
    )
    got = {
        (r["user_id"], r["session_seq"]): (r["start_ts"], r["n_events"], r["cents"])
        for r in got_df.collect()
    }
    ref = ssn.sessionize_batch_reference(events, gap_seconds=1800).collect()
    full = {
        (r["user_id"], r["session_seq"]): (r["start_ts"], r["n_events"], r["cents"])
        for r in ref
    }
    last_seq = {}
    for r in ref:
        last_seq[r["user_id"]] = max(last_seq.get(r["user_id"], 0), r["session_seq"])
    must_emit = {k for k in full if k[1] < last_seq[k[0]]}

    assert set(got) <= set(full)          # nothing fabricated
    assert must_emit <= set(got)          # every gap-closed session emitted
    for k in got:
        assert got[k] == full[k]          # values exactly equal to the twin
    assert len(got) > 0
