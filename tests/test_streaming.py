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
