"""Exactly-once streaming sink into an icelite table (north rule: every
stage writes per-partition lineage rows to the metrics table — including
the streaming ingest stage).

Spark's exactly-once contract for foreachBatch is *replayable source +
idempotent sink*: after a crash, checkpoint recovery re-offers the last
in-flight micro-batch with the SAME batch id.  The sink therefore derives
the icelite batch tag deterministically from that id (``sb{batch_id}``)
and ``icelite.catalog.append_batch`` skips tags already in the manifest —
a replayed batch is a no-op, a batch that crashed between its data write
and its manifest swap is an orphan the next attempt GCs and rewrites.
Every committed micro-batch lands per-partition lineage rows (row count,
key bounds, checksum) in the manifest like any batch stage.

On a real cluster the same foreachBatch body binds to an Iceberg
``MERGE``/append with the streaming batch id recorded as a snapshot
property — the standard Iceberg exactly-once sink pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..icelite import catalog as ice


def stream_to_icelite(
    stream_df: DataFrame,
    root: str,
    table: str,
    *,
    stage: str,
    key_col: str,
    n_partitions: int = 8,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start a foreachBatch writer committing each micro-batch to the
    icelite table with exactly-once semantics.  Returns the started
    StreamingQuery (caller awaits/stops)."""

    def _commit(df: DataFrame, batch_id: int) -> None:
        ice.append_batch(
            df,
            root,
            table,
            stage=stage,
            key_col=key_col,
            n_partitions=n_partitions,
            batch_tag=f"sb{batch_id}",
        )

    writer = (
        stream_df.writeStream.foreachBatch(_commit)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
