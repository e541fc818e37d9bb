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
    compact_every: int | None = None,
    expire_keep_last: int | None = 2,
):
    """Start a foreachBatch writer committing each micro-batch to the
    icelite table with exactly-once semantics.  Returns the started
    StreamingQuery (caller awaits/stops).

    ``compact_every=k`` runs the maintenance loop in-line every k
    committed micro-batches (after batches k-1, 2k-1, ...): a
    ``rewrite_files`` bin-pack (one key-sorted file per partition —
    without it a long-running stream accretes ``n_partitions`` files per
    micro-batch forever) followed by ``expire_snapshots(keep_last=
    expire_keep_last)`` to reclaim the pre-compaction batch directories
    (``None`` keeps every snapshot for time travel).  Safe across
    restarts by construction: compacted-away tags live in
    ``retired_batches``, so a checkpoint replay of a pre-compaction
    micro-batch stays a no-op, and the single stream writer means the
    compaction's CAS cannot lose to itself.  A replayed (already
    committed) micro-batch skips the maintenance hook — replays must
    stay pure no-ops."""
    if compact_every is not None and compact_every < 1:
        raise ValueError(f"compact_every must be >= 1, got {compact_every}")

    def _commit(df: DataFrame, batch_id: int) -> None:
        before = ice.current_manifest(root, table)
        man = ice.append_batch(
            df,
            root,
            table,
            stage=stage,
            key_col=key_col,
            n_partitions=n_partitions,
            batch_tag=f"sb{batch_id}",
        )
        replayed = before is not None and man["version"] == before["version"]
        if (
            compact_every
            and not replayed
            and (batch_id + 1) % compact_every == 0
        ):
            ice.rewrite_files(df.sparkSession, root, table)
            if expire_keep_last is not None:
                ice.expire_snapshots(root, table, keep_last=expire_keep_last)

    writer = (
        stream_df.writeStream.foreachBatch(_commit)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
