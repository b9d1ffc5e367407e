"""Structured Streaming -> :class:`SnapshotTable` sink with exactly-once
appends (T1/S13 on the lakehouse tier).

Spark's checkpoint gives at-least-once ``foreachBatch`` invocations: after
a restart the last micro-batch REPLAYS with the same ``batch_id``. The
sink turns that into exactly-once the way Delta does — every commit is
stamped with ``{"app_id", "batch_id"}`` (the txn action) and a replayed
batch id is dropped inside the manifest commit's atomic section, so even
a replay racing its original cannot double-append. A replay detected
late (after its data files were written) leaves only orphan files, which
``vacuum`` collects; the table state is never wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.lakehouse import SnapshotTable


def write_stream_to_snapshot_table(
    stream_df: DataFrame,
    table: SnapshotTable,
    app_id: str,
    checkpoint: str,
    processing_time: str | None = None,
):
    """Start a ``foreachBatch`` writer appending each micro-batch to
    ``table`` idempotently. First batch creates the table if absent.

    ``processing_time=None`` -> ``availableNow`` (drain pending, stop) —
    the scheduled micro-batch cadence (T4); a duration string gives the
    continuous cadence (T1).
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        seen = (
            table.last_committed_batch(app_id) if table._versions() else None
        )
        if seen is not None and batch_id <= seen:
            return  # checkpoint replay: already durable
        txn = {"app_id": app_id, "batch_id": batch_id}
        if not table._versions():
            files = table._write_batch(batch_df)
            table._commit("create", 0, files, replace_all=True, txn=txn)
        else:
            table.append(batch_df, txn=txn)

    writer = (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if processing_time:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merge_stream_into_snapshot_table(
    stream_df: DataFrame,
    table: SnapshotTable,
    key_cols: list[str],
    app_id: str,
    checkpoint: str,
    processing_time: str | None = None,
):
    """Streaming UPSERT (CDC apply): each micro-batch row-level-MERGEs
    into ``table`` by ``key_cols`` — later batches overwrite matching
    keys, new keys insert. Same txn-stamp idempotency as the append
    sink, so checkpoint replays cannot double-apply a batch; within a
    batch the source must be unique per key (pre-aggregate a
    last-write-wins if not). The table must already exist (MERGE needs
    a schema to match against)."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        seen = table.last_committed_batch(app_id)
        if seen is not None and batch_id <= seen:
            return
        table.merge(
            batch_df, key_cols, txn={"app_id": app_id, "batch_id": batch_id}
        )

    writer = (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if processing_time:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
