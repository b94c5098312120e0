"""Streaming sinks: foreachBatch bridging to the batch writers.

This is THE production pattern for streaming into systems without a
native streaming sink (Elasticsearch included): each micro-batch
arrives as a plain batch DataFrame, so the exact same `write_sink` /
elasticsearch-hadoop writer the batch pipeline uses handles the
stream. Checkpointing gives at-least-once delivery; combined with
`es.mapping.id` upserts (io.es_writer_options) the sink becomes
effectively exactly-once — re-delivered batches overwrite themselves
idempotently.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def start_foreach_batch(
    stream_df: DataFrame,
    write_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    available_now: bool = True,
    output_mode: str = "append",
) -> StreamingQuery:
    """Start a stream that delivers each micro-batch to `write_batch`.

    write_batch(batch_df, batch_id) runs on the driver per micro-batch
    with a BATCH DataFrame — any batch writer works unchanged. batch_id
    is stable across restarts from the same checkpoint, so writers can
    deduplicate re-deliveries (or rely on idempotent upserts).
    `output_mode="update"` is required upstream of stateful operators
    that emit per-update rows (applyInPandasWithState).
    """
    writer = (
        stream_df.writeStream.foreachBatch(write_batch)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def parquet_batch_writer(path: str) -> Callable[[DataFrame, int], None]:
    """Batch writer appending each micro-batch to one parquet dataset
    (the test-env stand-in for the ES bulk upsert writer)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(path)

    return write
