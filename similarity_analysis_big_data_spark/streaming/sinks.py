"""Exactly-once streaming sinks via idempotent foreachBatch writes ([ext]).

Structured Streaming guarantees each epoch's batch DataFrame is
deterministic under replay (checkpointed offsets), but the default file
sink only appends — a batch replayed after a crash between write and
commit lands TWICE. The standard production fix is an IDEMPOTENT writer:
key the physical layout by epoch so a replay overwrites the same partition
it wrote before, converging to exactly-once output without a transactional
sink.

``partitionOverwriteMode=dynamic`` is the whole trick: ``mode("overwrite")``
then touches ONLY the partitions present in this batch (``_epoch=N``),
never the rest of the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_batch_idempotent(df: DataFrame, epoch_id: int, path: str) -> None:
    """Write one micro-batch to ``path`` partitioned by its epoch id;
    replaying the same epoch overwrites its own partition (idempotent)."""
    (
        df.withColumn("_epoch", F.lit(int(epoch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_epoch")
        .parquet(path)
    )


def start_idempotent_stream(stream_df: DataFrame, path: str, checkpoint: str):
    """Attach the idempotent writer to a stream; returns the started query."""
    return (
        stream_df.writeStream.foreachBatch(
            lambda df, epoch: write_batch_idempotent(df, epoch, path)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
