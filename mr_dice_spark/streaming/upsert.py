"""Streaming CDC upsert: foreachBatch merge into a versioned snapshot store.

Closes the streaming loop over `operators.merge`: a change stream lands in
a keyed snapshot that is correct under failure/replay. Since no
transactional table format ships in this environment, the store is a
minimal commit protocol of the same shape Delta/Iceberg use:

    {path}/snap_{batch_id}/...parquet   immutable snapshot per micro-batch
    {path}/CURRENT                      pointer file naming the live dir

Readers resolve CURRENT then scan one immutable directory; the pointer
update is an atomic ``os.replace``, so a reader never observes a partial
snapshot. foreachBatch may REPLAY a batch after failure — the upsert is
idempotent because (a) merge_latest_wins is deterministic, (b) the replay
rewrites the same snap_{batch_id} directory, and (c) the pointer flip is
last. On a real cluster the pointer lives in a metastore/manifest commit;
the operator shape (read snapshot -> union changes -> latest-wins ->
write -> atomic publish) is unchanged.
"""

from __future__ import annotations

import os
import shutil
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def read_snapshot(spark: SparkSession, path: str) -> DataFrame | None:
    """Resolve the CURRENT pointer and scan the live snapshot (None if no
    snapshot has been committed yet)."""
    pointer = os.path.join(path, "CURRENT")
    if not os.path.exists(pointer):
        return None
    with open(pointer) as fh:
        name = fh.read().strip()
    return spark.read.parquet(os.path.join(path, name))


def _publish(path: str, name: str, keep_last: int = 2) -> None:
    tmp = os.path.join(path, "CURRENT.tmp")
    with open(tmp, "w") as fh:
        fh.write(name)
    os.replace(tmp, os.path.join(path, "CURRENT"))  # atomic publish
    snaps = sorted(d for d in os.listdir(path) if d.startswith("snap_"))
    for old in snaps[:-keep_last]:
        if old != name:
            shutil.rmtree(os.path.join(path, old), ignore_errors=True)


def stream_upsert_to_snapshot(
    stream_df: DataFrame,
    path: str,
    keys: Sequence[str],
    version_col: str,
    checkpoint: str,
    tiebreakers: Sequence[str] = (),
    timeout_seconds: int = 300,
):
    """Drain a keyed change stream into the snapshot store with
    latest-wins semantics (availableNow trigger; drop it for continuous
    upserting). Each micro-batch: read CURRENT -> union the batch ->
    merge_latest_wins -> write snap_{batch_id} -> atomically flip CURRENT.
    """
    from mr_dice_spark.operators.merge import merge_latest_wins

    os.makedirs(path, exist_ok=True)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        base = read_snapshot(spark, path)
        source = base.unionByName(batch_df) if base is not None else batch_df
        merged = merge_latest_wins(source, list(keys), version_col, list(tiebreakers))
        name = f"snap_{batch_id:012d}"
        merged.write.mode("overwrite").parquet(os.path.join(path, name))
        _publish(path, name)

    q = (
        stream_df.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_seconds)
    return q
