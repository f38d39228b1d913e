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
idempotent because (a) a replay of a batch whose snapshot is already
published is detected via CURRENT and skipped (the publish IS the commit;
without this check a replay would lazily read the very directory it
overwrite-writes, destroying the live snapshot), (b) each attempt writes
to a staging directory and renames it into place, so a crashed attempt
never leaves a partial snap_* directory, and (c) the pointer flip is
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
        name = f"snap_{batch_id:012d}"
        pointer = os.path.join(path, "CURRENT")
        if os.path.exists(pointer):
            with open(pointer) as fh:
                if fh.read().strip() == name:
                    # Replay after a crash between _publish and the stream's
                    # checkpoint commit: the snapshot is already live. Reading
                    # CURRENT here would scan the directory the overwrite
                    # below deletes — skip instead (publish IS the commit).
                    return
        base = read_snapshot(spark, path)
        source = base.unionByName(batch_df) if base is not None else batch_df
        merged = merge_latest_wins(source, list(keys), version_col, list(tiebreakers))
        # Stage then rename: a crash mid-write leaves only .stage_* garbage,
        # never a partial snap_* directory a reader (or cleanup) could see.
        stage = os.path.join(path, f".stage_{name}")
        shutil.rmtree(stage, ignore_errors=True)
        merged.write.mode("overwrite").parquet(stage)
        final = os.path.join(path, name)
        shutil.rmtree(final, ignore_errors=True)  # partial dir from a crashed attempt
        os.replace(stage, final)
        _publish(path, name)

    q = (
        stream_df.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_seconds)
    return q
