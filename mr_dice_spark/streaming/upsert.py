"""Streaming CDC upsert: foreachBatch merge into a versioned snapshot store.

Closes the streaming loop over `operators.merge`: a change stream lands in
a keyed snapshot that is correct under failure/replay. Since no
transactional table format ships in this environment, the store is a
minimal commit protocol of the same shape Delta/Iceberg use:

    {path}/snap_{batch_id}_{run}/...parquet  immutable snapshot per
                                             (stream run, micro-batch)
    {path}/CURRENT                           pointer file naming the live dir

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


def _read_pointer(path: str) -> tuple[str, str] | None:
    """(snapshot name, committer token) from CURRENT, or None. The token
    identifies WHICH stream run (checkpoint) published the snapshot — the
    same (token, batch_id) pair is the idempotency key, exactly the
    txnAppId/txnVersion convention transactional formats use."""
    pointer = os.path.join(path, "CURRENT")
    if not os.path.exists(pointer):
        return None
    with open(pointer) as fh:
        lines = fh.read().splitlines()
    return (lines[0].strip(), lines[1].strip() if len(lines) > 1 else "")


def read_snapshot(spark: SparkSession, path: str) -> DataFrame | None:
    """Resolve the CURRENT pointer and scan the live snapshot (None if no
    snapshot has been committed yet)."""
    cur = _read_pointer(path)
    if cur is None:
        return None
    return spark.read.parquet(os.path.join(path, cur[0]))


def _publish(path: str, name: str, token: str) -> None:
    prev = _read_pointer(path)
    tmp = os.path.join(path, "CURRENT.tmp")
    with open(tmp, "w") as fh:
        fh.write(f"{name}\n{token}")
    os.replace(tmp, os.path.join(path, "CURRENT"))  # atomic publish
    # retain exactly {new, previous} BY POINTER, not by name order: after a
    # new checkpoint restarts batch numbering at 0, stale high-numbered
    # snaps from the dead run would sort last and survive a keep-last-N
    # rule while the genuinely-previous snapshot got evicted under a
    # still-reading client
    keep = {name} | ({prev[0]} if prev else set())
    for old in os.listdir(path):
        if old.startswith("snap_") and old not in keep:
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
    import uuid

    from mr_dice_spark.operators.merge import merge_latest_wins

    os.makedirs(path, exist_ok=True)
    # Per-RUN token, stored inside the checkpoint directory so it shares
    # the checkpoint's fate: a crash-restart reuses both (replay of an
    # already-published batch is skipped), while deleting the checkpoint to
    # force reprocessing — even at the same path — mints a new token, so
    # the new run's batch 0 merges instead of being wrongly skipped. A
    # path-derived token would silently drop that batch's new data.
    os.makedirs(checkpoint, exist_ok=True)
    marker = os.path.join(checkpoint, "__upsert_run_token")
    if os.path.exists(marker):
        with open(marker) as fh:
            token = fh.read().strip()
    else:
        token = uuid.uuid4().hex[:12]
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(token)
        os.replace(tmp, marker)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # token in the NAME makes snapshot directories unique per
        # (run, batch): a different run's batch 0 writes a different
        # directory, so the rmtree below can never touch the live
        # CURRENT-pointed snapshot (no window where the pointer names a
        # deleted directory)
        name = f"snap_{batch_id:012d}_{token}"
        cur = _read_pointer(path)
        if cur is not None and cur[0] == name:
            # Replay after a crash between _publish and THIS run's
            # checkpoint commit: the same offsets were already applied and
            # published. Skipping is safe only for the same run — the
            # replayed batch is byte-identical by the source contract.
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
        # a partial dir from a crashed attempt of THIS (run, batch) only —
        # never the live snapshot (the skip above fires when final is
        # CURRENT)
        shutil.rmtree(final, ignore_errors=True)
        os.replace(stage, final)
        _publish(path, name, token)

    q = (
        stream_df.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_seconds)
    return q
