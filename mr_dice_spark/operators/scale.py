"""Parallelism guard for compute-heavy narrow operators.

A small Parquet table (one file, a few MB) scans as ONE partition, but
operators like MinHash signatures or shingle explosion do orders of
magnitude more compute per row than the scan itself — on a single
partition all that CPU lands in one task and the other 31 cores idle.
``fan_out`` repartitions the (already column-pruned) input up to the
cluster's parallelism before the heavy expressions run.

At real scale (100 TB → tens of thousands of input splits) the input
partition count already exceeds the target and this is a no-op — the guard
costs nothing on big inputs and fixes the pathological small-input case
(which is exactly what a per-query driver, notebook, or test hits).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: Optional[int] = None) -> DataFrame:
    """Round-robin repartition up to ``min_partitions`` (default: the
    session's default parallelism) iff the plan currently has fewer
    partitions. Call it on the narrowest projection (ids + the column the
    heavy expression consumes) so the shuffle moves minimal bytes."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
