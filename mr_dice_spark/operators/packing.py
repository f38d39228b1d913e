"""Sequence packing (beyond-reference training-data-pipeline operator):
the GPT-style concat-and-chunk batch construction — documents are laid
end-to-end in a deterministic order and the token stream is cut into
fixed-length training sequences; each document maps to the sequence span
[first_seq, last_seq] it occupies (documents may straddle a cut).

The core is a GLOBAL prefix sum of token counts. A naive
``Window.orderBy(id)`` with no partition key collapses the corpus onto one
task, so this implements the textbook two-pass distributed scan instead:

1. range-repartition by id (so partition order == id order),
2. per-partition running sum (a local window — no shuffle),
3. per-partition totals collected to the driver (one row per partition —
   KBs at any corpus size) and turned into exclusive partition offsets,
4. offsets joined back by partition id (broadcast), start = offset +
   local running sum - own tokens.

Every output column is integer arithmetic — bit-exact against a SQL
oracle's single-window formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col,
    seq_len: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per document: (id, n_tokens, start_offset, first_seq, last_seq,
    n_seqs) for fixed ``seq_len``-token training sequences over the
    id-ordered concatenated token stream. Zero-token documents occupy no
    sequence (NULL first/last, n_seqs=0) but keep their (empty) offset.

    ``n_tokens_col`` is a Column expression (e.g. ``token_count(col)`` or a
    precomputed length column); ``id_col`` must be unique — it defines the
    packing order.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    base = df.select(
        F.col(id_col).alias("__id"), n_tokens_col.cast("long").alias("n_tokens")
    )
    parts = (
        base.repartitionByRange(num_partitions, "__id")
        if num_partitions
        else base.repartitionByRange("__id")
    )
    parts = parts.withColumn("__pid", F.spark_partition_id())
    # PIN the partitioning: the per-partition totals job and the final query
    # are two separately-compiled plans, and RangePartitioner re-samples its
    # boundaries per plan (seeded by RDD id) while spark_partition_id() is
    # nondeterministic across jobs — without materializing here, the
    # pid->offset map collected below could describe a DIFFERENT
    # partitioning than the one the final query executes (silently wrong
    # offsets, or rows dropped by the offset join). localCheckpoint
    # materializes the partitioned data once; both jobs then read it.
    parts = parts.localCheckpoint(eager=True)
    w = (
        Window.partitionBy("__pid")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parts.withColumn("__cum", F.sum("n_tokens").over(w))
    # one row per partition — the driver-side state of the scan. A plain
    # per-pid sum (map-side combine, no window sort) — reading max(__cum)
    # from the window would shuffle and sort the whole corpus just to
    # recompute this number.
    totals = sorted(
        parts.groupBy("__pid").agg(F.sum("n_tokens").alias("__t")).collect(),
        key=lambda r: r["__pid"],
    )
    offsets, acc = [], 0
    for r in totals:
        offsets.append((r["__pid"], acc))
        acc += r["__t"]
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(offsets or [(0, 0)], "__pid int, __off long")
    )
    # integer DIV, not floor(double /): offsets in a 100 TB corpus overflow
    # the 2^53 exact-double range long before they overflow a long
    staged = (
        local.join(off_df, "__pid")
        .withColumn(
            "start_offset", F.col("__off") + F.col("__cum") - F.col("n_tokens")
        )
        .withColumn("__end", F.col("start_offset") + F.col("n_tokens") - 1)
    )
    first = F.expr(f"start_offset DIV {int(seq_len)}")
    last = F.expr(f"__end DIV {int(seq_len)}")
    return staged.select(
        F.col("__id").alias(id_col),
        "n_tokens",
        "start_offset",
        F.when(F.col("n_tokens") > 0, first).alias("first_seq"),
        F.when(F.col("n_tokens") > 0, last).alias("last_seq"),
        F.when(F.col("n_tokens") > 0, last - first + 1)
        .otherwise(F.lit(0)).cast("long").alias("n_seqs"),
    )


def length_bucketed_batches(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    bucket_edges: list[int],
    batch_size: int,
) -> DataFrame:
    """Inference/serving batch assignment that minimizes padding waste:
    documents fall into length BUCKETS (``bucket`` = index of the first
    edge >= n_tokens; longer-than-last-edge rows take the overflow
    bucket len(edges)), and within each bucket are packed ``batch_size``
    at a time in (n_tokens, id) order — so a batch's members are as
    close in length as the bucketing allows and its padding cost is
    batch_max - member length. Returns ``(id, n_tokens, bucket,
    batch_in_bucket, pos_in_batch, batch_max_tokens, padding_tokens)``.

    Scale shape: two keyed exchanges and no global sort — first the
    bucket-keyed row_number window, then the per-batch max over
    (bucket, batch): a second pass over the same rows but on a
    HIGH-CARDINALITY key (one group per batch, ~batch_size rows each),
    so it spreads across the cluster instead of serializing. (A
    broadcast of per-batch stats would NOT scale: batch count grows
    with the corpus.) Batch ids are per-bucket composites precisely so
    no global sequence exists to serialize on. NULL/negative token
    counts are excluded (no length, no batch).
    """
    if batch_size <= 0:
        raise ValueError(f"length_bucketed_batches: batch_size must be > 0, got {batch_size}")
    if not bucket_edges or sorted(bucket_edges) != list(bucket_edges) or len(set(bucket_edges)) != len(bucket_edges):
        raise ValueError(f"bucket_edges must be non-empty and strictly increasing: {bucket_edges}")
    n = F.col(n_tokens_col)
    bucket = F.lit(len(bucket_edges))
    for i in range(len(bucket_edges) - 1, -1, -1):
        bucket = F.when(n <= bucket_edges[i], F.lit(i)).otherwise(bucket)
    base = df.where(n.isNotNull() & (n >= 0)).select(
        F.col(id_col).alias("__id"), n.alias("n_tokens"), bucket.alias("bucket")
    )
    w = Window.partitionBy("bucket").orderBy("n_tokens", "__id")
    ranked = base.withColumn("__rn", F.row_number().over(w))
    ranked = ranked.withColumn(
        "batch_in_bucket", ((F.col("__rn") - 1) / batch_size).cast("int")
    ).withColumn("pos_in_batch", ((F.col("__rn") - 1) % batch_size).cast("int"))
    wb = Window.partitionBy("bucket", "batch_in_bucket")
    bmax = F.max("n_tokens").over(wb)
    return ranked.select(
        F.col("__id").alias(id_col),
        "n_tokens",
        "bucket",
        "batch_in_bucket",
        "pos_in_batch",
        bmax.alias("batch_max_tokens"),
        (bmax - F.col("n_tokens")).alias("padding_tokens"),
    )
