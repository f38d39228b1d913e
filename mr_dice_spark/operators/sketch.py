"""Mergeable-sketch operators: count-min-sketch heavy hitters.

Complements the HLL approximate-distinct path (golden
``approx_distinct_users_daily``) with the frequency side: a count-min
sketch is built by Spark's native ``count_min_sketch`` aggregate (merged
map-side per partition, exactly like a partial aggregate — the shuffle
carries d×w counters per partition, never rows), shipped to the driver as
bytes, and queried there for candidate keys. The reference has no sketches
(north-star extension); at 100 TB this is how you answer "which keys
exceed p% of a trillion rows" with one narrow pass and KBs of state.

Guarantee: estimate >= true count always; estimate <= true + eps*N with
probability >= confidence. With eps = 1e-4 and a small candidate set the
collision probability is ~w^-d (~1e-17), so estimates are exact in
practice — which is what lets the golden hash-match an exact-count oracle.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def cms_sketch(
    df: DataFrame,
    col: str,
    eps: float = 1e-4,
    confidence: float = 0.99,
    seed: int = 42,
) -> bytes:
    """One-pass count-min sketch over ``col`` (string or integral);
    returns the serialized sketch (d = ceil(ln(1/(1-confidence))) rows ×
    w = ceil(e/eps) counters — KBs, independent of row count)."""
    row = df.agg(
        F.count_min_sketch(
            col, F.lit(float(eps)), F.lit(float(confidence)), F.lit(seed)
        ).alias("s")
    ).first()
    return bytes(row["s"])


def cms_estimate(spark: SparkSession, sketch: bytes, keys: Iterable) -> dict:
    """Point-query the sketch for each key driver-side (JVM
    ``CountMinSketch.readFrom``). Returns {key: estimated_count}."""
    cms = spark.sparkContext._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        sketch
    )
    return {k: int(cms.estimateCount(k)) for k in keys}


def pigeonhole_candidates(df: DataFrame, col: str, min_share: float) -> DataFrame:
    """Distributed heavy-hitter candidate pass: keys whose LOCAL share is
    >= ``min_share`` in at least one scan partition — a guaranteed superset
    of global heavy hitters (if every partition share were below the
    threshold, the weighted average over partitions would be too), bounded
    by num_partitions / min_share keys regardless of column cardinality.
    Exposed separately so plan tests exercise the exact operator plan."""
    local = (
        df.where(F.col(col).isNotNull())
        .select(F.spark_partition_id().alias("__p"), F.col(col).alias("__k"))
        .groupBy("__p", "__k")
        .count()
    )
    w = Window.partitionBy("__p")
    return (
        local.withColumn("__tot", F.sum("count").over(w))
        .where(F.col("count") >= F.lit(min_share) * F.col("__tot"))
        .select("__k")
        .distinct()
    )


def heavy_hitters_cms(
    df: DataFrame,
    col: str,
    min_share: float = 0.05,
    candidates: Sequence | None = None,
    eps: float = 1e-4,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Keys whose estimated frequency is at least ``min_share`` of all
    rows: ``(col, est_count)``, descending count then key.

    ``candidates`` bounds the point-query set; by default they come from a
    distributed pigeonhole pass: a key with global share >= min_share must
    have local share >= min_share in at least one partition (otherwise its
    total would be below the threshold), so keys qualifying locally are a
    guaranteed superset of the true heavy hitters. The collected set is
    bounded by num_partitions / min_share keys regardless of column
    cardinality — never a full distinct() materialization. Passing
    explicit ``candidates`` (e.g. a prior day's hitters) skips the pass.
    """
    spark = df.sparkSession
    # validate BEFORE the count and sketch jobs — rejecting bad input after
    # two full cluster passes would waste them
    if candidates is None and min_share <= 0:
        raise ValueError(
            "min_share must be > 0 when candidates are derived (the "
            "pigeonhole candidate bound is num_partitions/min_share keys)"
        )
    # ONE scan computes the sketch AND the share denominator (count(col)
    # skips NULLs, matching the sketch's NULL handling) — a separate count
    # job would re-read the table just for one long. The only other job is
    # the pigeonhole candidate pass (skipped entirely when explicit
    # candidates are supplied), so heavy_hitters_cms is <=2 scans total.
    agg_row = df.agg(
        F.count_min_sketch(
            col, F.lit(float(eps)), F.lit(float(confidence)), F.lit(seed)
        ).alias("s"),
        F.count(F.col(col)).alias("n"),
    ).first()
    sketch, total_row = bytes(agg_row["s"]), agg_row["n"]
    if candidates is None:
        candidates = [r[0] for r in pigeonhole_candidates(df, col, min_share).collect()]
    est = cms_estimate(spark, sketch, candidates)
    cut = min_share * total_row
    rows = sorted(
        ((k, n) for k, n in est.items() if n >= cut),
        key=lambda t: (-t[1], t[0]),
    )
    # key column keeps its SOURCE type (a hardcoded string would silently
    # retype integral keys and break joins back to the source table)
    key_type = dict(df.dtypes)[col]
    return spark.createDataFrame(
        [(k, n) for k, n in rows], f"{col} {key_type}, est_count long"
    )


# ---------------------------------------------------------------------------
# DataSketches rollups (HLL distinct, Theta set ops, KLL quantiles)
# ---------------------------------------------------------------------------
# The defining 100 TB pattern: pre-aggregate a KB-sized MERGEABLE sketch
# per fine-grained cell once, then answer any coarser rollup by merging
# sketches — never rescanning raw data. Exact DISTINCT/quantile rollups
# cannot re-aggregate (distinct counts are not additive; percentiles are
# not mergeable), so the sketch column IS the only viable materialized
# aggregate for these questions at scale. Estimates are deterministic
# (same input set -> same sketch -> same estimate) but engine-specific;
# the goldens built on HLL/Theta are nonetheless HASH-CHECKED against
# exact SQL oracles because the fixtures' cardinality sits in the
# sketches' exact sparse mode (see the golden docstrings) — changing lgk
# or the estimate cast WILL break them. The approximate high-cardinality
# regime is pinned by tolerance tests (tests/test_functions.py).


def hll_partial_sketches(
    df: DataFrame, group_cols: Sequence[str], value_col: str, lgk: int = 12
) -> DataFrame:
    """Per-group HLL sketch of distinct ``value_col`` (binary column
    ``__hll``, ~2^lgk bytes). This is the frame you PERSIST partitioned
    by the finest grain (e.g. day); every coarser distinct-count question
    afterwards is a merge, not a scan."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("__hll")
    )


def hll_rollup(sketches: DataFrame, rollup_cols: Sequence[str]) -> DataFrame:
    """Merge per-cell sketches up to ``rollup_cols`` and estimate:
    ``(rollup_cols..., approx_distinct)``. Input is the tiny sketch frame,
    so the shuffle moves KBs per group."""
    merged = sketches.groupBy(*rollup_cols).agg(
        F.hll_union_agg("__hll").alias("__m")
    )
    return merged.select(
        *rollup_cols,
        F.hll_sketch_estimate("__m").cast("long").alias("approx_distinct"),
    )


def theta_overlap_matrix(
    df: DataFrame, group_col: str, value_col: str, lgk: int = 12
) -> DataFrame:
    """Pairwise overlap between groups' distinct-value sets via Theta
    sketches: ``(g_a, g_b, distinct_a, distinct_b, overlap)`` for every
    unordered pair — e.g. shared users between event types, audience
    overlap between sources. Exact SQL needs a value-keyed self-join per
    pair (corpus-sized); this builds one KB sketch per group and
    intersects driver-free on the #groups x #groups grid, which is tiny
    by construction (the operator targets LOW-cardinality group columns;
    the sketch frame after the first aggregate has one row per group).

    NULL group keys are EXCLUDED up front (filtered before the sketch
    aggregate): the ``g_a < g_b`` pair join is null-unsafe, so a NULL
    group's sketch would otherwise be built and then silently vanish
    from the grid. Coalesce NULLs to a sentinel first if they matter."""
    sk = df.where(F.col(group_col).isNotNull()).groupBy(group_col).agg(
        F.theta_sketch_agg(value_col, F.lit(lgk)).alias("__t")
    )
    a = sk.select(
        F.col(group_col).alias("g_a"), F.col("__t").alias("__ta")
    )
    b = sk.select(
        F.col(group_col).alias("g_b"), F.col("__t").alias("__tb")
    )
    pairs = a.join(b, F.col("g_a") < F.col("g_b"))
    return pairs.select(
        "g_a",
        "g_b",
        F.theta_sketch_estimate("__ta").cast("long").alias("distinct_a"),
        F.theta_sketch_estimate("__tb").cast("long").alias("distinct_b"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("__ta"), F.col("__tb"))
        ).cast("long").alias("overlap"),
    )


def kll_quantiles_rollup(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    quantiles: Sequence[float],
    rollup_cols: Sequence[str] = (),
    k: int = 200,
) -> DataFrame:
    """Mergeable quantiles: KLL sketch per fine-grained group, merged up
    to ``rollup_cols`` (global when empty), then evaluated at
    ``quantiles`` -> columns ``q_<pct>``. Percentiles are not mergeable
    exactly; the KLL sketch is how a 100 TB pipeline keeps re-aggregable
    latency/length distributions."""
    qs = [float(q) for q in quantiles]
    if not qs or any(not 0.0 <= q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be non-empty, each in [0,1]: {quantiles}")
    # column names come from the float repr: sanitize '.', '-', '+' (e.g.
    # 1e-05 -> q_1em05) and refuse duplicates, which would produce two
    # identically named output columns and ambiguous row access
    names = [
        "q_" + str(q).replace(".", "_").replace("-", "m").replace("+", "p")
        for q in qs
    ]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate quantiles: {quantiles}")
    partial = df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias("__k")
    )
    merged = partial.groupBy(*rollup_cols).agg(
        F.kll_merge_agg_double("__k").alias("__m")
    )
    qcols = [
        F.kll_sketch_get_quantile_double(F.col("__m"), F.lit(q)).alias(name)
        for q, name in zip(qs, names)
    ]
    return merged.select(*rollup_cols, *qcols)


def misra_gries_summary(df: DataFrame, col: str, m: int = 256) -> DataFrame:
    """Per-partition Misra-Gries frequency summaries, merged by
    summation: the classic DETERMINISTIC mergeable heavy-hitters
    summary (Misra & Gries 1982; mergeability per Agarwal et al.
    PODS'12) beside the probabilistic count-min path. Each partition
    keeps at most ``m`` counters (the m-way generalization of
    Boyer-Moore majority voting: absent keys decrement all counters);
    the guarantee after summation-merge is
    ``true - N/(m+1) <= est <= true`` for EVERY key — no hash
    collisions, no failure probability, under-counts only.

    Scale shape: one Arrow-batched pass (mapInPandas, O(m) state per
    task regardless of input size or cardinality), then a key-summed
    hash aggregate over the <= m x partitions summary rows. The output
    is summary-sized (bounded by m x partitions), NOT the key
    cardinality — the point of the sketch. Returns ``(col, est)`` with
    est <= the key's true count. NULL keys are skipped (matching
    count()'s NULL handling, the cms convention).

    Which keys survive depends on partitioning (like any per-partition
    summary), so goldens built on this follow the audit-verdict
    pattern: the checkable claim is the GUARANTEE against exact
    counts, not the estimates themselves."""
    if m < 1:
        raise ValueError(f"m must be >= 1: {m}")
    import pandas as pd

    key_type = dict(df.dtypes)[col]

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col]:
                if v is None or v != v:  # NULL / NaN skip
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < m:
                    counters[v] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for k in counters:
                        counters[k] -= 1
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
        yield pd.DataFrame(
            {col: list(counters.keys()), "est": list(counters.values())}
        )

    parts = df.select(col).mapInPandas(summarize, f"{col} {key_type}, est long")
    return parts.groupBy(col).agg(F.sum("est").cast("long").alias("est"))


def misra_gries_topk_audit(
    df: DataFrame, col: str, m: int = 256, k: int = 10
) -> DataFrame:
    """Accuracy audit of :func:`misra_gries_summary` in the
    approx_distinct_audit pattern: the exact top-``k`` keys (count
    desc, key asc — deterministic) carry their exact counts plus the
    verdict that the summary's estimate honors the deterministic
    sandwich ``exact - N/(m+1) <= est <= exact`` (a key missing from
    the summary estimates 0, which the lower bound must still cover).
    The estimates themselves stay OUT of the output — they legitimately
    vary with partitioning; the GUARANTEE is the invariant, so the
    verdict rows hash-match a plain exact-count SQL oracle."""
    summary = misra_gries_summary(df, col, m)
    base = df.where(F.col(col).isNotNull())
    exact = base.groupBy(col).agg(F.count(F.lit(1)).alias("exact_count"))
    total = base.agg(F.count(F.lit(1)).alias("__n"))
    top = (
        exact.orderBy(F.desc("exact_count"), F.asc(col))
        .limit(k)
        .join(summary, col, "left")
        .crossJoin(F.broadcast(total))
    )
    est = F.coalesce(F.col("est"), F.lit(0))
    bound = F.col("__n").cast("double") / float(m + 1)
    return top.select(
        col,
        F.col("exact_count").cast("long").alias("exact_count"),
        (
            (est <= F.col("exact_count"))
            & (est.cast("double") >= F.col("exact_count").cast("double") - bound)
        ).alias("within_bound"),
    ).orderBy(F.desc("exact_count"), F.asc(col))
