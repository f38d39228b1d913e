"""Deterministic sampling (training-data subsampling, north-star pipeline).

`df.sample()` is seed-dependent per partitioning and not reproducible
across engines or re-runs with different splits; these operators hash a
KEY instead — membership is a pure function of (key, seed), so samples are
stable under repartitioning, retries, incremental reruns, and are
restatable in ANSI SQL for oracle parity (md5 prefix → integer, identical
in Spark and DuckDB).

* ``deterministic_sample`` — Bernoulli by hash threshold: one narrow
  filter, pushdown-friendly, no shuffle.
* ``stratified_sample_exact`` — exactly n per stratum, chosen by hash
  order: one window per stratum (single shuffle), deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 1 << 32


def hash_bucket(key: Column, seed: str = "") -> Column:
    """Uniform bucket in [0, 2^32) from the md5 prefix of (seed || key) —
    engine-portable (same arithmetic runs in DuckDB for oracles)."""
    s = F.concat(F.lit(seed), key.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, seed: str = ""
) -> DataFrame:
    """Keep rows whose key hashes under ``fraction`` of the bucket space.

    Expected |sample| = fraction·n with binomial deviation; membership is
    per-key stable, so joins between two tables sampled on the SAME key
    stay consistent (both keep the same keys)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.where(hash_bucket(F.col(key_col), seed) < int(fraction * _BUCKETS))


def stratified_sample_exact(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    key_col: str,
    seed: str = "",
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, selected by hash order
    (key tiebreak) — a deterministic alternative to ``sampleBy`` whose
    per-stratum counts never fluctuate run to run."""
    w = Window.partitionBy(*strata_cols).orderBy(
        hash_bucket(F.col(key_col), seed).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )
