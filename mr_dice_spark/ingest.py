"""Ingestion-time normalization (SURVEY.md §7.1 step 1; optimizer notes
R3/R4).

The reference rewrites predicates per provider at query time — space-group
number fanned out to `_alexandria_space_group=221` / `_oqmd_spacegroup=
"Pm-3m"` / `_tcod_sg="P m -3 m"` (Optimade_Server/utils.py:550-573) and
band gap to per-provider property names (utils.py:585-613). Our engine does
that mapping ONCE, at ingest: every provider's records are normalized into
canonical columns, after which `fetch_with_spg` / `fetch_with_bandgap`
compile to plain pushdown-able equality/range predicates and the dialect
maps disappear from the query path entirely.

Each normalizer is a Column expression (unicode translate, coalesce,
broadcast dim join); only Hill-formula canonicalization needs Python and
runs as an Arrow-batched pandas_udf, once per ingested row — never per
query.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from mr_dice_spark.functions.formula import hill_formula_udf, normalize_unicode_digits_col
from mr_dice_spark.functions.spacegroup import HM_SYMBOLS, tcod_spacing

# inverted symbol lookup: plain and TCOD-spaced H-M symbols -> number
SYMBOL_TO_NUMBER: dict[str, int] = {}
for _n, _s in HM_SYMBOLS.items():
    SYMBOL_TO_NUMBER[_s] = _n
    SYMBOL_TO_NUMBER[tcod_spacing(_s)] = _n


def spg_number_from_any(*spg_cols: Column) -> Column:
    """Canonical ``spacegroup_number`` from whatever a provider exposes:
    ints pass through, H-M symbols (plain or TCOD-spaced) map through the
    inverted 230-entry table (a literal map expression — effectively a
    broadcast dim lookup without a join)."""
    mapping = F.create_map(
        *[x for s, n in SYMBOL_TO_NUMBER.items() for x in (F.lit(s), F.lit(n))]
    )
    out: Optional[Column] = None
    for c in spg_cols:
        as_num = F.when(
            c.cast("string").rlike(r"^\d+$"), c.cast("int")
        ).otherwise(mapping[c.cast("string")])
        out = as_num if out is None else F.coalesce(out, as_num)
    assert out is not None, "need at least one source column"
    return out.cast("int")


def pack_provider_attrs(
    df: DataFrame, prefix: str = "_", keep: Sequence[str] = ()
) -> DataFrame:
    """Fold open provider-prefixed columns into ``provider_attrs:
    map<string,string>`` (SURVEY.md §1.3: OPTIMADE/Bohrium records carry
    provider-namespaced fields like ``_alexandria_space_group`` handled by
    allow/deny lists, not a schema — reference
    Optimade_Server/utils.py:109-125).

    The map is the escape hatch; queryable fields should be PROMOTED to
    typed columns (``promote_attr`` / ``normalize_structures``) because a
    map lookup is opaque to parquet predicate pushdown and min/max
    pruning. Null-valued attributes are dropped from the map (absent ==
    unknown, matching the reference's sparse records).
    """
    attr_cols = [c for c in df.columns if c.startswith(prefix) and c not in set(keep)]
    if not attr_cols:
        return df.withColumn(
            "provider_attrs", F.create_map().cast("map<string,string>")
        )
    entries: list[Column] = []
    for c in attr_cols:
        entries += [F.lit(c), F.col(c).cast("string")]
    packed = F.map_filter(F.create_map(*entries), lambda _k, v: v.isNotNull())
    kept = [c for c in df.columns if c not in set(attr_cols)]
    return df.select(*kept, packed.alias("provider_attrs"))


def promote_attr(
    df: DataFrame, key: str, dtype: str = "string", alias: Optional[str] = None
) -> DataFrame:
    """Promote one map attribute back to a typed top-level column — the
    step that makes it pushdown-able once a provider field turns out to be
    queried often. Missing keys yield NULL (cast of a missing map value)."""
    return df.withColumn(
        alias or key.lstrip("_"), F.col("provider_attrs").getItem(key).cast(dtype)
    )


def scan_evolving(spark, *paths: str) -> DataFrame:
    """Schema-evolution scan (SURVEY.md §7.3): union the footer schemas of
    every input (``mergeSchema``) so batches written before a provider
    added a column read back with NULLs in the new column. Reserved for
    ingestion paths — steady-state queries should read a single declared
    schema so the footers of thousands of files aren't merged per query."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def normalize_structures(
    df: DataFrame,
    formula_col: str = "chemical_formula_reduced",
    spg_cols: Sequence[str] = (),
    bandgap_cols: Sequence[str] = (),
) -> DataFrame:
    """Produce the canonical query columns:

    * ``formula_hill`` — unicode digits translated, Hill-ordered (R4: query
      literals canonicalize the same way at compile time, so equality works)
    * ``spacegroup_number`` — int 1-230 from any provider dialect (R3)
    * ``band_gap`` — first non-null provider band-gap property, as double
    """
    out = df
    if formula_col in df.columns:
        cleaned = normalize_unicode_digits_col(F.col(formula_col))
        out = out.withColumn("formula_hill", hill_formula_udf()(cleaned))
    if spg_cols:
        out = out.withColumn(
            "spacegroup_number", spg_number_from_any(*[F.col(c) for c in spg_cols])
        )
    if bandgap_cols:
        out = out.withColumn(
            "band_gap",
            F.coalesce(*[F.col(c).cast("double") for c in bandgap_cols]),
        )
    return out


# ---------------------------------------------------------------------------
# typed entry tools over normalized tables (reference
# fetch_structures_with_spg / fetch_structures_with_bandgap,
# Optimade_Server/server.py:202,358)
# ---------------------------------------------------------------------------

def fetch_with_spg(
    df: DataFrame,
    spg_number: int,
    base_filter: Optional[str] = None,
) -> DataFrame:
    """Space-group query = plain equality on the canonical column, ANDed
    with an optional OPTIMADE base filter (reference conjoins per-provider
    dialect clauses — P11; here one predicate serves every provider)."""
    if not 1 <= spg_number <= 230:
        raise ValueError(f"space group number must be 1-230, got {spg_number}")
    cond = F.col("spacegroup_number") == spg_number
    if base_filter:
        from mr_dice_spark.filters import compile_filter

        cond = compile_filter(base_filter) & cond
    return df.where(cond)


def fetch_with_bandgap(
    df: DataFrame,
    min_ev: Optional[float] = None,
    max_ev: Optional[float] = None,
    base_filter: Optional[str] = None,
) -> DataFrame:
    """Band-gap range query; open ends auto-complete to [0, 100] eV
    (reference Bohriumpublic_Server/server.py:130-142 — P18)."""
    lo = 0.0 if min_ev is None else min_ev
    hi = 100.0 if max_ev is None else max_ev
    cond = F.col("band_gap").between(lo, hi)
    if base_filter:
        from mr_dice_spark.filters import compile_filter

        cond = compile_filter(base_filter) & cond
    return df.where(cond)


# ---------------------------------------------------------------------------
# storage layout: partitioned / bucketed writes
# ---------------------------------------------------------------------------

def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    max_records_per_file: int = 5_000_000,
    fmt: str = "parquet",
) -> None:
    """Write with hive-style partition directories: queries filtering on
    ``partition_by`` columns prune whole directories at planning time
    (PartitionFilters in the scan), which is the dominant cost saver on a
    100 TB table. Keep partition cardinality moderate (date, source,
    provider — not user_id) to avoid the small-files problem;
    ``maxRecordsPerFile`` bounds file size within partitions."""
    writer = df.write.mode("overwrite").option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    n_buckets: int,
    sort_by: Sequence[str] = (),
    fmt: str = "parquet",
) -> None:
    """Bucketed (hash-clustered) managed table: joins/aggregations on the
    bucket columns between co-bucketed tables skip the shuffle entirely —
    the ingest-time layout for repeated large-large joins (e.g. lineitem ⋈
    orders on orderkey). Bucketing requires the table catalog (bucket
    metadata lives there), hence ``saveAsTable`` rather than a bare path."""
    writer = df.write.mode("overwrite").format(fmt).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def estimated_plan_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the optimized plan (propagated from
    file-scan statistics). Rough — compression and projection change the
    true written size — but the right order of magnitude for sizing output
    files without an extra pass over the data."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def _target_file_count(df: DataFrame, target_file_mb: int) -> int:
    """Shared output-file sizing for the compaction/clustering writers."""
    return max(1, round(estimated_plan_bytes(df) / (target_file_mb * 1024 * 1024)))


def write_compacted(
    df: DataFrame,
    path: str,
    target_file_mb: int = 256,
    fmt: str = "parquet",
) -> int:
    """Compaction writer: coalesce output into ~``target_file_mb`` files.

    The small-files problem is the quiet killer of 100 TB tables — a
    million 1 MB files cost more in scan planning/open overhead than the
    I/O itself. Returns the file count used. Estimation is plan-stats
    based; for exact post-compression sizing, run a second compaction pass
    over the written data (its scan stats are then exact)."""
    n = _target_file_count(df, target_file_mb)
    df.repartition(n).write.mode("overwrite").format(fmt).save(path)
    return n


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: Sequence[str],
    n_files: int | None = None,
    target_file_mb: int = 256,
    fmt: str = "parquet",
) -> int:
    """Range-cluster the data by ``cluster_by`` across ~equal-size files and
    sort within each file.

    Every file then covers a narrow, non-overlapping range of the cluster
    key, so parquet footer min/max statistics let a point/range filter on
    that key skip all but ~one file — partition-pruning economics without
    the directory-cardinality limits (the single-column analogue of
    Z-ordering; use partitioning for the coarse key and clustering for the
    fine one). Returns the file count."""
    if n_files is None:
        n_files = _target_file_count(df, target_file_mb)
    cols = [F.col(c) for c in cluster_by]
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )
    return n_files


def zorder_key(
    cols: Sequence[Column],
    ranges: Sequence[tuple[float, float]],
    bits: int = 12,
) -> Column:
    """Morton (Z-order) key: each column scaled to a ``bits``-bit integer
    over its [min, max] range, bits interleaved column-round-robin.

    Pure bitwise/arithmetic expression — stays in whole-stage codegen.
    NULLs map to the range minimum. ``bits * len(cols)`` must be <= 63.
    """
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"bits*cols = {bits * n} exceeds a signed 64-bit key")
    top = (1 << bits) - 1
    scaled = []
    for c, (mn, mx) in zip(cols, ranges):
        span = (mx - mn) or 1.0
        q = F.floor((F.coalesce(c.cast("double"), F.lit(mn)) - mn) / span * top)
        scaled.append(F.least(F.greatest(q, F.lit(0)), F.lit(top)).cast("long"))
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1).cast("long"))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: Sequence[str],
    n_files: int | None = None,
    target_file_mb: int = 256,
    bits: int = 12,
    fmt: str = "parquet",
) -> int:
    """Cluster files along a Morton curve over ``zorder_by``.

    ``write_clustered`` (lexicographic range) gives file-level min/max
    pruning only on the LEADING sort column; Z-ordering interleaves the
    dimensions so every listed column keeps partial locality — a filter on
    any one of them skips most files. The standard layout for 100 TB
    tables queried along several independent dimensions. Costs one tiny
    min/max aggregate (to scale the curve) plus the same range shuffle as
    write_clustered. Returns the file count.

    ``zorder_by`` columns must be castable to double (numerics and
    timestamps — a timestamp becomes epoch seconds); the call fails with a
    clear error on empty input, an all-NULL column, or a non-numeric
    column, rather than producing a meaningless curve."""
    if n_files is None:
        n_files = _target_file_count(df, target_file_mb)
    dcols = {c: F.col(c).cast("double") for c in zorder_by}
    bounds = df.agg(
        *[
            f
            for c, dc in dcols.items()
            for f in (F.min(dc).alias(f"mn_{c}"), F.max(dc).alias(f"mx_{c}"))
        ]
    ).first()
    ranges = []
    for c in zorder_by:
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        if mn is None or mx is None:
            raise ValueError(
                f"cannot z-order on column '{c}': input is empty, the column "
                "is all NULL, or it is not castable to double "
                "(numeric/timestamp columns only)"
            )
        ranges.append((float(mn), float(mx)))
    key = zorder_key(list(dcols.values()), ranges, bits)
    (
        df.withColumn("__z", key)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )
    return n_files
