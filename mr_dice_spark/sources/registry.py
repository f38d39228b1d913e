"""Source registry (SURVEY.md §2.1 S1-S5).

The reference's five source kinds (OPTIMADE fan-out, SQLite, bulk REST,
keyset-paginated REST, paged REST) all collapse to declarative scans here:
a table is a Parquet/JSON/CSV path; a federation of providers is a union of
provider tables. Pagination/keyset/streaming-unzip disappear — the
distributed scan IS the pagination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_READERS = {
    "parquet": lambda s, p, o: s.read.options(**o).parquet(p),
    "json": lambda s, p, o: s.read.options(**o).json(p),
    "csv": lambda s, p, o: s.read.options(**{"header": "true", **o}).csv(p),
}


def read_table(spark: SparkSession, path: str, fmt: str = "parquet", **options) -> DataFrame:
    try:
        reader = _READERS[fmt]
    except KeyError:
        raise ValueError(f"unsupported format {fmt!r}; known: {sorted(_READERS)}")
    return reader(spark, path, options)


def read_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: str,
    fmt: str = "json",
    **options,
) -> tuple[DataFrame, DataFrame]:
    """Schema-enforced semi-structured ingestion with bad-record capture.

    Returns ``(good, quarantine)``: rows that parse under the declared
    schema, and raw malformed records (the PERMISSIVE-mode
    ``_corrupt_record`` capture) for offline repair. At 100 TB a single
    malformed line must neither kill the job (FAILFAST) nor silently
    vanish (DROPMALFORMED) — quarantining is the only auditable mode.
    Both frames come from ONE parse pass; the split is two filters over
    the same cached-scan lineage, not two reads.
    """
    return parse_with_quarantine(spark.read.text(path), schema, fmt, **options)


def parse_with_quarantine(
    raw: DataFrame,
    schema: str,
    fmt: str = "json",
    **options,
) -> tuple[DataFrame, DataFrame]:
    """The parse/split core of :func:`read_with_quarantine`, over an
    existing one-column ``value: string`` frame of raw lines — usable on
    any line source (text scan, Kafka value column, a derived fixture),
    not just a path."""
    if fmt not in ("json", "csv"):
        raise ValueError("quarantine reader supports json/csv")
    # parse from a text scan with from_json/from_csv rather than the raw
    # JSON/CSV DataFrameReader: the reader's _corrupt_record column carries
    # the QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction (column pruning on
    # e.g. bad.count() reduces the referenced set to the corrupt column
    # alone and the query is rejected; Spark's documented workaround is
    # caching the whole parse). The expression form has no such
    # restriction, still one pass, nothing cached.
    full_schema = schema + ", _corrupt_record string"
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"}
    if fmt == "csv":
        parsed = raw.select(
            F.col("value"),
            F.from_csv("value", full_schema, {**opts, **options}).alias("r"),
        )
        # Header rows fail typed parse and land in quarantine; recognize
        # them there by comparing the raw line (whitespace-insensitively)
        # against the schema's field names — parsed via StructType so
        # types containing commas (decimal(10,2)) can't corrupt the
        # header string. Data rows are NEVER filtered on raw equality: a
        # row that happens to look like the header but parses under the
        # schema stays in the good frame. Corollary: with an all-string
        # schema the header parses too and is returned as data — there is
        # no typed signal to tell them apart; such callers drop it
        # themselves.
        from pyspark.sql.types import StructType

        header = ",".join(StructType.fromDDL(schema).fieldNames())
        is_header = (
            F.regexp_replace(F.col("value"), r"\s+", "") == header.replace(" ", "")
        )
        parsed = parsed.where(
            F.col("r._corrupt_record").isNull() | ~is_header
        )
    else:
        parsed = raw.select(
            F.from_json("value", full_schema, {**opts, **options}).alias("r")
        )
    flat = parsed.select("r.*")
    # quarantine keeps every parsed column: partial parses retain whatever
    # fields DID decode, aiding offline repair
    bad = flat.where(F.col("_corrupt_record").isNotNull())
    good = flat.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return good, bad


def multi_provider_scan(
    spark: SparkSession,
    provider_paths: dict[str, str],
    fmt: str = "parquet",
    provider_col: str = "provider",
    skip_unavailable: bool = False,
    warnings: list[str] | None = None,
) -> DataFrame:
    """S1: one logical table over N provider tables.

    ``unionByName(allowMissingColumns=True)`` absorbs provider schema drift
    (the reference's ``_provider_``-prefixed open attributes, SURVEY.md
    §1.3); the provider name becomes an ordinary column, so per-provider
    caps/quotas are per-group operators downstream and a provider predicate
    prunes whole scans (partition-pruning analogue of choosing which
    providers to query).

    Provider order (dict insertion order) is preserved as ``provider_rank``
    — the deterministic priority that replaces the reference's
    traversal-order-dependent first-wins dedup (SURVEY.md §7.3).

    ``skip_unavailable`` is the reference's per-provider failure isolation
    (R5: ``asyncio.gather(return_exceptions=True)`` — a failed provider
    becomes an empty partition and the query still succeeds,
    Optimade_Server/server.py:123-126): unreadable provider tables are
    skipped, with a note appended to ``warnings`` (the manifest's warnings
    list, S9) instead of failing the whole scan.
    """
    out: DataFrame | None = None
    for rank, (name, path) in enumerate(provider_paths.items()):
        try:
            df = read_table(spark, path, fmt)
        except Exception as exc:  # noqa: BLE001 — isolation is the contract
            if not skip_unavailable:
                raise
            if warnings is not None:
                warnings.append(f"provider {name!r} unavailable: {exc}")
            continue
        df = df.withColumn(provider_col, F.lit(name)).withColumn(
            "provider_rank", F.lit(rank)
        )
        out = df if out is None else out.unionByName(df, allowMissingColumns=True)
    if out is None:
        raise ValueError("no providers given (or all unavailable)")
    return out
