"""URL normalization and URL-keyed dedup for web-corpus pipelines.

A crawl dump carries the same page under many surface forms — scheme case,
default ports, fragments, tracking parameters, trailing slashes. Training-
data dedup needs ONE canonical key per page before any content-level pass
(it is orders of magnitude cheaper than MinHash and removes the bulk of
crawl duplication). Beyond-reference extension in the SURVEY §2 LLM-
pipeline family, sibling of `operators/dedup.py`.

Everything here is built from codegen'd string expressions (lower, regexp
replace/extract, split) — no UDFs, so normalization runs inside whole-
stage codegen at scan speed and the dedup itself is the standard
hash-shuffle on the canonical key.

Normalization rules (the common canonicalization subset):
* scheme and host lowercased; path/query case preserved
* default ports stripped (``:80`` for http, ``:443`` for https)
* fragment (``#...``) removed
* tracking parameters removed: ``utm_*``, ``gclid``, ``fbclid``, ``ref``
* remaining query parameters sorted (order-insensitive equality)
* trailing ``/`` dropped from non-root paths
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAM_RE = r"^(utm_[a-zA-Z0-9_]*|gclid|fbclid|ref)$"


def normalize_url(url: Column | str) -> Column:
    """Canonical form of ``url`` as a codegen'd expression tree."""
    u = F.col(url) if isinstance(url, str) else url
    # strip fragment first — everything after '#' never reaches the server
    u = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]+)", 1))
    port = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#:]+:(\d+)", 1)
    # port kept only when non-default for the scheme
    port_sfx = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^?#]*)?", 1)
    # trailing slash dropped except for the bare root
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, r"(.)/$", r"$1")
    )
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda kv: (kv != "")
        & ~F.split(kv, "=").getItem(0).rlike(TRACKING_PARAM_RE),
    )
    query_norm = F.array_join(F.array_sort(kept), "&")
    query_sfx = F.when(query_norm == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), query_norm)
    )
    return F.when(scheme == "", u).otherwise(
        F.concat(scheme, F.lit("://"), host, port_sfx, path, query_sfx)
    )


def url_host(url: Column | str) -> Column:
    """Lowercased host (no port)."""
    u = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]+)", 1))


def registered_domain(url: Column | str, tld_levels: int = 2) -> Column:
    """Last ``tld_levels`` host labels — the grouping key for per-domain
    quotas and crawl-politeness stats. (A public-suffix list would refine
    co.uk-style hosts; this is the deterministic approximation.)"""
    parts = F.split(url_host(url), r"\.")
    n = F.size(parts)
    return F.array_join(
        F.slice(parts, F.greatest(n - (tld_levels - 1), F.lit(1)), F.lit(tld_levels)),
        ".",
    )


def dedup_by_url(
    df: DataFrame, url_col: str, id_col: str, priority_cols: list | None = None
) -> DataFrame:
    """Keep one row per canonical URL — deterministic winner = min
    ``priority_cols`` (default: the id). One hash shuffle on the canonical
    key; the normalization rides the scan projection."""
    from pyspark.sql import Window

    order = [F.col(c).asc() for c in (priority_cols or [id_col])]
    w = Window.partitionBy(normalize_url(url_col)).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
