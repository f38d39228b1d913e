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
* scheme and host lowercased; path/query VALUE case preserved
* userinfo (``user:pass@``) dropped from the authority; IPv6 literal
  hosts keep their brackets
* default ports stripped (``:80`` for http, ``:443`` for https),
  compared numerically (``:080`` is still the default)
* fragment (``#...``) removed
* tracking parameters removed (keys matched case-insensitively):
  ``utm_*`` plus the unambiguous click-id keys (``gclid``, ``fbclid``,
  ``msclkid``, ``yclid``). Bare ``ref`` is deliberately NOT in the
  default set: unlike click ids, ``?ref=`` frequently selects content
  (git hosting ``?ref=branch``), so stripping it would assign distinct
  pages one canonical key and dedup would silently drop real pages.
  Corpora where ``ref`` is known tracking noise pass their own
  ``tracking_param_re``.
* remaining query parameters sorted (order-insensitive equality)
* trailing ``/`` dropped from non-root paths
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAM_RE = r"^(utm_[a-zA-Z0-9_]*|gclid|fbclid|msclkid|yclid)$"


def normalize_url(
    url: Column | str, tracking_param_re: str = TRACKING_PARAM_RE
) -> Column:
    """Canonical form of ``url`` as a codegen'd expression tree.

    ``tracking_param_re`` is matched (case-insensitively) against each
    query-parameter KEY; matching parameters are dropped. Override it per
    corpus — e.g. add ``|ref`` for crawls where ``?ref=`` is referral
    noise rather than content-selecting."""
    u = F.col(url) if isinstance(url, str) else url
    # strip fragment first — everything after '#' never reaches the server
    u = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    # authority = everything between :// and the first /?#; userinfo
    # (user:pass@) is dropped AFTER extraction — matching host with a
    # character class that excludes ':' would capture the username of a
    # user:pass@ authority as the host, silently merging distinct sites
    authority = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    hostport = F.regexp_replace(authority, r"^.*@", "")
    # IPv6 literals keep their brackets; their port sits after "]:"
    host6 = F.regexp_extract(hostport, r"^(\[[^\]]*\])", 1)
    host = F.when(host6 != "", F.lower(host6)).otherwise(
        F.lower(F.regexp_replace(hostport, r":\d+$", ""))
    )
    port = F.when(
        host6 != "", F.regexp_extract(hostport, r"^\[[^\]]*\]:(\d+)$", 1)
    ).otherwise(F.regexp_extract(hostport, r":(\d+)$", 1))
    # numeric comparison (':080' is still the default port) and numeric
    # re-emission for kept ports; empty -> NULL first (ANSI mode rejects
    # casting '' to int)
    port_n = F.when(port == "", None).otherwise(port).cast("int")
    port_sfx = F.when(
        port_n.isNull()
        | ((scheme == "http") & (port_n == 80))
        | ((scheme == "https") & (port_n == 443)),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port_n.cast("string")))
    path = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^?#]*)?", 1)
    # trailing slash dropped except for the bare root
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, r"(.)/$", r"$1")
    )
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda kv: (kv != "")
        # tracking keys match case-insensitively (UTM_Source is as much
        # tracking noise as utm_source); non-tracking key case is preserved
        & ~F.lower(F.split(kv, "=").getItem(0)).rlike(tracking_param_re),
    )
    query_norm = F.array_join(F.array_sort(kept), "&")
    query_sfx = F.when(query_norm == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), query_norm)
    )
    return F.when(scheme == "", u).otherwise(
        F.concat(scheme, F.lit("://"), host, port_sfx, path, query_sfx)
    )


def url_host(url: Column | str) -> Column:
    """Lowercased host (no port, no userinfo; IPv6 keeps brackets)."""
    u = F.col(url) if isinstance(url, str) else url
    authority = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    hostport = F.regexp_replace(authority, r"^.*@", "")
    host6 = F.regexp_extract(hostport, r"^(\[[^\]]*\])", 1)
    return F.when(host6 != "", F.lower(host6)).otherwise(
        F.lower(F.regexp_replace(hostport, r":\d+$", ""))
    )


# common multi-label public suffixes: a host ending in one of these needs
# THREE labels for its registered domain (bbc.co.uk, not co.uk). A full
# public-suffix list is a data file swap; this covers the high-traffic tail.
MULTI_LABEL_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk", "net.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "co.kr", "com.br", "com.cn", "com.mx", "co.in", "co.za", "com.sg",
)


def registered_domain(url: Column | str) -> Column:
    """Registered domain (the grouping key for per-domain quotas and
    crawl-politeness stats): the last two host labels, or three when the
    host ends in a known multi-label public suffix (``co.uk`` et al)."""
    host = url_host(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)

    def last(k: int) -> Column:
        return F.array_join(F.slice(parts, F.greatest(n - (k - 1), F.lit(1)), F.lit(k)), ".")

    # every entry is exactly two labels, so "ends with .sfx or equals sfx"
    # collapses to one membership test on the last two labels
    return F.when(last(2).isin(*MULTI_LABEL_SUFFIXES), last(3)).otherwise(last(2))


def dedup_by_url(
    df: DataFrame,
    url_col: str,
    id_col: str,
    priority_cols: list | None = None,
    tracking_param_re: str = TRACKING_PARAM_RE,
) -> DataFrame:
    """Keep one row per canonical URL — deterministic winner = min
    ``priority_cols`` (default: the id). One hash shuffle on the canonical
    key; the normalization rides the scan projection.
    ``tracking_param_re`` tunes which query keys the canonical key ignores
    (see :func:`normalize_url`)."""
    from pyspark.sql import Window

    order = [F.col(c).asc() for c in (priority_cols or [id_col])]
    w = Window.partitionBy(normalize_url(url_col, tracking_param_re)).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        # a missing URL is no evidence of duplication: NULL urls all land
        # in one window partition, and keeping only rn=1 there would
        # silently drop every other null-url document
        .where((F.col("__rn") == 1) | F.col(url_col).isNull())
        .drop("__rn")
    )
