"""Parametric query builders (SURVEY.md §2.2 P14-P18, §2.6 O3, §3.3).

The reference's three REST-parametric modules (MOFdb, OpenLAM, Bohrium)
share one shape: a flat typed filter spec (equality + open/closed numeric
ranges + keyword match + time window), a server-side sort, and page/size
pagination. Here that spec compiles to a single declarative DataFrame
plan — every predicate lands in the Parquet scan via Catalyst pushdown, so
at 100 TB the scan skips row groups instead of post-filtering.

Reference citations:
* range params + assembly — mofdb_database/Mofdb_Server/server.py:59-75,
  mofdb_client/main.py:139-170 (P14)
* enum validation — mofdb_client/main.py:34-39 (P15)
* formula/energy/time window — openlam_database/openlam/lam_optimize/
  db.py:55-68, Openlam_Server/utils.py:41-47 (P16)
* fuzzy vs exact match_mode — Bohriumpublic_Server/server.py:65,89,158 (P17)
* open-ended range auto-completion — Bohriumpublic_Server/server.py:130-142
  (P18)
* server-side sort spec + page/size — Bohriumpublic_Server/server.py:144-178
  (O3/S5)
"""

from __future__ import annotations

import datetime as _dt
from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Number = Union[int, float]


class InvalidParam(ValueError):
    """Fail-fast validation error (reference InvalidUnit/validate_db shape,
    mofdb_client/main.py:19-39): raised BEFORE any execution."""


class ParametricQuery:
    """Accumulates typed predicates over a base DataFrame and compiles to a
    declarative plan.

    All methods return ``self`` for chaining; ``build()`` produces the
    DataFrame. Nothing executes until an action — the builder only
    constructs the logical plan, so Catalyst sees the full conjunction and
    pushes it into the scan.
    """

    def __init__(self, df: DataFrame):
        self._df = df
        self._preds: list[Column] = []
        self._sort: list[Column] = []
        self._offset: int = 0
        self._limit: Optional[int] = None

    # -- predicates ---------------------------------------------------------

    def equals(self, column: str, value) -> "ParametricQuery":
        if value is not None:
            self._preds.append(F.col(column) == F.lit(value))
        return self

    def isin(self, column: str, values: Optional[Sequence]) -> "ParametricQuery":
        # None means "parameter absent"; an EXPLICIT empty list means
        # "match nothing" — a truthiness check would silently drop the
        # predicate and return every row, the exact opposite
        if values is not None:
            if len(values) == 0:
                self._preds.append(F.lit(False))
            else:
                self._preds.append(F.col(column).isin(list(values)))
        return self

    def enum(self, column: str, value: Optional[str], allowed: Sequence[str]) -> "ParametricQuery":
        """P15: enum-validated equality — invalid value is a typed error
        before execution, not an empty result."""
        if value is not None:
            if value not in allowed:
                raise InvalidParam(
                    f"{column}={value!r} not in allowed set {sorted(allowed)}"
                )
            self._preds.append(F.col(column) == F.lit(value))
        return self

    def range(
        self,
        column: str,
        lo: Optional[Number] = None,
        hi: Optional[Number] = None,
        default_lo: Optional[Number] = None,
        default_hi: Optional[Number] = None,
    ) -> "ParametricQuery":
        """P14 + P18: numeric range; a missing end falls back to the
        domain default (reference fills band_gap range with 0/100), or is
        left unbounded when no default is given."""
        # validate the USER-supplied pair before defaults are filled: an
        # open-ended user bound (60, None) combined with a domain default
        # hi of 50 is not a user error, and the raised message must never
        # cite a bound the caller did not pass
        if lo is not None and hi is not None and lo > hi:
            raise InvalidParam(f"{column}: empty range [{lo}, {hi}]")
        lo = default_lo if lo is None else lo
        hi = default_hi if hi is None else hi
        if lo is not None and hi is not None and lo > hi:
            # defaults produced the contradiction -> empty result, not an
            # error: match nothing
            self._preds.append(F.lit(False))
            return self
        if lo is not None:
            self._preds.append(F.col(column) >= F.lit(lo))
        if hi is not None:
            self._preds.append(F.col(column) <= F.lit(hi))
        return self

    def time_window(
        self,
        column: str,
        start: Optional[Union[str, _dt.datetime]] = None,
        end: Optional[Union[str, _dt.datetime]] = None,
    ) -> "ParametricQuery":
        """P16: submission-time window; ISO-8601 strings accepted (the
        reference parses Z-suffixed ISO, Openlam_Server/utils.py:41-47)."""
        def ts(v):
            if isinstance(v, str):
                v = _dt.datetime.fromisoformat(v.replace("Z", "+00:00"))
            if isinstance(v, _dt.datetime) and v.tzinfo is not None:
                # KEEP the tz-aware datetime: PySpark converts aware values
                # via calendar.timegm (absolute instant) but NAIVE ones via
                # driver-local mktime — stripping tzinfo here would shift
                # every bound by the driver's UTC offset on non-UTC hosts
                v = v.astimezone(_dt.timezone.utc)
            return F.lit(v).cast("timestamp")

        if start is not None:
            self._preds.append(F.col(column) >= ts(start))
        if end is not None:
            self._preds.append(F.col(column) <= ts(end))
        return self

    def keyword(self, column: str, value: Optional[str], exact: bool = False) -> "ParametricQuery":
        """P17: match_mode — exact equality vs fuzzy substring."""
        if value is not None:
            self._preds.append(
                F.col(column) == F.lit(value) if exact
                else F.col(column).contains(value)
            )
        return self

    def not_null(self, *columns: str) -> "ParametricQuery":
        """P21 NULL guard."""
        for c in columns:
            self._preds.append(F.col(c).isNotNull())
        return self

    # -- output shaping -----------------------------------------------------

    def sort(self, *spec: tuple[str, bool]) -> "ParametricQuery":
        """O3: server-side sort spec: (column, descending) pairs."""
        self._sort = [F.col(c).desc() if d else F.col(c).asc() for c, d in spec]
        return self

    def page(self, page: int, size: int) -> "ParametricQuery":
        """S5: page/size pagination (page is 1-based, reference default).

        Compiles to ``offset + limit`` on a sorted plan — Spark plans this
        as a global-limit of ``offset+size`` (top-N per partition, then one
        merge), NOT a full sort, so it stays cheap at scale for shallow
        pages. Deep pagination should use keyset predicates instead (the
        OpenLAM S4 pattern: ``range(id, lo=last_seen)``), which this
        builder also expresses.
        """
        if page < 1 or size < 1:
            raise InvalidParam(f"bad page spec page={page} size={size}")
        self._offset = (page - 1) * size
        self._limit = size
        return self

    def limit(self, n: int) -> "ParametricQuery":
        self._limit = n
        return self

    def build(self) -> DataFrame:
        df = self._df
        for p in self._preds:
            df = df.where(p)
        if self._sort:
            df = df.orderBy(*self._sort)
        if self._offset:
            df = df.offset(self._offset)
        if self._limit is not None:
            df = df.limit(self._limit)
        return df


# ---------------------------------------------------------------------------
# Typed frontends re-targeted onto the star schema. Each mirrors one
# reference module's parameter surface; the domain column mapping is noted
# per parameter.
# ---------------------------------------------------------------------------

PART_BRANDS = tuple(f"Brand#{i}" for i in range(1, 26))
PART_TYPES = ("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def mofdb_fetch(
    part: DataFrame,
    *,
    name: Optional[str] = None,
    brand: Optional[str] = None,
    size_min: Optional[int] = None,
    size_max: Optional[int] = None,
    price_min: Optional[float] = None,
    price_max: Optional[float] = None,
    limit: Optional[int] = None,
) -> DataFrame:
    """MOFdb parametric surface (P14/P15) on ``part``: the reference's
    vf/lcd/pld/sa min-max ranges map to size/retailprice ranges; the
    ``database`` enum maps to the brand enum; mof name substring → p_name
    substring (mofdb_database/Mofdb_Server/server.py:59-75)."""
    q = (
        ParametricQuery(part)
        .keyword("p_name", name)
        .enum("p_brand", brand, PART_BRANDS)
        .range("p_size", size_min, size_max)
        .range("p_retailprice", price_min, price_max)
    )
    if limit is not None:
        q.sort(("p_partkey", False)).limit(limit)
    return q.build()


def openlam_fetch(
    events: DataFrame,
    *,
    event_type: Optional[str] = None,
    value_min: Optional[float] = None,
    value_max: Optional[float] = None,
    submitted_after: Optional[str] = None,
    submitted_before: Optional[str] = None,
    limit: Optional[int] = None,
) -> DataFrame:
    """OpenLAM surface (P16) on ``events``: formula equality → event_type,
    energy range → value, submission-time window → ts
    (openlam/lam_optimize/db.py:55-68)."""
    q = (
        ParametricQuery(events)
        .equals("event_type", event_type)
        .range("value", value_min, value_max)
        .time_window("ts", submitted_after, submitted_before)
    )
    if limit is not None:
        q.sort(("event_id", False)).limit(limit)
    return q.build()


def bohrium_fetch(
    part: DataFrame,
    *,
    keyword: Optional[str] = None,
    exact: bool = False,
    size_range: tuple[Optional[int], Optional[int]] = (None, None),
    sort_field: str = "p_retailprice",
    descending: bool = False,
    page: int = 1,
    size: int = 10,
) -> DataFrame:
    """Bohrium surface (P17/P18/O3/S5) on ``part``: fuzzy/exact keyword on
    p_type, open-ended property range auto-completed to the domain bounds
    [1, 50] (the reference fills 0/100 for band gap), server-side sort +
    page/size (Bohriumpublic_Server/server.py:61-178). Sort is tiebroken by
    key so pagination is deterministic."""
    return (
        ParametricQuery(part)
        .keyword("p_type", keyword, exact=exact)
        .range("p_size", *size_range, default_lo=1, default_hi=50)
        .sort((sort_field, descending), ("p_partkey", False))
        .page(page, size)
        .build()
    )
