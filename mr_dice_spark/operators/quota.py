"""Fair-quota top-k across groups ("water-fill").

The reference's most distinctive operator (SURVEY.md §2.6 O5):
``distribute_quota_fair`` at optimade_database/Optimade_Server/utils.py:253-384
allocates a global result budget across (clause -> url) capacity groups:

1. equal split across active clauses (±1, insertion order gets the
   remainder), capped by clause capacity;
2. inside each clause, equal split across its urls (±1) plus an intra-clause
   round-robin water-fill over urls with headroom;
3. leftover budget water-fills across clauses — each pass gives one unit to
   every clause currently at the minimum total (insertion order), routed
   round-robin to that clause's residual urls — until the budget or all
   capacity is exhausted.

Invariants (property-tested in tests/test_quota.py):
* sum(plan) == min(n_results, total capacity)
* plan[c][u] <= stats[c][u] for every cell
* clause totals differ by <= 1 unless capacity-bound.

The allocation is a pure function of the per-group COUNTS, so at scale the
distributed form is: cheap count aggregate -> driver-side plan (dozens of
groups) -> broadcast quota join -> per-group row_number filter. No data-size
dependence on the driver beyond the group count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GroupStats = dict[str, dict[str, int]]


def _split_evenly(budget: int, keys: list[str], caps: dict[str, int]) -> dict[str, int]:
    """base + remainder split over ``keys`` in order, capped per key."""
    share, extra = divmod(budget, len(keys))
    return {
        k: min(caps[k], share + (1 if i < extra else 0)) for i, k in enumerate(keys)
    }


def _round_robin_fill(
    assigned: dict[str, int], caps: dict[str, int], keys: list[str], budget: int
) -> int:
    """Hand out ``budget`` one unit at a time, cycling ``keys`` in order and
    skipping keys without headroom. Returns the number of units placed."""
    placed = 0
    while placed < budget:
        progressed = False
        for k in keys:
            if placed >= budget:
                break
            if assigned[k] < caps[k]:
                assigned[k] += 1
                placed += 1
                progressed = True
        if not progressed:
            break
    return placed


def distribute_quota_fair(stats: GroupStats, n_results: int) -> GroupStats:
    """Pure water-fill allocation, semantics-parity with the reference."""
    if not stats or n_results <= 0:
        return {}

    plan: GroupStats = {c: {u: 0 for u in urls} for c, urls in stats.items()}
    clause_cap = {c: sum(urls.values()) for c, urls in stats.items()}
    active = [c for c in stats if clause_cap[c] > 0]
    if not active:
        return plan

    # step 1: per-clause targets — equal split over active clauses, capped
    targets = _split_evenly(n_results, active, clause_cap)

    # step 2: realize each clause's target over its urls (equal + water-fill)
    totals: dict[str, int] = {}
    for c in active:
        urls = list(stats[c].keys())
        caps = stats[c]
        got = _split_evenly(targets[c], urls, caps) if targets[c] > 0 else {u: 0 for u in urls}
        short = targets[c] - sum(got.values())
        if short > 0:
            _round_robin_fill(got, caps, urls, short)
        plan[c] = dict(got)
        totals[c] = sum(got.values())

    # step 3: clause-level water-fill of the leftover budget. Each pass
    # raises every clause sitting at the current minimum total by one unit
    # (insertion order), routing the unit round-robin within the clause.
    # Pointer state persists across passes; an exhausted url leaves the
    # rotation and the pointer stays on the element that slid into its slot
    # (exact parity with the reference's shrinking-residual-list behavior).
    remaining = n_results - sum(totals.values())
    headroom: dict[str, list[list]] = {}
    ptr: dict[str, int] = {}
    for c in active:
        open_urls = [[u, stats[c][u] - plan[c][u]] for u in stats[c] if stats[c][u] > plan[c][u]]
        if open_urls:
            headroom[c] = open_urls
            ptr[c] = 0

    def feed_clause(c: str) -> None:
        rotation = headroom[c]
        i = ptr[c] % len(rotation)
        url, slack = rotation[i]
        plan[c][url] += 1
        totals[c] += 1
        if slack == 1:
            rotation.pop(i)
            if rotation:
                ptr[c] = i % len(rotation)
            else:
                del headroom[c]
        else:
            rotation[i][1] = slack - 1
            ptr[c] = (i + 1) % len(rotation)

    while remaining > 0 and headroom:
        if len(headroom) == 1:
            # single clause left: cross-clause fairness is decided, so whole
            # round-robin rounds can be granted in bulk. `whole` <= min
            # slack - 1 keeps every url open, making the bulk grant
            # EXACTLY equal to whole*r unit feeds (no url exhausts
            # mid-round); the residue falls through to unit steps. Turns
            # the O(remaining) driver loop into O(#urls) for large budgets.
            (c,) = tuple(headroom)
            rotation = headroom[c]
            r = len(rotation)
            min_slack = min(s for _, s in rotation)
            whole = min(min_slack - 1, remaining // r)
            if whole > 0:
                for entry in rotation:
                    entry[1] -= whole
                    plan[c][entry[0]] += whole
                totals[c] += whole * r
                remaining -= whole * r
                continue
        floor = min(totals[c] for c in active if c in headroom)
        progressed = False
        for c in active:
            if remaining == 0:
                break
            if c in headroom and totals[c] == floor:
                feed_clause(c)
                remaining -= 1
                progressed = True
        if not progressed:
            break
    return plan


def fair_quota_topk(
    df: DataFrame,
    clause_col: str,
    url_col: str | None,
    n_results: int,
    order_by: list,
) -> DataFrame:
    """Distributed fair-quota top-k: the reference's count -> allocate ->
    materialize-under-quota pipeline (Optimade_Server/server.py:123-161) as
    one DataFrame transform.

    ``order_by`` defines the deterministic per-group priority (the reference
    relies on provider insertion order; a distributed engine must impose an
    explicit total order — SURVEY.md §7.3).

    Scale shape: one cheap groupBy-count (collected: #groups rows, tiny),
    driver-side pure allocation, broadcast join of the quota table, then a
    single window row_number filter — one shuffle over the data.
    """
    ucol = url_col
    if ucol is None:
        df = df.withColumn("__url", F.lit("_"))
        ucol = "__url"

    counts = df.groupBy(clause_col, ucol).count().collect()
    # fail fast on NULL group keys: the quota join below is null-unsafe, so
    # a NULL clause/url group would be ALLOCATED quota and then silently
    # dropped by the join — under-filling the budget. Checked here on the
    # already-collected counts (zero extra jobs).
    for row in counts:
        if row[clause_col] is None or row[ucol] is None:
            raise ValueError(
                f"fair_quota_topk: NULL in group keys "
                f"({clause_col!r}/{ucol!r}); filter or coalesce them first"
            )
    stats: GroupStats = {}
    for row in sorted(counts, key=lambda r: (str(r[clause_col]), str(r[ucol]))):
        stats.setdefault(row[clause_col], {})[row[ucol]] = row["count"]
    plan = distribute_quota_fair(stats, n_results)

    quota_rows = [
        (c, u, q) for c, urls in plan.items() for u, q in urls.items() if q > 0
    ]
    spark = df.sparkSession
    if not quota_rows:
        # empty input or n_results <= 0: an empty quota table with an
        # EXPLICIT schema (createDataFrame cannot infer types from [])
        key_fields = [f for f in df.schema.fields if f.name in (clause_col, ucol)]
        from pyspark.sql.types import LongType, StructField, StructType

        schema = StructType(key_fields + [StructField("__quota", LongType())])
        quota_df = spark.createDataFrame([], schema)
    else:
        quota_df = spark.createDataFrame(quota_rows, [clause_col, ucol, "__quota"])

    w = Window.partitionBy(clause_col, ucol).orderBy(*order_by)
    # literal max-quota bound first: WindowGroupLimit needs a CONSTANT
    # limit to prune per-group rows map-side — rank <= column alone would
    # shuffle whole groups; the column comparison then applies each
    # group's exact water-fill quota
    max_q = max((q for _, _, q in quota_rows), default=0)
    out = (
        df.join(F.broadcast(quota_df), [clause_col, ucol])
        .withColumn("__rn", F.row_number().over(w))
        .where(
            (F.col("__rn") <= F.lit(int(max_q)))
            & (F.col("__rn") <= F.col("__quota"))
        )
        .drop("__rn", "__quota")
    )
    return out.drop("__url") if url_col is None else out
