"""Ordered-funnel conversion analysis: how many users performed a given
sequence of event types IN ORDER (view → click → purchase), the product-
analytics primitive next to sessionization and cohort retention
(golden_builders' events family). Also match_pattern, the
MATCH_RECOGNIZE-style generalization: regex over each user's encoded
event sequence with immediate-follows semantics.

Semantics: a user reaches step i if, scanning their events in (time,
type) order, steps 1..i match greedily — the greedy earliest match is
optimal for subsequence matching, so "reached" is exactly the longest
funnel prefix the user's history contains. Events with types outside the
funnel are ignored; NULL users are excluded (no identity, no funnel).

Scale shape: ONE user-keyed shuffle (collect each user's in-funnel
events), then the subsequence scan as an in-row ``aggregate`` fold over
the sorted array — no joins, no per-step passes (a conditional-
aggregation formulation would need k dependent shuffles). The final
per-step rollup is a single tiny global aggregate. Per-user arrays are
bounded by that user's in-funnel event count; a pathological single user
with billions of events would need per-user pre-bucketing, the same
caveat as sessionize. Engine-portable: the sort key is (epoch_ms, type)
and the fold is restated in SQL as list_reduce over step indices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_conversion(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
) -> DataFrame:
    """Per funnel step: ``(step_index, step, n_users, conversion)`` with
    1-based step_index, n_users = users whose history contains steps
    1..i as a time-ordered subsequence, and conversion = n_users /
    step-1 users (nudge-rounded to 6; NULL when nobody entered)."""
    if not steps or len(set(steps)) != len(steps):
        raise ValueError(f"steps must be non-empty and distinct: {steps}")
    k = len(steps)
    evs = (
        # an unstamped event has no position in a sequence; NULL ts would
        # also sort differently across engines (Spark NULLS FIRST in the
        # array-sort struct vs list_sort's NULL handling)
        df.where(
            F.col(type_col).isin(list(steps))
            & F.col(user_col).isNotNull()
            & F.col(ts_col).isNotNull()
        )
        .select(
            F.col(user_col).alias("__u"),
            F.struct(
                F.unix_millis(F.col(ts_col)).alias("t"),
                F.col(type_col).alias("ty"),
            ).alias("__e"),
        )
        .groupBy("__u")
        .agg(F.array_sort(F.collect_list("__e")).alias("__evs"))
    )
    idxs = F.transform(F.col("__evs"), lambda e: _step_index(e["ty"], steps))
    reached = F.aggregate(
        idxs,
        F.lit(0),
        lambda acc, x: F.when(x == acc, acc + 1).otherwise(acc),
    )
    per_user = evs.select(reached.alias("__reached"))
    counts = per_user.agg(
        *[
            F.count_if(F.col("__reached") >= i + 1).alias(f"__n{i}")
            for i in range(k)
        ]
    )
    # conversion computed on the ONE-row counts frame against __n0, so no
    # window is ever needed on the exploded side
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_index"),
                F.lit(steps[i]).alias("step"),
                F.col(f"__n{i}").alias("n_users"),
                F.when(
                    F.col("__n0") > 0,
                    F.round(
                        F.col(f"__n{i}") / F.col("__n0") + F.lit(1e-9), 6
                    ),
                ).alias("conversion"),
            )
            for i in range(k)
        ]
    )
    return counts.select(F.explode(rows).alias("r")).select(
        "r.step_index", "r.step", "r.n_users", "r.conversion"
    )


def _step_index(ty, steps):
    out = F.lit(None).cast("int")
    for i in range(len(steps) - 1, -1, -1):
        out = F.when(ty == steps[i], F.lit(i)).otherwise(out)
    return out


def event_transitions(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
) -> DataFrame:
    """First-order transition matrix over each user's event stream:
    ``(from_type, to_type, n_transitions, prob)`` where consecutive
    events per user (in (epoch_ms, type) order — the deterministic tie
    rule shared with funnel_conversion) form one transition and ``prob``
    row-normalizes per from_type (nudge-rounded to 6). The
    session-behavior fingerprint next to the funnel: where users
    actually GO after each event. NULL users are excluded.

    Scale shape: one user-keyed window (lead over the per-user sort)
    then a hash aggregate on the (from, to) pairs — type-cardinality²
    keys at most — and a tiny per-from normalization window over that
    aggregate. No collects, no per-user arrays (unlike the funnel fold,
    adjacency needs only lead())."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.unix_millis(F.col(ts_col)), F.col(type_col)
    )
    pairs = (
        df.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("__u"),
            F.col(type_col).alias("from_type"),
            F.lead(F.col(type_col)).over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wf = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wf) + F.lit(1e-9),
            6,
        ).alias("prob"),
    )


def match_pattern(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    alphabet: dict[str, str],
    pattern: str,
) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern detection (the SQL:2016
    row-pattern primitive, reference-free): encode each user's events as
    a string (one letter per event via ``alphabet``, ordered by
    (epoch_ms, type) — the tie rule shared with funnel_conversion), then
    scan it with ``pattern`` (leftmost, greedy, NON-overlapping, the
    shared semantics of Java regex and RE2). Unlike funnel_conversion's
    subsequence semantics, a match here is CONTIGUOUS — an event of a
    type outside the pattern's next step breaks the run, which is what
    "view+ click* purchase, uninterrupted" means. Events whose type is
    not in ``alphabet`` are dropped BEFORE encoding (classic
    MATCH_RECOGNIZE pre-filter); to make a type match-breaking instead,
    put it in the alphabet and exclude its letter from the pattern.

    Returns ``(user, match_no, hit, n_events)``: 1-based match ordinal
    per user, the matched letter string, and its event count. Users with
    no match produce no rows.

    ``pattern`` must stay inside the dialect-portable core — literals,
    classes, grouping, alternation, greedy quantifiers. Lookarounds and
    backreferences are rejected (RE2, hence the DuckDB oracle, has no
    backrefs; empty-width constructs make empty matches engine-specific),
    as is any pattern that can match the empty string.

    Scale shape: ONE user-keyed shuffle (collect each user's events),
    then the regex scan is a per-row JVM operation on the encoded
    string; the explode is linear in matches. Per-user strings are
    bounded by that user's event count — the same single-hot-user caveat
    as sessionize/funnel (pre-bucket by day for pathological users)."""
    import re as _re

    if not alphabet:
        raise ValueError("alphabet must be non-empty")
    chars = list(alphabet.values())
    if len(set(chars)) != len(chars) or any(
        len(c) != 1 or not ("a" <= c <= "z" or "A" <= c <= "Z") for c in chars
    ):
        raise ValueError(
            f"alphabet values must be distinct single ASCII letters: {chars}"
        )
    if "(?" in pattern or _re.search(r"\\[0-9]", pattern):
        raise ValueError(
            "lookarounds / backreferences are not dialect-portable"
        )
    try:
        empty = _re.fullmatch(pattern, "") is not None
    except _re.error as exc:
        raise ValueError(f"invalid pattern {pattern!r}: {exc}") from exc
    if empty:
        raise ValueError("pattern must not match the empty string")

    evs = (
        df.where(
            F.col(type_col).isin(list(alphabet))
            & F.col(user_col).isNotNull()
            & F.col(ts_col).isNotNull()
        )
        .select(
            F.col(user_col).alias("user"),
            F.struct(
                F.unix_millis(F.col(ts_col)).alias("t"),
                F.col(type_col).alias("ty"),
            ).alias("__e"),
        )
        .groupBy("user")
        .agg(F.array_sort(F.collect_list("__e")).alias("__evs"))
    )
    seq = F.array_join(
        F.transform(
            F.col("__evs"),
            lambda e: _char_of(e["ty"], alphabet),
        ),
        "",
    )
    hits = F.regexp_extract_all(F.col("__seq"), F.lit(pattern), F.lit(0))
    return (
        evs.select("user", seq.alias("__seq"))
        .select("user", F.posexplode(hits).alias("__pos", "hit"))
        .select(
            "user",
            (F.col("__pos") + 1).alias("match_no"),
            "hit",
            F.length("hit").alias("n_events"),
        )
    )


def _char_of(ty, alphabet):
    out = F.lit(None).cast("string")
    for t, c in alphabet.items():
        out = F.when(ty == t, F.lit(c)).otherwise(out)
    return out


def touch_attribution(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    convert_type: str,
    touch_type: str,
    lookback_us: int = 7 * 24 * 3600 * 1_000_000,
) -> DataFrame:
    """First- and last-touch attribution: for every ``convert_type``
    event, the earliest and latest ``touch_type`` event by the same
    user within the microsecond-exact lookback window ending at the
    conversion (inclusive — a touch at the same instant counts). The
    marketing-analytics primitive next to funnel/cohort. Returns
    ``(conversion_id, user, first_touch_id, last_touch_id,
    last_touch_lag_us)`` with NULLs when no touch is in window.

    Scale shape: ONE user-keyed window exchange; both touches come from
    min/max of a (epoch_us, id) struct over a RANGE frame keyed on
    integer microseconds — no self-join, no interval join, and the
    struct ordering makes same-instant ties deterministic by id. The
    single-hot-user caveat matches sessionize/funnel."""
    if lookback_us <= 0:
        raise ValueError(f"lookback_us must be > 0: {lookback_us}")
    from pyspark.sql import Window

    nn = events.where(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isNotNull()
    ).select(
        F.col(id_col).alias("__id"),
        F.col(user_col).alias("__user"),
        F.col(type_col).alias("__type"),
        F.unix_micros(F.col(ts_col)).alias("__us"),
    )
    touch = F.when(
        F.col("__type") == touch_type,
        F.struct(F.col("__us").alias("us"), F.col("__id").alias("id")),
    )
    w = (
        Window.partitionBy("__user")
        .orderBy("__us")
        .rangeBetween(-int(lookback_us), 0)
    )
    return (
        nn.withColumn("__lt", F.max(touch).over(w))
        .withColumn("__ft", F.min(touch).over(w))
        .where(F.col("__type") == convert_type)
        .select(
            F.col("__id").alias("conversion_id"),
            F.col("__user").alias(user_col),
            F.col("__ft.id").alias("first_touch_id"),
            F.col("__lt.id").alias("last_touch_id"),
            (F.col("__us") - F.col("__lt.us")).alias("last_touch_lag_us"),
        )
    )


def rfm_segments(
    df: DataFrame,
    unit_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """RFM (recency/frequency/monetary) quartile segmentation — the
    classic behavioral-cohort cut (Hughes 1994): per unit, recency =
    seconds from the unit's last event to the corpus end, frequency =
    event count, monetary = value sum; each scored 1-4 against the
    population quartiles (4 = best: most recent / most frequent /
    highest value) and rolled up per 'rfm' segment code.

    Quartiles are THRESHOLD-based (exact percentiles of the unit frame,
    quantized before comparison — the winsorize discipline), not
    NTILE: a global NTILE is a single-task total sort over every unit,
    while three quantized cuts broadcast as one tiny row and assign in
    a narrow map — boundary ties share a score instead of being split
    arbitrarily, which is also the reproducible behavior. All compares
    run against 6dp-pinned thresholds, so segment membership is
    cross-engine exact. Returns one row per occupied segment:
    ``(segment, r_score, f_score, m_score, n_units, avg_monetary)``.

    Scale shape: one corpus aggregate to the unit frame, one 1-row
    percentile reduce broadcast back, one segment-keyed aggregate
    (<= 64 groups)."""
    base = df.where(
        F.col(unit_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    )
    units = base.groupBy(F.col(unit_col).alias("__u")).agg(
        F.max(F.unix_timestamp(F.col(ts_col))).alias("__last"),
        F.count(F.lit(1)).cast("double").alias("__f"),
        F.round(F.sum(F.col(value_col).cast("double")) + F.lit(1e-9), 6).alias(
            "__m"
        ),
    )
    ref = units.agg(F.max("__last").alias("__end"))
    scored_in = units.crossJoin(F.broadcast(ref)).select(
        "__u",
        (F.col("__end") - F.col("__last")).cast("double").alias("__r"),
        "__f",
        "__m",
    ).localCheckpoint(eager=True)
    cuts = scored_in.agg(
        *[
            F.round(F.percentile(c, p) + F.lit(1e-9), 6).alias(f"{c}_{i}")
            for c in ("__r", "__f", "__m")
            for i, p in ((1, 0.25), (2, 0.5), (3, 0.75))
        ]
    )

    def score(c, invert):
        # count of thresholds strictly exceeded -> 1..4; recency
        # inverts (smaller gap = better)
        raw = (
            (F.col(c) > F.col(f"{c}_1")).cast("int")
            + (F.col(c) > F.col(f"{c}_2")).cast("int")
            + (F.col(c) > F.col(f"{c}_3")).cast("int")
        )
        return (F.lit(4) - raw) if invert else (F.lit(1) + raw)

    scored = scored_in.crossJoin(F.broadcast(cuts)).select(
        "__m",
        score("__r", True).alias("r_score"),
        score("__f", False).alias("f_score"),
        score("__m", False).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_units"),
            F.round(F.avg("__m") + F.lit(1e-9), 6).alias("avg_monetary"),
        )
        .select(
            F.concat(
                F.col("r_score").cast("string"),
                F.col("f_score").cast("string"),
                F.col("m_score").cast("string"),
            ).alias("segment"),
            F.col("r_score").cast("long").alias("r_score"),
            F.col("f_score").cast("long").alias("f_score"),
            F.col("m_score").cast("long").alias("m_score"),
            F.col("n_units").cast("long").alias("n_units"),
            "avg_monetary",
        )
    )
