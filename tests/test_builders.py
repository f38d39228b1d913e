"""Parametric builder tests (SURVEY.md §2.2 P14-P18, §2.6 O3, §2.1 S5)."""

import pytest
from pyspark.sql import functions as F

from mr_dice_spark.catalog import Catalog
from mr_dice_spark.plans import (
    InvalidParam,
    ParametricQuery,
    bohrium_fetch,
    mofdb_fetch,
)


def test_enum_validation_fails_fast(spark, sf_dir):
    part = Catalog(spark, sf_dir).part
    with pytest.raises(InvalidParam, match="p_brand"):
        mofdb_fetch(part, brand="Brand#99")


def test_empty_range_rejected(spark, sf_dir):
    part = Catalog(spark, sf_dir).part
    with pytest.raises(InvalidParam, match="empty range"):
        mofdb_fetch(part, size_min=40, size_max=10)


def test_bad_page_rejected(spark, sf_dir):
    part = Catalog(spark, sf_dir).part
    with pytest.raises(InvalidParam, match="page"):
        bohrium_fetch(part, page=0, size=10)


def test_open_range_autocompletion(spark, sf_dir):
    # P18: missing ends fall back to domain defaults instead of unbounded
    part = Catalog(spark, sf_dir).part
    out = (
        ParametricQuery(part)
        .range("p_size", lo=None, hi=None, default_lo=45, default_hi=50)
        .build()
    )
    sizes = {r["p_size"] for r in out.select("p_size").distinct().collect()}
    assert sizes and all(45 <= s <= 50 for s in sizes)


def test_pagination_is_disjoint_and_ordered(spark, sf_dir):
    part = Catalog(spark, sf_dir).part
    pages = [
        bohrium_fetch(part, page=p, size=15, sort_field="p_retailprice",
                      descending=True).select("p_partkey").collect()
        for p in (1, 2, 3)
    ]
    keys = [[r["p_partkey"] for r in page] for page in pages]
    flat = [k for page in keys for k in page]
    assert len(flat) == len(set(flat)) == 45  # disjoint pages
    # concatenated pages equal the head of the full ordering
    full = [
        r["p_partkey"]
        for r in part.orderBy(F.desc("p_retailprice"), "p_partkey")
        .limit(45).select("p_partkey").collect()
    ]
    assert flat == full


def test_time_window_accepts_iso_z(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    out = (
        ParametricQuery(ev)
        .time_window("ts", "2024-01-05T00:00:00Z", "2024-01-06T00:00:00Z")
        .build()
    )
    bounds = out.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    assert bounds["lo"] is not None
    assert bounds["lo"].day >= 4 and bounds["hi"].day <= 6


def test_predicates_reach_parquet_scan(spark, sf_dir):
    # the whole point of the declarative compile: filters land in the scan
    part = Catalog(spark, sf_dir).part
    plan = mofdb_fetch(part, brand="Brand#7", size_min=10)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "p_brand" in plan.split("PushedFilters")[1][:400]


def test_funnel_conversion_order_sensitivity(spark):
    """The funnel is a SUBSEQUENCE match: a purchase BEFORE the click
    must not count as step 3, and ignoring interleaved non-funnel events
    must not break the chain."""
    import datetime as dt

    import pytest

    from mr_dice_spark.operators.funnel import funnel_conversion

    t0 = dt.datetime(2024, 1, 1)

    def e(u, ty, minutes):
        return (u, ty, t0 + dt.timedelta(minutes=minutes))

    rows = [
        # u1: perfect order (with noise interleaved)
        e(1, "view", 0), e(1, "error", 1), e(1, "click", 2), e(1, "purchase", 3),
        # u2: purchase BEFORE click -> reaches only step 2
        e(2, "view", 0), e(2, "purchase", 1), e(2, "click", 2),
        # u3: only views
        e(3, "view", 0), e(3, "view", 5),
        # u4: click without prior view -> reaches nothing
        e(4, "click", 0), e(4, "purchase", 1),
        # u5: null user ignored
        (None, "view", t0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {r["step_index"]: r for r in funnel_conversion(
        df, "user_id", "event_type", "ts", ["view", "click", "purchase"]).collect()}
    assert got[1]["n_users"] == 3          # u1, u2, u3
    assert got[2]["n_users"] == 2          # u1, u2 (u2's click follows its view)
    assert got[3]["n_users"] == 1          # u1 only
    assert got[1]["conversion"] == 1.0
    assert got[3]["conversion"] == pytest.approx(1 / 3, abs=1e-6)
    with pytest.raises(ValueError):
        funnel_conversion(df, "user_id", "event_type", "ts", [])
    with pytest.raises(ValueError):
        funnel_conversion(df, "user_id", "event_type", "ts", ["view", "view"])


def test_event_transitions_counts_and_normalization(spark):
    import datetime as dt

    import pytest

    from mr_dice_spark.operators.funnel import event_transitions

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # u1: a -> b -> a ; u2: a -> b ; null user ignored
        (1, "a", t0), (1, "b", t0 + dt.timedelta(minutes=1)),
        (1, "a", t0 + dt.timedelta(minutes=2)),
        (2, "a", t0), (2, "b", t0 + dt.timedelta(minutes=1)),
        (None, "a", t0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {(r["from_type"], r["to_type"]): r for r in
           event_transitions(df, "user_id", "event_type", "ts").collect()}
    assert got[("a", "b")]["n_transitions"] == 2
    assert got[("b", "a")]["n_transitions"] == 1
    assert set(got) == {("a", "b"), ("b", "a")}
    # per-from normalization: a only ever goes to b
    assert got[("a", "b")]["prob"] == pytest.approx(1.0)
    assert got[("b", "a")]["prob"] == pytest.approx(1.0)


def test_match_pattern_contiguity_and_validation(spark):
    """match_pattern is CONTIGUOUS (an alphabet letter outside the
    pattern breaks a run — unlike the funnel's subsequence semantics),
    matches are leftmost-greedy non-overlapping, and the dialect guard
    rejects unportable or empty-matching patterns."""
    import datetime as dt

    import pytest

    from mr_dice_spark.operators.funnel import match_pattern

    t0 = dt.datetime(2024, 1, 1)

    def e(u, ty, minutes):
        return (u, ty, t0 + dt.timedelta(minutes=minutes))

    rows = [
        # u1: v v p -> one greedy hit 'vvp' (not 'vp')
        e(1, "view", 0), e(1, "view", 1), e(1, "purchase", 2),
        # u2: v e p -> error breaks the run; no hit
        e(2, "view", 0), e(2, "error", 1), e(2, "purchase", 2),
        # u3: v p v c p -> two hits, ordinals 1 and 2
        e(3, "view", 0), e(3, "purchase", 1), e(3, "view", 2),
        e(3, "click", 3), e(3, "purchase", 4),
        # u4: subsequence but not contiguous across a signup
        e(4, "view", 0), e(4, "signup", 1), e(4, "purchase", 2),
        # null user / null ts ignored
        (None, "view", t0), (5, "view", None),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    alpha = {"signup": "s", "error": "e", "click": "c", "view": "v",
             "purchase": "p"}
    got = sorted(
        (r["user"], r["match_no"], r["hit"], r["n_events"])
        for r in match_pattern(
            df, "user_id", "event_type", "ts", alpha, "v[vc]*p"
        ).collect()
    )
    assert got == [(1, 1, "vvp", 3), (3, 1, "vp", 2), (3, 2, "vcp", 3)]
    for bad in ("c*", "(?=v)p", r"(v)\1p", "v[", ""):
        with pytest.raises(ValueError):
            match_pattern(df, "user_id", "event_type", "ts", alpha, bad)
    with pytest.raises(ValueError):  # duplicate letters
        match_pattern(df, "user_id", "event_type", "ts",
                      {"view": "v", "click": "v"}, "v+")
    with pytest.raises(ValueError):  # non-letter
        match_pattern(df, "user_id", "event_type", "ts", {"view": "."}, "v")


def test_kfold_assign_stability_and_grouping(spark):
    """Fold is a pure function of (key, seed): repartitioning doesn't
    move rows, same key -> same fold (group-leakage contract), seeds
    decorrelate, k validates."""
    import pytest

    from mr_dice_spark.operators.sampling import kfold_assign

    df = spark.createDataFrame(
        [(i, i % 7) for i in range(200)], "id long, grp long"
    )
    a = {r["id"]: r["fold"] for r in kfold_assign(df, "grp", 5).collect()}
    b = {r["id"]: r["fold"]
         for r in kfold_assign(df.repartition(13), "grp", 5).collect()}
    assert a == b
    # group keying: every row of a group shares its fold
    by_grp = {}
    for i, f in a.items():
        by_grp.setdefault(i % 7, set()).add(f)
    assert all(len(s) == 1 for s in by_grp.values())
    assert set(a.values()) <= set(range(5))
    c = {r["id"]: r["fold"]
         for r in kfold_assign(df, "grp", 5, seed="v2/").collect()}
    assert c != a
    with pytest.raises(ValueError):
        kfold_assign(df, "grp", 1)


def test_frequent_itemsets_set_semantics_and_guards(spark):
    """Multiplicity within a basket must not inflate support; itemset
    identity is the sorted join; the basket-size circuit breaker and
    parameter validation fire."""
    import datetime as dt

    import pytest

    from mr_dice_spark.operators.itemsets import frequent_itemsets

    d = dt.date(2024, 1, 1)
    rows = [
        # basket (1, d): a a b  -> supports {a}, {b}, {a b} once each
        (1, d, "a"), (1, d, "a"), (1, d, "b"),
        # basket (2, d): b c a -> {a},{b},{c},{a b},{a c},{b c},{a b c}
        (2, d, "b"), (2, d, "c"), (2, d, "a"),
        # null user / null item excluded
        (None, d, "a"), (3, d, None),
    ]
    df = spark.createDataFrame(rows, "user_id long, day date, it string")
    got = {
        (r["itemset"], r["size"]): r["support"]
        for r in frequent_itemsets(df, ["user_id", "day"], "it", 1).collect()
    }
    assert got[("a", 1)] == 2          # NOT 3: multiplicity ignored
    assert got[("a b", 2)] == 2
    assert got[("a b c", 3)] == 1
    assert ("c", 1) in got and got[("c", 1)] == 1
    # min_support filters
    got2 = {
        r["itemset"]
        for r in frequent_itemsets(df, ["user_id", "day"], "it", 2).collect()
    }
    assert got2 == {"a", "b", "a b"}
    with pytest.raises(ValueError):
        frequent_itemsets(df, ["user_id"], "it", 0)
    with pytest.raises(ValueError, match="max_basket_items"):
        frequent_itemsets(df, ["day"], "it", 1, max_basket_items=2)


def test_itemsets_delimiter_ambiguity_fails_fast_and_rules_survive_spaces(spark):
    """An item value containing the itemset delimiter would corrupt any
    downstream split (ADVICE r5) — the default space delimiter must
    fail fast on spaced items, an explicit safe delimiter must mine
    them correctly, and association_rules (which now mines with \\x1f
    internally) must return intact spaced item names."""
    import pytest

    from mr_dice_spark.operators.itemsets import association_rules, frequent_itemsets

    rows = [
        (1, "hot dog"), (1, "soda pop"),
        (2, "hot dog"), (2, "soda pop"),
        (3, "hot dog"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    with pytest.raises(ValueError, match="delimiter"):
        frequent_itemsets(df, ["basket"], "item", 1).collect()
    got = {
        (r["itemset"], r["size"]): r["support"]
        for r in frequent_itemsets(
            df, ["basket"], "item", 1, delimiter="\x1f"
        ).collect()
    }
    assert got[("hot dog", 1)] == 3
    assert got[("hot dog\x1fsoda pop", 2)] == 2
    rules = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(df, ["basket"], "item", min_support=1).collect()
    }
    hd = rules[("hot dog", "soda pop")]
    assert hd["support"] == 2 and abs(hd["confidence"] - 2 / 3) < 1e-12
    sp = rules[("soda pop", "hot dog")]
    assert abs(sp["confidence"] - 1.0) < 1e-12
    with pytest.raises(ValueError, match="non-empty"):
        frequent_itemsets(df, ["basket"], "item", 1, delimiter="")


def test_association_rules_hand_baskets(spark):
    """4 baskets: {a,b} x3, {a} x1 -> rule a->b has conf 3/4, lift
    (3/4)/(3/4) = 1.0; rule b->a conf 1, lift 1/(4/4)... computed by
    hand below; min_confidence filters."""
    from mr_dice_spark.operators.itemsets import association_rules

    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"),
        (4, "a"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {(r["antecedent"], r["consequent"]): r for r in
           association_rules(df, ["basket"], "item", min_support=1).collect()}
    ab = got[("a", "b")]
    assert ab["support"] == 3
    assert abs(ab["confidence"] - 3 / 4) < 1e-12
    assert abs(ab["lift"] - (3 / 4) / (3 / 4)) < 1e-12      # sup(b)/n = 3/4
    ba = got[("b", "a")]
    assert abs(ba["confidence"] - 1.0) < 1e-12
    assert abs(ba["lift"] - 1.0 / (4 / 4)) < 1e-12          # sup(a)/n = 1
    filtered = association_rules(
        df, ["basket"], "item", min_support=1, min_confidence=0.9
    ).collect()
    assert [(r["antecedent"], r["consequent"]) for r in filtered] == [("b", "a")]
