"""Frequent itemset mining over grouped baskets — market-basket /
co-occurrence analytics for event streams: which sets of event types
happen together within a (user, day), the classic support-counting
primitive (Agrawal-Srikant Apriori's output at sizes 1-3).

Design: baskets are DISTINCT item sets per group; size-2/3 candidate
itemsets are enumerated IN-ROW from each basket's sorted item array
(combination expansion via indexed slices — no self-joins over the
exploded item table, which would shuffle the item stream twice per
size), then one hash aggregate per size counts support with map-side
combine. The in-row expansion is C(d, k) per basket, so a
``max_basket_items`` guard fail-fasts baskets whose distinct-item count
would explode the row (the cosine_pairs_exact circuit-breaker policy);
typed event streams have single-digit d, where C(d, 3) is trivial. True
Apriori level-wise candidate pruning only pays off when the item domain
is large — that regime wants the self-join formulation, documented
here, not silently slow expansion.

Scale shape: one group-keyed aggregate to build baskets, then per size
one narrow expansion + one itemset-keyed count aggregate; the basket
count for support ratios is a 1-row broadcast cross join. Output is
bounded by the frequent-itemset count, not the basket count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_itemsets(
    df: DataFrame,
    basket_cols: list[str],
    item_col: str,
    min_support: int,
    max_size: int = 3,
    max_basket_items: int = 64,
    delimiter: str = " ",
) -> DataFrame:
    """(itemset, size, support, support_ratio): itemsets of 1..max_size
    items appearing in >= ``min_support`` baskets, itemset rendered as
    the sorted items joined with ``delimiter`` (deterministic identity),
    support_ratio = support / n_baskets nudge-rounded to 6. A basket
    supports an itemset if it contains ALL its items (set semantics —
    multiplicity within a basket does not matter). NULL group keys or
    items are excluded.

    An item VALUE containing the delimiter would make the rendered
    itemset ambiguous (and silently corrupt any downstream split, e.g.
    :func:`association_rules`), so such items fail fast; pass a
    delimiter that cannot occur in the data (association_rules uses
    ``"\\x1f"``, the ASCII unit separator) when items may contain
    spaces."""
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1: {min_support}")
    if not 1 <= max_size <= 3:
        raise ValueError(f"max_size must be 1..3: {max_size}")
    if not delimiter:
        raise ValueError("delimiter must be non-empty")
    nn = df
    for c in [*basket_cols, item_col]:
        nn = nn.where(F.col(c).isNotNull())
    # the basket build is the one item-stream shuffle and feeds FIVE
    # consumers (guard scan, n_baskets, one expansion per size);
    # materialize it once — without this, each union branch re-runs the
    # grouped collect_set (measured: 13 exchanges -> 6, the expensive
    # one deduplicated). Same pattern as minhash_lsh_candidates' sets_.
    baskets = (
        nn.groupBy(*basket_cols)
        .agg(F.array_sort(F.collect_set(item_col)).alias("__items"))
        .localCheckpoint(eager=True)
    )
    # one guard pass over the checkpointed baskets catches both fail-fast
    # conditions (expansion blowup; delimiter-ambiguous item values)
    bad = (
        baskets.select(
            (F.size("__items") > max_basket_items).alias("__over"),
            F.exists(
                "__items", lambda x: x.contains(F.lit(delimiter))
            ).alias("__delim"),
        )
        .where(F.col("__over") | F.col("__delim"))
        .limit(1)
        .collect()
    )
    if bad:
        if bad[0]["__over"]:
            raise ValueError(
                f"frequent_itemsets: a basket exceeds max_basket_items="
                f"{max_basket_items}; in-row C(d,k) expansion would explode — "
                "use the self-join formulation for large item domains "
                "(or raise the guard deliberately)"
            )
        raise ValueError(
            f"frequent_itemsets: an item value contains the itemset "
            f"delimiter {delimiter!r}, which would make the rendered "
            "itemset ambiguous — pass a delimiter that cannot occur in "
            'the data (e.g. delimiter="\\x1f")'
        )
    n_b = baskets.agg(F.count(F.lit(1)).alias("__n"))
    a = F.col("__items")
    d = F.size(a)
    sets_by_size = {1: F.transform(a, lambda x: F.array(x))}
    if max_size >= 2:
        sets_by_size[2] = F.flatten(
            F.transform(
                a,
                lambda x, i: F.transform(
                    F.slice(a, i + 2, d), lambda y: F.array(x, y)
                ),
            )
        )
    if max_size >= 3:
        sets_by_size[3] = F.flatten(
            F.flatten(
                F.transform(
                    a,
                    lambda x, i: F.transform(
                        F.slice(a, i + 2, d),
                        lambda y, j: F.transform(
                            F.slice(a, i + j + 3, d),
                            lambda z: F.array(x, y, z),
                        ),
                    ),
                )
            )
        )
    out = None
    for size, expr in sets_by_size.items():
        counts = (
            baskets.select(F.explode(expr).alias("__set"))
            .groupBy("__set")
            .agg(F.count(F.lit(1)).alias("support"))
            .where(F.col("support") >= min_support)
            .crossJoin(F.broadcast(n_b))
            .select(
                F.array_join("__set", delimiter).alias("itemset"),
                F.lit(size).alias("size"),
                "support",
                F.round(
                    F.col("support") / F.col("__n") + F.lit(1e-9), 6
                ).alias("support_ratio"),
            )
        )
        out = counts if out is None else out.unionByName(counts)
    return out


def association_rules(
    df: DataFrame,
    basket_cols: list[str],
    item_col: str,
    min_support: int,
    min_confidence: float = 0.0,
) -> DataFrame:
    """Association rules from the frequent pairs: for every frequent
    itemset {a, b}, both directed rules with
    ``confidence = sup(ab) / sup(antecedent)`` and
    ``lift = confidence / (sup(consequent) / n_baskets)`` — lift > 1 is
    genuine co-occurrence, lift < 1 is substitution; the classic
    recommendation/diagnostics layer over :func:`frequent_itemsets`.
    Antecedent singletons are always frequent when the pair is
    (sup(a) >= sup(ab) >= min_support), so the join never drops rules.

    One extra distinct-basket count beside the itemset mining (a driver
    scalar, the k-means-centroid idiom); the rule build itself is
    pair-sized. Returns ``(antecedent, consequent, support, confidence,
    lift)`` for rules at or above ``min_confidence``.
    """
    # mine with the unit-separator delimiter so item values containing
    # spaces round-trip through the itemset string intact (ADVICE r5);
    # frequent_itemsets fails fast on the (pathological) \x1f-in-item case
    _delim = "\x1f"
    its = frequent_itemsets(
        df, basket_cols, item_col, min_support=min_support, max_size=2,
        delimiter=_delim,
    )
    singles = its.where(F.col("size") == 1).select(
        F.col("itemset").alias("__it"), F.col("support").alias("__s")
    )
    pairs = its.where(F.col("size") == 2).select(
        F.split("itemset", _delim).getItem(0).alias("__a"),
        F.split("itemset", _delim).getItem(1).alias("__b"),
        F.col("support").alias("__sab"),
    )
    nn = df
    for c in [*basket_cols, item_col]:
        nn = nn.where(F.col(c).isNotNull())
    n_b = nn.select(*basket_cols).distinct().count()
    directed = pairs.select(
        F.col("__a").alias("antecedent"), F.col("__b").alias("consequent"), "__sab"
    ).union(
        pairs.select(
            F.col("__b").alias("antecedent"), F.col("__a").alias("consequent"),
            "__sab",
        )
    )
    out = (
        directed.join(
            F.broadcast(singles.withColumnRenamed("__it", "antecedent")
                        .withColumnRenamed("__s", "__sa")),
            "antecedent",
        )
        .join(
            F.broadcast(
                singles.withColumnRenamed("__it", "consequent")
                .withColumnRenamed("__s", "__sc")
            ),
            "consequent",
        )
    )
    conf = F.col("__sab").cast("double") / F.col("__sa")
    lift = conf * F.lit(float(n_b)) / F.col("__sc")
    return (
        out.select(
            "antecedent",
            "consequent",
            F.col("__sab").alias("support"),
            conf.alias("confidence"),
            lift.alias("lift"),
        )
        .where(F.col("confidence") >= min_confidence)
    )
