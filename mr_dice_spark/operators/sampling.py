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
    engine-portable (same arithmetic runs in DuckDB for oracles).

    NULL keys hash to a fixed sentinel bucket rather than propagating NULL:
    a NULL bucket would silently DROP the row from ``deterministic_sample``
    (NULL < threshold filters it) and rank it FIRST in the window samplers
    (NULLS FIRST ordering) — both wrong in opposite directions. Non-null
    keys are unaffected, so SQL oracles restating the arithmetic on
    non-null fixtures stay valid."""
    s = F.concat(F.lit(seed), F.coalesce(key.cast("string"), F.lit("\x00null")))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def shuffle_shards(
    df: DataFrame, key_col: str, n_shards: int, seed: str = ""
) -> DataFrame:
    """Deterministic distributed shuffle into training shards: every row
    gains (shard, shard_rank) where ``shard = hash(key) mod n_shards``
    and ``shard_rank`` orders the shard by the same hash (key breaks
    ties) — the pseudo-random global interleave a pretraining pipeline
    wants before tokenization/packing, WITHOUT a global sort.

    Scale shape: one hash shuffle on the shard key + a within-shard sort
    — a row_number window per shard, so the worst task holds n/n_shards
    rows (size n_shards so a shard fits a task; at 100 TB that is tens of
    thousands of shards). A naive ``orderBy(hash)`` would range-sample
    the input (PERFORMANCE.md finding 9) and funnel the final pass
    through a single ordering; reading the output sorted by
    (shard, shard_rank) yields the same deterministic permutation with
    every stage parallel. The hash is the engine-portable md5 prefix, so
    the permutation — not just the counts — is oracle-checkable."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be > 0, got {n_shards}")
    key = F.col(key_col)
    h = hash_bucket(key, seed)
    shard = (h % n_shards).cast("int")
    w = Window.partitionBy(shard).orderBy(h, key)
    return df.withColumn("shard", shard).withColumn(
        "shard_rank", F.row_number().over(w)
    )


def split_thresholds(splits) -> list[tuple[str, int]]:
    """Cumulative upper bucket bounds for :func:`split_assign`, exposed so
    SQL oracles restate the EXACT integer thresholds the operator compares
    against (recomputing ``int(cum * 2^32)`` elsewhere risks a one-ulp
    drift in the float cumsum flipping a boundary key's split).

    Fractions are normalized by their sum, so ``(9, 0.5, 0.5)`` works as
    ratios; the last split's bound is pinned to the full bucket space so
    float rounding can never leave keys unassigned."""
    splits = list(splits)
    if not splits:
        raise ValueError("splits must be non-empty")
    total = float(sum(frac for _, frac in splits))
    if total <= 0 or any(frac < 0 for _, frac in splits):
        raise ValueError(f"split fractions must be >= 0 with a positive sum: {splits}")
    names = [name for name, _ in splits]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate split names: {names}")
    out: list[tuple[str, int]] = []
    cum = 0.0
    for name, frac in splits[:-1]:
        cum += frac / total
        out.append((name, int(cum * _BUCKETS)))
    out.append((splits[-1][0], _BUCKETS))
    return out


def split_assign(
    df: DataFrame,
    key_col: str,
    splits=(("train", 0.98), ("val", 0.01), ("test", 0.01)),
    seed: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: every row gains ``split``,
    a pure function of (key, seed) — the standard leakage-safe way to cut
    a corpus, because membership survives repartitioning, incremental
    re-runs, and engine changes (the hash is the portable md5 prefix), and
    keying on a GROUP id (e.g. registered domain) keeps all of a group's
    rows in one split so near-duplicates cannot straddle train/test.

    Scale shape: a narrow per-row CASE over the hash — no shuffle, no
    aggregate, pushdown-unaffected; the split column is a zero-cost
    partition key for the downstream write."""
    bounds = split_thresholds(splits)
    h = hash_bucket(F.col(key_col), seed)
    expr = None
    for name, upper in bounds[:-1]:
        expr = (F.when if expr is None else expr.when)(h < upper, F.lit(name))
    last = F.lit(bounds[-1][0])
    return df.withColumn(out_col, last if expr is None else expr.otherwise(last))


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


def apportion_weighted(
    avail: dict, weights: dict, total: int
) -> dict:
    """Deterministic largest-remainder apportionment of ``total`` rows over
    groups with target ``weights``, capped by per-group availability; the
    shortfall from capped groups re-apportions over the remaining groups by
    their renormalized weights (pretraining data-mixing semantics: an
    exhausted source gives its share to the rest of the mixture, it does
    not shrink the run). Pure driver-side arithmetic on per-group counts —
    the same altitude as the reference's water-fill quota. Ties in the
    fractional remainders break on group name."""
    alloc = {g: 0 for g in avail}
    active = {g for g in avail if weights.get(g, 0) > 0 and avail[g] > 0}
    budget = max(0, int(total))
    while budget > 0 and active:
        # sum in sorted group order: set-iteration order varies per run,
        # and a different float summation order could flip a fractional
        # remainder sitting exactly on a tie — the allocation must be a
        # pure function of (avail, weights, total)
        wsum = sum(weights[g] for g in sorted(active))
        quot = {g: budget * weights[g] / wsum for g in active}
        base = {g: int(quot[g]) for g in active}
        rem = budget - sum(base.values())
        for g in sorted(active, key=lambda g: (-(quot[g] - base[g]), g))[:rem]:
            base[g] += 1
        progressed = False
        for g in sorted(active):
            take = min(base[g], avail[g] - alloc[g])
            if take > 0:
                progressed = True
            alloc[g] += take
            budget -= take
            if alloc[g] >= avail[g]:
                active.discard(g)
        if not progressed:
            break
    return alloc


def _broadcast_group_dim(
    df: DataFrame, group_col: str, mapping: dict, value_col: str
) -> DataFrame:
    """Broadcast dimension (group -> long value) for per-group quotas and
    budgets. Typed after the ACTUAL group column (a hardcoded string type
    would join non-string groups only via implicit cast) and long (int32
    overflows when one group carries > 2^31-1 rows/tokens). Raises on a
    missing group column — the silent alternative is an analysis error
    deep inside the join."""
    gtype_map = dict(df.dtypes)
    if group_col not in gtype_map:
        raise ValueError(f"no such column: {group_col}")
    return F.broadcast(
        df.sparkSession.createDataFrame(
            [(g, int(v)) for g, v in mapping.items()],
            f"{group_col} {gtype_map[group_col]}, {value_col} long",
        )
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    weights: dict,
    total: int,
    key_col: str,
    seed: str = "",
) -> DataFrame:
    """Sample ``df`` to a target mixture: ``weights[g]`` of the ``total``
    rows come from group g (availability-capped, shortfall redistributed),
    rows chosen per group by portable hash order — fully deterministic
    under repartitioning and re-runs.

    Cost: one tiny groupBy-count collect (rows = #groups), then one window
    shuffle on the group key with the quota dimension broadcast back. The
    per-group top-n is WindowGroupLimit-pruned map-side."""
    counts = {r[0]: r[1] for r in df.groupBy(group_col).count().collect()}
    alloc = apportion_weighted(counts, weights, total)
    return _take_quota_by_hash(df, group_col, alloc, key_col, seed)


def _take_quota_by_hash(
    df: DataFrame, group_col: str, alloc: dict, key_col: str, seed: str
) -> DataFrame:
    """Keep the first ``alloc[g]`` rows of each group in portable hash
    order (key tiebreak) — the shared selection tail of the mixture
    samplers: one group-keyed window shuffle with the quota dimension
    broadcast back."""
    quota = _broadcast_group_dim(df, group_col, alloc, "__quota")
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(key_col), seed).asc(), F.col(key_col).asc()
    )
    return (
        df.join(quota, group_col)
        .withColumn("__rn", F.row_number().over(w))
        # the LITERAL max-quota bound is what enables WindowGroupLimit
        # (map-side per-group pruning needs a constant limit — a bare
        # rank <= column comparison shuffles whole groups); the column
        # comparison then applies each group's exact quota
        .where(
            (F.col("__rn") <= F.lit(int(max(alloc.values(), default=0))))
            & (F.col("__rn") <= F.col("__quota"))
        )
        .drop("__rn", "__quota")
    )


def temperature_mixture_sample(
    df: DataFrame,
    group_col: str,
    total: int,
    key_col: str,
    alpha: float = 0.5,
    seed: str = "",
) -> DataFrame:
    """Temperature-smoothed mixture: group g's share of the ``total``
    rows is proportional to ``count_g ** alpha`` — the standard
    multilingual-pretraining reweighting (exponential smoothing):
    ``alpha=1`` preserves natural proportions, ``alpha -> 0`` approaches
    uniform across groups, and values in between upsample low-resource
    groups at a controlled rate. Shares are integerized by the same
    deterministic largest-remainder apportionment as ``mixture_sample``
    (availability-capped, shortfall redistributed, name tiebreak), and
    rows are chosen per group by portable hash order.

    Cost shape is mixture_sample's: one tiny groupBy-count collect
    (rows = #groups — the ONLY data-dependent driver round-trip, and the
    reason the weights can follow the data), then one group-keyed window
    shuffle with WindowGroupLimit map-side pruning.
    """
    if not (alpha > 0 and alpha == alpha and alpha != float("inf")):
        raise ValueError(f"temperature_mixture_sample: bad alpha {alpha!r}")
    counts = {r[0]: r[1] for r in df.groupBy(group_col).count().collect()}
    weights = {g: float(c) ** alpha for g, c in counts.items() if c > 0}
    alloc = apportion_weighted(counts, weights, total)
    return _take_quota_by_hash(df, group_col, alloc, key_col, seed)


def token_budget_sample(
    df: DataFrame,
    group_col: str,
    budgets: dict,
    token_count_col: str,
    key_col: str,
    seed: str = "",
) -> DataFrame:
    """Sample each group down to a TOKEN budget rather than a row count —
    how pretraining mixtures are actually specified ("300 B tokens of
    web, 50 B of code"). Rows are taken in portable-hash order (key
    tiebreak) and a row is kept while the tokens taken BEFORE it are
    still under the group's budget, so the first crossing row is included
    (overshoot is bounded by one document) and a zero budget takes
    nothing. Groups absent from ``budgets`` are dropped; a NULL token
    count folds to 0 (row kept, costs nothing).

    ``key_col`` must be UNIQUE within each group: it is the only
    tiebreak in the running-sum order, so rows sharing a key value tie
    on both (hash, key) and their relative order — hence ``cum_before``
    and membership at the budget boundary — would be run-dependent. The
    property tests encode this assumption; pass a rowid-augmented key if
    your natural key can repeat.

    Output: the input columns plus ``cum_before`` (tokens taken before
    this row in hash order), so callers can audit the cut.

    Scale shape: ONE hash shuffle on the group key for the running-sum
    window (the same exchange any per-group op needs) with the budget
    dimension broadcast back; no global sort, no collect. Skewed mixtures
    (one giant group) are bounded by that group's partition, same as every
    other per-group window here.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(hash_bucket(F.col(key_col), seed).asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bdim = _broadcast_group_dim(df, group_col, budgets, "__budget")
    # NULL token counts (an upstream tokenizer failure) fold to 0: the
    # row is KEPT and costs nothing — bare NULL arithmetic would give the
    # row cum_before NULL, and NULL < budget silently drops it (the
    # hash_bucket NULL hazard in this file, same shape)
    toks = F.coalesce(F.col(token_count_col).cast("long"), F.lit(0))
    return (
        df.join(bdim, group_col)
        .withColumn("cum_before", F.sum(toks).over(w) - toks)
        .where(F.col("cum_before") < F.col("__budget"))
        .drop("__budget")
    )


def weighted_sample_without_replacement(
    df: DataFrame, key_col: str, weight_col: str, n: int, seed: str = ""
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the
    Efraimidis-Spirakis A-Res scheme — each row draws
    ``r = u ** (1 / w)`` with ``u`` uniform in (0, 1) and the n largest
    r win, which yields exactly the sequential
    weighted-draw-without-replacement distribution. ``u`` here is the
    portable key hash ((bucket + 0.5) / 2^32), so membership is a pure
    function of (key, seed): reproducible across reruns, repartitioning,
    and engines (the SQL oracle restates the same md5/pow arithmetic).
    Rows with NULL or non-positive weight never qualify.

    Scale shape: one narrow projection then a global top-n BY LIMIT —
    TakeOrderedAndProject (per-partition heaps + one n-row merge), the
    PERFORMANCE.md finding-11 shape, never a full sort. The key-hash u
    means no RNG state and no collect."""
    if n < 0:
        raise ValueError(f"weighted_sample_without_replacement: n must be >= 0, got {n}")
    u = (hash_bucket(F.col(key_col), seed) + F.lit(0.5)) / F.lit(float(_BUCKETS))
    r = F.pow(u, F.lit(1.0) / F.col(weight_col))
    w = F.col(weight_col)
    # isnan guard is load-bearing: Spark orders NaN ABOVE every double in
    # both comparisons and sorts, so a NaN weight would pass `> 0` AND
    # produce r = NaN, which ranks first in the descending top-n
    return (
        df.where(w.isNotNull() & ~F.isnan(w.cast("double")) & (w > 0))
        .withColumn("__r", r)
        .orderBy(F.col("__r").desc(), F.col(key_col).asc())
        .limit(n)
        .drop("__r")
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weight_col: str,
    n_per_group: int,
    seed: str = "",
) -> DataFrame:
    """Per-stratum Efraimidis-Spirakis A-Res: the ``n_per_group``
    largest ``r = u ** (1/w)`` WITHIN each group — stratified
    weighted-without-replacement sampling (e.g. 'k docs per language,
    weighted by token count'). Same portable key-hash ``u`` as
    :func:`weighted_sample_without_replacement`, so the draw is a pure
    function of (key, seed) and SQL-restatable.

    Scale shape: the global variant's TakeOrderedAndProject becomes a
    per-group ``row_number() < LITERAL`` — Spark's WindowGroupLimit
    pushes the top-n into the shuffle (per-partition group heaps), so no
    group ever materializes fully sorted. One exchange on the group key.
    Rows with NULL/NaN/non-positive weight never qualify.
    """
    if n_per_group < 0:
        raise ValueError(
            f"weighted_sample_per_group: n_per_group must be >= 0, got {n_per_group}"
        )
    u = (hash_bucket(F.col(key_col), seed) + F.lit(0.5)) / F.lit(float(_BUCKETS))
    r = F.pow(u, F.lit(1.0) / F.col(weight_col))
    w = F.col(weight_col)
    win = Window.partitionBy(group_col).orderBy(
        F.col("__r").desc(), F.col(key_col).asc()
    )
    return (
        df.where(w.isNotNull() & ~F.isnan(w.cast("double")) & (w > 0))
        .withColumn("__r", r)
        .withColumn("__rank", F.row_number().over(win))
        .where(F.col("__rank") <= n_per_group)
        .drop("__r", "__rank")
    )


def split_leakage_audit(
    df: DataFrame,
    id_col: str,
    text_col: str,
    splits=(("train", 0.98), ("val", 0.01), ("test", 0.01)),
    seed: str = "",
    key_col: str | None = None,
) -> DataFrame:
    """Audit a split for duplicate leakage: group documents by exact
    content (md5 of the JSON-framed text, so NULL and '' stay distinct
    classes), report every class with more than one document
    and the set of splits it lands in — ``leaky`` marks classes straddling
    two or more splits, i.e. eval rows whose exact text is in train. This
    is the QA gate run AFTER :func:`split_assign`; keying the split on a
    group id (``key_col``) instead of the row id is the fix the audit
    motivates.

    Output per duplicate class: ``(content_key, n_docs, n_splits,
    splits, first_doc, leaky)``, deterministic (split list sorted, first
    doc is the minimum id).

    Scale shape: split assignment is a narrow CASE; the audit is one hash
    aggregate keyed on the content hash — the same shuffle an exact-dedup
    pass costs, with nothing collected."""
    kc = key_col or id_col
    cols = [F.col(id_col), F.col(text_col)] + (
        [F.col(kc)] if kc not in (id_col, text_col) else []
    )
    assigned = split_assign(df.select(*cols), kc, splits=splits, seed=seed)
    c = assigned.select(
        # JSON framing (as in dedup_exact) keeps NULL text and '' text in
        # DISTINCT classes — md5(coalesce(text,'')) would merge them and
        # raise a false leakage alarm when the two land in different splits
        F.md5(F.to_json(F.struct(F.col(text_col)))).alias("content_key"),
        F.col(id_col),
        "split",
    )
    g = c.groupBy("content_key").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("split").cast("long").alias("n_splits"),
        F.concat_ws(",", F.sort_array(F.collect_set("split"))).alias("splits"),
        F.min(F.col(id_col)).alias("first_doc"),
    )
    return g.where(F.col("n_docs") > 1).withColumn(
        "leaky", F.col("n_splits") > 1
    )


def mixture_upsample_epochs(
    df: DataFrame,
    group_col: str,
    epochs: dict,
    key_col: str,
    seed: str = "",
) -> DataFrame:
    """UP-sample groups by fractional epoch counts — the other half of
    mixture weighting (``mixture_sample`` cuts over-represented groups
    DOWN; this repeats under-represented ones): a group with
    ``epochs[g] = 2.5`` emits every row twice (``epoch`` 0 and 1) plus a
    deterministic hash-chosen half once more (``epoch`` 2) — e.g. "2.4
    epochs of wiki, 0.7 of books" mixtures. Rows keep their columns plus
    the ``epoch`` index, so downstream shuffling/packing can interleave
    repeats instead of clustering them.

    Inclusion of the fractional copy is ``hash_bucket(key, seed || '@' ||
    epoch) < frac * 2^32`` — per-epoch salting, so a row's fractional
    fate at epoch 2 is independent of a future 3.5-epoch rerun's epoch 3.
    Groups absent from ``epochs`` are dropped (consistent with the other
    mixture samplers); epochs must be non-negative and finite.

    Scale shape: a broadcast group-dim join plus an in-row
    explode(sequence) — a pure narrow map, NO shuffle; output size is the
    mixture's token budget, which is the point.
    """
    for g, e in epochs.items():
        e = float(e)
        if not (e >= 0.0 and e == e and e != float("inf")):
            raise ValueError(f"mixture_upsample_epochs: bad epoch count {e!r} for {g!r}")
    # _broadcast_group_dim types its values long (quota semantics); epoch
    # counts are fractional, so build the double-typed dim directly
    gtype_map = dict(df.dtypes)
    if group_col not in gtype_map:
        raise ValueError(f"no such column: {group_col}")
    bdim = F.broadcast(
        df.sparkSession.createDataFrame(
            [(g, float(e)) for g, e in epochs.items()],
            f"{group_col} {gtype_map[group_col]}, __epochs double",
        )
    )
    full = F.floor(F.col("__epochs")).cast("int")
    frac = F.col("__epochs") - full
    # copies = full epochs + possibly one fractional epoch, decided per row
    take_frac = (
        hash_bucket(
            F.concat(F.col(key_col).cast("string"), F.lit("@"), full.cast("string")),
            seed,
        )
        < (frac * F.lit(float(_BUCKETS))).cast("long")
    )
    total = full + F.when(take_frac, F.lit(1)).otherwise(F.lit(0))
    # sequence(0, -1) would DESCEND ([0, -1]), not empty — guard total = 0
    eps = F.when(total > 0, F.sequence(F.lit(0), total - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return df.join(bdim, group_col).withColumn("epoch", F.explode(eps)).drop("__epochs")


def kfold_assign(
    df: DataFrame,
    key_col: str,
    k: int,
    seed: str = "",
    out_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: every row gains
    ``fold`` in [0, k), a pure function of (key, seed) — the k-way
    sibling of split_assign with the same leakage contract: key on a
    GROUP id (domain, dedup-cluster representative) and all of a group's
    rows share a fold, so near-duplicates never straddle a train/eval
    boundary. Folds are hash-uniform (sizes binomial around n/k, not
    exactly equal — exact equality would need a global rank, and fold
    membership would then depend on the rest of the corpus, breaking
    incremental stability: adding documents must not move old rows
    between folds).

    Scale shape: one narrow per-row expression over the portable hash —
    no shuffle, no aggregate; ``fold`` is a zero-cost partition key for
    the downstream write."""
    if k < 2:
        raise ValueError(f"k must be >= 2: {k}")
    return df.withColumn(
        out_col, (hash_bucket(F.col(key_col), seed) % k).cast("int")
    )
