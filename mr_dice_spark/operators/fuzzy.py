"""Fuzzy entity-resolution join: all pairs within edit distance k, via
exact-recall pigeonhole segment blocking (PassJoin's k+1-segment scheme,
Li et al. 2011) — a hand-optimized two-segment path for k=1 and the
general segment/shift index for any k.

Beyond-reference operator — the record-linkage primitive (near-identical
names/titles/SKUs across sources) the reference's exact-equality dedup
family (SURVEY.md §2.7) cannot express.

Why the blocking is EXACT: split x into halves x = x1 + x2 with
``|x1| = ceil(len/2)``. A single edit touches one half, so any y with
``ed(x, y) <= 1`` agrees with x on the untouched half VERBATIM and in
place: edit in the second half -> ``prefix(y, |x1|) == x1``; edit in the
first half -> ``suffix(y, |x2|) == x2`` (suffix length is unaffected by
an insert/delete on the other side of the split). Every true pair
therefore shares an INDEX key (x's own halves) with the partner's PROBE
keys (its halves recomputed at each admissible partner length
``l-1, l, l+1``) — pigeonhole, no probabilistic recall.

Scale shape: 2 index keys + <= 6 probe keys per row, one equi-join on
the (role, segment-length, segment) key with the levenshtein verify
applied map-side on the join output, then DISTINCT on the verified
pairs only (output-bound exchange) — near-linear when segment values
distribute.

DEGENERATE-CORPUS HANDLING (built in, on by default): a corpus whose
strings share a constant half (e.g. a fixed 'Customer#' prefix on
ID-like names — the exact shape entity-resolution corpora have) would
collapse that segment's block to all-pairs: quadratic candidate
generation AND a single-key shuffle skew. The operator therefore strips
the corpus-wide longest common prefix and suffix before segmenting.
This is EXACT: if every string is p·u·t then ed(p·u·t, p·v·t) =
ed(u, v) (in any optimal alignment the shared affixes can be matched
to each other — the classic strip-common-affixes lemma), so the output
pair set is bit-identical while the blocks move into the high-entropy
core. The affix bounds come from ONE tiny aggregate (lexicographic
min/max of the string and of its reverse: the common prefix of a set
equals the common prefix of its lexicographic extremes), a driver
round-trip of four strings.

The affix strip cannot help when only a SUBSET of the corpus shares a
constant half (the corpus-wide LCP is empty): e.g. 15 k clean
'Customer#...' names unioned with corrupted twins — the clean side's
first-half block is the single key 'Customer#' and the candidate join
emits ~10^8 pairs INTO ONE SHUFFLE KEY (quadratic work AND a one-task
verify stage; measured >10 min at sf0.1). The k=1 path therefore
carries a second, adaptive guard (on by default): after building the
key streams, one small aggregate counts candidates per key
(index_rows × probe_rows); keys over ``hot_block_product`` are
re-blocked by the DELETION NEIGHBORHOOD of the string's remainder
after the shared segment. Exact for k=1 twice over: (1) sharing a
P/S segment key verbatim makes the full-string distance equal the
remainder distance (the same strip lemma, applied to THAT pair's
shared half), and (2) ed(u, v) <= 1 iff ({u} ∪ D1(u)) ∩
({v} ∪ D1(v)) != ∅ where D1 is the 1-deletion neighborhood
(substitution at i: delete i from both; indel: the shorter string IS
a deletion of the longer). Cost: only hot rows expand (|remainder|+1
keys instead of 1), everything else keeps the 2-key PassJoin shape.
A refined block is near-unique on ID-like corpora (the remainder's
deletion variants carry its full entropy), so the skewed key
disappears instead of being salted around.

A corpus that defeats BOTH guards can still degenerate a block (k >= 2
with a constant interior, or adversarial variant collisions); for
that, ``max_block_rows`` is an optional fail-fast circuit breaker
(one extra counting pass over the FINAL post-refinement index) that
raises with mitigation guidance instead of running quadratically for
hours.

INTENDED CONTRACT — the interior-constant fail-fast: a constant
substring strictly INSIDE the strings (templated SKUs like
'WIDGET-<v>-STD-<n>' where the '-STD-' core lands in a segment, with
enough rows that deletion variants still collide) is reachable by
neither the affix strip (corpus-wide LCP/LCS are empty) nor the
deletion re-keying (the refined keys still share the constant core).
Such corpora get an EXCEPTION, not a silent quadratic run — e.g.::

    ValueError: edit_distance_join: more than 64 blocking keys exceed
    hot_block_product=4000000; the corpus is pathological for segment
    blocking (near-constant strings?). Deduplicate exact strings
    first, or raise hot_block_product if the quadratic blocks are
    genuinely acceptable.

The first remediation is DEDUPE-FIRST: collapse exact duplicates
(``dedup.dedup_exact`` keyed on the string), fuzzy-join the distinct
strings, and re-expand pairs through the id↔string map — on templated
corpora the distinct-string table is orders of magnitude smaller and
the constant core stops dominating any block. Alternatively strip the
known template region upstream (exact by the same affix lemma, applied
per-template), or accept the quadratic block explicitly by raising
``hot_block_product`` / ``max_block_rows``. Tests pin the error text so
the guidance is part of the API (tests/test_fuzzy.py).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _common_affix_lengths(s: DataFrame) -> tuple[int, int]:
    """(prefix_len, suffix_len) shared by EVERY ``__s`` in ``s``:
    one aggregate collecting the lexicographic min/max of the string and
    of its reverse — the common prefix of a set equals the common prefix
    of its lexicographic extremes (any string between them shares it).
    The suffix is capped so prefix+suffix never exceeds the shortest
    string (strip the prefix first, then the suffix of what remains —
    a suffix of a common suffix is still common). Returns (0, 0) for
    corpora of fewer than 2 rows (nothing to pair)."""
    row = s.agg(
        F.min("__s").alias("mn"),
        F.max("__s").alias("mx"),
        F.min(F.reverse(F.col("__s"))).alias("rmn"),
        F.max(F.reverse(F.col("__s"))).alias("rmx"),
        F.min("__l").alias("minlen"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    if row is None or row["n"] is None or row["n"] < 2:
        return 0, 0

    def lcp(a: str, b: str) -> int:
        i = 0
        for ca, cb in zip(a, b):
            if ca != cb:
                break
            i += 1
        return i

    pl = lcp(row["mn"], row["mx"])
    sl = lcp(row["rmn"], row["rmx"])
    sl = min(sl, row["minlen"] - pl)
    return pl, max(sl, 0)


def _strip_common_affixes(s: DataFrame) -> DataFrame:
    """Strip the corpus-wide common prefix/suffix off ``__s`` (distance-
    preserving, see module docstring) and recompute ``__l``. No-op
    (same plan, no driver round-trip cost beyond the one aggregate)
    when the corpus shares no affix."""
    pl, sl = _common_affix_lengths(s)
    if pl == 0 and sl == 0:
        return s
    return s.select(
        "__id",
        F.expr(f"substring(__s, {pl + 1}, __l - {pl + sl})").alias("__s"),
        (F.col("__l") - F.lit(pl + sl)).cast("int").alias("__l"),
    )


def _check_block_sizes(index: DataFrame, max_block_rows: int) -> None:
    """Fail-fast circuit breaker: raise if any single blocking key holds
    more than ``max_block_rows`` index rows (a block of m rows generates
    O(m^2) candidate pairs on one shuffle key). Costs one counting pass
    over the index side."""
    worst = (
        index.groupBy("__k")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("mx"))
        .first()
    )
    mx = worst["mx"] if worst is not None else None
    if mx is not None and mx > max_block_rows:
        raise ValueError(
            f"edit_distance_join: a blocking key holds {mx} rows "
            f"(> max_block_rows={max_block_rows}); candidate generation "
            "would be quadratic on that key. The corpus likely shares a "
            "constant interior substring. Mitigations: raise max_dist "
            "(shorter segments reach higher-entropy regions), strip the "
            "constant region upstream, or raise max_block_rows if the "
            "quadratic block is genuinely acceptable."
        )


_HOT_KEY_CAP = 64


def _hot_block_keys(
    index: DataFrame, probe: DataFrame, product_threshold: int
) -> list[str]:
    """Blocking keys whose candidate product (index rows × probe rows)
    exceeds ``product_threshold`` — each such key would emit that many
    join rows into ONE shuffle partition. ONE map-side-combinable
    aggregate over the union of both tagged key streams; the product is
    computed in the double domain (counts are exact well past any real
    corpus, and doubles cannot overflow under ANSI).
    Capped at ``_HOT_KEY_CAP`` keys: more than that means the corpus is
    pathological for segment blocking and we refuse to expand it."""
    tagged = index.select("__k", F.lit(1).alias("__i")).unionAll(
        probe.select("__k", F.lit(0).alias("__i"))
    )
    rows = (
        tagged.groupBy("__k")
        .agg(
            F.sum("__i").cast("double").alias("__ci"),
            F.sum(1 - F.col("__i")).cast("double").alias("__cp"),
        )
        .where(F.col("__ci") * F.col("__cp") > F.lit(float(product_threshold)))
        .select("__k")
        .limit(_HOT_KEY_CAP + 1)
        .collect()
    )
    keys = [r["__k"] for r in rows]
    if len(keys) > _HOT_KEY_CAP:
        raise ValueError(
            f"edit_distance_join: more than {_HOT_KEY_CAP} blocking keys "
            f"exceed hot_block_product={product_threshold}; the corpus is "
            "pathological for segment blocking (near-constant strings?). "
            "Deduplicate exact strings first, or raise hot_block_product "
            "if the quadratic blocks are genuinely acceptable."
        )
    return keys


def _deletion_refined(part: DataFrame) -> DataFrame:
    """Re-key hot-block rows by the deletion neighborhood of the
    remainder after the shared segment. The incoming ``__k`` is
    'P\\x00len\\x00content' (shared prefix of length len) or
    'S\\x00len\\x00content' (shared suffix); the remainder is the rest
    of ``__s``. Every true pair within the block shares a refined key
    ``__k + '\\x00' + variant`` (module docstring, guard 2); false
    variant collisions (ed = 2) are removed by the levenshtein verify
    like any other false candidate."""
    seg_len = F.split(F.col("__k"), "\x00").getItem(1).cast("int")
    rem = F.when(
        F.col("__k").startswith("P"),
        F.col("__s").substr(seg_len + F.lit(1), F.col("__l") - seg_len),
    ).otherwise(F.col("__s").substr(F.lit(1), F.col("__l") - seg_len))
    deletions = F.transform(
        F.sequence(F.lit(1), F.length(F.col("__rem"))),
        lambda i: F.concat(
            F.col("__rem").substr(F.lit(1), i - F.lit(1)),
            F.col("__rem").substr(i + F.lit(1), F.length(F.col("__rem"))),
        ),
    )
    variants = F.when(
        F.length(F.col("__rem")) > 0,
        F.array_distinct(F.concat(F.array(F.col("__rem")), deletions)),
    ).otherwise(F.array(F.col("__rem")))
    return (
        part.withColumn("__rem", rem)
        .select("__id", "__s", "__l", "__k", F.explode(variants).alias("__v"))
        .select(
            "__id",
            "__s",
            "__l",
            F.concat(F.col("__k"), F.lit("\x00"), F.col("__v")).alias("__k"),
        )
    )


def _refine_hot_blocks(
    index: DataFrame, probe: DataFrame, product_threshold: int
) -> tuple[DataFrame, DataFrame]:
    """Split both key streams on hot-key membership and re-key the hot
    rows (routing is per-key, so both sides of any candidate pair route
    identically); cold rows keep the 2-key PassJoin shape untouched."""
    hot = _hot_block_keys(index, probe, product_threshold)
    if not hot:
        return index, probe
    is_hot = F.col("__k").isin(hot)
    index = index.where(~is_hot).unionByName(_deletion_refined(index.where(is_hot)))
    probe = probe.where(~is_hot).unionByName(_deletion_refined(probe.where(is_hot)))
    return index, probe


# --- general-k hot-block refinement (r12 optimization, guide §2.5) --------
#
# The k=1 deletion-neighborhood guard above relies on the shared segment
# sitting at a string BOUNDARY (the strip lemma reduces the pair's
# distance to the remainder's distance). At k >= 2 the untouched segment
# is INTERIOR, so the remainder is a (prefix, suffix) pair around the
# occurrence and the boundary argument no longer applies. The exact
# necessary condition that replaces it: if ed(x, y) <= k via an alignment
# that matches x's segment verbatim at some occurrence in y, then the
# alignment restricted to the remainders pairs prefix-with-prefix and
# suffix-with-suffix at total cost <= k; every substitution deletes one
# aligned char from EACH side, every indel deletes one char from ONE
# side, so each side reaches the common alignment residue by deleting at
# most k characters from its own remainder. Hence, with '\x01' marking
# the prefix/suffix boundary (neither side deletes it on the witness
# path),
#
#   D<=k(prefix_x + '\x01' + suffix_x)  ∩  D<=k(prefix_y + '\x01' + suffix_y) != ∅
#
# where D<=k is the <=k-deletion neighborhood. Re-keying hot-block rows
# by (key, variant) therefore preserves recall exactly; variant
# collisions beyond the true pairs are false candidates the levenshtein
# verify already removes. The index side splits at its segment's
# canonical position; the probe side splits at EVERY textual occurrence
# of the segment content (a superset of the shifted-window positions
# that generated the key — supersets only add false candidates).


def _dels_upto_k(rem, k: int):
    """``array<string>`` of every string reachable from ``rem`` by at
    most ``k`` single-character deletions (k rounds of expand+dedup;
    the array stays O(|rem|^k), only ever evaluated on hot-block rows)."""
    one = lambda v: F.transform(  # noqa: E731 — local expression builder
        F.sequence(F.lit(1), F.greatest(F.length(v), F.lit(1))),
        lambda i: F.concat(
            v.substr(F.lit(1), i - F.lit(1)),
            v.substr(i + F.lit(1), F.length(v)),
        ),
    )
    vs = F.array(rem)
    for _ in range(k):
        vs = F.array_distinct(F.concat(vs, F.flatten(F.transform(vs, one))))
    return vs


def _deletion_refined_k(part: DataFrame, k: int, index_side: bool) -> DataFrame:
    """Re-key hot general-k rows by the deletion neighborhood of the
    remainder around the shared segment. ``__k`` is
    '{segment#}\\x00{len}\\x00{content}'; the refined key appends
    '\\x00{variant}' where variant ∈ D<=k(prefix + '\\x01' + suffix).
    Index rows split at the segment's canonical position; probe rows at
    every occurrence of the content (see the exactness note above)."""
    seg_i = F.split(F.col("__k"), "\x00").getItem(0).cast("int")
    seg_len = F.split(F.col("__k"), "\x00").getItem(1).cast("int")
    content = F.split(F.col("__k"), "\x00").getItem(2)
    l = F.col("__l")
    if index_side:
        starts = F.array(_seg_start(l, seg_i, k))
    else:
        starts = F.filter(
            F.sequence(F.lit(1), F.greatest(l - seg_len + F.lit(1), F.lit(1))),
            lambda p: F.col("__s").substr(p, seg_len) == content,
        )

    def rem(p):
        return F.concat(
            F.col("__s").substr(F.lit(1), p - F.lit(1)),
            F.lit("\x01"),
            F.col("__s").substr(p + seg_len, l),
        )

    # variants across ALL occurrence splits, deduped in-array so the
    # refined stream never needs its own distinct exchange
    variants = F.array_distinct(
        F.flatten(F.transform(starts, lambda p: _dels_upto_k(rem(p), k)))
    )
    return part.select(
        "__id", "__s", "__l", "__k", F.explode(variants).alias("__v")
    ).select(
        "__id", "__s", "__l",
        F.concat(F.col("__k"), F.lit("\x00"), F.col("__v")).alias("__k"),
    )


def _refine_hot_blocks_k(
    index: DataFrame, probe: DataFrame, k: int, product_threshold: int
) -> tuple[DataFrame, DataFrame]:
    """General-k analogue of :func:`_refine_hot_blocks`. Low-entropy
    segments (short splits over small alphabets — templated IDs, digit
    cores) can make MANY keys hot at k >= 2, so membership is decided by
    a broadcast semi/anti join against the hot-key frame instead of the
    k=1 path's driver-collected isin list (no _HOT_KEY_CAP fail-fast
    here: refinement handles the degeneracy instead of refusing; the
    optional ``max_block_rows`` breaker still applies AFTER refinement).
    The tiny-string block 'T' is never refined — it has no segment
    geometry; its population is bounded by strings of length <= 2k.

    The hot frame stays LAZY: it is broadcast into the four semi/anti
    joins and Spark's exchange reuse executes the aggregate once, inside
    the main query — no driver round-trip, no extra jobs, no planning
    gap (an eager checkpoint+count shape measured ~3 s of serial
    driver/job overhead per call at sf0.1). Its size is bounded by
    total_candidates / product_threshold keys, so the broadcast is tiny
    for any corpus that finishes at all."""
    tagged = index.select("__k", F.lit(1).alias("__i")).unionAll(
        probe.select("__k", F.lit(0).alias("__i"))
    )
    hot = (
        tagged.groupBy("__k")
        .agg(
            F.sum("__i").cast("double").alias("__ci"),
            F.sum(1 - F.col("__i")).cast("double").alias("__cp"),
        )
        .where(
            (F.col("__ci") * F.col("__cp") > F.lit(float(product_threshold)))
            & (F.col("__k") != F.lit("T"))
        )
        .select("__k")
    )
    hot_b = F.broadcast(hot)
    index = index.join(hot_b, "__k", "left_anti").unionByName(
        _deletion_refined_k(index.join(hot_b, "__k", "left_semi"), k, True)
    )
    probe = probe.join(hot_b, "__k", "left_anti").unionByName(
        _deletion_refined_k(probe.join(hot_b, "__k", "left_semi"), k, False)
    )
    return index, probe


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
    strip_affixes: bool = True,
    max_block_rows: int | None = None,
    hot_block_product: int | None = 4_000_000,
) -> DataFrame:
    """All unordered pairs with ``levenshtein <= max_dist``:
    ``(id_a, id_b, dist)`` with ``id_a < id_b``. NULL strings never pair
    (an unknown name is not within edit distance of anything).
    PRECONDITION: ``id_col`` is unique per row (the natural ER input —
    one record per id). The final DISTINCT is keyed on
    ``(id_a, id_b, dist)``, so two rows reusing one id with different
    strings collapse to one output pair per distance value; dedupe ids
    upstream if that is not what you mean.
    ``max_dist=1`` runs the hand-optimized two-segment path below;
    larger k delegates to :func:`edit_distance_join_k` (the general
    k+1-segment PassJoin, same structural-recall guarantee).

    ``strip_affixes`` (default on) strips the corpus-wide common
    prefix/suffix before blocking — distance-preserving, exact, and the
    difference between near-linear and quadratic on ID-like corpora (see
    module docstring). ``hot_block_product`` (default on, k=1 only)
    re-blocks any key whose candidate product exceeds it via deletion-
    neighborhood refinement — exact recall, no skewed shuffle key (see
    module docstring; ``None`` disables). ``max_block_rows`` optionally
    fail-fasts if any FINAL (post-refinement) blocking key still
    exceeds that cardinality."""
    if max_dist != 1:
        # hot_block_product is NOT forwarded: the k=1 deletion guard and
        # the general-k refinement have different cost profiles, and the
        # k-path default is documented on edit_distance_join_k.
        return edit_distance_join_k(
            df, id_col, str_col, max_dist,
            strip_affixes=strip_affixes, max_block_rows=max_block_rows,
        )
    s = df.select(
        F.col(id_col).alias("__id"),
        F.col(str_col).alias("__s"),
        F.length(str_col).alias("__l"),
    ).where(F.col(str_col).isNotNull())
    if strip_affixes:
        s = _strip_common_affixes(s)

    # index keys: the string's own canonical halves
    p_own = F.ceil(F.col("__l") / 2).cast("int")
    s_own = (F.col("__l") - p_own).cast("int")
    idx_keys = F.array(
        F.concat_ws("\x00", F.lit("P"), p_own, F.expr("substring(__s, 1, ceil(__l / 2))")),
        F.concat_ws("\x00", F.lit("S"), s_own, F.expr("right(__s, __l - ceil(__l / 2))")),
    )
    index = s.select("__id", "__s", "__l", F.explode(idx_keys).alias("__k"))

    # probe keys: halves recomputed at each admissible partner length
    probe_arr = F.array_distinct(
        F.flatten(
            F.transform(
                F.sequence(F.col("__l") - 1, F.col("__l") + 1),
                lambda la: F.array(
                    F.when(
                        (la >= 1) & (F.ceil(la / 2).cast("int") <= F.col("__l")),
                        F.concat_ws(
                            "\x00",
                            F.lit("P"),
                            F.ceil(la / 2).cast("int"),
                            F.col("__s").substr(F.lit(1), F.ceil(la / 2).cast("int")),
                        ),
                    ),
                    F.when(
                        (la >= 1) & ((la - F.ceil(la / 2)).cast("int") <= F.col("__l"))
                        & ((la - F.ceil(la / 2)).cast("int") >= 0),
                        F.concat_ws(
                            "\x00",
                            F.lit("S"),
                            (la - F.ceil(la / 2)).cast("int"),
                            F.col("__s").substr(
                                F.col("__l") - (la - F.ceil(la / 2)).cast("int") + 1,
                                (la - F.ceil(la / 2)).cast("int"),
                            ),
                        ),
                    ),
                ),
            )
        )
    )
    probe = s.select("__id", "__s", "__l", F.explode(probe_arr).alias("__k")).where(
        F.col("__k").isNotNull()
    )

    if hot_block_product is not None:
        index, probe = _refine_hot_blocks(index, probe, hot_block_product)
    if max_block_rows is not None:
        _check_block_sizes(index, max_block_rows)

    # shuffle_hash hint: left to stats, Spark can BROADCAST the index
    # side (it often fits under the 10 MB threshold at test scale), which
    # serializes candidate verification into the probe SCAN's partition
    # count — the levenshtein filter is pushed below the distinct into
    # the join stage, so a 2-file input runs ~10^8 verifies 2-way
    # (measured >300 s; the shuffled join's key-partitioned verify is
    # ~8 s on the same corpus). The shuffled hash join on the segment
    # key is also the only shape that scales to a corpus-sized index.
    # VERIFY BELOW THE EXCHANGE (r11 optimization, guide §2.3): the
    # levenshtein verify runs map-side on the raw join output and only
    # TRUE pairs reach the distinct's shuffle. The old shape distinct-ed
    # the candidates first, which shuffled every candidate (ids + both
    # strings) just to dedup the <= 4-key collision multiplicity before
    # verifying — on the degenerate-block regime that is a candidate-
    # bound exchange (54M rows at sf0.1 in the k=2 golden) vs the
    # output-bound one here. Each pair pays at most the key-collision
    # constant (<= 4 at k=1) extra levenshtein calls, all parallel in
    # the join stage; `dist` is a pure function of the pair, so DISTINCT
    # over (id_a, id_b, dist) equals DISTINCT over the pair.
    # (No _pin_join_parallelism here: the k=1 key streams are 2-key/
    # <=6-key per row, and measured end-to-end the forced repartition
    # COSTS ~1 s on the er_best_match golden — AQE's coalescing does not
    # starve this path's smaller fan-out, so the extra exchange buys
    # nothing. The general-k path below is the one with the measured
    # coalescing collapse.)
    verified = (
        index.alias("a")
        .hint("shuffle_hash")
        .join(
            probe.alias("b"),
            (F.col("a.__k") == F.col("b.__k"))
            & (F.col("a.__id") < F.col("b.__id"))
            & (F.abs(F.col("a.__l") - F.col("b.__l")) <= 1),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            # thresholded levenshtein (r12, guide §1.2 step-2 per-task
            # work): the 3-arg form computes a banded O(k·n) DP and
            # returns -1 past the threshold instead of the full O(n²)
            # matrix — exact distance for every kept row, so
            # `dist >= 0` ≡ `dist <= max_dist` and the output is
            # bit-identical
            F.levenshtein(F.col("a.__s"), F.col("b.__s"), max_dist).alias("dist"),
        )
        .where(F.col("dist") >= 0)
        .distinct()
    )
    return verified.select("id_a", "id_b", "dist")


def _shuffle_partitions(df: DataFrame) -> int:
    """The session's shuffle partition count as an int, falling back to
    ``sparkContext.defaultParallelism`` where the conf is non-numeric
    (e.g. 'auto' under vendor AQE auto-shuffle)."""
    spark = df.sparkSession
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    except ValueError:
        return spark.sparkContext.defaultParallelism


def _pin_join_parallelism(index: DataFrame, probe: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Explicitly hash-partition both candidate-join inputs on the
    blocking key at the session's shuffle partition count (r11
    optimization). The candidate join is a FAN-OUT join: its shuffle
    INPUT is small (key streams of short strings) but its output is
    candidate pairs, every one paying a levenshtein verify in the same
    stage. AQE's bytes-based partition coalescing sees only the input
    bytes and collapsed the join to a handful of partitions, serializing
    tens of millions of verifies onto a few cores (measured 31.1 s vs
    5.4 s with coalescing off on the k=2 golden at sf0.1). A
    user-specified repartition is exempt from AQE coalescing, restoring
    the verify parallelism; using ``spark.sql.shuffle.partitions``
    (not a hardcoded count) keeps it cluster-sized — on a real cluster
    that conf is tuned to the executor fleet, and the join inherits it.
    Both sides share the partitioning, so the join adds no extra
    exchange. (The forced hash repartition re-concentrates any residual
    hot key into one partition; the affix strip and hot-block
    refinement mitigate but do not eliminate that — a corpus whose
    post-refinement keys are still skewed trades the AQE-starvation fix
    for a straggler.)"""
    n = _shuffle_partitions(index)
    return index.repartition(n, "__k"), probe.repartition(n, "__k")


def _seg_len(la, i, k):
    """Length of segment ``i`` (0-based) of a ``k+1``-way balanced split
    of a string of length ``la``: the first ``la % (k+1)`` segments get
    the extra character."""
    base = F.floor(la / (k + 1)).cast("int")
    rem = (la % (k + 1)).cast("int")
    return base + F.when(F.lit(i) < rem, 1).otherwise(0)


def _seg_start(la, i, k):
    """1-based start of segment ``i`` under the same split."""
    base = F.floor(la / (k + 1)).cast("int")
    rem = (la % (k + 1)).cast("int")
    return F.lit(i) * base + F.least(F.lit(i), rem) + 1


def edit_distance_join_k(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int,
    strip_affixes: bool = True,
    max_block_rows: int | None = None,
    hot_block_product: int | None = None,
) -> DataFrame:
    """General-k PassJoin: all unordered pairs with ``levenshtein <=
    max_dist`` via the k+1-segment pigeonhole — ``k`` edits cannot touch
    all ``k+1`` segments, and the untouched segment of x appears in y
    VERBATIM at a position shifted by at most ``k`` (the net length
    change of the edits before it). Index side: each string's own
    ``k+1`` segments, keyed (segment#, length, content). Probe side: for
    each admissible partner length and segment, the substrings at every
    shift in ``[-k, k]`` — at most ``(2k+1)^2 (k+1)`` keys per row, a
    constant. Strings shorter than ``k+1`` fall into a tiny-string block
    (every such string is indexed against all partners of length
    ``<= 2k``) — bounded by the short-string population. Candidates are
    then levenshtein-verified; recall is structural. Same id-uniqueness
    precondition as :func:`edit_distance_join`.

    ``edit_distance_join`` (k=1) is the hand-optimized two-segment
    special case (6 probe keys instead of 18); this is the general
    engine behind it for k >= 2.

    ``hot_block_product`` (OPT-IN, default None): any key whose
    candidate product (index rows x probe rows) exceeds it is re-blocked
    by the <=k-deletion neighborhood of the remainder AROUND the shared
    segment (prefix + '\\x01' + suffix) — the interior-segment
    generalization of the k=1 guard, exact by the alignment argument
    documented at :func:`_refine_hot_blocks_k`, verified by brute-force
    parity on adversarial corpora at k=2 and k=3 (tests/test_fuzzy.py).
    Off by default on MEASUREMENT, not principle: on the k=2 golden's
    degenerate digit corpus at sf0.1 the refinement cuts candidate
    enumeration 85.5M -> 52.8M and the join stage's executor time 87 s
    -> 38 s, but the pair density there is so high (4.08M true pairs)
    that the whole query is output-bound at ~7 s wall, and the
    refinement's extra query stages (hot-key aggregate, semi/anti
    routing, variant expansion) serialize into MORE wall (11.8-14.6 s
    across three orchestration variants) than they save. Switch it on
    for corpora where a hot block's enumeration dominates end-to-end
    wall — sparse-output corpora with a templated interior (constant
    cores the affix strip cannot reach), where quadratic blocks are the
    wall and output is small. ``max_block_rows`` fail-fasts on the FINAL
    post-refinement index, mirroring the k=1 contract.
    """
    k = max_dist
    if k < 1:
        raise ValueError(f"max_dist must be >= 1: {max_dist}")
    s = df.select(
        F.col(id_col).alias("__id"),
        F.col(str_col).alias("__s"),
        F.length(str_col).alias("__l"),
    ).where(F.col(str_col).isNotNull())
    if strip_affixes:
        s = _strip_common_affixes(s)
    if hot_block_product is not None:
        # The deletion-neighborhood expansion on hot rows runs map-side
        # in the stage that READS this frame, so a corpus stored in a
        # handful of parquet files would expand variants nearly serially
        # (measured: the 2-file customer scan at sf0.1 ran the refined
        # probe expansion 3.1 s on 2 of 32 cores). Widen once with a
        # round-robin exchange — reused by every downstream branch —
        # unless the scan is already session-shuffle wide (a 100 TB
        # corpus), where the extra exchange would be pure cost (§2.4).
        # NOT applied on the default path: A/B'd +0.6 s there (the plain
        # key expansion is light enough that the exchange never pays).
        n_part = _shuffle_partitions(s)
        if s.rdd.getNumPartitions() < n_part:
            s = s.repartition(n_part)
    l = F.col("__l")

    idx_segs = [
        F.when(
            l >= k + 1,
            F.concat_ws(
                "\x00",
                F.lit(str(i)),
                _seg_len(l, i, k),
                F.col("__s").substr(_seg_start(l, i, k), _seg_len(l, i, k)),
            ),
        )
        for i in range(k + 1)
    ]
    tiny_idx = F.when(l <= k, F.lit("T"))
    index = s.select(
        "__id", "__s", "__l",
        F.explode(F.array(*idx_segs, tiny_idx)).alias("__k"),
    ).where(F.col("__k").isNotNull())

    def probe_keys_for(i: int):
        # keys for partner length la and segment i across admissible
        # shifts. Shift tightening (r11 optimization, exact): if the
        # partner's untouched segment matches y at shift ``sh``, the
        # prefixes before the occurrence differ in net length by ``sh``
        # (>= |sh| edits) and the suffixes after it by ``Δ - sh`` where
        # ``Δ = len(y) - la`` (>= |Δ - sh| edits), so any true match has
        # |sh| + |Δ - sh| <= k — a width-(k+1) shift window instead of
        # the naive 2k+1. At k=2 this drops probe keys ~40% and, on the
        # degenerate-block corpus the k=2 golden pins, raw candidates
        # 60.2M -> 36M at sf0.1.
        def one(la):
            slen = _seg_len(la, i, k)
            start = _seg_start(la, i, k)
            return F.transform(
                F.sequence(F.lit(-k), F.lit(k)),
                lambda sh: F.when(
                    (la >= k + 1)
                    & (F.abs(sh) + F.abs(l - la - sh) <= k)
                    & (start + sh >= 1)
                    & (start + sh + slen - 1 <= l),
                    F.concat_ws(
                        "\x00",
                        F.lit(str(i)),
                        slen,
                        F.col("__s").substr(start + sh, slen),
                    ),
                ),
            )

        return F.flatten(
            F.transform(F.sequence(l - k, l + k), lambda la: one(la))
        )

    probe_arr = F.array_distinct(
        F.concat(
            *[probe_keys_for(i) for i in range(k + 1)],
            F.array(F.when(l <= 2 * k, F.lit("T"))),
        )
    )
    probe = s.select(
        "__id", "__s", "__l", F.explode(probe_arr).alias("__k")
    ).where(F.col("__k").isNotNull())

    if hot_block_product is not None:
        index, probe = _refine_hot_blocks_k(index, probe, k, hot_block_product)
    if max_block_rows is not None:
        _check_block_sizes(index, max_block_rows)

    # shuffle_hash: same rationale as the k=1 path — never broadcast the
    # candidate join, its verify parallelism must follow the key shuffle.
    # Verify BELOW the exchange (r11 optimization, same rationale as the
    # k=1 path): at k=2 the probe side posts up to (2k+1)^2(k+1) keys per
    # row, and on the degenerate-block corpus the candidate join emits
    # 60M rows at sf0.1 of which 54M are DISTINCT — the old
    # distinct-then-verify shape shuffled all of them with both strings
    # attached; filtering on the map side first makes the exchange
    # output-bound (26.7 s -> 5.6 s at sf0.1 together with the shift
    # tightening above and the pinned join parallelism below).
    index, probe = _pin_join_parallelism(index, probe)
    verified = (
        index.alias("a")
        .hint("shuffle_hash")
        .join(
            probe.alias("b"),
            (F.col("a.__k") == F.col("b.__k"))
            & (F.col("a.__id") < F.col("b.__id"))
            & (F.abs(F.col("a.__l") - F.col("b.__l")) <= k),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            # thresholded levenshtein — banded O(k·n) early-exit verify,
            # exact dist for kept rows (see the k=1 path's note)
            F.levenshtein(F.col("a.__s"), F.col("b.__s"), k).alias("dist"),
        )
        .where(F.col("dist") >= 0)
        .distinct()
    )
    return verified.select("id_a", "id_b", "dist")


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    block_col: str,
    window: int = 5,
    max_distance: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood record linkage (Hernández & Stolfo 1995):
    sort each block by ``key_col``, slide a ``window``-row neighborhood,
    and emit the ordered candidate pairs — optionally verified by
    ``levenshtein(key1, key2) <= max_distance``.

    The complementary ER strategy to :func:`edit_distance_join`:
    PassJoin guarantees exact recall at a fixed edit budget; SNM trades
    recall for a HARD per-row cost cap (exactly ``window - 1`` candidate
    partners, whatever the corpus looks like), which is what you reach
    for when the similarity predicate is not an edit metric or the
    corpus defeats metric blocking. Cross-block misses are the
    documented SNM trade-off — run multiple passes with rotated
    block/sort keys and union the pair sets.

    Scale shape: NO global sort — rank is per (block) via one window
    shuffle, and the neighborhood self-join buckets ranks at width
    ``window - 1`` so a pair at gap <= window-1 lands in the same or
    adjacent bucket: an equi-join on (block, bucket), never a range
    scan. Per-block work is |block| * window; the verify runs on
    candidates only.

    Returns ``(id1, id2, key1, key2, gap[, distance])`` with id1's rank
    below id2's.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2: {window}")
    w = Window.partitionBy("__blk").orderBy("__k", "__id")
    r = df.select(
        F.col(id_col).alias("__id"),
        F.col(key_col).alias("__k"),
        F.col(block_col).alias("__blk"),
    ).withColumn("__rn", F.row_number().over(w))
    span = window - 1
    r = r.withColumn("__b", ((F.col("__rn") - 1) / span).cast("long"))
    lo = r.select(
        F.col("__id").alias("id1"), F.col("__k").alias("key1"),
        F.col("__blk").alias("__blk"), F.col("__rn").alias("__r1"),
        F.col("__b").alias("__b1"),
    )
    hi = r.select(
        F.col("__id").alias("id2"), F.col("__k").alias("key2"),
        F.col("__blk").alias("__blk2"), F.col("__rn").alias("__r2"),
        F.col("__b").alias("__b2"),
    )
    # the lo side probes its own and the next bucket (an exploded pure
    # equi-join key, so this stays a hash join — an OR'd bucket predicate
    # would fall out of equi-join extraction); same+adjacent buckets
    # cover every gap in [1, window-1] exactly once
    lo = lo.withColumn(
        "__pb", F.explode(F.array(F.col("__b1"), F.col("__b1") + 1))
    )
    cand = lo.join(
        hi,
        (F.col("__blk") == F.col("__blk2")) & (F.col("__pb") == F.col("__b2")),
    ).where((F.col("__r2") - F.col("__r1")).between(1, span))
    out = cand.select(
        "id1", "id2", "key1", "key2", (F.col("__r2") - F.col("__r1")).alias("gap")
    )
    if max_distance is not None:
        # thresholded levenshtein: banded early-exit verify, exact
        # distance for every kept row (same move as edit_distance_join)
        out = out.withColumn(
            "distance", F.levenshtein("key1", "key2", max_distance)
        ).where(F.col("distance") >= 0)
    return out


def _jaro_winkler_bytes(a: bytes, b: bytes) -> float:
    """Jaro-Winkler similarity over raw UTF-8 bytes, matching DuckDB's
    ``jaro_winkler_similarity`` bit-for-bit (verified on 5000 random +
    adversarial cases): byte-level matching (not code points), either
    side empty -> 0.0, Winkler prefix boost (scale 0.1, max prefix 4)
    applied only when jaro > 0.7, transpositions = half the unmatched
    alignment flips."""
    l1, l2 = len(a), len(b)
    if l1 == 0 or l2 == 0:
        return 0.0
    md = max(l1, l2) // 2 - 1
    if md < 0:
        md = 0
    f1 = [False] * l1
    f2 = [False] * l2
    m = 0
    for i in range(l1):
        lo, hi = max(0, i - md), min(i + md + 1, l2)
        for j in range(lo, hi):
            if not f2[j] and a[i] == b[j]:
                f1[i] = f2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if f1[i]:
            while not f2[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    j = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if j > 0.7:
        p = 0
        for x, y in zip(a[:4], b[:4]):
            if x != y:
                break
            p += 1
        j = j + p * 0.1 * (1.0 - j)
    return j


def jaro_winkler_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    threshold: float = 0.85,
    max_block_rows: int | None = 5_000,
) -> DataFrame:
    """Blocked Jaro-Winkler candidate pairs for entity resolution: all
    unordered same-block pairs whose name similarity clears
    ``threshold`` — the classic record-linkage scorer for SHORT strings
    (person/product/vendor names) where edit distance over-penalizes
    transpositions and a shared prefix should count extra
    (:func:`edit_distance_join` is the k-errors complement for longer
    keys; this is the Winkler-weighted similarity scorer).

    Blocking contract: the caller supplies ``block_col`` (a phonetic
    key, a brand, a sorted-token prefix) and only within-block pairs
    are scored — the standard ER recall/cost trade. A block of m rows
    scores C(m, 2) pairs of pure-Python O(|a|*|b|) scorings, so
    ``max_block_rows`` is the standard circuit breaker, ON by default
    at 5_000 (C(5k, 2) ~ 12.5M pairs — the largest block a single
    Arrow batch stream digests in minutes, not days; the previous
    100k default would have admitted ~5e9 pairs, a hang rather than a
    guard). Raise it or pass None ONLY after sizing the worst block;
    the intended input is a collapsed (distinct-key) frame whose
    blocks are vocabulary-bounded, never the raw corpus.

    Cross-engine parity: the score is computed over UTF-8 BYTES with
    DuckDB's exact semantics (:func:`_jaro_winkler_bytes` — byte-level
    matching, empty -> 0.0, boost threshold 0.7, prefix scale 0.1,
    max prefix 4), and the threshold compares on the nudge-rounded 6dp
    grid, so ``jaro_winkler_similarity`` restates it verbatim in SQL.
    NULL id/text/block rows are excluded.

    Scale shape: one block-keyed equi-join (candidate-bound, never
    all-pairs), one Arrow-batched scoring map, one grid filter.
    Returns ``(id_a, id_b, jw)`` with ``id_a < id_b``.
    """
    from pyspark.sql.functions import pandas_udf

    if not 0.0 <= threshold <= 1.0:
        raise ValueError(f"jaro_winkler_pairs: bad threshold {threshold}")
    base = (
        df.select(
            F.col(id_col).alias("__id"),
            F.col(text_col).alias("__t"),
            F.col(block_col).alias("__k"),
        )
        .where(
            F.col(id_col).isNotNull()
            & F.col(text_col).isNotNull()
            & F.col(block_col).isNotNull()
        )
        # pin the (often expensively derived) index frame: it feeds the
        # breaker aggregate AND both self-join sides — the adamic_adar
        # convention, so each branch reads the materialized frame instead
        # of re-planning the caller's upstream lineage
        .localCheckpoint(eager=True)
    )
    if max_block_rows is not None:
        worst = (
            base.groupBy("__k")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.max("c").alias("mx"))
            .first()
        )
        mx = worst["mx"] if worst is not None else None
        if mx is not None and mx > max_block_rows:
            raise ValueError(
                f"jaro_winkler_pairs: a blocking key holds {mx} rows "
                f"(> max_block_rows={max_block_rows}); pair generation "
                "would be quadratic on that key. Use a finer block_col "
                "or raise max_block_rows if the block is genuinely "
                "acceptable."
            )

    @pandas_udf("double")
    def jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _jaro_winkler_bytes(x.encode("utf-8"), y.encode("utf-8"))
                for x, y in zip(a, b)
            ],
            dtype="float64",
        )

    left = base.select(
        F.col("__id").alias("id_a"), F.col("__t").alias("__ta"), "__k"
    )
    right = base.select(
        F.col("__id").alias("id_b"), F.col("__t").alias("__tb"), "__k"
    )
    pairs = left.join(right, "__k").where(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a",
        "id_b",
        F.round(jw(F.col("__ta"), F.col("__tb")) + F.lit(1e-9), 6).alias("jw"),
    )
    return scored.where(F.col("jw") >= F.lit(float(threshold)))
