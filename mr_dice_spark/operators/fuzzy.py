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
the (role, segment-length, segment) key, DISTINCT on the id pair, then
levenshtein verification on candidates only — near-linear when segment
values distribute. HONEST HAZARD: a corpus whose strings share a
constant half (e.g. a fixed 'Customer#' prefix) degenerates that
segment's block to all-pairs, making candidate generation quadratic
(verification stays cheap, output may itself be quadratic in such
corpora). Production mitigations: strip known constant prefixes before
joining, or raise k and use k+1 shorter segments so at least one falls
in the high-entropy region — both change keys only, not the verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All unordered pairs with ``levenshtein <= max_dist``:
    ``(id_a, id_b, dist)`` with ``id_a < id_b``. NULL strings never pair
    (an unknown name is not within edit distance of anything).
    ``max_dist=1`` runs the hand-optimized two-segment path below;
    larger k delegates to :func:`edit_distance_join_k` (the general
    k+1-segment PassJoin, same structural-recall guarantee)."""
    if max_dist != 1:
        return edit_distance_join_k(df, id_col, str_col, max_dist)
    s = df.select(
        F.col(id_col).alias("__id"),
        F.col(str_col).alias("__s"),
        F.length(str_col).alias("__l"),
    ).where(F.col(str_col).isNotNull())

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

    cand = (
        index.alias("a")
        .join(
            probe.alias("b"),
            (F.col("a.__k") == F.col("b.__k"))
            & (F.col("a.__id") < F.col("b.__id"))
            & (F.abs(F.col("a.__l") - F.col("b.__l")) <= 1),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__s").alias("__sa"),
            F.col("b.__s").alias("__sb"),
        )
        .distinct()
    )
    dist = F.levenshtein(F.col("__sa"), F.col("__sb"))
    return (
        cand.withColumn("dist", dist)
        .where(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )


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
    then levenshtein-verified; recall is structural.

    ``edit_distance_join`` (k=1) is the hand-optimized two-segment
    special case (6 probe keys instead of 18); this is the general
    engine behind it for k >= 2.
    """
    k = max_dist
    if k < 1:
        raise ValueError(f"max_dist must be >= 1: {max_dist}")
    s = df.select(
        F.col(id_col).alias("__id"),
        F.col(str_col).alias("__s"),
        F.length(str_col).alias("__l"),
    ).where(F.col(str_col).isNotNull())
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
        # keys for partner length la and segment i across all shifts
        def one(la):
            slen = _seg_len(la, i, k)
            start = _seg_start(la, i, k)
            return F.transform(
                F.sequence(F.lit(-k), F.lit(k)),
                lambda sh: F.when(
                    (la >= k + 1)
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

    cand = (
        index.alias("a")
        .join(
            probe.alias("b"),
            (F.col("a.__k") == F.col("b.__k"))
            & (F.col("a.__id") < F.col("b.__id"))
            & (F.abs(F.col("a.__l") - F.col("b.__l")) <= k),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__s").alias("__sa"),
            F.col("b.__s").alias("__sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein(F.col("__sa"), F.col("__sb")))
        .where(F.col("dist") <= k)
        .select("id_a", "id_b", "dist")
    )
