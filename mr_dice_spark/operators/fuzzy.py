"""Fuzzy entity-resolution join: all pairs within edit distance 1, via
exact-recall pigeonhole segment blocking (PassJoin's k+1-segment scheme,
Li et al. 2011, instantiated at k=1).

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
    """All unordered pairs with ``levenshtein <= max_dist`` (currently
    only ``max_dist=1`` — the 2-segment pigeonhole; larger k needs the
    general k+1-segment index): ``(id_a, id_b, dist)`` with
    ``id_a < id_b``. NULL strings never pair (an unknown name is not
    within edit distance of anything)."""
    if max_dist != 1:
        raise NotImplementedError(
            "edit_distance_join implements the k=1 two-segment pigeonhole; "
            "for larger k use k+1 segments (same scheme, more keys)"
        )
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
