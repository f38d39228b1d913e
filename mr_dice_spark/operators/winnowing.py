"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003;
the MOSS algorithm). Beyond-reference pipeline operator: the guarantee-
bearing fingerprint scheme for substring-level duplicate detection —
any shared substring of length >= window + k - 1 produces at least one
SHARED fingerprint, a property MinHash (whole-set similarity) and
SimHash (global distance) do not give.

Spark shape: all JVM-side array expressions, zero Python UDFs; the only
exchange is fan_out's small-input widening (a no-op at real scale) —

1. normalize: lowercase + whitespace collapse (fingerprints should not
   change with formatting), materialized in its OWN projection behind
   the fan_out exchange so transform lambdas can't re-evaluate the
   whole-document regex per gram (PERFORMANCE.md finding 4),
2. k-gram hashes: ``transform(sequence(...), i -> hash(substr(s,i,k)))``.
   A classic CPU rolling hash reuses the previous gram's value; that
   recurrence is inexpressible in pure SQL, so each gram hashes its own
   substring — O(n*k) instead of O(n), the price of staying JVM-side
   with no per-row Python,
3. winnow: per sliding window of ``window`` consecutive gram hashes,
   keep the minimum; distinct survivors are the fingerprint set. The
   window minimum is ``array_min(slice(...))`` per position — O(n*w)
   array arithmetic.

``portable=True`` switches xxhash64 to the md5-derived 60-bit hash an
ANSI-SQL oracle reproduces bit-for-bit (operators/dedup.portable_hash60).

Selection-count intuition: winnowing keeps ~2/(window+1) of the gram
hashes, so fingerprint storage is a tunable fraction of document size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mr_dice_spark.operators.dedup import portable_hash60
from mr_dice_spark.operators.scale import fan_out


# explicit whitespace class, NOT \s: Java regex \s includes \x0B where
# RE2 (DuckDB) does not — the oracle must normalize identically
_WS = r"[ \t\n\r\f\x0B]+"


def _normalized(text_col: Column) -> Column:
    return F.lower(F.regexp_replace(F.trim(text_col), _WS, " "))


def _winnowed(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    window: int,
    portable: bool,
    with_pos: bool,
) -> DataFrame:
    """Shared winnowing scaffold: normalize → gram hashes → window minima
    → distinct explode. ONE place owns the two plan-shape subtleties —
    normalization in its own projection behind fan_out's exchange (the
    CollapseProject barrier; embedded in the transform lambda the
    whole-document regex would re-run once per gram, the O(n^2) trap of
    PERFORMANCE.md finding 4), and the window-min slice arithmetic — so
    the plan guard in tests/test_plans.py covers every variant.
    ``with_pos=False`` emits (id, fingerprint); ``with_pos=True`` emits
    (id, fingerprint, pos) with the LEFTMOST minimum's 1-based position
    per window."""
    if k <= 0 or window <= 0:
        raise ValueError(f"k and window must be > 0, got k={k} window={window}")
    s = F.col("__s")
    n_grams = F.length(s) - (k - 1)

    def gram_hash(i: Column) -> Column:
        sub = s.substr(i, F.lit(k))
        return portable_hash60(sub) if portable else F.xxhash64(sub)

    grams = F.when(
        n_grams >= 1, F.transform(F.sequence(F.lit(1), n_grams), gram_hash)
    ).otherwise(F.array().cast("array<bigint>"))
    n_windows = F.greatest(F.size("__g") - (window - 1), F.lit(1))

    if with_pos:
        def win_min(j: Column) -> Column:
            sl = F.slice(F.col("__g"), j, window)
            mn = F.array_min(sl)
            return F.struct(
                mn.alias("fingerprint"),
                (j - 1 + F.array_position(sl, mn)).cast("int").alias("pos"),
            )

        empty_type = "array<struct<fingerprint:bigint,pos:int>>"
    else:
        def win_min(j: Column) -> Column:
            return F.array_min(F.slice(F.col("__g"), j, window))

        empty_type = "array<bigint>"
    mins = F.when(
        F.size("__g") > 0,
        F.transform(F.sequence(F.lit(1), n_windows), win_min),
    ).otherwise(F.array().cast(empty_type))
    base = fan_out(
        df.select(F.col(id_col).alias("__id"), _normalized(F.col(text_col)).alias("__s"))
    )
    exploded = base.select("__id", grams.alias("__g")).select(
        "__id", F.explode(F.array_distinct(mins)).alias("__fp")
    )
    if with_pos:
        return exploded.select(
            F.col("__id").alias(id_col),
            F.col("__fp.fingerprint").alias("fingerprint"),
            F.col("__fp.pos").alias("pos"),
        )
    return exploded.select(F.col("__id").alias(id_col), F.col("__fp").alias("fingerprint"))


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
    portable: bool = False,
) -> DataFrame:
    """(id, fingerprint) — one row per distinct winnowed k-gram hash.

    Documents shorter than ``k`` normalized characters yield no rows;
    documents with fewer than ``window`` grams yield the single minimum
    (the only window). Deterministic: equal texts (up to case/whitespace)
    produce identical fingerprint sets.
    """
    return _winnowed(df, id_col, text_col, k, window, portable, with_pos=False)


def winnowing_fingerprint_positions(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
    portable: bool = False,
) -> DataFrame:
    """(id, fingerprint, pos) — winnowed fingerprints WITH the 1-based
    character position (in the normalized text) of the selected gram, the
    input span recovery needs. Per window the LEFTMOST minimum's position
    is recorded (deterministic and identical to the oracle's
    ``list_position``; classic winnowing breaks ties rightmost — the
    fingerprint VALUES are unchanged, only which duplicate position is
    reported differs). The same (fingerprint, pos) selected by several
    overlapping windows is emitted once; the same fingerprint at DISTINCT
    positions keeps one row per position (repeated boilerplate within a
    single document must cover every occurrence)."""
    return _winnowed(df, id_col, text_col, k, window, portable, with_pos=True)


def merge_intervals(
    iv: DataFrame, id_col: str, start_col: str = "s", end_col: str = "e"
) -> DataFrame:
    """Merge overlapping AND adjacent (gap == 0) closed integer intervals
    per ``id_col`` — the gaps-and-islands pattern: one shuffle on the id,
    two window passes (running max of end to flag island starts, running
    sum to number islands), one hash aggregate. Returns
    (id, span_start, span_end, span_len)."""
    from pyspark.sql import Window

    w_scan = Window.partitionBy(id_col).orderBy(start_col, end_col)
    prev_max_e = F.max(end_col).over(
        w_scan.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "__new",
        # first interval of the id (NULL prev) and any interval starting
        # past prev_max_e + 1 open a new island; start == prev_max_e + 1
        # is ADJACENT text and merges
        F.when(F.col(start_col) > F.coalesce(prev_max_e, F.lit(-1)) + 1, 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "__gid", F.sum("__new").over(w_scan.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy(id_col, "__gid")
        .agg(
            F.min(start_col).alias("span_start"),
            F.max(end_col).alias("span_end"),
            (F.max(end_col) - F.min(start_col) + 1).alias("span_len"),
        )
        .drop("__gid")
    )


def boilerplate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 2,
    k: int = 8,
    window: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Cross-document repeated-span extraction on top of winnowing: the
    character ranges (in the NORMALIZED text, 1-based closed intervals)
    covered by fingerprints appearing in >= ``min_docs`` distinct
    documents, merged per document — the spans a training-data pipeline
    cuts as boilerplate from otherwise-unique documents. Returns
    (id, span_start, span_end, span_len).

    Scale shape — deliberately NO pair join anywhere: fingerprint
    doc-frequency is one hash aggregate on the fingerprint key, the
    common-fingerprint filter is a key-partitioned join back (the common
    set is small by construction — boilerplate is low-cardinality — but
    correctness never depends on that), and the interval merge is one
    shuffle on the doc id. Linear in corpus size where pairwise span
    recovery would be quadratic in the duplicate family size."""
    fps = winnowing_fingerprint_positions(df, id_col, text_col, k, window, portable)
    common = (
        fps.groupBy("fingerprint")
        .agg(F.count_distinct(F.col(id_col)).alias("__df"))
        .where(F.col("__df") >= min_docs)
        .select("fingerprint")
    )
    # no distinct needed: the positions frame is distinct on
    # (id, fingerprint, pos) and the fingerprint is a FUNCTION of
    # (id, pos) — the gram at pos hashes to exactly one value — so
    # (id, pos) is already unique and a dedup here would only buy an
    # extra full shuffle
    covered = fps.join(common, "fingerprint").select(
        id_col,
        F.col("pos").alias("s"),
        (F.col("pos") + (k - 1)).alias("e"),
    )
    return merge_intervals(covered, id_col, "s", "e")


def remove_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    spans: DataFrame,
    start_col: str = "span_start",
    end_col: str = "span_end",
) -> DataFrame:
    """Cut the given 1-based closed character intervals (in the
    NORMALIZED text — what :func:`boilerplate_spans` emits) out of each
    document: (id, text_clean, n_removed). Rows with no spans keep their
    full normalized text with n_removed = 0 — the cleaning pass is
    row-count preserving.

    Shape: spans collapse to one sorted array per doc (hash aggregate on
    the id), join back to the documents (key-partitioned; at scale both
    sides are id-hashed), and the stitch itself is ONE row-local
    ``aggregate`` over the doc's spans — per-span work, not per-char, so
    a doc with three boilerplate blocks does three substrings regardless
    of length. Overlapping/adjacent input spans are legal (the fold
    clamps the cursor), though boilerplate_spans already merges them."""
    doc = df.select(
        F.col(id_col).alias("__id"), _normalized(F.col(text_col)).alias("__s")
    )
    sp = spans.groupBy(F.col(id_col).alias("__id")).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(start_col).alias("s"), F.col(end_col).alias("e")))
        ).alias("__spans")
    )
    joined = doc.join(sp, "__id", "left")
    # fold state: (pos = next uncut 1-based offset, acc = kept text).
    # For each span: keep [pos, span.s), jump pos to span.e + 1. greatest()
    # clamps overlapping spans (span.s < pos) to a zero-length keep.
    stitched = F.aggregate(
        F.col("__spans"),
        F.struct(F.lit(1).cast("int").alias("pos"), F.lit("").alias("acc")),
        lambda st, sub: F.struct(
            F.greatest(st.getField("pos"), (sub.getField("e") + 1).cast("int")).alias("pos"),
            F.concat(
                st.getField("acc"),
                F.col("__s").substr(
                    st.getField("pos"),
                    F.greatest(
                        sub.getField("s").cast("int") - st.getField("pos"), F.lit(0)
                    ),
                ),
            ).alias("acc"),
        ),
        lambda st: F.concat(
            st.getField("acc"), F.col("__s").substr(st.getField("pos"), F.length("__s"))
        ),
    )
    clean = F.when(F.col("__spans").isNull(), F.col("__s")).otherwise(stitched)
    return joined.select(
        F.col("__id").alias(id_col),
        clean.alias("text_clean"),
        (F.length("__s") - F.length(clean)).cast("int").alias("n_removed"),
    )


def fingerprint_overlap_join(
    fps: DataFrame,
    id_col: str,
    min_shared: int = 2,
    fp_col: str = "fingerprint",
    prefix_filter: bool = True,
) -> DataFrame:
    """(id_a, id_b, shared) for pairs sharing >= ``min_shared`` values of
    ``fp_col`` — the MOSS ranking join, equally usable over any hash-key
    column. ``fps`` must be distinct per (id, fp), as
    winnowing_fingerprints emits.

    ``prefix_filter=True`` (default) is the exact PPJoin-style pushdown
    (Chaudhuri et al. SSJoin 2006; Xiao et al. PPJoin 2008): order every
    document's fingerprints by GLOBAL rarity (document frequency, then
    value — a total order shared by all docs) and post only each doc's
    first ``n - min_shared + 1`` fingerprints into the candidate join.
    Completeness is the prefix-filtering principle: two sets with
    overlap >= t whose elements are sorted by one common total order
    must collide inside those prefixes — so no pair is lost — while the
    ultra-frequent boilerplate keys (the quadratic posting lists that
    make the naive join pair-output-bound on crawl corpora) land in the
    SUFFIX of almost every document and never reach the join. Candidates
    are then verified with an exact array intersection against each
    doc's full fingerprint set. Cost: one small frequency aggregate, one
    per-doc sort, the (pruned) candidate join, and two id-keyed joins to
    attach the arrays — each bounded by candidates, not by key
    co-occurrence. Docs with fewer than ``min_shared`` fingerprints
    cannot reach the threshold and are pruned up front.

    ``prefix_filter=False`` is the naive inverted-index count-join
    (every co-occurring pair materialized, then HAVING) — fine when no
    key is frequent, pair-output-bound when one is."""
    if not prefix_filter:
        l, r = fps.alias("x"), fps.alias("y")
        return (
            l.join(
                r,
                (F.col(f"x.{fp_col}") == F.col(f"y.{fp_col}"))
                & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
            )
            .groupBy(
                F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b")
            )
            .agg(F.count(F.lit(1)).alias("shared"))
            .where(F.col("shared") >= min_shared)
        )
    t = int(min_shared)
    freq = fps.groupBy(fp_col).agg(F.count(F.lit(1)).alias("__df"))
    ranked = fps.join(freq, fp_col)
    # per doc: fingerprints in (document-frequency, value) order — one
    # global total order, so both sides of any pair sort identically
    docs = (
        ranked.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__df"), F.col(fp_col).alias("f")))
            ).alias("__sorted")
        )
        .select(
            id_col,
            F.transform(F.col("__sorted"), lambda s: s["f"]).alias("__fps"),
        )
        .where(F.size("__fps") >= t)
    )
    pre = docs.select(
        id_col,
        F.explode(
            F.slice(F.col("__fps"), 1, F.size("__fps") - F.lit(t) + 1)
        ).alias("__pf"),
    )
    cand = (
        pre.alias("a")
        .join(
            pre.alias("b"),
            (F.col("a.__pf") == F.col("b.__pf"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    fa = docs.select(F.col(id_col).alias("id_a"), F.col("__fps").alias("__fa"))
    fb = docs.select(F.col(id_col).alias("id_b"), F.col("__fps").alias("__fb"))
    return (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect(F.col("__fa"), F.col("__fb"))).alias("shared"),
        )
        .where(F.col("shared") >= t)
    )


def exact_repeated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 50,
    min_docs: int = 2,
    k: int = 8,
    window: int = 4,
    margin: int | None = None,
) -> DataFrame:
    """EXACT cross-document repeated-substring extraction — the Lee et
    al. "Deduplicating Training Data Makes Language Models Better"
    (ACL 2022) rule, re-expressed relationally: every maximal span of
    >= ``min_len`` NORMALIZED characters that occurs verbatim in
    >= ``min_docs`` distinct documents, as (id, span_start, span_end,
    span_len) 1-based closed intervals per document. Where the paper
    builds a suffix array, this composes three Spark-native stages so
    no single task ever holds the corpus:

    1. PREFILTER (guaranteed recall): winnowing fingerprints shared by
       >= min_docs docs mark candidate regions. The SIGMOD'03 guarantee
       — any shared substring of length >= window + k - 1 selects at
       least one common fingerprint, and interiors select one per
       ``window`` grams — means every true span is fingerprint-covered;
       merged covered intervals expanded by ``margin`` (default
       min_len + window + k, comfortably above the w + k - 2 boundary
       slack) therefore contain every true min_len-gram start.
    2. HASH GROUP (candidate-bound): only candidate positions emit an
       (id, pos, xxhash64 of the min_len-gram) row — never the gram
       text — and one hash aggregate keeps hashes spanning >= min_docs
       docs. Work is proportional to candidate coverage, not corpus
       size: boilerplate-free corpora emit almost nothing.
    3. GROUPED EXACT CONFIRM: surviving positions re-derive the gram
       TEXT and group on it — equal text in >= min_docs docs is the
       exactness proof (a 64-bit hash collision is filtered here, not
       trusted) — then per-document gaps-and-islands merging turns the
       covered min_len-grams into maximal spans. A character lies in
       some repeated span of length >= min_len iff some repeated
       min_len-gram covers it, so the merged islands ARE the paper's
       maximal spans.

    Feed the output to :func:`remove_spans` to cut the duplicated text
    (span coordinates are in the normalized text, as remove_spans
    expects). Unlike :func:`boilerplate_spans` (fingerprint-level,
    approximate span edges, k-sized matches count), this is exact at
    the min_len threshold — the difference matters because partial
    50-char overlaps are what the 50-token rule is calibrated against.
    """
    if min_len < window + k - 1:
        raise ValueError(
            f"min_len={min_len} below the winnowing guarantee "
            f"window + k - 1 = {window + k - 1}; shorter repeats can "
            "evade the prefilter — lower k/window or raise min_len"
        )
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2: {min_docs}")
    m = margin if margin is not None else min_len + window + k
    if m < min_len + window + k:
        # a smaller margin can miss true span-interior gram starts near
        # the prefilter's boundary slack — raising is allowed
        # (diagnostics), lowering silently breaks the EXACT contract
        raise ValueError(
            f"margin={m} below the recall bound min_len + window + k = "
            f"{min_len + window + k}"
        )
    fps = winnowing_fingerprint_positions(df, id_col, text_col, k, window)
    common = (
        fps.groupBy("fingerprint")
        .agg(F.count_distinct(F.col(id_col)).alias("__df"))
        .where(F.col("__df") >= min_docs)
        .select("fingerprint")
    )
    doc, grams1 = _candidate_gram_hashes(
        df, id_col, text_col, fps, common, k, min_len, m
    )
    hot = (
        grams1.groupBy("__h")
        .agg(F.count_distinct(F.col(id_col)).alias("__dc"))
        .where(F.col("__dc") >= min_docs)
        .select("__h")
    )
    grams2 = _gram_texts(grams1.join(hot, "__h"), doc, id_col, min_len)
    confirmed = (
        grams2.groupBy("__g")
        .agg(F.count_distinct(F.col(id_col)).alias("__dc"))
        .where(F.col("__dc") >= min_docs)
        .select("__g")
    )
    final_cov = grams2.join(confirmed, "__g").select(
        id_col,
        F.col("__q").alias("s"),
        (F.col("__q") + (min_len - 1)).alias("e"),
    )
    return merge_intervals(final_cov, id_col, "s", "e")


def _candidate_gram_hashes(
    df: DataFrame,
    id_col: str,
    text_col: str,
    fps: DataFrame,
    keep_fps: DataFrame,
    k: int,
    min_len: int,
    m: int,
):
    """One side of the exact-substring machinery: positions covered by
    ``keep_fps`` fingerprints -> merged intervals expanded by ``m`` ->
    every min_len-gram start in a candidate interval, hashed. Returns
    ``(doc, grams1)`` where doc = (id, __s normalized text) and grams1 =
    (id, __q, __h) — the gram TEXT never leaves the row here."""
    covered = fps.join(keep_fps, "fingerprint").select(
        id_col, F.col("pos").alias("s"), (F.col("pos") + (k - 1)).alias("e")
    )
    cand = merge_intervals(covered, id_col, "s", "e").select(
        id_col,
        F.greatest(F.lit(1), F.col("span_start") - m).alias("s"),
        (F.col("span_end") + m).alias("e"),
    )
    cand = merge_intervals(cand, id_col, "s", "e")
    doc = df.select(F.col(id_col), _normalized(F.col(text_col)).alias("__s"))
    q_hi = F.least(F.col("span_end"), F.length("__s") - (min_len - 1))
    q_lo = F.col("span_start")
    # hash IN-ROW (transform over the position range), THEN explode only
    # (q, hash) structs: exploding raw positions and substr-ing after
    # would carry the full document string through every exploded row's
    # UnsafeRow — an O(positions x doc_len) copy the winnowing scaffold
    # already avoids the same way
    pairs = F.when(
        q_hi >= q_lo,
        F.transform(
            F.sequence(q_lo, q_hi),
            lambda q: F.struct(
                q.alias("q"),
                F.xxhash64(F.col("__s").substr(q, F.lit(min_len))).alias("h"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<q:bigint,h:bigint>>"))
    grams1 = (
        cand.join(doc, id_col)
        .select(id_col, F.explode(pairs).alias("__p"))
        .select(
            id_col,
            F.col("__p.q").alias("__q"),
            F.col("__p.h").alias("__h"),
        )
    )
    return doc, grams1


def _gram_texts(
    survivors: DataFrame, doc: DataFrame, id_col: str, min_len: int
) -> DataFrame:
    """(id, __q, __g): re-derive the gram TEXT for surviving positions
    only — the grouped-exact-confirm input. A plain id-keyed join +
    substr: survivors are hash-group confirmed (near-certain true
    repeats), so this side is output-bound by construction and a
    collect-positions-then-explode rewrite would only add a shuffle
    (measured +1.2 s at sf0.1 for no win)."""
    return survivors.select(id_col, "__q").join(doc, id_col).select(
        id_col,
        "__q",
        F.col("__s").substr(F.col("__q"), F.lit(min_len)).alias("__g"),
    )


def exact_contamination_spans(
    df: DataFrame,
    contaminants: DataFrame,
    id_col: str,
    text_col: str,
    cont_id_col: str | None = None,
    cont_text_col: str | None = None,
    min_len: int = 50,
    k: int = 8,
    window: int = 4,
    margin: int | None = None,
) -> DataFrame:
    """Contamination surgery — the CROSS-TABLE twin of
    :func:`exact_repeated_spans`: every maximal span of >= ``min_len``
    normalized characters in a CORPUS document that occurs verbatim in
    ANY contaminant document (a benchmark/eval set), as
    (id, span_start, span_end, span_len). Whole-document
    decontamination (``operators/decontaminate.py``) drops documents
    that LOOK like benchmark rows; this finds the copied REGION inside
    an otherwise-legitimate document, so :func:`remove_spans` can cut
    the contamination instead of discarding the document — the surgical
    variant of the n-gram-overlap decontamination rule used by LLM
    training pipelines.

    Same three-stage shape and guarantees as exact_repeated_spans, with
    the doc-frequency test replaced by PRESENCE ON BOTH SIDES at every
    stage: shared fingerprint values gate the candidates, shared gram
    hashes gate the confirm, and shared gram TEXT is the exactness
    proof. Work on each side is bounded by ITS candidate coverage — a
    clean corpus emits almost nothing regardless of benchmark size, and
    the benchmark side only ever fans out regions a corpus document
    also fingerprints.
    """
    if min_len < window + k - 1:
        raise ValueError(
            f"min_len={min_len} below the winnowing guarantee "
            f"window + k - 1 = {window + k - 1}; shorter repeats can "
            "evade the prefilter — lower k/window or raise min_len"
        )
    m = margin if margin is not None else min_len + window + k
    if m < min_len + window + k:
        raise ValueError(
            f"margin={m} below the recall bound min_len + window + k = "
            f"{min_len + window + k}"
        )
    cid = cont_id_col or id_col
    ctext = cont_text_col or text_col
    fps_a = winnowing_fingerprint_positions(df, id_col, text_col, k, window)
    fps_b = winnowing_fingerprint_positions(contaminants, cid, ctext, k, window)
    shared_fp = (
        fps_a.select("fingerprint")
        .distinct()
        .join(fps_b.select("fingerprint").distinct(), "fingerprint")
    )
    doc_a, g1a = _candidate_gram_hashes(
        df, id_col, text_col, fps_a, shared_fp, k, min_len, m
    )
    doc_b, g1b = _candidate_gram_hashes(
        contaminants, cid, ctext, fps_b, shared_fp, k, min_len, m
    )
    hot = (
        g1a.select("__h").distinct().join(g1b.select("__h").distinct(), "__h")
    )
    g2a = _gram_texts(g1a.join(hot, "__h"), doc_a, id_col, min_len)
    g2b = _gram_texts(g1b.join(hot, "__h"), doc_b, cid, min_len)
    confirmed = g2b.select("__g").distinct()
    final_cov = g2a.join(confirmed, "__g").select(
        id_col,
        F.col("__q").alias("s"),
        (F.col("__q") + (min_len - 1)).alias("e"),
    )
    return merge_intervals(final_cov, id_col, "s", "e")
