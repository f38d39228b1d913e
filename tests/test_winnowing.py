"""Winnowing fingerprints vs the paper's algorithm as a pure-Python model."""

import hashlib

import pytest
from pyspark.sql import functions as F

from mr_dice_spark.operators.winnowing import (
    fingerprint_overlap_join,
    winnowing_fingerprints,
)


def _phash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _model(text, k=8, w=4):
    if text is None:
        return set()
    import re

    # mirror the operator: trim -> collapse \s+ to single spaces -> lower
    # explicit ASCII class like the operator (python \s is Unicode-wide)
    s = re.sub(r"[ \t\n\r\f\x0b]+", " ", text.strip().lower())
    grams = [_phash(s[i : i + k]) for i in range(len(s) - k + 1)]
    if not grams:
        return set()
    nw = max(1, len(grams) - w + 1)
    return {min(grams[j : j + w]) for j in range(nw)}


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "The   Quick Brown fox JUMPS over the lazy dog",   # case/space noise -> same fps
    "completely different content with other words here",
    "short",                                            # < k chars -> no fps
    "exactly8c",                                        # 9 chars -> 2 grams, 1 window
    "",
    None,
]


def test_winnowing_matches_model(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    out = winnowing_fingerprints(df, "doc_id", "text", k=8, window=4, portable=True)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    for i, t in enumerate(TEXTS):
        assert got.get(i, set()) == _model(t), f"doc {i}"
    # normalization: docs 0 and 1 fingerprint identically
    assert got[0] == got[1]


def test_winnowing_shared_substring_guarantee(spark):
    """The winnowing guarantee: a shared substring of length >= w+k-1
    (here 11) forces at least one shared fingerprint."""
    shared = "abcdefghijklmnop"  # 16 chars shared block
    df = spark.createDataFrame(
        [(1, "xx " + shared + " yy"), (2, "totally other " + shared + " tail")],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(df, "doc_id", "text", k=8, window=4)
    pairs = fingerprint_overlap_join(fps, "doc_id", min_shared=1).collect()
    assert len(pairs) == 1 and pairs[0]["shared"] >= 1


def test_winnowing_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        winnowing_fingerprints(df, "doc_id", "text", k=0)


# ---------------------------------------------------------------------------
# position-carrying fingerprints + boilerplate span extraction
# ---------------------------------------------------------------------------

from mr_dice_spark.operators.winnowing import (  # noqa: E402
    boilerplate_spans,
    merge_intervals,
    winnowing_fingerprint_positions,
)


def _model_pos(text, k=8, w=4):
    """(fingerprint, pos) pairs: per window, the LEFTMOST minimum and its
    1-based position in the normalized text."""
    if text is None:
        return set()
    import re

    s = re.sub(r"[ \t\n\r\f\x0b]+", " ", text.strip().lower())
    grams = [_phash(s[i : i + k]) for i in range(len(s) - k + 1)]
    if not grams:
        return set()
    nw = max(1, len(grams) - w + 1)
    out = set()
    for j in range(nw):
        win = grams[j : j + w]
        mn = min(win)
        out.add((mn, j + 1 + win.index(mn)))
    return out


def test_fingerprint_positions_match_model(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    out = winnowing_fingerprint_positions(df, "doc_id", "text", k=8, window=4, portable=True)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], set()).add((r["fingerprint"], r["pos"]))
    for i, t in enumerate(TEXTS):
        assert got.get(i, set()) == _model_pos(t), f"doc {i}"


def test_merge_intervals_overlap_adjacent_and_gap(spark):
    iv = spark.createDataFrame(
        [
            (1, 1, 5), (1, 4, 8),     # overlap -> one span 1..8
            (1, 9, 12),               # adjacent (gap 0) -> still merges
            (1, 20, 25),              # real gap -> new span
            (2, 3, 7),                # other id untouched
        ],
        "doc_id long, s int, e int",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in merge_intervals(iv, "doc_id", "s", "e").collect()
    }
    assert got == {(1, 1, 12, 12), (1, 20, 25, 6), (2, 3, 7, 5)}


def test_boilerplate_spans_identical_docs_and_unique_docs(spark):
    """Two identical docs: winnowing selects a fingerprint in every
    window of 4 consecutive grams, so covered k=8 intervals chain into a
    SINGLE span covering essentially the whole normalized doc (start <=
    window, end >= n - window + 1 + k - 1 bound). A doc sharing nothing
    emits no spans at all."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, text), (2, text.upper()), (3, "zzz qqq vvv unrelated interior www")],
        "doc_id long, text string",
    )
    rows = boilerplate_spans(df, "doc_id", "text", min_docs=2, k=8, window=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    n = len(text)  # already normalized (lowercase, single spaces)
    for d in (1, 2):
        assert len(by_doc[d]) == 1, by_doc
        s, e = by_doc[d][0]
        assert s <= 4 and e >= n - 3, (s, e, n)
    assert 3 not in by_doc


def test_remove_spans_stitch_and_preserve(spark):
    from mr_dice_spark.operators.winnowing import remove_spans

    docs = spark.createDataFrame(
        [
            (1, "abcdefghij"),         # cut [3,5] and [8,9] -> 'ab' + 'fg' + 'j'
            (2, "KEEP   me  whole"),   # no spans: normalized text survives
            (3, "0123456789"),         # overlapping spans clamp
            (4, "xyz"),                # span covering everything -> empty
        ],
        "doc_id long, text string",
    )
    spans = spark.createDataFrame(
        [
            (1, 3, 5), (1, 8, 9),
            (3, 2, 6), (3, 4, 8),     # overlap: union covers [2,8]
            (4, 1, 3),
        ],
        "doc_id long, span_start int, span_end int",
    )
    got = {r["doc_id"]: (r["text_clean"], r["n_removed"])
           for r in remove_spans(docs, "doc_id", "text", spans).collect()}
    assert got[1] == ("abfgj", 5)
    assert got[2] == ("keep me whole", 0)   # normalized, untouched
    assert got[3] == ("089", 7)  # kept: pos 1 ('0') and pos 9-10 ('89')
    assert got[4] == ("", 3)
    assert set(got) == {1, 2, 3, 4}          # row-count preserving


def test_remove_spans_roundtrip_with_boilerplate_spans(spark):
    """End-to-end detect -> cut: after removing boilerplate_spans'
    output, re-running detection on the CLEANED text finds no cross-doc
    fingerprints of the planted block (the shared text is gone)."""
    from mr_dice_spark.operators.winnowing import boilerplate_spans, remove_spans

    shared = "common navigation footer boilerplate block of text"
    docs = spark.createDataFrame(
        [
            (1, "first unique document opening " + shared + " first tail"),
            (2, "second very different start " + shared + " second ending"),
        ],
        "doc_id long, text string",
    )
    spans = boilerplate_spans(docs, "doc_id", "text", min_docs=2, k=8, window=4)
    cleaned = remove_spans(docs, "doc_id", "text", spans)
    assert cleaned.count() == 2
    again = boilerplate_spans(
        cleaned, "doc_id", "text_clean", min_docs=2, k=8, window=4
    ).collect()
    assert again == []  # nothing shared survives the cut


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_span_st = st.lists(
    st.tuples(st.integers(1, 30), st.integers(0, 9)).map(lambda t: (t[0], t[0] + t[1])),
    max_size=6,
)


@settings(max_examples=25, deadline=None)
@given(st.text(alphabet="abcdef ", min_size=0, max_size=40), _span_st)
def test_remove_spans_matches_char_model(spark, text, spans):
    """remove_spans (per-span fold stitch) vs a per-character Python
    model (keep chars not covered by any span) — structurally different
    algorithms, any off-by-one in the fold diverges."""
    import re

    from mr_dice_spark.operators.winnowing import remove_spans

    norm = re.sub(r"[ \t\n\r\f\x0b]+", " ", text.strip().lower())
    expect = "".join(
        ch for i, ch in enumerate(norm, start=1)
        if not any(s <= i <= e for s, e in spans)
    )
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    sp = spark.createDataFrame(
        [(1, s, e) for s, e in spans] or [(2, 1, 1)],  # keep schema non-empty
        "doc_id long, span_start int, span_end int",
    )
    row = remove_spans(docs, "doc_id", "text", sp).first()
    assert row["text_clean"] == expect
    assert row["n_removed"] == len(norm) - len(expect)


def test_boilerplate_spans_shared_block_localized(spark):
    """A shared interior block in otherwise-unique docs produces spans
    whose covered text actually contains shared grams: every span lies
    within/around the planted block, not across the unique regions."""
    shared = "common boilerplate navigation footer text"
    a = "first document unique opening words here " + shared + " unique tail alpha"
    b = "second doc other start " + shared + " different ending beta"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    rows = boilerplate_spans(df, "doc_id", "text", min_docs=2, k=8, window=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    assert set(by_doc) == {1, 2}
    for doc_id, text in ((1, a), (2, b)):
        lo = text.index(shared) + 1  # 1-based normalized offset
        hi = lo + len(shared) - 1
        for s, e in by_doc[doc_id]:
            # spans stay anchored to the planted block: they at least
            # intersect it and never extend a full gram past its edges
            assert s >= lo - 7 and e <= hi + 7, (doc_id, s, e, lo, hi)
            assert s <= hi and e >= lo


def test_overlap_join_prefix_filter_matches_naive(spark):
    """The PPJoin prefix-filtered path must return the IDENTICAL
    (id_a, id_b, shared) set as the naive count-join — including on a
    boilerplate-heavy fixture where one fingerprint co-occurs in every
    document (the posting list the pushdown exists to prune)."""
    import random

    from mr_dice_spark.operators.winnowing import (
        fingerprint_overlap_join,
        winnowing_fingerprints,
    )

    rng = random.Random(7)
    boiler = "shared navigation footer copyright terms of service block "
    docs = []
    for i in range(30):
        body = " ".join(
            rng.choice(["alpha", "beta", "gamma", "delta", "epsi", "zeta"])
            for _ in range(rng.randint(5, 30))
        )
        # every doc carries the same boilerplate; half share a second block
        extra = "identical quoted paragraph fragment " if i % 2 else ""
        docs.append((i, boiler + extra + body))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = winnowing_fingerprints(df, "doc_id", "text", k=8, window=4)
    for t in (2, 3, 5):
        fast = {
            (r["id_a"], r["id_b"], r["shared"])
            for r in fingerprint_overlap_join(
                fps, "doc_id", min_shared=t, prefix_filter=True
            ).collect()
        }
        naive = {
            (r["id_a"], r["id_b"], r["shared"])
            for r in fingerprint_overlap_join(
                fps, "doc_id", min_shared=t, prefix_filter=False
            ).collect()
        }
        assert fast == naive, f"t={t}: {fast ^ naive}"
        assert fast, f"t={t}: fixture produced no overlapping pairs"


def _brute_repeated_spans(docs: dict, L: int, min_docs: int = 2):
    """O(n*L) reference: all repeated L-grams, merged per doc."""
    import re
    from collections import defaultdict

    def norm(t):
        return re.sub(r"[ \t\n\r\f\x0B]+", " ", t.strip()).lower()

    grams = defaultdict(set)
    for i, t in docs.items():
        s = norm(t)
        for q in range(len(s) - L + 1):
            grams[s[q : q + L]].add(i)
    out = []
    for i, t in docs.items():
        s = norm(t)
        ivs = [
            (q + 1, q + L)
            for q in range(len(s) - L + 1)
            if len(grams[s[q : q + L]]) >= min_docs
        ]
        if not ivs:
            continue
        cs, ce = ivs[0]
        for s_, e_ in ivs[1:]:
            if s_ <= ce + 1:
                ce = max(ce, e_)
            else:
                out.append((i, cs, ce, ce - cs + 1))
                cs, ce = s_, e_
        out.append((i, cs, ce, ce - cs + 1))
    return sorted(out)


def test_exact_repeated_spans_matches_bruteforce(spark):
    """Planted 50+-char repeats at document START, MIDDLE, and END (the
    prefilter's boundary-slack cases) plus unique bodies: output must
    equal the brute-force all-L-grams reference exactly."""
    import random

    from mr_dice_spark.operators.winnowing import exact_repeated_spans

    rng = random.Random(5)
    alpha = "abcdefghij "
    boiler1 = "".join(rng.choice(alpha) for _ in range(70))
    boiler2 = "".join(rng.choice(alpha) for _ in range(55))
    docs = {}
    for i in range(40):
        body = "".join(rng.choice(alpha) for _ in range(rng.randint(60, 300)))
        r = rng.random()
        if r < 0.3:
            docs[i] = boiler1 + body
        elif r < 0.5:
            docs[i] = body + boiler2
        elif r < 0.7:
            cut = len(body) // 2
            docs[i] = body[:cut] + boiler1 + body[cut:]
        else:
            docs[i] = body
    df = spark.createDataFrame(list(docs.items()), "id long, text string")
    got = sorted(
        tuple(r)
        for r in exact_repeated_spans(df, "id", "text", min_len=50).collect()
    )
    assert got == _brute_repeated_spans(docs, 50)
    # a 49-char shared block must NOT appear at min_len=50 but must at 49
    short = "x" * 49
    docs2 = {0: short + "aqaqaqaqaqaqaqaqaqaq", 1: short + "bwbwbwbwbwbwbwbwbwbw"}
    df2 = spark.createDataFrame(list(docs2.items()), "id long, text string")
    assert exact_repeated_spans(df2, "id", "text", min_len=50).count() == 0
    got49 = sorted(
        tuple(r)
        for r in exact_repeated_spans(df2, "id", "text", min_len=49).collect()
    )
    assert got49 == [(0, 1, 49, 49), (1, 1, 49, 49)]


def test_exact_repeated_spans_validation_and_candidate_bound(spark):
    """Parameter guards fire; and the hash stage's row count stays
    bounded by candidate coverage, far below the all-grams count, on a
    corpus that is mostly unique (the 100 TB cost claim, measured)."""
    import random

    import pytest
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.winnowing import (
        exact_repeated_spans,
        merge_intervals,
        winnowing_fingerprint_positions,
    )

    rng = random.Random(11)
    alpha = "abcdefghijklmnop "
    boiler = "".join(rng.choice(alpha) for _ in range(60))
    docs = []
    for i in range(60):
        body = "".join(rng.choice(alpha) for _ in range(500))
        docs.append((i, (boiler + body) if i % 10 == 0 else body))
    df = spark.createDataFrame(docs, "id long, text string")
    with pytest.raises(ValueError, match="winnowing guarantee"):
        exact_repeated_spans(df, "id", "text", min_len=5, k=8, window=4)
    with pytest.raises(ValueError, match="min_docs"):
        exact_repeated_spans(df, "id", "text", min_docs=1)
    # candidate coverage (re-derived exactly as the operator does: merged
    # common-fingerprint intervals, expanded by the default margin) must
    # be a small fraction of total chars on this mostly-unique corpus
    fps = winnowing_fingerprint_positions(df, "id", "text", 8, 4)
    common = (
        fps.groupBy("fingerprint")
        .agg(F.count_distinct("id").alias("df"))
        .where(F.col("df") >= 2)
        .select("fingerprint")
    )
    cov = fps.join(common, "fingerprint").select(
        "id", F.col("pos").alias("s"), (F.col("pos") + 7).alias("e")
    )
    m = 50 + 4 + 8
    cand = merge_intervals(cov, "id", "s", "e").select(
        "id",
        F.greatest(F.lit(1), F.col("span_start") - m).alias("s"),
        (F.col("span_end") + m).alias("e"),
    )
    cand_chars = (
        merge_intervals(cand, "id", "s", "e")
        .agg(F.sum("span_len"))
        .first()[0]
        or 0
    )
    total_chars = sum(len(t) for _, t in docs)
    assert cand_chars < 0.25 * total_chars, (cand_chars, total_chars)
    # and the operator still finds exactly the planted repeats
    got = exact_repeated_spans(df, "id", "text", min_len=50).collect()
    assert sorted(r["id"] for r in got) == [i for i in range(60) if i % 10 == 0]


def test_exact_contamination_spans_matches_bruteforce(spark):
    """Cross-table surgery: corpus docs with planted benchmark fragments
    (60-90 chars, mid-document) must yield exactly the brute-force
    corpus-gram ∩ benchmark-gram span set; clean docs yield nothing; a
    margin below the recall bound is rejected."""
    import random
    import re

    import pytest

    from mr_dice_spark.operators.winnowing import exact_contamination_spans

    def norm(t):
        return re.sub(r"[ \t\n\r\f\x0B]+", " ", t.strip()).lower()

    rng = random.Random(9)
    alpha = "abcdefgh "
    bench = {j: "".join(rng.choice(alpha) for _ in range(200)) for j in range(5)}
    corpus = {}
    for i in range(30):
        body = "".join(rng.choice(alpha) for _ in range(rng.randint(80, 250)))
        if rng.random() < 0.4:
            j = rng.randrange(5)
            st = rng.randrange(100)
            frag = bench[j][st : st + rng.randint(60, 90)]
            cut = len(body) // 2
            corpus[i] = body[:cut] + frag + body[cut:]
        else:
            corpus[i] = body
    L = 50
    grams_b = {
        norm(t)[q : q + L]
        for t in bench.values()
        for q in range(len(norm(t)) - L + 1)
    }
    exp = []
    for i, t in corpus.items():
        s = norm(t)
        ivs = [
            (q + 1, q + L)
            for q in range(len(s) - L + 1)
            if s[q : q + L] in grams_b
        ]
        if not ivs:
            continue
        cs, ce = ivs[0]
        for s_, e_ in ivs[1:]:
            if s_ <= ce + 1:
                ce = max(ce, e_)
            else:
                exp.append((i, cs, ce, ce - cs + 1))
                cs, ce = s_, e_
        exp.append((i, cs, ce, ce - cs + 1))
    dfc = spark.createDataFrame(list(corpus.items()), "id long, text string")
    dfb = spark.createDataFrame(list(bench.items()), "bid long, btext string")
    got = sorted(
        tuple(r)
        for r in exact_contamination_spans(
            dfc, dfb, "id", "text",
            cont_id_col="bid", cont_text_col="btext", min_len=L,
        ).collect()
    )
    assert got == sorted(exp)
    assert got, "fixture planted contamination but none was found"
    with pytest.raises(ValueError, match="recall bound"):
        exact_contamination_spans(
            dfc, dfb, "id", "text",
            cont_id_col="bid", cont_text_col="btext", min_len=L, margin=10,
        )
