"""Unit tests for the Gopher/C4 rule filters and tokenizer statistics
(operators/quality_rules.py, operators/vocab.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mr_dice_spark.operators.quality_rules import c4_line_filter, gopher_quality_flags
from mr_dice_spark.operators.vocab import bpe_pair_stats, ngram_novelty


def _one(df, **kw):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_gopher_flags_hand_computed(spark):
    """Every metric on a single hand-computable document: 4 lines, one
    duplicated; a bullet line; an ellipsis line."""
    text = "\n".join(
        [
            "the cat sat on the mat",   # 6 words, 17 word-chars
            "the cat sat on the mat",   # duplicate line
            "- bullet item three",      # bullet, 4 words ('-' counts), 16 word-chars
            "trailing off now...",      # ellipsis, 3 words, 17 word-chars
        ]
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = _one(gopher_quality_flags(df, "doc_id", "text", min_words=5))
    assert r["n_lines"] == 4 and r["n_words"] == 19
    assert r["bullet_line_frac"] == 0.25 and r["ellipsis_line_frac"] == 0.25
    assert r["dup_line_frac"] == 0.25  # 4 lines, 3 distinct
    # dup chars: one extra copy of a 22-char line over 22+22+19+19 chars
    assert r["dup_line_char_frac"] == round(22 / 82 + 1e-9, 6)
    assert r["mean_word_len"] == round((17 + 17 + 16 + 17) / 19 + 1e-9, 6)
    assert r["alpha_word_frac"] == round(18 / 19 + 1e-9, 6)  # '-' is non-alpha
    assert r["stopword_hits"] == 1  # only 'the' from the Gopher list


def test_gopher_stopwords_word_boundary(spark):
    """'there'/'toto' must NOT satisfy the 'the'/'to' required-stopword
    rule — matches are word-boundary, not substring."""
    df = spark.createDataFrame(
        [(1, "there toto andover"), (2, "the to and")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_quality_flags(df, "doc_id", "text").collect()}
    assert out[1]["stopword_hits"] == 0
    assert out[2]["stopword_hits"] == 3


def test_gopher_empty_text_never_kept(spark):
    """A whitespace-only document has 0 words, NULL ratios, keep=false —
    NULL thresholds must not leak a true."""
    df = spark.createDataFrame([(1, "   ")], "doc_id long, text string")
    r = _one(gopher_quality_flags(df, "doc_id", "text", min_words=0))
    assert r["n_words"] == 0
    assert r["mean_word_len"] is None and r["alpha_word_frac"] is None
    assert r["keep"] is False


def test_c4_line_rules(spark):
    """Line keep = terminal punctuation AND >= 3 words AND no
    'javascript' (case-insensitive); order of surviving lines is
    preserved."""
    text = "\n".join(
        [
            "no terminal punctuation here",   # dropped: punctuation
            "only two.",                      # dropped: < 3 words
            "uses JavaScript heavily today.", # dropped: javascript
            "this one stays in!",
            'a quoted keeper line."',
            "third keeper line here?",
        ]
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = _one(c4_line_filter(df, "doc_id", "text"))
    assert r["n_lines"] == 6 and r["n_kept"] == 3 and r["keep"] is True
    assert r["cleaned_text"].split("\n") == [
        "this one stays in!",
        'a quoted keeper line."',
        "third keeper line here?",
    ]


def test_c4_page_rules(spark):
    """Brace and lorem-ipsum pages drop regardless of kept lines; a page
    under min_kept_lines drops with its cleaned_text still emitted."""
    good = "one fine line here.\nand another good one.\na third to be safe."
    df = spark.createDataFrame(
        [
            (1, good),
            (2, good + "\nvar x = { a: 1 }."),
            (3, good + "\nLorem Ipsum filler text."),
            (4, "just one survivor line."),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in c4_line_filter(df, "doc_id", "text").collect()}
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["has_brace"]
    assert out[3]["keep"] is False and out[3]["has_lorem"]
    assert out[4]["keep"] is False and out[4]["n_kept"] == 1
    assert out[4]["cleaned_text"] == "just one survivor line."


def test_c4_is_shuffle_free(spark):
    """The operator is a narrow map: no Exchange in its physical plan —
    the property that lets it pipeline inside the scan stage at 100 TB."""
    df = spark.createDataFrame([(1, "a b c.")], "doc_id long, text string")
    plan = c4_line_filter(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bpe_pair_stats_hand_computed(spark):
    """'aab' x2 + 'ab': pairs aa(2), ab(3); rank ties break on pair
    string; single-char words contribute nothing."""
    df = spark.createDataFrame(
        [(1, "aab aab ab x"), (2, "")], "doc_id long, text string"
    )
    rows = bpe_pair_stats(df, "text").collect()
    assert [(r["pair"], r["n_occurrences"], r["rank"]) for r in rows] == [
        ("ab", 3, 1),
        ("aa", 2, 2),
    ]


def test_bpe_pair_stats_tie_rank_deterministic(spark):
    """Equal counts order by pair ascending."""
    df = spark.createDataFrame([(1, "xy ab")], "doc_id long, text string")
    rows = bpe_pair_stats(df, "text").collect()
    assert [(r["pair"], r["rank"]) for r in rows] == [("ab", 1), ("xy", 2)]


def test_ngram_novelty_attribution(spark):
    """A verbatim re-crawl scores 0; the original scores 1; a doc below
    n words is excluded; novelty counts DISTINCT grams (repeats inside a
    doc don't inflate)."""
    df = spark.createDataFrame(
        [
            (1, "a b c a b c"),   # grams: 'a b c','b c a','c a b' (distinct 4-gram window) -> distinct set
            (2, "a b c a b c"),   # exact re-crawl of doc 1
            (3, "z z"),           # < 3 words: excluded
            (4, "q r s"),         # fresh
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(df, "doc_id", "text", n=3).collect()}
    assert set(out) == {1, 2, 4}
    assert out[1]["novelty_frac"] == 1.0
    assert out[2]["n_novel"] == 0 and out[2]["novelty_frac"] == 0.0
    assert out[4]["n_grams"] == 1 and out[4]["novelty_frac"] == 1.0
    # 4 gram positions but 'a b c' repeats: 3 DISTINCT grams
    assert out[1]["n_grams"] == out[2]["n_grams"] == 3


def test_vocab_coverage_oov_math(spark):
    """vocab_size=1 keeps only the most frequent word ('a', freq 3);
    every other token is OOV, counted WITH multiplicity."""
    from mr_dice_spark.operators.vocab import vocab_coverage

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c c c"), (3, "  ")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in vocab_coverage(df, "doc_id", "text", vocab_size=1).collect()}
    assert set(out) == {1, 2}  # whitespace-only doc has no tokens
    assert out[1]["n_tokens"] == 3 and out[1]["n_oov"] == 1
    assert out[2]["n_tokens"] == 4 and out[2]["n_oov"] == 3
    assert out[2]["oov_frac"] == 0.75


def test_vocab_coverage_tie_break_deterministic(spark):
    """Equal-frequency words admit by word ascending: with vocab_size=1
    and all counts equal, 'a' wins over 'b'/'c'."""
    from mr_dice_spark.operators.vocab import vocab_coverage

    df = spark.createDataFrame([(1, "b c a")], "doc_id long, text string")
    r = vocab_coverage(df, "doc_id", "text", vocab_size=1).collect()[0]
    assert r["n_oov"] == 2  # only 'a' in vocab


def test_dedup_connected_best_keeps_longest(spark):
    """Component {1,2,3} (chain 1-2, 2-3) keeps the max-metric member
    (id 2, len 9); ties inside component {4,5} break to the min id;
    unpaired rows survive."""
    from mr_dice_spark.operators.components import dedup_connected_best

    df = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 7), (4, 4), (5, 4), (6, 1)],
        "doc_id long, n long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup_connected_best(df, pairs, "doc_id", best_by="n").collect()
    )
    assert kept == [2, 4, 6]


def test_mixture_upsample_epochs_integer_and_fractional(spark):
    """Integer epochs replicate exactly; 0 drops the group; a missing
    group is dropped; epoch indices are 0..total-1; invalid counts
    raise."""
    import pytest

    from mr_dice_spark.operators.sampling import mixture_upsample_epochs

    df = spark.createDataFrame(
        [(i, "a" if i < 4 else ("b" if i < 8 else "c")) for i in range(12)],
        "doc_id long, lang string",
    )
    out = mixture_upsample_epochs(df, "lang", {"a": 3.0, "b": 0.0}, "doc_id")
    rows = out.collect()
    assert all(r["lang"] == "a" for r in rows)          # b zeroed, c absent
    assert len(rows) == 12                              # 4 docs x 3 epochs
    per = {}
    for r in rows:
        per.setdefault(r["doc_id"], []).append(r["epoch"])
    assert all(sorted(v) == [0, 1, 2] for v in per.values())
    with pytest.raises(ValueError, match="bad epoch"):
        mixture_upsample_epochs(df, "lang", {"a": -1.0}, "doc_id")
    with pytest.raises(ValueError, match="bad epoch"):
        mixture_upsample_epochs(df, "lang", {"a": float("nan")}, "doc_id")


def test_mixture_upsample_fractional_rate_and_determinism(spark):
    """Fractional inclusion tracks the rate over many keys and is
    identical across runs (pure function of key and seed)."""
    from mr_dice_spark.operators.sampling import mixture_upsample_epochs

    df = spark.createDataFrame(
        [(i, "g") for i in range(2000)], "doc_id long, lang string"
    )
    a = mixture_upsample_epochs(df, "lang", {"g": 1.5}, "doc_id", seed="x")
    n1 = a.count()
    assert 2000 + 800 < n1 < 2000 + 1200  # ~1000 fractional copies
    n2 = mixture_upsample_epochs(df, "lang", {"g": 1.5}, "doc_id", seed="x").count()
    assert n1 == n2


def test_minhash_recall_audit_exact_dups_always_hit(spark):
    """Exact duplicates share the whole signature, so every band
    proposes them: the 1.0 bucket must show recall 1.0; divisibility is
    validated."""
    import pytest

    from mr_dice_spark.operators.dedup import minhash_recall_audit

    t = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(1, t), (2, t), (3, "totally different words here now ok yes")],
        "doc_id long, text string",
    )
    rows = {r["bucket_lo"]: r for r in minhash_recall_audit(df, "doc_id", "text").collect()}
    assert rows[1.0]["n_true"] == 1 and rows[1.0]["recall"] == 1.0
    with pytest.raises(ValueError, match="divisible"):
        minhash_recall_audit(df, "doc_id", "text", num_hashes=8, bands=3)


def test_compression_ratio_stats_semantics(spark):
    """Repetitive text compresses far below 1; short text pays the zlib
    header (> 1); NULL stays NULL; empty text has NULL ratio; values
    match python zlib exactly."""
    import zlib

    from mr_dice_spark.functions.text import compression_ratio_stats

    rep = "abc " * 500
    df = spark.createDataFrame(
        [(1, rep), (2, "x"), (3, None), (4, "")], "id long, text string"
    )
    out = {r["id"]: r for r in compression_ratio_stats(df, "id", "text").collect()}
    assert out[1]["n_compressed"] == len(zlib.compress(rep.encode(), 6))
    assert out[1]["ratio"] < 0.05
    assert out[2]["ratio"] > 1.0
    assert out[3]["n_bytes"] is None and out[3]["ratio"] is None
    assert out[4]["n_bytes"] == 0 and out[4]["ratio"] is None


def test_nfc_normalize_composes_and_preserves(spark):
    """Decomposed e+COMBINING ACUTE composes to U+00E9; already-composed
    and plain ASCII are unchanged; NULL passes through."""
    from mr_dice_spark.functions.text import nfc_normalize
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "café"), (2, "café"), (3, "plain"), (4, None)],
        "id long, t string",
    )
    out = {r["id"]: r["n"] for r in df.select("id", nfc_normalize(F.col("t")).alias("n")).collect()}
    assert out[1] == out[2] == "café"
    assert out[3] == "plain" and out[4] is None


def test_gopher_and_c4_null_text_fail_closed(spark):
    """NULL-text documents must appear in BOTH gates' output with
    keep=false (code-review r4): gopher's line aggregates see no rows
    for them (left-joined back), and c4's split/contains go NULL
    (coalesced). Silent row loss or a NULL keep is invisible to both
    keep and ~keep filters downstream."""
    df = spark.createDataFrame(
        [(1, "the fine text here with that and have with a dozen words"),
         (2, None)],
        "doc_id long, text string",
    )
    g = {r["doc_id"]: r for r in gopher_quality_flags(df, "doc_id", "text", min_words=3).collect()}
    assert set(g) == {1, 2}
    assert g[2]["n_lines"] == 0 and g[2]["n_words"] == 0
    assert g[2]["keep"] is False and g[2]["stopword_hits"] == 0
    c = {r["doc_id"]: r for r in c4_line_filter(df, "doc_id", "text").collect()}
    assert set(c) == {1, 2}
    assert c[2]["keep"] is False and c[2]["n_lines"] == 0
    assert c[2]["cleaned_text"] == "" and c[2]["has_brace"] is False


def test_gopher_unicode_ellipsis_counts_as_symbol(spark):
    """'…' contributes to the symbol ratio exactly like '...' — the
    line rule already treated them as equivalent."""
    df = spark.createDataFrame(
        [(1, "w1 w2 … w3"), (2, "w1 w2 ... w3")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in gopher_quality_flags(df, "doc_id", "text").collect()}
    assert out[1]["symbol_ratio"] == out[2]["symbol_ratio"] == 0.25


def test_bpe_pair_stats_uses_take_ordered_top_k(spark):
    """Global top-K compiles to TakeOrderedAndProject, not a single-
    partition global window over the whole pair table (PERFORMANCE.md
    finding 12 applied to this operator too)."""
    df = spark.createDataFrame([(1, "ab ab cd")], "doc_id long, text string")
    out = bpe_pair_stats(df, "text", top_k=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert [(r["pair"], r["rank"]) for r in out.collect()] == [("ab", 1)]


def test_bloom_prescreen_superset_and_fp_regime(spark):
    """No false negatives at ANY filter size (a truly shared gram always
    passes), and a deliberately tiny filter (m=16) forces false
    positives — the prescreen must report them as maybe-shared, never
    drop them."""
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.decontaminate import (
        bloom_prescreen_stats,
        contamination_stats,
    )

    probe = spark.createDataFrame(
        [(1, "the quick brown fox jumps over a lazy dog tonight")],
        "id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps high"),       # truly shared grams
            (11, "completely different words entirely here now"),
            (12, "unrelated content about spark physical plans"),
            (13, "ab"),                                    # too short: 0 grams
        ],
        "id long, text string",
    )
    exact = {
        r["id"]: r["n_shared"]
        for r in contamination_stats(corpus, "id", "text", probe, "text", n=3).collect()
    }
    for m in (16, 1 << 18):
        pre = {
            r["id"]: r
            for r in bloom_prescreen_stats(
                corpus, "id", "text", probe, "text", n=3, m=m, k=3
            ).collect()
        }
        for i, n_shared in exact.items():
            assert pre[i]["n_maybe_shared"] >= n_shared, (m, i)
        assert pre[10]["prescreen_hit"]
        assert pre[13]["n_grams"] == 0 and not pre[13]["prescreen_hit"]
    # m=16: nearly every position is set, so the clean docs false-positive
    tiny = {
        r["id"]: r
        for r in bloom_prescreen_stats(
            corpus, "id", "text", probe, "text", n=3, m=16, k=3
        ).collect()
    }
    assert tiny[11]["prescreen_hit"] or tiny[12]["prescreen_hit"]
    # the honest filter keeps them clean
    big = {
        r["id"]: r
        for r in bloom_prescreen_stats(
            corpus, "id", "text", probe, "text", n=3, m=1 << 18, k=3
        ).collect()
    }
    assert not big[11]["prescreen_hit"] and not big[12]["prescreen_hit"]


def test_quality_percentile_blend_nulls_and_weights(spark):
    """NULL signals drop out of the row's weight mass (renormalized);
    all-NULL rows blend NULL; uniform data maps to in-(0,1) midpoints;
    validation rejects empty/nonpositive specs."""
    import pytest
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.curation import quality_percentile_blend

    rows = [(i, float(i), float(100 - i)) for i in range(1, 101)]
    rows += [(101, None, 50.0), (102, None, None)]
    df = spark.createDataFrame(rows, "id long, a double, b double")
    out = {
        r["id"]: r
        for r in quality_percentile_blend(
            df, "id", {"a": 0.75, "b": 0.25}, n_bins=10
        ).collect()
    }
    # monotone signal: row 1 in the lowest decile, row 100 in the top
    assert out[1]["pct_a"] == pytest.approx(0.05, abs=1e-9)
    assert out[100]["pct_a"] == pytest.approx(0.95, abs=1e-9)
    # b is anti-monotone: the blend weighs 0.75 a + 0.25 b
    assert out[100]["blend_score"] == pytest.approx(
        0.75 * 0.95 + 0.25 * 0.05, abs=1e-6
    )
    # NULL a -> blend = pct_b alone (weight renormalized to b)
    assert out[101]["pct_a"] is None
    assert out[101]["blend_score"] == pytest.approx(out[101]["pct_b"], abs=1e-9)
    assert out[102]["blend_score"] is None
    with pytest.raises(ValueError):
        quality_percentile_blend(df, "id", {})
    with pytest.raises(ValueError):
        quality_percentile_blend(df, "id", {"a": 0.0})


def _bpe_reference(word_freqs: dict, k: int):
    """Pure-Python greedy BPE: the independent third implementation the
    bpe_train_merges golden cites (argmax by (count DESC, left, right),
    merge applied left-to-right non-overlapping)."""
    from collections import Counter

    syms = {w: list(w) for w in word_freqs}
    out = []
    for rank in range(1, k + 1):
        pc = Counter()
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((rank, a, b, c))
        m = a + b
        for w, s in syms.items():
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(m)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            syms[w] = ns
    return out


def test_bpe_train_merges_matches_python_reference(spark):
    """Overlap-heavy corpus ('aaaa' runs force the a==a parity path,
    repeated merges force multi-char re-pairing) must match the
    independent fold-free Python implementation exactly."""
    from mr_dice_spark.operators.vocab import bpe_train_merges

    docs = [
        "aaaa aaa banana bandana",
        "banana banana bandana aaaa",
        "abab ababab banana",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)],
                               "doc_id long, text string")
    from collections import Counter
    wf = Counter(w for t in docs for w in t.split())
    want = _bpe_reference(dict(wf), 6)
    got = [tuple(r) for r in bpe_train_merges(df, "text", 6).collect()]
    assert got == want
    import pytest
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train_merges(df, "text", 0)


def test_bpe_encode_stats_hand_merges(spark):
    """Known merges applied to a tiny corpus: 'banana' under
    [(a,n), (an,a)] -> b|an|an|a -> b|ana|na? NO — greedy left fold:
    chars b,a,n,a,n,a; merge (a,n): b,an,an,a (4 symbols); merge
    (an,a): b,ana,n? NO — fold over [b,an,an,a]: an+a merges at the
    SECOND an -> [b,an,ana] (3 symbols). Verified by hand against the
    training fold's non-overlap rule; fertility = tokens/words."""
    from mr_dice_spark.operators.vocab import bpe_encode_stats

    rows = [(1, "banana banana", "en"), (2, "bab", "en"), (3, "banana", "de")]
    df = spark.createDataFrame(rows, "id long, text string, lang string")
    out = {r["lang"]: r for r in
           bpe_encode_stats(df, "text", [("a", "n"), ("an", "a")], "lang").collect()}
    # banana -> [b, an, ana] = 3 tokens; bab -> [b, a, b] = 3 tokens
    assert out["en"]["n_words"] == 3 and out["en"]["n_tokens"] == 3 * 2 + 3
    assert out["de"]["n_words"] == 1 and out["de"]["n_tokens"] == 3
    assert out["en"]["n_distinct_words"] == 2
    assert abs(out["en"]["fertility"] - 3.0) < 1e-12


def test_bpe_encode_matches_train_application(spark):
    """Round-trip: encoding the TRAINING corpus with the trained merges
    must reproduce the symbol lengths the trainer's own folds left
    behind (shared-fold invariant)."""
    from mr_dice_spark.functions.text import tokens as tok
    from mr_dice_spark.operators.vocab import bpe_encode_stats, bpe_train_merges
    from pyspark.sql import functions as F

    rows = [(i, t) for i, t in enumerate(
        ["low lower lowest", "new newer newest", "low new low"] * 3
    )]
    df = spark.createDataFrame(rows, "id long, text string")
    merges = [(r["left_sym"], r["right_sym"])
              for r in bpe_train_merges(df, "text", 5).collect()]
    assert len(merges) == 5
    [enc] = bpe_encode_stats(df, "text", merges).collect()
    # independent python re-application
    def apply(word):
        s = list(word)
        for a, b in merges:
            out = []
            for ch in s:
                if out and out[-1] == a and ch == b:
                    out[-1] = a + b
                else:
                    out.append(ch)
            s = out
        return len(s)
    words = [w for _, t in rows for w in t.split()]
    assert enc["n_words"] == len(words)
    assert enc["n_tokens"] == sum(apply(w) for w in words)


def test_heaps_law_extremes(spark):
    """All-unique words -> V(n) = n exactly, so beta = 1 and r2 = 1;
    a fixed-vocabulary loop flattens to beta near 0."""
    from mr_dice_spark.operators.vocab import heaps_law_fit

    uniq = [(i, f"w{i}a w{i}b w{i}c") for i in range(40)]
    df = spark.createDataFrame(uniq, "doc_id long, text string")
    [r] = heaps_law_fit(df, "doc_id", "text").collect()
    assert r["vocab"] == 120 and r["total_tokens"] == 120
    assert abs(r["beta"] - 1.0) < 1e-6 and abs(r["r2"] - 1.0) < 1e-6

    flat = [(i, "the same five words again") for i in range(40)]
    df2 = spark.createDataFrame(flat, "doc_id long, text string")
    [r2] = heaps_law_fit(df2, "doc_id", "text").collect()
    assert r2["vocab"] == 5
    assert abs(r2["beta"]) < 0.2


def test_prefix_sums_matches_single_window_any_partitioning(spark):
    """The distributed two-pass prefix sum must equal the plain global
    running sum on every row, for multiple columns, regardless of input
    partitioning (the partitioning-independence contract)."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.scale import prefix_sums

    rng = random.Random(23)
    rows = [(i, rng.randint(0, 9), rng.randint(0, 5)) for i in range(500)]
    for nparts in (1, 7):
        df = spark.createDataFrame(rows, "k long, a long, b long").repartition(nparts)
        got = {
            r["k"]: (r["a_cum"], r["b_cum"])
            for r in prefix_sums(df, "k", ["a", "b"], num_partitions=5).collect()
        }
        w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
        ref = {
            r["k"]: (r["ca"], r["cb"])
            for r in spark.createDataFrame(rows, "k long, a long, b long")
            .select("k", F.sum("a").over(w).alias("ca"), F.sum("b").over(w).alias("cb"))
            .collect()
        }
        assert got == ref


def test_prefix_sums_double_and_mixed_value_columns(spark):
    """Running sums over non-integral columns: the offset frame must
    mirror Spark's SUM result types (double stays double, int widens to
    long) instead of hardcoding long (ADVICE r5 — this raised TypeError
    at createDataFrame before)."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.scale import prefix_sums

    rng = random.Random(31)
    rows = [(i, round(rng.uniform(-5, 5), 3), rng.randint(0, 9)) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, x double, n int").repartition(5)
    out = prefix_sums(df, "k", ["x", "n"], num_partitions=4)
    assert dict(out.dtypes)["x_cum"] == "double"
    assert dict(out.dtypes)["n_cum"] == "bigint"
    got = {r["k"]: (r["x_cum"], r["n_cum"]) for r in out.collect()}
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    ref = {
        r["k"]: (r["cx"], r["cn"])
        for r in spark.createDataFrame(rows, "k long, x double, n int")
        .select("k", F.sum("x").over(w).alias("cx"), F.sum("n").over(w).alias("cn"))
        .collect()
    }
    assert set(got) == set(ref)
    for k in got:
        assert abs(got[k][0] - ref[k][0]) < 1e-9 and got[k][1] == ref[k][1]
