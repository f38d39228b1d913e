"""Scalar-function tests (SURVEY.md §2.8 F11/F13/F14) + sketch tolerance."""

import pytest
from pyspark.sql import functions as F

from mr_dice_spark.catalog import Catalog
from mr_dice_spark.functions.ids import (
    convert_pressure,
    pick_identifier,
    pressure_unit_dim,
    shorten_id,
    validate_unit,
)
from mr_dice_spark.functions.text import LANG_PROFILES, detect_language


def test_shorten_id(spark):
    df = spark.createDataFrame(
        [("abcdefghijklmnopqrstuvwxyz",), ("short",)], "id string"
    )
    rows = [r[0] for r in df.select(shorten_id(F.col("id"))).collect()]
    assert rows == ["abcdef...uvwxyz", "short"]


def test_pick_identifier_priority(spark):
    df = spark.createDataFrame(
        [("n1", "k1", 1), (None, "k2", 2), (None, "", 3), ("  ", None, 4)],
        "name string, key string, id long",
    )
    got = [
        r[0]
        for r in df.select(
            pick_identifier(F.col("name"), F.col("key"), fallback=F.col("id"))
        ).collect()
    ]
    assert got == ["n1", "k2", "3", "4"]


def test_pressure_conversion(spark):
    df = spark.createDataFrame([(1.0,)], "p double")
    v = df.select(convert_pressure(F.col("p"), "bar", "kPa").alias("v")).first()["v"]
    assert v == pytest.approx(100.0)
    v = df.select(convert_pressure(F.col("p"), "atm", "Pa").alias("v")).first()["v"]
    assert v == pytest.approx(101325.0)
    with pytest.raises(ValueError, match="invalid unit"):
        validate_unit("furlongs")
    assert pressure_unit_dim(spark).count() == 8


def test_detect_language_markers(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the hat is in the bag",),
            ("der hund und die katze ist nicht da",),
            ("xyzzy plugh qwerty",),
        ],
        "text string",
    )
    got = [r[0] for r in df.select(detect_language(F.col("text"))).collect()]
    assert got == ["en", "de", "und"]
    assert set(LANG_PROFILES) == {"de", "en", "es", "fr", "zh"}


def test_approx_distinct_within_tolerance(spark, oracle_sf_dir):
    ev = Catalog(spark, oracle_sf_dir).events
    row = ev.agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("a"),
        F.count_distinct("user_id").alias("e"),
    ).first()
    assert abs(row["a"] - row["e"]) / row["e"] < 0.02


def test_deterministic_sample_properties(spark, oracle_sf_dir):
    from mr_dice_spark.operators.sampling import deterministic_sample

    ev = Catalog(spark, oracle_sf_dir).events
    total = ev.count()
    s1 = deterministic_sample(ev, "event_id", 0.2)
    s2 = deterministic_sample(ev, "event_id", 0.2)
    n1 = s1.count()
    assert n1 == s2.count()  # bit-for-bit repeatable
    assert abs(n1 / total - 0.2) < 0.02  # binomial deviation at ~200k rows
    # nested fractions: a 10% sample is a subset of the 20% sample
    s_small = deterministic_sample(ev, "event_id", 0.1)
    assert s_small.join(s1, "event_id", "left_anti").count() == 0
    # different seed decorrelates membership
    s_seeded = deterministic_sample(ev, "event_id", 0.2, seed="v2/")
    overlap = s1.join(s_seeded, "event_id", "inner").count()
    assert abs(overlap / total - 0.04) < 0.01  # ~= 0.2 * 0.2


def test_shuffle_shards_deterministic_permutation(spark, oracle_sf_dir):
    """shuffle_shards: partitioning-invariant permutation, complete
    (shard, rank) keying, seed decorrelation, no global sort in the plan."""
    import pytest as _pytest

    from mr_dice_spark.operators.sampling import shuffle_shards

    docs = Catalog(spark, oracle_sf_dir).documents
    a = {r["doc_id"]: (r["shard"], r["shard_rank"])
         for r in shuffle_shards(docs, "doc_id", 8).collect()}
    b = {r["doc_id"]: (r["shard"], r["shard_rank"])
         for r in shuffle_shards(docs.repartition(13), "doc_id", 8).collect()}
    assert a == b                         # input partitioning is irrelevant
    assert len(a) == docs.count()         # row-count preserving
    assert {s for s, _ in a.values()} <= set(range(8))
    # ranks within each shard are exactly 1..|shard| (a permutation)
    by_shard = {}
    for s, r in a.values():
        by_shard.setdefault(s, []).append(r)
    for s, ranks in by_shard.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), s
    # seed changes the permutation
    c = {r["doc_id"]: (r["shard"], r["shard_rank"])
         for r in shuffle_shards(docs, "doc_id", 8, seed="v2/").collect()}
    assert c != a
    # plan: window sort per shard, never a global Sort over all rows
    from mr_dice_spark.plans.inspect import formatted_plan

    plan = formatted_plan(shuffle_shards(docs, "doc_id", 8))
    assert "Exchange rangepartitioning" not in plan
    with pytest.raises(ValueError):
        shuffle_shards(docs, "doc_id", 0)


def test_redact_pii(spark):
    from mr_dice_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@mail.example.org now"),
            (2, "host 192.168.1.254 call +1 (555) 123-4567"),
            (3, "see https://ex.com/a?b=c#d ok"),
            (4, "clean text, just 3.14"),
        ],
        "i long, text string",
    )
    got = {r["i"]: r["r"] for r in df.select("i", redact_pii(F.col("text")).alias("r")).collect()}
    assert got[1] == "mail <EMAIL> now"
    assert got[2] == "host <IP> call <PHONE>"
    assert got[3] == "see <URL> ok"
    assert got[4] == "clean text, just 3.14"


def test_tfidf_top_terms_rare_term_wins(spark):
    from mr_dice_spark.operators.terms import tfidf_top_terms

    # 'rare' appears once in doc 1; 'common' appears in every doc. With
    # N=5 docs, idf(rare) = ln(6/2)+1 ~ 2.10 outranks tf=2 * idf(common)=1.
    df = spark.createDataFrame(
        [
            (1, "common rare common"),
            (2, "common common common"),
            (3, "common other common"),
            (4, "common common"),
            (5, "common common"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, "doc_id", "text", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # rank-1 term for doc 1 must be the rare term despite lower tf
    assert by_doc[1][0]["term"] == "rare"
    assert all(len(v) <= 2 for v in by_doc.values())
    assert all(r["score"] > 0 for r in out)
    # ranks are 1..k dense per doc
    assert [r["rank"] for r in by_doc[1]] == [1, 2]


def test_redact_pii_cross_engine_fuzz(spark):
    """Seeded fuzz: the Java-regex and RE2 redaction chains must agree on
    adversarial near-PII strings (partial emails, dotted quads, digit runs,
    URL fragments) — the portability contract behind pii_redaction_probe."""
    import random

    import duckdb

    from mr_dice_spark.functions.text import pii_oracle_sql, redact_pii

    rng = random.Random(42)
    frags = [
        "a@b", "@", "x.y", "..", "10.0.0.1", "999.999.999.999", "1.2.3.4.5",
        "http://", "https://x", "ftp://x", "+", "()", "555", "(555)",
        "+1 555 123 4567", "word", "W0rd9", "%", "_", "-", ".com", "a@b.co",
        "  ", ".", "e@", "3.14159", "v2.0.1", "127.0.0.1:8080", "tel:",
    ]
    samples = [
        " ".join(rng.choice(frags) for _ in range(rng.randint(1, 12)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i long, text string"
    )
    got = {
        r["i"]: r["r"]
        for r in df.select("i", redact_pii(F.col("text")).alias("r")).collect()
    }
    con = duckdb.connect()
    try:
        for i, s in enumerate(samples):
            want = con.execute(
                f"SELECT {pii_oracle_sql('?')}", [s]
            ).fetchone()[0]
            assert got[i] == want, f"engines disagree on {s!r}: {got[i]!r} vs {want!r}"
    finally:
        con.close()


def test_decontaminate_drops_overlapping_docs(spark):
    from mr_dice_spark.operators.decontaminate import contamination_stats, decontaminate

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),      # shares 'alpha beta gamma'
            (2, "epsilon zeta eta theta"),      # clean
            (3, "one two"),                     # too short for a 3-gram
        ],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame(
        [("alpha beta gamma something else",)], "text string"
    )
    stats = {
        r["doc_id"]: r
        for r in contamination_stats(corpus, "doc_id", "text", probe, "text").collect()
    }
    assert stats[1]["contaminated"] and stats[1]["n_shared"] == 1
    assert not stats[2]["contaminated"] and stats[2]["n_shared"] == 0
    assert stats[3]["n_grams"] == 0 and stats[3]["share"] == 0.0
    kept = {r["doc_id"] for r in decontaminate(corpus, "doc_id", "text", probe, "text").collect()}
    assert kept == {2, 3}
    # a permissive threshold keeps the lightly-contaminated doc (share 1/2)
    kept_loose = {
        r["doc_id"]
        for r in decontaminate(corpus, "doc_id", "text", probe, "text", max_share=0.6).collect()
    }
    assert kept_loose == {1, 2, 3}


def test_pack_sequences_spans_and_partition_invariance(spark):
    from mr_dice_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 0), (4, 64), (5, 3), (6, 130)],
        "doc_id long, nt long",
    )
    rows = {
        r["doc_id"]: r
        for r in pack_sequences(df, "doc_id", F.col("nt"), 64).collect()
    }
    # stream: d1 [0,10) d2 [10,60) d3 [] d4 [60,124) d5 [124,127) d6 [127,257)
    assert (rows[1]["first_seq"], rows[1]["last_seq"], rows[1]["n_seqs"]) == (0, 0, 1)
    assert (rows[4]["first_seq"], rows[4]["last_seq"], rows[4]["n_seqs"]) == (0, 1, 2)
    assert rows[3]["first_seq"] is None and rows[3]["n_seqs"] == 0
    assert (rows[6]["first_seq"], rows[6]["last_seq"], rows[6]["n_seqs"]) == (1, 4, 4)
    # offsets are contiguous in id order
    ordered = [rows[i] for i in sorted(rows)]
    for a, b in zip(ordered, ordered[1:]):
        assert b["start_offset"] == a["start_offset"] + a["n_tokens"]
    # result is invariant to the physical partitioning of the scan
    alt = {
        r["doc_id"]: r
        for r in pack_sequences(df, "doc_id", F.col("nt"), 64, num_partitions=3).collect()
    }
    for i in rows:
        assert tuple(rows[i]) == tuple(alt[i])


def test_pack_sequences_rejects_bad_seq_len(spark):
    from mr_dice_spark.operators.packing import pack_sequences

    df = spark.createDataFrame([(1, 5)], "doc_id long, nt long")
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(df, "doc_id", F.col("nt"), 0)


def test_apportion_weighted_caps_and_redistributes():
    from mr_dice_spark.operators.sampling import apportion_weighted

    # uncapped: pure largest-remainder
    assert apportion_weighted(
        {"a": 100, "b": 100, "c": 100}, {"a": 0.5, "b": 0.3, "c": 0.2}, 10
    ) == {"a": 5, "b": 3, "c": 2}
    # capped group passes its shortfall to the others by renormalized weight
    got = apportion_weighted({"a": 5, "b": 100, "c": 100}, {"a": 0.5, "b": 0.25, "c": 0.25}, 40)
    assert got["a"] == 5 and got["b"] + got["c"] == 35
    # demand beyond total availability takes everything
    assert apportion_weighted({"a": 3, "b": 4}, {"a": 0.5, "b": 0.5}, 100) == {"a": 3, "b": 4}
    # unweighted groups contribute nothing
    assert apportion_weighted({"a": 10, "b": 10}, {"a": 1.0}, 6) == {"a": 6, "b": 0}
    assert apportion_weighted({}, {"a": 1.0}, 6) == {}


def test_mixture_sample_hits_targets_and_is_deterministic(spark):
    from mr_dice_spark.operators.sampling import mixture_sample

    rows = [(i, "a" if i % 3 else "b") for i in range(300)]
    df = spark.createDataFrame(rows, "k long, grp string")
    out = mixture_sample(df, "grp", {"a": 0.75, "b": 0.25}, 40, "k")
    by = {g: 0 for g in ("a", "b")}
    for r in out.collect():
        by[r["grp"]] += 1
    assert by == {"a": 30, "b": 10}
    # repeatable set
    ids1 = {r["k"] for r in out.collect()}
    ids2 = {r["k"] for r in mixture_sample(df, "grp", {"a": 0.75, "b": 0.25}, 40, "k").collect()}
    assert ids1 == ids2


def test_temperature_mixture_alpha_semantics(spark):
    from mr_dice_spark.operators.sampling import temperature_mixture_sample

    import pytest

    # 900 'big' rows vs 100 'small' rows
    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, grp string")

    def shares(alpha):
        out = temperature_mixture_sample(df, "grp", 100, "k", alpha=alpha)
        by = {"big": 0, "small": 0}
        for r in out.collect():
            by[r["grp"]] += 1
        return by

    # alpha=1: natural proportions (largest remainder of 90/10)
    assert shares(1.0) == {"big": 90, "small": 10}
    # alpha=0.5: sqrt smoothing lifts the low-resource group
    # (30/(30+10) = 75%, 25%)
    assert shares(0.5) == {"big": 75, "small": 25}
    # alpha -> 0 approaches uniform
    assert shares(0.01) == {"big": 51, "small": 49} or shares(0.01) == {"big": 50, "small": 50}
    # availability cap redistributes: ask for more than 'small' holds
    out = temperature_mixture_sample(df, "grp", 400, "k", alpha=0.1)
    by = {"big": 0, "small": 0}
    for r in out.collect():
        by[r["grp"]] += 1
    assert by["small"] == 100 and by["big"] == 300
    # deterministic under re-run
    a = {r["k"] for r in temperature_mixture_sample(df, "grp", 100, "k", alpha=0.5).collect()}
    b = {r["k"] for r in temperature_mixture_sample(df, "grp", 100, "k", alpha=0.5).collect()}
    assert a == b
    with pytest.raises(ValueError):
        temperature_mixture_sample(df, "grp", 10, "k", alpha=0.0)


def test_weighted_sample_without_replacement(spark):
    from mr_dice_spark.operators.sampling import (
        weighted_sample_without_replacement as wswr,
    )

    rows = [(i, 1.0) for i in range(1, 1000)] + [(1000, 1e12), (1001, None), (1002, 0.0), (1003, -2.0)]
    df = spark.createDataFrame(rows, "k long, w double")
    picked = {r["k"] for r in wswr(df, "k", "w", 100, seed="t/").collect()}
    assert len(picked) == 100
    # an overwhelming weight is (numerically) always selected:
    # r = u^(1/1e12) ~ 1 - eps beats every unit-weight u
    assert 1000 in picked
    # NULL / zero / negative weights never qualify
    assert picked.isdisjoint({1001, 1002, 1003})
    # NaN weights never qualify either (Spark orders NaN above every
    # double, so an unguarded NaN would PASS > 0 and rank FIRST)
    nan_rows = [(1, 1.0), (2, float("nan"))]
    ndf = spark.createDataFrame(nan_rows, "k long, w double")
    assert {r["k"] for r in wswr(ndf, "k", "w", 2, seed="t/").collect()} == {1}
    # deterministic under re-run
    assert picked == {r["k"] for r in wswr(df, "k", "w", 100, seed="t/").collect()}
    # n beyond the qualifying population returns exactly the qualifiers
    assert len(wswr(df, "k", "w", 5000, seed="t/").collect()) == 1000
    # A-Res distribution: P(pick heavy of {w=3, w=1} with n=1) = 3/4;
    # check the frequency over 60 independent seeds
    two = spark.createDataFrame([(1, 3.0), (2, 1.0)], "k long, w double")
    wins = sum(
        1
        for s in range(60)
        if wswr(two, "k", "w", 1, seed=f"d{s}/").first()["k"] == 1
    )
    assert 33 <= wins <= 57, wins  # binomial(60, .75): ~6 sigma envelope


def test_repetition_stats_known_values(spark):
    from mr_dice_spark.operators.terms import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),   # 3 grams, all 'spam spam'
            (2, "a b c d"),               # 3 grams, all distinct
            (3, "one"),                   # too short: no 2-gram, excluded
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(df, "doc_id", "text").collect()}
    assert set(got) == {1, 2}
    assert got[1]["total_grams"] == 3 and got[1]["distinct_grams"] == 1
    assert got[1]["top_gram_share"] == pytest.approx(1.0)
    assert got[1]["dup_gram_share"] == pytest.approx(2 / 3)
    assert got[2]["dup_gram_share"] == pytest.approx(0.0)
    assert got[2]["top_gram_share"] == pytest.approx(1 / 3)


def test_unigram_lm_score_known_values(spark):
    import math

    from mr_dice_spark.operators.terms import unigram_lm_score

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "   ")],
        "doc_id long, text string",
    )
    # corpus counts: a=2, b=2, c=1; N=5
    got = {r["doc_id"]: r for r in unigram_lm_score(df, "doc_id", "text").collect()}
    assert set(got) == {1, 2}  # whitespace-only doc has no tokens
    assert got[1]["n_tokens"] == 3 and got[2]["n_tokens"] == 2
    ln5, ln2, ln1 = math.log(5), math.log(2), 0.0
    assert got[1]["avg_neg_logprob"] == pytest.approx((3 * (ln5 - ln2)) / 3)
    assert got[2]["avg_neg_logprob"] == pytest.approx(((ln5 - ln2) + (ln5 - ln1)) / 2)


def test_unigram_lm_score_external_vocab_oov(spark):
    import math

    from mr_dice_spark.operators.terms import unigram_lm_score

    df = spark.createDataFrame([(1, "a zzz")], "doc_id long, text string")
    vocab = spark.createDataFrame([("a", 9), ("b", 1)], "token string, cnt long")
    row = unigram_lm_score(df, "doc_id", "text", vocab=vocab).collect()[0]
    # N=10; 'zzz' is OOV -> add-one count 1
    ln10, ln9 = math.log(10), math.log(9)
    assert row["avg_neg_logprob"] == pytest.approx(((ln10 - ln9) + (ln10 - 0.0)) / 2)


def test_line_dedup_drops_shared_lines_preserves_order(spark):
    from mr_dice_spark.operators.lines import line_dedup

    df = spark.createDataFrame(
        [
            (1, "keep1\nboiler\nkeep2"),
            (2, "boiler\nunique2"),
            (3, "solo\nonly line"),
            (4, "boiler"),          # every line duplicated -> absent
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in line_dedup(df, "doc_id", "text").collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["text"] == "keep1\nkeep2" and got[1]["n_lines_kept"] == 2
    assert got[2]["text"] == "unique2"
    assert got[3]["text"] == "solo\nonly line" and got[3]["n_lines_kept"] == 2
    # raising the threshold above the boiler line's document count keeps it
    kept_all = {
        r["doc_id"]: r["text"]
        for r in line_dedup(df, "doc_id", "text", min_docs=4).collect()
    }
    assert kept_all[1] == "keep1\nboiler\nkeep2" and kept_all[4] == "boiler"


def test_duplicate_span_stats_known_values(spark):
    from mr_dice_spark.operators.terms import duplicate_span_stats

    df = spark.createDataFrame(
        [
            (1, "a b c d e"),        # shares "a b c" with doc 2
            (2, "x a b c y"),
            (3, "p q p q p q"),      # all 3-grams repeat within the doc
            (4, "u v w"),            # unique single gram
            (5, "t u"),              # too short for a 3-gram: excluded
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in duplicate_span_stats(df, "doc_id", "text", n=3).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1]["n_tokens"] == 5 and got[1]["dup_tokens"] == 3
    assert got[1]["dup_token_ratio"] == pytest.approx(3 / 5)
    assert got[2]["dup_tokens"] == 3              # positions 2-4 cover "a b c"
    assert got[3]["dup_tokens"] == 6 and got[3]["dup_token_ratio"] == pytest.approx(1.0)
    assert got[4]["dup_tokens"] == 0 and got[4]["dup_token_ratio"] == 0.0


# ---------------------------------------------------------------------------
# property test: line_dedup vs a pure-Python reference model
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_line_st = st.sampled_from(["a", "b", "c d", "e f g", ""])
_doc_st = st.lists(_line_st, min_size=1, max_size=6)


def _line_model(docs, min_docs):
    from collections import defaultdict

    docs_per_line = defaultdict(set)
    for i, lines in docs:
        for ln in lines:
            docs_per_line[ln].add(i)
    out = {}
    for i, lines in docs:
        # empty lines are census-exempt (paragraph structure, not boilerplate)
        kept = [ln for ln in lines if ln == "" or len(docs_per_line[ln]) < min_docs]
        if kept:
            out[i] = ("\n".join(kept), len(kept))
    return out


@given(docs=st.lists(_doc_st, min_size=1, max_size=6), min_docs=st.integers(2, 4))
@settings(max_examples=15, deadline=None)
def test_line_dedup_matches_model(spark, docs, min_docs):
    from mr_dice_spark.operators.lines import line_dedup

    rows = [(i, lines) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in rows], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text"], r["n_lines_kept"])
        for r in line_dedup(df, "doc_id", "text", min_docs=min_docs).collect()
    }
    assert got == _line_model(rows, min_docs)


# ---------------------------------------------------------------------------
# corpus curation cascade
# ---------------------------------------------------------------------------


def test_curate_corpus_every_rule_fires(spark):
    from mr_dice_spark.operators.curation import curate_corpus

    en = "the cat and the dog sat on the mat with a hat and it was good " * 3
    rows = [
        (0, en),                          # keep
        (1, en),                          # exact_dup of 0 (higher id loses)
        (2, "short text only"),           # too_short
        (3, " ".join(["zzz"] * 40)),      # lang_und: no marker words
        (4, " ".join(["the"] + ["qqq"] * 60)),  # low marker density
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["verdict"], r["reason"])
           for r in curate_corpus(df, "doc_id", "text").collect()}
    assert got[0] == ("keep", "ok")
    assert got[1] == ("drop", "exact_dup")
    assert got[2] == ("drop", "too_short")
    assert got[3] == ("drop", "lang_und")
    assert got[4] == ("drop", "low_stopword")


def test_curate_corpus_one_shuffle(spark, sf_dir):
    from mr_dice_spark.catalog import Catalog
    from mr_dice_spark.operators.curation import curate_corpus
    from mr_dice_spark.plans.inspect import shuffle_count

    docs = Catalog(spark, sf_dir).documents
    out = curate_corpus(docs, "doc_id", "text")
    # the dedup window is the only exchange; the signal cascade adds none
    assert shuffle_count(out) == 1


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def test_cms_never_undercounts_at_tiny_width(spark):
    """With eps huge (width 3) collisions are forced: every estimate must
    still be >= the true count (the one-sided CMS guarantee)."""
    from mr_dice_spark.operators.sketch import cms_estimate, cms_sketch

    rows = [(f"k{i % 7}",) for i in range(200)]
    df = spark.createDataFrame(rows, "k string")
    sk = cms_sketch(df, "k", eps=1.0, confidence=0.9)
    exact = {f"k{i}": len([r for r in rows if r[0] == f"k{i}"]) for i in range(7)}
    est = cms_estimate(spark, sk, exact.keys())
    assert all(est[k] >= n for k, n in exact.items())
    assert sum(exact.values()) == 200


def test_heavy_hitters_cms_matches_exact(spark, sf_dir):
    from mr_dice_spark.catalog import Catalog
    from mr_dice_spark.operators.sketch import heavy_hitters_cms

    from pyspark.sql import functions as F

    ev = Catalog(spark, sf_dir).events
    got = {(r[0], r[1]) for r in heavy_hitters_cms(ev, "event_type", min_share=0.05).collect()}
    total = ev.count()
    exact = {
        (r["event_type"], r["n"])
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
        if r["n"] >= 0.05 * total
    }
    assert got == exact


# ---------------------------------------------------------------------------
# approximate aggregates: the documented 100 TB paths must land within
# their advertised error bounds of the exact answers on real fixture data
# ---------------------------------------------------------------------------


def test_approx_percentile_within_tolerance(spark, sf_dir):
    from pyspark.sql import functions as F

    from mr_dice_spark.catalog import Catalog

    ev = Catalog(spark, sf_dir).events
    rows = ev.groupBy("event_type").agg(
        # rank-error bracket: the approx value must land between the exact
        # percentiles at p +/- 0.03 (value-space tolerances are meaningless
        # in sparse tails, rank-space ones are the sketch's actual contract)
        F.expr(
            "percentile(value, array(0.47D, 0.53D, 0.92D, 0.98D))"
        ).alias("bracket"),
        F.expr("approx_percentile(value, array(0.5D, 0.95D), 10000)").alias("approx"),
    ).collect()
    assert rows
    for r in rows:
        lo50, hi50, lo95, hi95 = r["bracket"]
        a50, a95 = r["approx"]
        assert lo50 <= a50 <= hi50, r
        assert lo95 <= a95 <= hi95, r


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    from pyspark.sql import functions as F

    from mr_dice_spark.catalog import Catalog

    ev = Catalog(spark, sf_dir).events
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
    ).collect()[0]
    # HLL++ with rsd=2% — allow 3 sigma
    assert abs(row["approx"] - row["exact"]) <= 0.06 * row["exact"] + 1


def test_sampling_null_keys_stable_not_dropped(spark):
    from mr_dice_spark.operators.sampling import (
        deterministic_sample,
        stratified_sample_exact,
    )

    df = spark.createDataFrame(
        [("s", 1), ("s", 2), ("s", None)], "g string, k int"
    )
    # fraction=1.0 keeps EVERYTHING, including the NULL key
    assert deterministic_sample(df, "k", 1.0).count() == 3
    # NULL keys rank by their sentinel hash, not automatically first
    top2 = stratified_sample_exact(df, ["g"], 2, "k")
    assert top2.count() == 2


def test_mixture_sample_integral_group_column(spark):
    from mr_dice_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame(
        [(1, i) for i in range(10)] + [(2, i) for i in range(10, 20)],
        "grp int, k int",
    )
    out = mixture_sample(df, "grp", {1: 0.5, 2: 0.5}, 10, "k")
    assert out.count() == 10
    assert dict(out.dtypes)["grp"] == "int"  # no silent retype to string


def test_heavy_hitters_keeps_key_type_and_nonnull_share(spark):
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.sketch import heavy_hitters_cms

    rows = [(7,)] * 8 + [(9,)] * 2 + [(None,)] * 10
    df = spark.createDataFrame(rows, "uid int")
    out = heavy_hitters_cms(df, "uid", min_share=0.5)
    got = [(r["uid"], r["est_count"]) for r in out.collect()]
    # 7 holds 80% of NON-NULL values; a NULL-inflated denominator (50%
    # threshold of 20 rows = 10) would wrongly exclude it
    assert got == [(7, 8)]
    assert dict(out.dtypes)["uid"] == "int"


def test_detect_language_unspaced_chinese(spark):
    """zh markers are single characters inside unspaced text — token
    matching can never see them, character counting must."""
    df = spark.createDataFrame(
        [("这是一个很好的例子我们都喜欢它",), ("the cat and the dog sat",)],
        "text string",
    )
    got = [r[0] for r in df.select(detect_language(F.col("text"))).collect()]
    assert got == ["zh", "en"]


def test_heavy_hitters_cms_high_cardinality_candidates(spark):
    """The default candidate pass must find every true heavy hitter on a
    high-cardinality column WITHOUT collecting all distinct values: 100k
    distinct long-tail keys plus two heavy keys, hitters exact."""
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.sketch import heavy_hitters_cms

    n_tail = 100_000
    tail = spark.range(n_tail).select(
        F.concat(F.lit("tail_"), F.col("id")).alias("k")
    )
    heavy = spark.range(30_000).select(
        F.when(F.col("id") % 2 == 0, "hot_a").otherwise("hot_b").alias("k")
    )
    df = tail.unionByName(heavy).repartition(8)
    out = heavy_hitters_cms(df, "k", min_share=0.05, eps=1e-5)
    got = {r["k"]: r["est_count"] for r in out.collect()}
    assert set(got) == {"hot_a", "hot_b"}
    # CMS never undercounts; at eps=1e-5 over 130k rows it is near-exact
    assert got["hot_a"] >= 15_000 and got["hot_a"] <= 15_200
    assert got["hot_b"] >= 15_000 and got["hot_b"] <= 15_200


def test_heavy_hitters_cms_rejects_nonpositive_share_without_candidates(spark):
    import pytest as _pytest

    from mr_dice_spark.operators.sketch import heavy_hitters_cms

    df = spark.range(10).select(F_col_str("id"))
    with pytest.raises(ValueError, match="min_share"):
        heavy_hitters_cms(df, "k", min_share=0.0)


def F_col_str(name):
    from pyspark.sql import functions as F

    return F.col(name).cast("string").alias("k")


# ---------------------------------------------------------------------------
# split_assign / split_thresholds
# ---------------------------------------------------------------------------


def test_split_thresholds_normalizes_and_pins_tail():
    from mr_dice_spark.operators.sampling import _BUCKETS, split_thresholds

    # ratios normalize: (9, 0.5, 0.5) == (0.9, 0.05, 0.05)
    a = split_thresholds((("train", 9), ("val", 0.5), ("test", 0.5)))
    b = split_thresholds((("train", 0.9), ("val", 0.05), ("test", 0.05)))
    assert a == b
    # last bound is the full space regardless of float rounding
    assert a[-1] == ("test", _BUCKETS)
    # monotone non-decreasing bounds
    uppers = [u for _, u in a]
    assert uppers == sorted(uppers)


def test_split_thresholds_rejects_bad_specs():
    from mr_dice_spark.operators.sampling import split_thresholds

    for bad in ([], [("a", -1), ("b", 2)], [("a", 0), ("b", 0)], [("a", 1), ("a", 1)]):
        with pytest.raises(ValueError):
            split_thresholds(bad)


def test_split_assign_partition_invariant_and_total(spark):
    """Every key gets exactly one split; assignment is identical under a
    different partitioning (the leakage-safety property); a single-split
    spec degenerates to a constant with no when-chain."""
    from mr_dice_spark.operators.sampling import split_assign

    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    a = {r["k"]: r["split"] for r in split_assign(df, "k", seed="s").collect()}
    b = {
        r["k"]: r["split"]
        for r in split_assign(df.repartition(7, "k"), "k", seed="s").collect()
    }
    assert a == b and len(a) == 1000
    counts = {}
    for s in a.values():
        counts[s] = counts.get(s, 0) + 1
    # 98/1/1 default: the big split dominates, all three non-empty at n=1000
    assert counts["train"] > 900
    one = split_assign(df, "k", splits=(("all", 1.0),)).select("split").distinct()
    assert [r["split"] for r in one.collect()] == ["all"]


def test_split_assign_group_key_keeps_groups_together(spark):
    """Keying the split on a group id puts every row of the group in the
    same split — the near-dup-leakage defense the docstring promises."""
    from mr_dice_spark.operators.sampling import split_assign

    df = spark.range(0, 300).select(
        F.col("id").alias("row_id"), (F.col("id") % 30).alias("domain")
    )
    out = split_assign(df, "domain", seed="g").groupBy("domain").agg(
        F.countDistinct("split").alias("n")
    )
    assert all(r["n"] == 1 for r in out.collect())


# ---------------------------------------------------------------------------
# quantile_length_filter
# ---------------------------------------------------------------------------


def test_quantile_length_filter_bounds_and_nulls(spark):
    from mr_dice_spark.operators.curation import quantile_length_filter

    rows = [(i, "w " * n) for i, n in enumerate([1, 5, 5, 5, 5, 5, 5, 5, 5, 100])]
    rows.append((10, None))  # NULL text -> 0 tokens, an outlier like the 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = quantile_length_filter(df, "doc_id", "text", low=0.10, high=0.90)
    ids = sorted(r["doc_id"] for r in kept.collect())
    # counts sorted: [0,1,5,...,5,100]; p10 lands EXACTLY on 1 (index
    # 0.1*10), p90 on 5 — so the 1-token doc survives via the boundary
    # widening while the 0-token (NULL) and 100-token outliers drop
    assert ids == [0, 1, 2, 3, 4, 5, 6, 7, 8]
    assert set(kept.columns) == {"doc_id", "text", "n_tokens"}
    with pytest.raises(ValueError):
        quantile_length_filter(df, "doc_id", "text", low=0.9, high=0.1)


def test_quantile_length_filter_integer_boundary_kept(spark):
    """A doc sitting EXACTLY on the interpolated bound survives (the
    boundary_eps widening): with uniform counts the quantile equals the
    count, so everything is on-boundary and nothing may drop."""
    from mr_dice_spark.operators.curation import quantile_length_filter

    df = spark.createDataFrame(
        [(i, "a b c") for i in range(20)], "doc_id long, text string"
    )
    assert quantile_length_filter(df, "doc_id", "text").count() == 20


# ---------------------------------------------------------------------------
# token_budget_sample
# ---------------------------------------------------------------------------


def test_token_budget_sample_semantics(spark):
    """Zero budget takes nothing; unlisted groups drop; the first
    budget-crossing doc is included (overshoot <= one doc); membership is
    partition-invariant."""
    from mr_dice_spark.operators.sampling import token_budget_sample

    rows = [(i, "g" if i < 10 else ("z" if i < 15 else "u"), 10) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, n_tok long")
    out = token_budget_sample(df, "grp", {"g": 35, "z": 0}, "n_tok", "doc_id", seed="b")
    got = out.collect()
    by_grp = {}
    for r in got:
        by_grp.setdefault(r["grp"], []).append(r)
    assert "u" not in by_grp and "z" not in by_grp  # unlisted drops, 0-budget drops
    g = sorted(by_grp["g"], key=lambda r: r["cum_before"])
    # 10-token docs, budget 35: cum_before 0,10,20,30 all < 35 -> 4 docs (40 tokens)
    assert [r["cum_before"] for r in g] == [0, 10, 20, 30]
    rep = token_budget_sample(
        df.repartition(5, "doc_id"), "grp", {"g": 35, "z": 0}, "n_tok", "doc_id", seed="b"
    )
    assert sorted(r["doc_id"] for r in rep.collect()) == sorted(
        r["doc_id"] for r in got
    )


def test_split_contamination_audit_flags_planted_leakage(spark):
    """Docs sharing text with a train-side doc are contaminated; unique
    docs are not. The shared text is planted on many ids so at least one
    lands in train under the fixed seed (asserted as a precondition)."""
    from mr_dice_spark.operators.decontaminate import split_contamination_audit
    from mr_dice_spark.operators.sampling import split_assign

    shared = "the quick brown fox jumps over the lazy dog again"
    rows = [(i, shared) for i in range(0, 40, 2)]
    # every word carries the doc id so no 3-gram repeats across docs
    rows += [(i, " ".join(f"tok{i}w{j}" for j in range(8))) for i in range(1, 40, 2)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    splits = (("train", 0.6), ("test", 0.4))
    assigned = {r["doc_id"]: r["split"]
                for r in split_assign(df, "doc_id", splits=splits, seed="t").collect()}
    shared_train = [i for i in range(0, 40, 2) if assigned[i] == "train"]
    assert shared_train, "precondition: some shared-text doc must land in train"
    out = {r["doc_id"]: r for r in split_contamination_audit(
        df, "doc_id", "text", splits=splits, seed="t").collect()}
    assert set(out) == {i for i, s in assigned.items() if s == "test"}
    for i, r in out.items():
        if i % 2 == 0:
            assert r["contaminated"] and r["share"] == 1.0
        else:
            assert not r["contaminated"] and r["n_shared"] == 0


def test_split_leakage_audit_planted_dup_classes(spark):
    """Exact-content classes report their split spread; classes confined
    to one split are not leaky; singletons never appear."""
    from mr_dice_spark.operators.sampling import split_assign, split_leakage_audit

    dup_a = "alpha beta gamma"      # planted on many ids -> near-certain straddle
    dup_b = "delta epsilon zeta"
    rows = [(i, dup_a) for i in range(0, 30)]
    rows += [(100, dup_b), (101, dup_b)]
    rows += [(200, "single one"), (201, "single two")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    splits = (("train", 0.5), ("test", 0.5))
    out = {r["content_key"]: r
           for r in split_leakage_audit(df, "doc_id", "text",
                                        splits=splits, seed="s").collect()}
    assert len(out) == 2  # only the two dup classes, no singletons
    assigned = {r["doc_id"]: r["split"]
                for r in split_assign(df, "doc_id", splits=splits, seed="s").collect()}
    for r in out.values():
        ids = ([i for i in range(0, 30)] if r["n_docs"] == 30 else [100, 101])
        want = sorted({assigned[i] for i in ids})
        assert r["splits"] == ",".join(want)
        assert r["n_splits"] == len(want)
        assert r["leaky"] == (len(want) > 1)
        assert r["first_doc"] == min(ids)
    # keying the split on the CONTENT hash puts each dup class in one
    # split — the audit's own remediation advice — so nothing is leaky
    keyed = df.withColumn("ck", F.md5("text"))
    out_keyed = split_leakage_audit(keyed, "doc_id", "text",
                                    splits=splits, seed="s", key_col="ck")
    rows_keyed = out_keyed.collect()
    assert len(rows_keyed) == 2 and all(not r["leaky"] for r in rows_keyed)


def test_split_leakage_audit_null_vs_empty_text_distinct(spark):
    """NULL text and '' text are different contents: neither may be
    reported as a duplicate class of the other (review finding — the
    JSON framing from dedup_exact keeps them apart)."""
    from mr_dice_spark.operators.sampling import split_leakage_audit

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "x y"), (3, "x y")], "doc_id long, text string"
    )
    rows = split_leakage_audit(df, "doc_id", "text",
                               splits=(("a", 0.5), ("b", 0.5)), seed="n").collect()
    assert len(rows) == 1 and rows[0]["n_docs"] == 2  # only the planted x-y pair


def test_token_budget_sample_null_count_kept_at_zero_cost(spark):
    """A NULL token count folds to 0: the row survives and charges
    nothing against the budget (review finding — bare NULL arithmetic
    silently dropped the row)."""
    from mr_dice_spark.operators.sampling import token_budget_sample

    df = spark.createDataFrame(
        [(0, "g", 10), (1, "g", None), (2, "g", 10)],
        "doc_id long, grp string, n_tok long",
    )
    out = token_budget_sample(df, "grp", {"g": 15}, "n_tok", "doc_id", seed="z")
    rows = {r["doc_id"]: r["cum_before"] for r in out.collect()}
    assert 1 in rows  # the NULL-count row is kept
    # total tokens charged never counts the NULL row
    assert max(rows.values()) <= 20


# ---------------------------------------------------------------------------
# DataSketches rollups (HLL / Theta / KLL): the approximate regime
# ---------------------------------------------------------------------------


def test_hll_rollup_tolerance_and_merge_invariance(spark):
    """Beyond the exact sparse mode (goldens): at 200k distinct values an
    lgk=12 HLL estimates within a few percent, and merging per-group
    sketches gives the SAME estimate as one direct sketch (lossless union
    at equal lgk) — the property that makes pre-aggregated sketch frames
    trustworthy for any rollup."""
    from mr_dice_spark.operators.sketch import hll_partial_sketches, hll_rollup
    from pyspark.sql import functions as F

    n = 200_000
    df = spark.range(n).select(
        (F.col("id") % 10).alias("g"), F.col("id").alias("v")
    )
    merged = hll_rollup(hll_partial_sketches(df, ["g"], "v"), [])
    est = merged.first()["approx_distinct"]
    assert abs(est - n) / n < 0.05
    direct = hll_rollup(hll_partial_sketches(df.select(F.lit(1).alias("k"), "v"), ["k"], "v"), [])
    assert direct.first()["approx_distinct"] == est


def test_theta_overlap_tolerance_high_cardinality(spark):
    """Two 100k-value sets overlapping in 50k: Theta intersection
    estimates each cardinality and the overlap within 10%."""
    from mr_dice_spark.operators.sketch import theta_overlap_matrix
    from pyspark.sql import functions as F

    a = spark.range(0, 100_000).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    b = spark.range(50_000, 150_000).select(F.lit("b").alias("g"), F.col("id").alias("v"))
    row = theta_overlap_matrix(a.unionByName(b), "g", "v").first()
    assert abs(row["distinct_a"] - 100_000) / 100_000 < 0.10
    assert abs(row["distinct_b"] - 100_000) / 100_000 < 0.10
    assert abs(row["overlap"] - 50_000) / 50_000 < 0.10


def test_kll_quantiles_rollup_rank_tolerance(spark):
    """Merged per-group KLL sketches answer global quantiles within the
    published normalized-rank error (~1.3% at k=200; assert 5%): the
    mergeable complement to exact percentile(), which cannot
    re-aggregate."""
    from mr_dice_spark.operators.sketch import kll_quantiles_rollup
    from pyspark.sql import functions as F

    n = 100_000
    df = spark.range(n).select((F.col("id") % 7).alias("g"), F.col("id").alias("v"))
    row = kll_quantiles_rollup(df, ["g"], "v", [0.5, 0.95]).first()
    assert abs(row["q_0_5"] - 0.5 * n) / n < 0.05
    assert abs(row["q_0_95"] - 0.95 * n) / n < 0.05


def test_kll_quantiles_rollup_name_sanitization_and_validation(spark):
    """Column names survive scientific-notation floats; duplicate or
    out-of-range quantiles raise instead of emitting ambiguous columns."""
    from mr_dice_spark.operators.sketch import kll_quantiles_rollup
    from pyspark.sql import functions as F

    df = spark.range(1000).select(F.lit(1).alias("g"), F.col("id").alias("v"))
    out = kll_quantiles_rollup(df, ["g"], "v", [1e-05, 0.5])
    assert out.columns == ["q_1em05", "q_0_5"]
    for bad in ([], [0.5, 0.50], [1.5], [-0.1]):
        with pytest.raises(ValueError):
            kll_quantiles_rollup(df, ["g"], "v", bad)


def test_split_thresholds_properties_hypothesis():
    """Property-based: for ANY valid split spec — bounds are monotone
    non-decreasing, the tail is pinned to the full bucket space (no key
    can be unassigned), names survive in order, and scaling every
    fraction by a constant changes nothing (ratio semantics)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mr_dice_spark.operators.sampling import _BUCKETS, split_thresholds

    # fractions are 0 or >= 1e-3: a 5e-324 denormal would underflow to 0
    # under the scaling check below — caller-error territory, not the
    # invariance under test
    specs = st.lists(
        st.tuples(
            st.text(alphabet="abcdefgh", min_size=1, max_size=4),
            st.one_of(
                st.just(0.0), st.floats(min_value=1e-3, max_value=1e6)
            ),
        ),
        min_size=1,
        max_size=6,
    ).filter(
        lambda s: sum(f for _, f in s) > 0
        and len({n for n, _ in s}) == len(s)
    )

    @given(spec=specs, scale=st.floats(min_value=1e-3, max_value=1e3))
    @settings(max_examples=200, deadline=None)
    def check(spec, scale):
        bounds = split_thresholds(spec)
        uppers = [u for _, u in bounds]
        assert uppers == sorted(uppers)
        assert bounds[-1][1] == _BUCKETS
        assert [n for n, _ in bounds] == [n for n, _ in spec]
        assert all(0 <= u <= _BUCKETS for u in uppers)
        scaled = split_thresholds([(n, f * scale) for n, f in spec])
        # identical thresholds under uniform scaling, modulo the one-ulp
        # float division wiggle (f*scale)/(total*scale) can introduce
        for (_, a), (_, b) in zip(bounds, scaled):
            assert abs(a - b) <= 8

    check()


def test_token_budget_sample_properties_hypothesis(spark):
    """Property-based: for random corpora and budgets, each group's kept
    set is a PREFIX of its hash order, every kept row's prior spend is
    under budget, and the overshoot is bounded by the crossing doc."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mr_dice_spark.operators.sampling import hash_bucket, token_budget_sample

    corpora = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),      # doc id (deduped below)
            st.sampled_from(["g1", "g2", "g3"]),
            st.integers(min_value=0, max_value=50),       # token count
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    )
    budgets = st.fixed_dictionaries(
        {g: st.integers(min_value=0, max_value=200) for g in ("g1", "g2")}
    )

    @given(rows=corpora, bud=budgets)
    @settings(max_examples=15, deadline=None)
    def check(rows, bud):
        df = spark.createDataFrame(rows, "doc_id long, grp string, n_tok long")
        out = token_budget_sample(df, "grp", bud, "n_tok", "doc_id", seed="h")
        kept = out.collect()
        assert all(r["grp"] in bud for r in kept)          # unlisted groups drop
        hv = {
            r["doc_id"]: r["h"]
            for r in df.select(
                "doc_id", hash_bucket(F.col("doc_id"), "h").alias("h")
            ).collect()
        }
        by_grp_all = {}
        for d, g, n in rows:
            by_grp_all.setdefault(g, []).append((hv[d], d, n))
        kept_by_grp = {}
        for r in kept:
            kept_by_grp.setdefault(r["grp"], set()).add(r["doc_id"])
        for g, budget in bud.items():
            order = sorted(by_grp_all.get(g, []))
            spend, expect = 0, set()
            for _, d, n in order:
                if spend >= budget:
                    break
                expect.add(d)
                spend += n
            assert kept_by_grp.get(g, set()) == expect, (g, budget)

    check()


def test_theta_overlap_matrix_null_group_excluded(spark):
    """NULL group keys are filtered BEFORE the sketch aggregate (ADVICE
    r3): the g_a < g_b pair join is null-unsafe, so an unfiltered NULL
    group's sketch would be built and then silently vanish from the
    grid. Non-null pairs are unaffected."""
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.sketch import theta_overlap_matrix

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 2), ("b", 3), (None, 1), (None, 9)],
        "g string, v int",
    )
    rows = theta_overlap_matrix(df, "g", "v").collect()
    assert [(r["g_a"], r["g_b"]) for r in rows] == [("a", "b")]
    assert rows[0]["overlap"] == 1


def test_length_bucketed_batches_semantics(spark):
    import pytest

    from mr_dice_spark.operators.packing import length_bucketed_batches

    rows = [(i, l) for i, l in [(1, 10), (2, 100), (3, 101), (4, 250), (5, 999),
                                (6, 50), (7, 60), (8, None), (9, -5)]]
    df = spark.createDataFrame(rows, "id long, n long")
    out = {r["id"]: r for r in length_bucketed_batches(
        df, "id", "n", bucket_edges=[100, 200, 400], batch_size=2).collect()}
    # NULL / negative lengths excluded
    assert set(out) == {1, 2, 3, 4, 5, 6, 7}
    # bucket boundaries are inclusive upper edges; overflow takes len(edges)
    assert out[2]["bucket"] == 0 and out[3]["bucket"] == 1
    assert out[4]["bucket"] == 2 and out[5]["bucket"] == 3
    # bucket 0 in (n, id) order: 10, 50, 60, 100 -> batches [10,50], [60,100]
    assert (out[1]["batch_in_bucket"], out[1]["pos_in_batch"]) == (0, 0)
    assert (out[6]["batch_in_bucket"], out[6]["pos_in_batch"]) == (0, 1)
    assert (out[7]["batch_in_bucket"], out[7]["pos_in_batch"]) == (1, 0)
    assert (out[2]["batch_in_bucket"], out[2]["pos_in_batch"]) == (1, 1)
    # padding = batch max - own length
    assert out[1]["batch_max_tokens"] == 50 and out[1]["padding_tokens"] == 40
    assert out[6]["padding_tokens"] == 0
    assert out[2]["padding_tokens"] == 0 and out[7]["padding_tokens"] == 40
    with pytest.raises(ValueError):
        length_bucketed_batches(df, "id", "n", [100, 50], 2)
    with pytest.raises(ValueError):
        length_bucketed_batches(df, "id", "n", [100], 0)


def test_bigram_lm_score_order_sensitivity(spark):
    """Two docs with the SAME unigram bag but different word order must
    score differently (the whole point over the unigram model); hand-
    computed add-k values pin the context-count and smoothing math;
    docs with <2 tokens are absent."""
    import pytest

    from mr_dice_spark.operators.terms import bigram_lm_score

    df = spark.createDataFrame(
        [
            (1, "a b a b a"),      # bigrams ab,ba,ab,ba — all common
            (2, "a a b b a"),      # same bag {a:3,b:2}, rare aa/bb pairs
            (3, "solo"),           # no bigrams
            (4, "  "),             # no tokens
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bigram_lm_score(df, "doc_id", "text").collect()}
    assert set(got) == {1, 2}
    assert got[1]["n_bigrams"] == 4 and got[2]["n_bigrams"] == 4
    # model: cb(ab)=3, cb(ba)=3, cb(aa)=1, cb(bb)=1; cu(a)=cu(b)=4;
    # V=3 — the vocabulary is the CORPUS unigram vocab, so doc 3's
    # 'solo' counts even though it forms no bigram.
    # P(ab)=P(ba)=3.5/5.5, P(aa)=P(bb)=1.5/5.5
    import math

    assert got[1]["avg_neg_logprob"] == pytest.approx(
        -math.log(3.5 / 5.5), abs=1e-9
    )
    assert got[2]["avg_neg_logprob"] == pytest.approx(
        -(2 * math.log(1.5 / 5.5) + 2 * math.log(3.5 / 5.5)) / 4, abs=1e-9
    )
    assert got[2]["avg_neg_logprob"] > got[1]["avg_neg_logprob"]


def test_pmi_collocations_planted_phrase(spark):
    """A phrase whose words ONLY occur together must out-PMI a pair of
    independently frequent words with the same pair count; min_count
    suppresses one-off pairs; k bounds the output."""
    from mr_dice_spark.operators.terms import pmi_collocations

    rows = []
    # 'new york' 6 times: 'new'/'york' never apart
    rows += [("new york",)] * 6
    # 'the cat' 6 times, but 'the' and 'cat' also occur alone a lot
    rows += [("the cat",)] * 6
    rows += [("the dog",)] * 10
    rows += [("a cat",)] * 10
    # a one-off pair below min_count
    rows += [("rare pair",)]
    df = spark.createDataFrame(rows, "text string")
    got = pmi_collocations(df, "text", min_count=5, k=10).collect()
    pairs = [(r["w1"], r["w2"]) for r in got]
    assert ("rare", "pair") not in pairs
    by_pair = {(r["w1"], r["w2"]): r for r in got}
    assert by_pair[("new", "york")]["n_pair"] == 6
    assert by_pair[("new", "york")]["pmi"] > by_pair[("the", "cat")]["pmi"]
    assert len(got) <= 10
    # top-1 is the exclusive phrase
    assert pairs[0] == ("new", "york")


def test_perplexity_buckets_semantics_and_guards(spark):
    """Equal-count per-group split with deterministic tiebreak; docs
    with <2 tokens are absent; parameter validation fires."""
    import pytest

    from mr_dice_spark.operators.curation import perplexity_buckets

    rows = [
        (1, "en", "the quick fox jumps the quick fox"),
        (2, "en", "the quick fox jumps over lazy dog"),
        (3, "en", "zz yy xx ww vv uu tt"),
        (4, "en", "the the the the the the the"),
        (5, "en", "one"),          # <2 tokens: absent from output
        (6, "fr", "le chat dort"),
        (7, "fr", "le chien court vite"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = perplexity_buckets(df, "doc_id", "text", "lang", n_buckets=2,
                             labels=("keep", "drop"))
    got = {r["doc_id"]: (r["lang"], r["bucket"]) for r in out.collect()}
    assert 5 not in got and len(got) == 6
    # per-group equal-count: 4 en docs -> 2 keep + 2 drop; 2 fr -> 1 + 1
    en = [b for (lg, b) in got.values() if lg == "en"]
    fr = [b for (lg, b) in got.values() if lg == "fr"]
    assert sorted(en) == ["drop", "drop", "keep", "keep"]
    assert sorted(fr) == ["drop", "keep"]
    with pytest.raises(ValueError, match="n_buckets"):
        perplexity_buckets(df, "doc_id", "text", "lang", n_buckets=1)
    with pytest.raises(ValueError, match="labels"):
        perplexity_buckets(df, "doc_id", "text", "lang", n_buckets=3,
                           labels=("a", "b"))


def test_dsir_importance_select_prefers_target_like_docs(spark):
    from mr_dice_spark.operators.curation import dsir_importance_select

    # target docs speak "alpha beta"; pool noise speaks "zulu yankee".
    # candidates 100-104 are target-like, 200-204 pool-like: the top-5
    # draw must pick the target-like ones (logw gap >> gumbel noise).
    rows = (
        [(i, "alpha beta alpha beta gamma", True) for i in range(5)]
        + [(100 + i, "alpha beta gamma alpha", False) for i in range(5)]
        + [(200 + i, "zulu yankee xray zulu yankee", False) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    out = dsir_importance_select(df, "doc_id", "text", "is_t", k=5, buckets=64)
    picked = {r["doc_id"] for r in out.collect()}
    assert all(d < 200 for d in picked), picked
    # deterministic: same call, same draw
    again = {
        r["doc_id"]
        for r in dsir_importance_select(
            df, "doc_id", "text", "is_t", k=5, buckets=64
        ).collect()
    }
    assert picked == again


def test_dsir_importance_select_validates_args(spark):
    import pytest

    from mr_dice_spark.operators.curation import dsir_importance_select

    df = spark.createDataFrame([(1, "x", True)], "doc_id long, text string, t boolean")
    with pytest.raises(ValueError):
        dsir_importance_select(df, "doc_id", "text", "t", k=0)
    with pytest.raises(ValueError):
        dsir_importance_select(df, "doc_id", "text", "t", k=1, buckets=0)
    # empty/NULL text scores 0 but is still drawable
    df2 = spark.createDataFrame(
        [(1, None, True), (2, "", False)], "doc_id long, text string, t boolean"
    )
    out = dsir_importance_select(df2, "doc_id", "text", "t", k=2)
    assert {r["doc_id"]: r["logw"] for r in out.collect()} == {1: 0.0, 2: 0.0}


def test_weighted_sample_per_group_counts_and_guards(spark):
    from mr_dice_spark.operators.sampling import weighted_sample_per_group

    rows = [(i, "a", float(i + 1)) for i in range(10)] + [
        (100, "b", 5.0), (101, "b", None), (102, "b", -1.0),
        (103, "b", float("nan")),
    ]
    df = spark.createDataFrame(rows, "id long, g string, w double")
    out = weighted_sample_per_group(df, "g", "id", "w", n_per_group=3)
    by_g = {}
    for r in out.collect():
        by_g.setdefault(r["g"], []).append(r["id"])
    assert len(by_g["a"]) == 3
    # NULL/NaN/non-positive weights never qualify: only id 100 survives in b
    assert by_g["b"] == [100]
    # deterministic across calls
    again = sorted(r["id"] for r in
                   weighted_sample_per_group(df, "g", "id", "w", 3).collect())
    assert again == sorted(i for ids in by_g.values() for i in ids)
    import pytest as _pytest
    with pytest.raises(ValueError):
        weighted_sample_per_group(df, "g", "id", "w", -1)


def test_weighted_sample_per_group_plan_window_group_limit(spark):
    from mr_dice_spark.operators.sampling import weighted_sample_per_group

    df = spark.createDataFrame([(1, "a", 1.0)], "id long, g string, w double")
    plan = (
        weighted_sample_per_group(df, "g", "id", "w", 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan


def test_fold_homoglyphs_maps_confusables(spark):
    from mr_dice_spark.functions.text import (
        _HOMOGLYPH_DST,
        _HOMOGLYPH_SRC,
        fold_homoglyphs,
    )

    assert len(_HOMOGLYPH_SRC) == len(set(_HOMOGLYPH_SRC)) == len(_HOMOGLYPH_DST)
    # every source char is non-ASCII, every destination char is ASCII
    assert all(ord(c) > 127 for c in _HOMOGLYPH_SRC)
    assert all(ord(c) < 128 for c in _HOMOGLYPH_DST)
    rows = [
        ("раypаl", "paypal"),      # Cyrillic р/а swapped in
        ("οΟlymp", "oOlymp"),      # Greek omicron pair
        ("plain ascii", "plain ascii"),      # untouched
        (None, None),
    ]
    df = spark.createDataFrame([(a,) for a, _ in rows], "t string")
    got = [r["f"] for r in df.select(fold_homoglyphs("t").alias("f")).collect()]
    assert got == [b for _, b in rows]


def test_readability_flesch_hand_text(spark):
    from mr_dice_spark.functions.text import readability_flesch

    df = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!"),
            (2, ""),              # degenerate: floors at 1 word/sentence
            (3, None),
        ],
        "id long, text string",
    )
    got = {
        r["id"]: r["r"]
        for r in df.select(
            "id", readability_flesch(F.col("text")).alias("r")
        ).collect()
    }
    r1 = got[1]
    # words: the cat sat the dog ran = 6; sentences: '.' and '!' = 2;
    # vowel groups: e,a,a,e,o,a = 6 (one per word)
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (6, 2, 6)
    exp = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert abs(r1["flesch"] - exp) < 1e-4
    r2 = got[2]
    assert (r2["n_words"], r2["n_sentences"], r2["n_syllables"]) == (0, 0, 0)
    assert abs(r2["flesch"] - (206.835 - 1.015 - 0.0)) < 1e-4
    # NULL text propagates NULL fields (callers coalesce upstream; the
    # golden's documents fixture has no NULL text)
    assert got[3]["n_words"] is None and got[3]["flesch"] is None


def test_vocab_richness_hand_corpus(spark):
    from mr_dice_spark.operators.vocab import vocab_richness_estimate

    df = spark.createDataFrame(
        [("a a a b b c",), ("d  e",), ("",)], "text string"
    )
    [r] = vocab_richness_estimate(df, "text").collect()
    # freqs: a=3 b=2 c=1 d=1 e=1 -> D=5, f1=3, f2=1, N=8
    assert (r["n_tokens"], r["vocab"], r["f1"], r["f2"]) == (8, 5, 3, 1)
    assert abs(r["chao1"] - (5 + 3 * 2 / (2 * 2))) < 1e-6
    assert abs(r["gt_unseen_mass"] - 3 / 8) < 1e-6


def test_distinct_ngram_diversity_hand_counts(spark):
    # en: 'a b c' + 'x' -> uni 4/4 distinct; bi 'a b','b c' (2/2); tri 1/1
    # fr: 'p q p q' -> uni 4 total 2 distinct; bi 3 total 2 distinct
    #     ('p q','q p','p q'); tri 2 total 2 distinct
    from mr_dice_spark.operators.vocab import distinct_ngram_diversity

    df = spark.createDataFrame(
        [("en", "a b c"), ("en", "x"), ("fr", "p q p q")],
        "lang string, text string",
    )
    out = distinct_ngram_diversity(df, "lang", "text", ns=(1, 2, 3)).collect()
    got = {(r["lang"], r["n"]): (r["total_ngrams"], r["distinct_ngrams"]) for r in out}
    assert got[("en", 1)] == (4, 4)
    assert got[("en", 2)] == (2, 2)
    assert got[("en", 3)] == (1, 1)
    assert got[("fr", 1)] == (4, 2)
    assert got[("fr", 2)] == (3, 2)
    assert got[("fr", 3)] == (2, 2)
    ratio = {r for r in out if r["lang"] == "fr" and r["n"] == 1}
    assert next(iter(ratio))["distinct_ratio"] == 0.5


def test_distinct_ngram_diversity_validates_ns(spark):
    from mr_dice_spark.operators.vocab import distinct_ngram_diversity

    df = spark.createDataFrame([("en", "a")], "lang string, text string")
    with pytest.raises(ValueError, match="ns must be >= 1"):
        distinct_ngram_diversity(df, "lang", "text", ns=(0,))
    with pytest.raises(ValueError, match="ns must be >= 1"):
        distinct_ngram_diversity(df, "lang", "text", ns=())


def test_term_burstiness_hand_values(spark):
    # d1="a a b", d2="a c", d3="c", N=3: a: df=2, s1=3, s2=5 -> m=1,
    # fano=(5/3-1)/1=2/3; c: df=2 -> m=2/3, fano=(2/3-4/9)/(2/3)=1/3;
    # with min_df=1, b (fano 2/3) ties a -> term-asc order a, b
    from mr_dice_spark.operators.terms import term_burstiness

    rows = [(1, "a a b"), (2, "a c"), (3, "c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = term_burstiness(df, "doc_id", "text", min_df=2, k=10).collect()
    assert [r["term"] for r in got] == ["a", "c"]
    assert got[0]["fano"] == pytest.approx(2 / 3, abs=1e-6)
    assert got[1]["fano"] == pytest.approx(1 / 3, abs=1e-6)
    assert (got[0]["df"], got[0]["total_tf"]) == (2, 3)
    all3 = term_burstiness(df, "doc_id", "text", min_df=1, k=10).collect()
    assert [r["term"] for r in all3] == ["a", "b", "c"]
    with pytest.raises(ValueError):
        term_burstiness(df, "doc_id", "text", min_df=0)


def test_unigram_kl_by_group_hand_values(spark):
    # g1="x x y" (ng=3), g2="x z" (ng=2); corpus N=5, ct: x=3,y=1,z=1
    import math

    from mr_dice_spark.operators.terms import unigram_kl_by_group

    rows = [("g1", "x x y"), ("g2", "x z")]
    df = spark.createDataFrame(rows, "g string, text string")
    got = {r["g"]: r for r in unigram_kl_by_group(df, "g", "text").collect()}
    kl1 = (2 / 3) * math.log2(10 / 9) + (1 / 3) * math.log2(5 / 3)
    kl2 = 0.5 * math.log2(5 / 6) + 0.5 * math.log2(5 / 2)
    assert got["g1"]["kl_bits"] == pytest.approx(kl1, abs=1e-6)
    assert got["g2"]["kl_bits"] == pytest.approx(kl2, abs=1e-6)
    assert (got["g1"]["n_tokens"], got["g1"]["vocab_terms"]) == (3, 2)
    assert (got["g2"]["n_tokens"], got["g2"]["vocab_terms"]) == (2, 2)


def test_unigram_kl_identical_distribution_is_zero(spark):
    # both groups share one distribution -> p_g == p -> KL exactly 0
    from mr_dice_spark.operators.terms import unigram_kl_by_group

    rows = [("a", "x y"), ("b", "x y")]
    df = spark.createDataFrame(rows, "g string, text string")
    got = {r["g"]: r["kl_bits"] for r in unigram_kl_by_group(df, "g", "text").collect()}
    assert got["a"] == pytest.approx(0.0, abs=1e-9)
    assert got["b"] == pytest.approx(0.0, abs=1e-9)


def test_weighted_percentile_hand_values(spark):
    # values 1,2,3 with weights 1,1,6: total 8, half 4 -> cumw hits 4
    # first at v=3 (lower weighted median); the UNWEIGHTED median row
    # would be 2 — the distinction under test
    from mr_dice_spark.operators.robust import weighted_percentile

    rows = [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 6.0)]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    [r] = weighted_percentile(df, "g", "v", "w", p=0.5).collect()
    assert (r["n_rows"], r["total_weight"]) == (3, 8.0)
    assert r["wpct"] == 3.0
    # p=0.25 -> threshold 2: cumw 1,2,8 -> first >= 2 at v=2
    [r] = weighted_percentile(df, "g", "v", "w", p=0.25).collect()
    assert r["wpct"] == 2.0


def test_weighted_percentile_excludes_nonpositive_and_validates(spark):
    # zero/negative/NULL weights never become the answer; p out of
    # range raises
    from mr_dice_spark.operators.robust import weighted_percentile

    rows = [("g", 1.0, 0.0), ("g", 2.0, -3.0), ("g", 3.0, None),
            ("g", 4.0, 2.0)]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    [r] = weighted_percentile(df, "g", "v", "w", p=0.5).collect()
    assert (r["n_rows"], r["wpct"]) == (1, 4.0)
    with pytest.raises(ValueError):
        weighted_percentile(df, "g", "v", "w", p=0.0)


def test_misra_gries_exact_when_cardinality_fits(spark):
    # cardinality <= m: no decrement ever fires -> est == exact count
    from mr_dice_spark.operators.sketch import misra_gries_summary

    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    got = {r["k"]: r["est"] for r in misra_gries_summary(df, "k", m=8).collect()}
    assert got == {"a": 5, "b": 3, "c": 1}


def test_misra_gries_guarantee_under_pressure(spark):
    # m=2 against 1 heavy key + 10 distinct singletons: the sandwich
    # exact - N/(m+1) <= est <= exact must hold for the heavy key even
    # though decrements fire constantly
    from mr_dice_spark.operators.sketch import misra_gries_summary

    rows = [("hot",)] * 10
    for i in range(10):
        rows.insert(2 * i + 1, (f"s{i}",))
    df = spark.createDataFrame(rows, "k string").coalesce(1)
    got = {r["k"]: r["est"] for r in misra_gries_summary(df, "k", m=2).collect()}
    est = got.get("hot", 0)
    assert est <= 10
    assert est >= 10 - 20 / 3
    with pytest.raises(ValueError):
        misra_gries_summary(df, "k", m=0)


def test_misra_gries_majority_survives_m1(spark):
    # m=1 is Boyer-Moore majority voting: a strict-majority element is
    # always in the summary
    from mr_dice_spark.operators.sketch import misra_gries_summary

    rows = [("a",), ("b",)] * 5 + [("a",)]
    df = spark.createDataFrame(rows, "k string").coalesce(1)
    got = {r["k"]: r["est"] for r in misra_gries_summary(df, "k", m=1).collect()}
    assert "a" in got


def test_misra_gries_audit_verdicts_true_under_stress(spark):
    # tiny m over many keys: estimates are badly degraded but the
    # deterministic sandwich STILL holds for every top key — the
    # invariant the golden hashes
    from mr_dice_spark.operators.sketch import misra_gries_topk_audit

    rows = [(f"k{i % 37}",) for i in range(500)] + [("dom",)] * 100
    df = spark.createDataFrame(rows, "k string")
    out = misra_gries_topk_audit(df, "k", m=2, k=5).collect()
    assert len(out) == 5
    assert all(r["within_bound"] for r in out)
    assert out[0]["k"] == "dom" and out[0]["exact_count"] == 100


def test_interval_coverage_hand_values(spark):
    # key a: [0,10] + [5,15] overlap -> one island [0,15] (covered 15,
    # raw 20); [20,20] zero-length touches nothing -> its own island,
    # adds no length; key b: [0,5] and [5,9] TOUCH -> merge
    from mr_dice_spark.operators.interval import interval_coverage

    rows = [("a", 0.0, 10.0), ("a", 5.0, 15.0), ("a", 20.0, 20.0),
            ("b", 0.0, 5.0), ("b", 5.0, 9.0)]
    df = spark.createDataFrame(rows, "k string, s double, e double")
    got = {r["k"]: r for r in interval_coverage(df, "k", "s", "e").collect()}
    a, b = got["a"], got["b"]
    assert (a["n_intervals"], a["n_islands"]) == (3, 2)
    assert (a["covered"], a["raw_length"]) == (15.0, 20.0)
    assert a["overlap_ratio"] == 0.75
    assert (b["n_islands"], b["covered"], b["raw_length"]) == (1, 9.0, 9.0)


def test_interval_coverage_rejects_reversed(spark):
    from mr_dice_spark.operators.interval import interval_coverage

    df = spark.createDataFrame([("a", 5.0, 1.0)], "k string, s double, e double")
    with pytest.raises(ValueError):
        interval_coverage(df, "k", "s", "e")


def test_correlation_matrix_hand_values(spark):
    # y = 2x exactly -> r(x,y) = 1; z anti-tracks x -> r(x,z) = -1;
    # constant column -> NULL r (fail-closed); complete-case: the row
    # with NULL z is excluded from EVERY pair (n = 3 everywhere)
    from mr_dice_spark.operators.profile import correlation_matrix

    rows = [(1.0, 2.0, 3.0, 7.0), (2.0, 4.0, 2.0, 7.0),
            (3.0, 6.0, 1.0, 7.0), (4.0, 8.0, None, 7.0)]
    df = spark.createDataFrame(rows, "x double, y double, z double, c double")
    got = {(r["col_a"], r["col_b"]): r
           for r in correlation_matrix(df, ["x", "y", "z", "c"]).collect()}
    assert len(got) == 6
    assert all(r["n"] == 3 for r in got.values())
    assert got[("x", "y")]["r"] == pytest.approx(1.0, abs=1e-6)
    assert got[("x", "z")]["r"] == pytest.approx(-1.0, abs=1e-6)
    assert got[("x", "c")]["r"] is None
    with pytest.raises(ValueError):
        correlation_matrix(df, ["x"])
    with pytest.raises(ValueError):
        correlation_matrix(df, ["x", "x"])


def test_llr_collocations_hand_values(spark):
    # corpus "a b a b c d": bigrams (a,b)x2, (b,a), (b,c), (c,d); test
    # (a,b): k11=2, r1(first=a)=2, c1(second=b)=2, N=5 -> k12=0, k21=0,
    # k22=3 -> G2 = 2*(2*ln(2*5/4) + 3*ln(3*5/9)) = 2*(2 ln 2.5 + 3 ln(5/3))
    import math

    from mr_dice_spark.operators.terms import llr_collocations

    df = spark.createDataFrame([("a b a b c d",)], "text string")
    got = {(r["w1"], r["w2"]): r
           for r in llr_collocations(df, "text", min_count=2, k=10).collect()}
    assert ("a", "b") in got
    exp = 2 * (2 * math.log(2.5) + 3 * math.log(5 / 3))
    assert got[("a", "b")]["llr"] == pytest.approx(exp, abs=1e-3)
    assert got[("a", "b")]["n_pair"] == 2


def test_llr_prefers_evidence_over_rarity(spark):
    # the PMI-bias case: "x y" occurs once among junk (PMI would love
    # it), "m l" occurs 5 times — with min_count=1 LLR must rank the
    # evidenced pair first
    from mr_dice_spark.operators.terms import llr_collocations

    text = " ".join(["m l"] * 5 + ["x y"] + [f"f{i} g{i}" for i in range(20)])
    df = spark.createDataFrame([(text,)], "text string")
    out = llr_collocations(df, "text", min_count=1, k=50).collect()
    ranked = [(r["w1"], r["w2"]) for r in out]
    assert ranked.index(("m", "l")) < ranked.index(("x", "y"))


def test_rfm_segments_hand_values(spark):
    # 4 units, distinct on every metric -> one unit per quartile;
    # recency INVERTS (latest event = r_score 4). Unit d: latest ts,
    # most events, highest sum -> segment '444'; unit a: oldest/fewest/
    # lowest -> '111'
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.funnel import rfm_segments

    rows = []
    for i, u in enumerate(["a", "b", "c", "d"]):
        for j in range(i + 1):  # frequency 1..4
            rows.append((u, 1000 * (i + 1) + j, 10.0 * (i + 1)))
    df = spark.createDataFrame(rows, "u string, t long, v double").select(
        "u", F.timestamp_seconds("t").alias("ts"), "v"
    )
    got = {r["segment"]: r for r in rfm_segments(df, "u", "ts", "v").collect()}
    assert set(got) == {"111", "222", "333", "444"}
    assert got["444"]["n_units"] == 1
    assert got["444"]["avg_monetary"] == pytest.approx(160.0, abs=1e-6)
    assert got["111"]["avg_monetary"] == pytest.approx(10.0, abs=1e-6)


def test_rfm_boundary_ties_share_a_score(spark):
    # identical units: every metric equals every threshold -> strict >
    # comparisons all false -> everyone lands in one segment (ties are
    # never split arbitrarily)
    from pyspark.sql import functions as F

    from mr_dice_spark.operators.funnel import rfm_segments

    rows = [(u, 100, 5.0) for u in ("a", "b", "c", "d")]
    df = spark.createDataFrame(rows, "u string, t long, v double").select(
        "u", F.timestamp_seconds("t").alias("ts"), "v"
    )
    out = rfm_segments(df, "u", "ts", "v").collect()
    assert len(out) == 1 and out[0]["n_units"] == 4
    assert out[0]["segment"] == "411"  # zero recency gap = best; f/m floor


def test_uncertainty_coefficients_hand_values(spark):
    # perfect determination: y = f(x) (x fine, y coarse) with x in
    # {a,b,c,d} uniform, y = x in {a,b} -> 'u' else 'v'. H(x) = ln 4,
    # H(y) = ln 2, MI = H(y) -> U(y|x) = 1 (x fully explains y),
    # U(x|y) = ln2/ln4 = 0.5; G = 2*N*MI
    import math

    from mr_dice_spark.operators.profile import uncertainty_coefficients

    rows = [(x, "u" if x in ("a", "b") else "v") for x in "abcd" * 4]
    df = spark.createDataFrame(rows, "x string, y string")
    [r] = uncertainty_coefficients(df, "x", "y").collect()
    assert r["n"] == 16
    assert r["mi"] == pytest.approx(math.log(2), abs=1e-9)
    assert r["u_y_given_x"] == pytest.approx(1.0, abs=1e-9)
    assert r["u_x_given_y"] == pytest.approx(0.5, abs=1e-9)
    assert r["g"] == pytest.approx(32 * math.log(2), abs=1e-6)


def test_uncertainty_coefficients_constant_column_null(spark):
    from mr_dice_spark.operators.profile import uncertainty_coefficients

    rows = [("a", "k"), ("b", "k"), ("c", "k")]
    df = spark.createDataFrame(rows, "x string, y string")
    [r] = uncertainty_coefficients(df, "x", "y").collect()
    assert r["u_y_given_x"] is None  # H(y) = 0: nothing to explain
    assert r["mi"] == pytest.approx(0.0, abs=1e-12)
