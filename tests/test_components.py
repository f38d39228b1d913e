"""Connected-components clustering: known topologies + fixpoint invariants
+ the transitivity gap vs first-wins dedup."""

import pytest
from pyspark.sql import functions as F

from mr_dice_spark.operators.components import connected_components, dedup_connected


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["id"]: r["component"]
        for r in connected_components(df, **kw).collect()
    }


def test_chain_collapses_to_min(spark):
    # 1-2, 2-3, 3-4 : one component rooted at 1
    got = _cc(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_components(spark):
    got = _cc(spark, [(1, 2), (5, 6), (6, 7), (10, 11)])
    assert got == {1: 1, 2: 1, 5: 5, 6: 5, 7: 5, 10: 10, 11: 10}


def test_long_chain_within_iterations(spark):
    # hash-min propagates >=1 hop per iteration; a 7-chain needs ~6
    edges = [(i, i + 1) for i in range(7)]
    got = _cc(spark, edges, max_iter=8)
    assert set(got.values()) == {0}


def test_dedup_connected_vs_first_wins_transitivity(spark):
    # a~b, b~c but a!~c: first-wins (drop larger of each PAIR) keeps {1},
    # drops 2 and 3; connected dedup also keeps only 1 — but on a
    # star 1~2, 3~2 first-wins drops only 2 (keeps 1 AND 3, not a~c
    # transitive) while CC collapses all three. That asymmetry is the
    # documented difference.
    rows = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "doc_id long, t string")
    star = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    kept_cc = {r["doc_id"] for r in dedup_connected(rows, star, "doc_id").collect()}
    assert kept_cc == {1}
    from mr_dice_spark.operators.dedup import dedup_first_wins  # contrast

    losers_fw = star.select(F.col("id_b").alias("doc_id")).distinct()
    kept_fw = {r["doc_id"] for r in rows.join(losers_fw, "doc_id", "left_anti").collect()}
    assert kept_fw == {1}  # chain case agrees...
    star2 = spark.createDataFrame([(1, 2), (3, 2)], "id_a long, id_b long")
    # pair rule with id_a<id_b normalization: (1,2),(2,3) -> same as star;
    # the raw (3,2) pair drops only 2 under naive larger-loses
    kept_cc2 = {r["doc_id"] for r in dedup_connected(rows, star2, "doc_id").collect()}
    assert kept_cc2 == {1}  # CC still one component


def test_unpaired_rows_survive(spark):
    rows = spark.createDataFrame(
        [(i, "t") for i in range(6)], "doc_id long, t string"
    )
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    kept = {r["doc_id"] for r in dedup_connected(rows, pairs, "doc_id").collect()}
    assert kept == {0, 2, 3, 4, 5}


def test_connected_components_raises_on_nonconvergence(spark):
    import pytest as _pytest

    from mr_dice_spark.operators.components import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    with _pytest.raises(ValueError, match="did not converge"):
        connected_components(chain, max_iter=2)
    ok = connected_components(chain, max_iter=15)
    assert {r["component"] for r in ok.collect()} == {0}


def test_ngram_jaccard_join_matches_bruteforce_at_boundary_thresholds(spark):
    """AllPairs prefix filtering must stay EXACT, including where t*n lands
    on (or within fp error of) an integer — the ceil-nudge boundary — and
    on duplicate-dense inputs where prefixes are maximally pruned."""
    import itertools

    from mr_dice_spark.operators.dedup import ngram_jaccard_join, shingle_sets

    texts = [
        "a b c d e f g h i j k l",
        "a b c d e f g h i j k l",            # exact dup of 0
        "a b c d e f g h i j k X",            # near dup
        "z y x w v u t s r q p o",            # disjoint
        "a b c d e f q r s t u v",            # half overlap
        "m n o",                               # short doc
        "m n o p",                             # short near dup
        "",                                    # empty
        "a b",                                 # shorter than shingle width
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sets = {
        r["__id"]: set(r["__sh"])
        for r in shingle_sets(df, "doc_id", "text", 3).collect()
    }
    for t in (0.1, 0.25, 0.5, 0.75, 1.0):
        expect = set()
        for a, b in itertools.combinations(sorted(sets), 2):
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= t:
                expect.add((a, b))
        got = {
            (r["id_a"], r["id_b"])
            for r in ngram_jaccard_join(df, "doc_id", "text", t).collect()
        }
        assert got == expect, f"threshold {t}: {got ^ expect}"


def test_ngram_jaccard_join_no_reflexive_pairs_on_duplicate_ids(spark):
    """A duplicate id whose two rows land in different set classes must not
    produce a reflexive (id, id) pair — an output the per-row inverted-
    index join could never emit (round-2 review finding)."""
    from mr_dice_spark.operators.dedup import ngram_jaccard_join

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (1, "a b c d e X"), (2, "z y x w v u")],
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_join(df, "doc_id", "text", 0.1).collect()
    assert all(r["id_a"] != r["id_b"] for r in pairs)


def test_classes_cache_is_scoped_per_session(spark):
    """The persist FIFO lives on the SparkSession: sessions never evict each
    other's frames, rotation past the slot budget unpersists only the
    session's own oldest frame, and a dead session's frames drop with the
    session object (attribute lifetime == session lifetime)."""
    from mr_dice_spark.operators.dedup import (
        _CLASSES_CACHE_ATTR,
        _CLASSES_CACHE_SLOTS,
        _rotate_classes_cache,
    )

    other = spark.newSession()
    for s in (spark, other):
        if hasattr(s, _CLASSES_CACHE_ATTR):
            delattr(s, _CLASSES_CACHE_ATTR)

    # structurally distinct plans: plan canonicalization erases aliases, so
    # frames must differ in the Range itself or the shared CacheManager
    # treats them as one cache entry
    def persisted(s, n):
        return s.range(n).persist()

    a_frames = [persisted(spark, 3 + i) for i in range(_CLASSES_CACHE_SLOTS + 1)]
    b_frame = persisted(other, 100)
    _rotate_classes_cache(other, b_frame)
    for f in a_frames:
        _rotate_classes_cache(spark, f)

    a_cache = getattr(spark, _CLASSES_CACHE_ATTR)
    b_cache = getattr(other, _CLASSES_CACHE_ATTR)
    # spark's 5th insert rotated out only spark's own oldest frame
    assert a_frames[0].storageLevel.useMemory is False
    assert all(f.storageLevel.useMemory for f in a_frames[1:])
    assert a_cache == a_frames[1:]
    # the other session's frame was untouched by spark's rotations
    assert b_cache == [b_frame] and b_frame.storageLevel.useMemory
    # the FIFO is an attribute of the session object itself, so a dropped
    # session releases its cache through ordinary GC (no module global
    # keeps the frames alive)
    import mr_dice_spark.operators.dedup as dedup_mod

    assert not any(
        isinstance(v, list) and v is not a_cache and v is not b_cache
        and any(isinstance(x, type(b_frame)) for x in v)
        for v in vars(dedup_mod).values()
    )
    for f in a_frames[1:] + [b_frame]:
        f.unpersist(False)
    delattr(spark, _CLASSES_CACHE_ATTR)
    delattr(other, _CLASSES_CACHE_ATTR)


def test_chunk_documents_edges(spark):
    from mr_dice_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),   # 7 tokens
            (2, "x y"),             # shorter than chunk
            (3, ""),                # empty -> no chunks
            (4, None),              # null -> no chunks
            (5, "   "),             # whitespace-only -> no chunks
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, "doc_id", "text", chunk_tokens=3, overlap_tokens=1)
    got = {
        (r["doc_id"], r["chunk_id"]): (r["start_token"], r["n_tokens"], r["chunk_text"])
        for r in out.collect()
    }
    # stride 2: starts 0,2,4 — start 6 would emit the lone 'g' already
    # fully contained in 'e f g' (start + overlap >= n), so it is dropped;
    # a genuinely short tail (start + overlap < n) is still kept
    assert got == {
        (1, 0): (0, 3, "a b c"),
        (1, 1): (2, 3, "c d e"),
        (1, 2): (4, 3, "e f g"),
        (2, 0): (0, 2, "x y"),
    }

    # 8 tokens: start 6 has start + overlap = 7 < 8, so the short tail
    # 'g h' carries the uncovered token h and survives
    eight = spark.createDataFrame([(1, "a b c d e f g h")], "doc_id long, text string")
    tail = {
        (r["chunk_id"]): (r["start_token"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(eight, "doc_id", "text", 3, 1).collect()
    }
    assert tail[3] == (6, 2, "g h")

    # zero overlap is untouched by the containment rule: every token
    # appears exactly once, tail kept
    nz = {
        r["chunk_id"]: r["chunk_text"]
        for r in chunk_documents(docs.where("doc_id = 1"), "doc_id", "text", 3, 0).collect()
    }
    assert nz == {0: "a b c", 1: "d e f", 2: "g"}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlap_tokens"):
        chunk_documents(docs, "doc_id", "text", chunk_tokens=3, overlap_tokens=3)
    with _pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(docs, "doc_id", "text", chunk_tokens=0)
