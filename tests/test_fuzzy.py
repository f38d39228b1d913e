"""Tests for the edit-distance-1 pigeonhole join (operators/fuzzy.py)."""

from __future__ import annotations

import itertools
import random

import pytest

from mr_dice_spark.operators.fuzzy import edit_distance_join


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _expected(rows):
    return sorted(
        (a, b, _lev(sa, sb))
        for (a, sa), (b, sb) in itertools.combinations(rows, 2)
        if sa is not None and sb is not None and _lev(sa, sb) <= 1
    )


def _got(spark, rows):
    df = spark.createDataFrame(rows, "id long, s string")
    return sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_join(df, "id", "s").collect()
    )


def test_edit_distance_join_randomized_exact_recall(spark):
    """200 random strings over a 3-letter alphabet (dense near-pairs,
    every edit type, lengths 0-6): the pigeonhole join must equal the
    brute-force pair set EXACTLY — recall is structural, not
    probabilistic."""
    rng = random.Random(11)
    rows = [
        (i, "".join(rng.choice("abc") for _ in range(rng.randint(0, 6))))
        for i in range(200)
    ]
    assert _got(spark, rows) == _expected(rows)


def test_edit_distance_join_edge_shapes(spark):
    """Empty vs 1-char (insert at the boundary), exact duplicates
    (dist 0), NULLs excluded."""
    rows = [(1, ""), (2, "a"), (3, "a"), (4, None), (5, "ab")]
    assert _got(spark, rows) == _expected([r for r in rows])


def test_edit_distance_join_general_k_randomized(spark):
    """k=2 and k=3 (general PassJoin path): exact match with brute force
    over a dense 2-letter alphabet with lengths 0-7 — every segment/
    shift/tiny-string case fires; k=0 rejected."""
    from mr_dice_spark.operators.fuzzy import edit_distance_join_k

    rng = random.Random(7)
    rows = [
        (i, "".join(rng.choice("ab") for _ in range(rng.randint(0, 7))))
        for i in range(120)
    ]
    for k in (2, 3):
        df = spark.createDataFrame(rows, "id long, s string")
        got = sorted(
            (r["id_a"], r["id_b"], r["dist"])
            for r in edit_distance_join(df, "id", "s", max_dist=k).collect()
        )
        exp = sorted(
            (a, b, _lev(sa, sb))
            for (a, sa), (b, sb) in itertools.combinations(rows, 2)
            if _lev(sa, sb) <= k
        )
        assert got == exp
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_join_k(df, "id", "s", 0)


def test_edit_distance_join_k_hot_block_refinement_exact(spark):
    """The OPT-IN general-k hot-block refinement (r12,
    ``edit_distance_join_k(hot_block_product=...)``): re-keying hot
    blocks by the <=k-deletion neighborhood of the remainder AROUND the
    shared interior segment must keep the pair set bit-identical to the
    unrefined path, on corpora engineered to fire every routing branch —
    low-entropy digit cores behind shared affixes (hot keys on every
    segment), repeated substrings (multi-occurrence probe splits), and
    tiny strings (the unrefinable 'T' block)."""
    from mr_dice_spark.operators.fuzzy import edit_distance_join_k

    rng = random.Random(11)
    corpora = [
        [f"X{i % 90:02d}Z" for i in range(160)],
        ["ab" * rng.randint(1, 4) + rng.choice(["", "a", "b", "ba"])
         for _ in range(120)],
        ["a", "", "ab", "ba"] * 3
        + ["".join(rng.choice("abc") for _ in range(rng.randint(0, 6)))
           for _ in range(100)],
    ]
    for k in (2, 3):
        for strs in corpora:
            rows = [(i, s) for i, s in enumerate(strs)]
            df = spark.createDataFrame(rows, "id long, s string")
            exp = sorted(
                (a, b, _lev(sa, sb))
                for (a, sa), (b, sb) in itertools.combinations(rows, 2)
                if _lev(sa, sb) <= k
            )
            for hbp in (50, 5):  # force refinement on many/all keys
                got = sorted(
                    (r["id_a"], r["id_b"], r["dist"])
                    for r in edit_distance_join_k(
                        df, "id", "s", k, hot_block_product=hbp
                    ).collect()
                )
                assert got == exp, f"k={k} hbp={hbp}"


def test_edit_distance_join_k_shift_tightening_long_strings(spark):
    """The r11 shift-tightening (|sh| + |Δ-sh| <= k admissibility in the
    general-k probe) must not lose pairs on LONGER strings, where indel
    placement drives the matched segment through every admissible shift:
    brute-force parity at k=2 over length-9..14 strings built by seeded
    random edits (indel-heavy) of a few stems."""
    from mr_dice_spark.operators.fuzzy import edit_distance_join

    rng = random.Random(11)
    stems = ["abcabcabcabc", "aabbccddeeff", "abababababab"]
    rows = []
    rid = 0
    for stem in stems:
        for _ in range(25):
            s = list(stem)
            for _ in range(rng.randint(0, 3)):
                op = rng.choice("ids")
                p = rng.randrange(len(s) + (op == "i"))
                if op == "i":
                    s.insert(p, rng.choice("abcdef"))
                elif op == "d" and s:
                    del s[p % len(s)]
                else:
                    s[p % len(s)] = rng.choice("abcdef")
            rows.append((rid, "".join(s)))
            rid += 1
    df = spark.createDataFrame(rows, "id long, s string")
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_join(df, "id", "s", max_dist=2).collect()
    )
    exp = sorted(
        (a, b, _lev(sa, sb))
        for (a, sa), (b, sb) in itertools.combinations(rows, 2)
        if _lev(sa, sb) <= 2
    )
    assert got == exp


def test_affix_strip_preserves_pair_set_on_id_corpora(spark):
    """Common prefix AND suffix (an 'ORDER#____/2024' shape): the strip
    must yield the identical pair set as the unstripped join — the
    strip-common-affixes lemma, checked against brute force and against
    strip_affixes=False."""
    rows = [(i, f"ORDER#{i:04d}/2024") for i in range(120)]
    rows += [(500, None), (501, "ORDER#0007/2024")]  # dup of i=7 + NULL
    got = _got(spark, rows)
    assert got == _expected(rows)
    from mr_dice_spark.operators.fuzzy import edit_distance_join

    df = spark.createDataFrame(rows, "id long, s string")
    raw = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_join(df, "id", "s", strip_affixes=False).collect()
    )
    assert got == raw


def test_hot_block_refinement_exact_on_subset_constant_halves(spark):
    """Two clusters with constant-but-different first halves PLUS a
    union of corrupted twins (the ER-linkage shape): corpus LCP is
    empty so the affix strip no-ops, and each cluster's P-block holds
    the whole cluster. With the hot threshold forced low, the deletion-
    neighborhood refinement must fire and still produce the exact
    brute-force pair set; disabled must agree."""
    rows = [(i, f"AAAAAAAAAA{i:04d}") for i in range(120)]
    rows += [(1000 + i, f"BBBBBBBBBB{i:04d}") for i in range(120)]
    # corrupted twins: delete one char at a varying position
    rows += [(2000 + i, s[: i % len(s)] + s[i % len(s) + 1:]) for i, s in
             ((i, f"AAAAAAAAAA{i:04d}") for i in range(0, 120, 3))]
    rows += [(5000, None), (5001, "AAAAAAAAAA0007")]
    df = spark.createDataFrame(rows, "id long, s string")
    exp = _expected(rows)
    got_hot = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_join(df, "id", "s", hot_block_product=50).collect()
    )
    got_off = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_join(df, "id", "s", hot_block_product=None).collect()
    )
    assert got_hot == exp
    assert got_off == exp


def test_hot_block_refinement_caps_pathological_corpora(spark):
    """A corpus where every blocking key is hot (threshold 0, unique
    random strings so there are far more than the key cap): the
    operator must refuse to expand it with guidance rather than
    silently multiplying every row's keys."""
    rng = random.Random(99)
    rows = [
        (i, "".join(rng.choice("abcdefghij") for _ in range(12)))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    with pytest.raises(ValueError, match="hot_block_product"):
        edit_distance_join(df, "id", "s", hot_block_product=0).collect()


def test_interior_constant_fail_fast_error_text_is_the_contract(spark):
    """The module docstring promises the interior-constant corpus an
    exception whose text carries the dedupe-first remediation — pin the
    guidance strings so they are part of the API (VERDICT r5 item 7)."""
    rng = random.Random(7)
    rows = [
        (i, "".join(rng.choice("abcdefghij") for _ in range(6)) + "XXSTDXX"
         + "".join(rng.choice("abcdefghij") for _ in range(6)))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    with pytest.raises(ValueError) as exc:
        edit_distance_join(df, "id", "s", hot_block_product=0).collect()
    msg = str(exc.value)
    assert "pathological for segment blocking" in msg
    assert "Deduplicate exact strings first" in msg
    assert "hot_block_product" in msg
    # the max_block_rows breaker's guidance is likewise pinned (low-entropy
    # affixes so segment blocks actually cluster: 8 distinct halves/side)
    rows2 = [
        (i, "".join(rng.choice("ab") for _ in range(3)) + "XXSTDXX"
         + "".join(rng.choice("ab") for _ in range(3)))
        for i in range(400)
    ]
    df2 = spark.createDataFrame(rows2, "id long, s string")
    with pytest.raises(ValueError) as exc2:
        edit_distance_join(
            df2, "id", "s", hot_block_product=None, max_block_rows=10
        ).collect()
    msg2 = str(exc2.value)
    assert "constant interior substring" in msg2
    assert "max_block_rows" in msg2


def test_max_block_rows_breaker_fires_on_clustered_constant_halves(spark):
    """Two clusters whose first HALVES are constant but differ from each
    other: the corpus-wide LCP is empty, so the affix strip cannot help,
    and each cluster's P-segment block holds the whole cluster — the
    circuit breaker must fail fast with guidance instead of running
    quadratic; a generous cap must let the same corpus through."""
    import pytest

    from mr_dice_spark.operators.fuzzy import edit_distance_join

    rows = [(i, f"AAAAAAAAAA{i:04d}") for i in range(150)]
    rows += [(1000 + i, f"BBBBBBBBBB{i:04d}") for i in range(150)]
    df = spark.createDataFrame(rows, "id long, s string")
    with pytest.raises(ValueError, match="max_block_rows"):
        edit_distance_join(df, "id", "s", max_block_rows=50).collect()
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_join(df, "id", "s", max_block_rows=1000).collect()
    )
    assert got == _expected(rows)


def test_sorted_neighborhood_pairs_exact_window(spark):
    from mr_dice_spark.operators.fuzzy import sorted_neighborhood_pairs

    # one block of 6 sorted names + a second block that must not mix
    rows = [(i, f"name{i:02d}", "A") for i in range(6)] + [
        (100, "name00", "B"), (101, "name01", "B")
    ]
    df = spark.createDataFrame(rows, "id long, k string, blk string")
    out = sorted_neighborhood_pairs(df, "id", "k", "blk", window=3)
    pairs = sorted((r["id1"], r["id2"], r["gap"]) for r in out.collect())
    # block A: gaps 1 and 2 only; block B: single gap-1 pair
    expect = sorted(
        [(i, i + 1, 1) for i in range(5)]
        + [(i, i + 2, 2) for i in range(4)]
        + [(100, 101, 1)]
    )
    assert pairs == expect


def test_sorted_neighborhood_pairs_verify_and_validate(spark):
    import pytest

    from mr_dice_spark.operators.fuzzy import sorted_neighborhood_pairs

    rows = [(1, "smith", "x"), (2, "smyth", "x"), (3, "zzzzzzzz", "x")]
    df = spark.createDataFrame(rows, "id long, k string, blk string")
    out = sorted_neighborhood_pairs(df, "id", "k", "blk", window=3, max_distance=1)
    got = [(r["id1"], r["id2"], r["distance"]) for r in out.collect()]
    assert got == [(1, 2, 1)]
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "id", "k", "blk", window=1)


def test_sorted_neighborhood_plan_is_hash_join(spark):
    from mr_dice_spark.operators.fuzzy import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x")], "id long, k string, blk string"
    )
    plan = (
        sorted_neighborhood_pairs(df, "id", "k", "blk", window=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# Jaro-Winkler blocked pairs
# ---------------------------------------------------------------------------


def test_jaro_winkler_bytes_reference_values():
    import pytest as _pt

    from mr_dice_spark.operators.fuzzy import _jaro_winkler_bytes as jwb

    # classic textbook values
    assert jwb(b"MARTHA", b"MARHTA") == _pt.approx(0.9611111111, abs=1e-9)
    assert jwb(b"DIXON", b"DICKSONX") == _pt.approx(0.8133333333, abs=1e-9)
    assert jwb(b"abc", b"abc") == 1.0
    assert jwb(b"abc", b"xyz") == 0.0
    # DuckDB's empty-side convention: 0, even for both-empty
    assert jwb(b"", b"") == 0.0
    assert jwb(b"a", b"") == 0.0


def test_jaro_winkler_bytes_matches_duckdb_bitwise():
    import random

    import duckdb

    from mr_dice_spark.operators.fuzzy import _jaro_winkler_bytes as jwb

    con = duckdb.connect()
    rng = random.Random(31)
    for _ in range(400):
        a = "".join(rng.choice("abcdef xyz") for _ in range(rng.randint(0, 16)))
        b = "".join(rng.choice("abcdef xyz") for _ in range(rng.randint(0, 16)))
        d = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert jwb(a.encode(), b.encode()) == d, (a, b)
    # byte-level (not code-point) matching, the DuckDB semantics
    d = con.execute(
        "SELECT jaro_winkler_similarity('café', 'cafe')"
    ).fetchone()[0]
    assert jwb("café".encode(), "cafe".encode()) == d


def test_jaro_winkler_pairs_blocking_and_threshold(spark):
    from mr_dice_spark.operators.fuzzy import jaro_winkler_pairs

    rows = [
        (1, "martha", "m"), (2, "marhta", "m"), (3, "mxqzwv", "m"),
        (4, "martha", "x"),  # different block: never paired with 1/2
        (5, None, "m"), (6, "martha", None),
    ]
    df = spark.createDataFrame(rows, "id long, name string, blk string")
    got = {
        (r["id_a"], r["id_b"]): r["jw"]
        for r in jaro_winkler_pairs(df, "id", "name", "blk", threshold=0.9).collect()
    }
    assert set(got) == {(1, 2)}
    assert abs(got[(1, 2)] - 0.961111) < 1e-9  # rounded to the 6dp grid


def test_jaro_winkler_pairs_breaker_fires(spark):
    import pytest as _pt

    from mr_dice_spark.operators.fuzzy import jaro_winkler_pairs

    rows = [(i, f"name{i}", "hot") for i in range(20)]
    df = spark.createDataFrame(rows, "id long, name string, blk string")
    with _pt.raises(ValueError, match="max_block_rows=10"):
        jaro_winkler_pairs(df, "id", "name", "blk", max_block_rows=10)
    # opt-out scores the quadratic block
    out = jaro_winkler_pairs(
        df, "id", "name", "blk", threshold=0.0, max_block_rows=None
    )
    assert out.count() == 190


def test_jaro_winkler_pairs_default_breaker_is_tractable():
    """The ON-by-default cap must bound projected pair work at a scale a
    single Arrow stream can actually digest: C(default, 2) ~ 12.5M pure-
    Python scorings, not the ~5e9 the old 100k default admitted
    (ADVICE r8)."""
    import inspect

    from mr_dice_spark.operators.fuzzy import jaro_winkler_pairs

    default = inspect.signature(jaro_winkler_pairs).parameters[
        "max_block_rows"
    ].default
    assert default is not None, "breaker must be ON by default"
    assert default * (default - 1) // 2 <= 20_000_000


def test_jaro_winkler_bytes_properties():
    """Symmetry, range, identity — cheap pure-Python properties over
    random byte strings (the cross-engine bitwise pin lives in
    test_jaro_winkler_bytes_matches_duckdb_bitwise)."""
    import random

    from mr_dice_spark.operators.fuzzy import _jaro_winkler_bytes as jwb

    rng = random.Random(97)
    for _ in range(500):
        a = bytes(rng.randrange(97, 123) for _ in range(rng.randint(0, 14)))
        b = bytes(rng.randrange(97, 123) for _ in range(rng.randint(0, 14)))
        s_ab, s_ba = jwb(a, b), jwb(b, a)
        assert s_ab == s_ba  # symmetric
        assert 0.0 <= s_ab <= 1.0
        if a:
            assert jwb(a, a) == 1.0
