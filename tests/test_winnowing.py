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
