"""End-to-end training-data pipeline integration test.

Each stage has its own oracle-checked golden; this test chains them the
way a real corpus build would run — curate -> decontaminate -> near-dup
dedup -> sequence packing — and checks the CROSS-STAGE invariants that
per-stage tests cannot see: monotone shrinkage, id conservation (no stage
invents or forks documents), and token conservation into the packed
stream.
"""

from pyspark.sql import functions as F

from mr_dice_spark.catalog import Catalog


def test_corpus_build_pipeline_invariants(spark, oracle_sf_dir):
    from mr_dice_spark.functions.text import token_count
    from mr_dice_spark.operators.curation import curate_corpus
    from mr_dice_spark.operators.decontaminate import decontaminate
    from mr_dice_spark.operators.dedup import minhash_lsh_dedup
    from mr_dice_spark.operators.packing import pack_sequences

    docs = Catalog(spark, oracle_sf_dir).documents.select("doc_id", "text")
    n0 = docs.count()

    # stage 1: curation verdicts -> keep survivors
    verdicts = curate_corpus(docs, "doc_id", "text")
    assert verdicts.count() == n0  # a verdict for every doc, none forked
    kept_ids = verdicts.where(F.col("verdict") == "keep").select("doc_id")
    stage1 = docs.join(kept_ids, "doc_id", "left_semi")
    n1 = stage1.count()
    assert 0 < n1 < n0  # the fixture plants both keepers and droppers

    # stage 2: decontamination against a probe set (first 20 docs as fake
    # benchmark); contaminated ids must be a subset of stage-1 ids
    probe = docs.orderBy("doc_id").limit(20).select(F.col("text").alias("ptext"))
    stage2 = decontaminate(stage1, "doc_id", "text", probe, "ptext", n=5, max_share=0.5)
    n2 = stage2.count()
    assert n2 <= n1

    # stage 3: near-dup dedup; survivors are a subset, and the kept doc of
    # every dropped near-dup pair is the smaller id (first-wins rule)
    stage3 = minhash_lsh_dedup(stage2, "doc_id", "text", threshold=0.7)
    n3 = stage3.count()
    assert 0 < n3 <= n2
    s2_ids = {r["doc_id"] for r in stage2.select("doc_id").collect()}
    s3_ids = {r["doc_id"] for r in stage3.select("doc_id").collect()}
    assert s3_ids <= s2_ids

    # stage 4: sequence packing over the survivors conserves tokens
    packed = pack_sequences(stage3, "doc_id", token_count(F.col("text")), seq_len=512)
    assert packed.count() == n3  # one packing row per surviving doc
    total_tokens = stage3.select(
        F.sum(token_count(F.col("text"))).alias("t")
    ).collect()[0]["t"]
    pk = packed.agg(
        F.sum("n_tokens").alias("t"),
        F.max(F.col("start_offset") + F.col("n_tokens")).alias("end"),
    ).collect()[0]
    assert pk["t"] == total_tokens          # no tokens lost or invented
    assert pk["end"] == total_tokens        # offsets tile the stream exactly
    # packed stream covers ceil(total/seq_len) sequences
    n_seqs = packed.agg(F.max("last_seq")).collect()[0][0]
    assert n_seqs == (total_tokens - 1) // 512


def test_driver_window_is_exactly_fifty_registered_goldens():
    """The driver's CORRECTNESS check covers the first 50 queries() in
    dict order. A typo'd name silently shrinks the window (the head
    filter drops unknowns) and a 51st entry silently never gets checked —
    both must fail CI instead."""
    import __spark_entry__ as e
    from mr_dice_spark.golden import GOLDEN

    names = e._CHECK_FIRST
    assert len(names) == 50
    assert len(set(names)) == 50, "duplicate window entries"
    unknown = [n for n in names if n not in GOLDEN]
    assert not unknown, f"window entries not in GOLDEN: {unknown}"
    # and the head of queries() is exactly the window, in order
    assert list(e.queries())[:50] == list(names)


def test_containment_join_directional_semantics(spark):
    """A doc fully inside a bigger doc must emit src->dst at 1.0 while
    the reverse direction stays below threshold; identical docs emit
    both directions at 1.0."""
    from mr_dice_spark.operators.dedup import ngram_containment_join

    big = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    small = "alpha beta gamma delta epsilon"      # 3 shingles, all in big
    df = spark.createDataFrame(
        [(1, big), (2, small), (3, big), (4, "totally different words here now")],
        "doc_id long, text string",
    )
    got = {
        (r["src_id"], r["dst_id"]): r["containment"]
        for r in ngram_containment_join(df, "doc_id", "text", 0.9).collect()
    }
    # small -> big in both copies of big; big never fits inside small
    assert got[(2, 1)] == 1.0 and got[(2, 3)] == 1.0
    assert (1, 2) not in got and (3, 2) not in got
    # exact copies: both directions
    assert got[(1, 3)] == 1.0 and got[(3, 1)] == 1.0
    assert not any(4 in p for p in got)
