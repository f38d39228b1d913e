"""Similarity search over embedding columns (north-star operator).

Brute-force cosine top-k is the exact baseline; the LSH (random hyperplane)
variant is the 100 TB path: signatures prune the candidate space, exact
cosine reranks. Everything is built from array expressions
(zip_with/aggregate) so the dot products run inside whole-stage codegen —
no Python, no UDF. The reference's nearest analogue is the blocked
StructureMatcher near-dup join (SURVEY.md §2.7 D4): block cheaply, verify
exactly on the survivors.
"""

from __future__ import annotations

import math
import random

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mr_dice_spark.operators.scale import fan_out


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk_bruteforce(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector.

    One scan, no shuffle beyond the global top-k (TakeOrderedAndProject);
    this is the correct plan shape even at scale — the k results are tiny.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine(F.col(vec_col).cast("array<double>"), q).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def signature_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit i = sign(vec . plane_i). Returns a
    long (n_planes <= 63)."""
    bits = [
        F.when(
            dot(vec, F.array(*[F.lit(float(x)) for x in p])) >= 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def cosine_topk_batch(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    q_id_col: str,
    q_vec_col: str,
    k: int = 10,
    round_scores: int | None = None,
) -> DataFrame:
    """Exact top-k per query for a whole QUERY SET in one corpus scan.

    The offline-serving shape (score a batch of probes against the corpus):
    the query table broadcasts, every corpus row scores all queries via a
    BroadcastNestedLoopJoin (deliberate — the small side is the query set),
    and the per-query top-k runs as row_number over (query, -score), which
    Spark rewrites to WindowGroupLimit: each map partition forwards at most
    k rows per query BEFORE the shuffle. Cost: one corpus scan + one
    (queries x k)-bounded shuffle, vs Q separate scans for Q single-query
    calls.
    """
    q = queries.select(
        F.col(q_id_col).alias("__qid"),
        F.col(q_vec_col).cast("array<double>").alias("__qv"),
    )
    score = cosine(F.col("__v"), F.col("__qv"))
    if round_scores is not None:
        # rank on the rounded grid: with scores quantized BEFORE the
        # row_number, top-k membership at the boundary is decided by the
        # deterministic id tiebreak instead of last-bit double noise —
        # required when results are compared across engines
        score = F.round(score + F.lit(1e-9), round_scores)
    scored = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))
        .crossJoin(F.broadcast(q))
        .select("__qid", id_col, score.alias("cosine"))
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(F.col("__qid").alias(q_id_col), id_col, "cosine")
    )


def hard_negative_mining(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    queries: DataFrame,
    q_id_col: str,
    q_vec_col: str,
    q_label_col: str,
    k: int = 5,
    round_scores: int | None = None,
) -> DataFrame:
    """Contrastive-training hard negatives: for each query, the top-k
    corpus vectors by cosine whose LABEL DIFFERS from the query's — the
    most-confusable wrong answers that make the strongest training
    negatives (easy random negatives teach a model nothing). Rows with
    NULL labels never qualify (an unlabeled vector is not a known
    negative).

    Same plan shape as cosine_topk_batch — broadcast query set, one
    corpus scan, per-query WindowGroupLimit top-k — with the label
    predicate applied BEFORE the window so disqualified rows never
    enter the rank. At 100 TB: one scan + a (queries x k)-bounded
    shuffle, regardless of corpus size."""
    q = queries.select(
        F.col(q_id_col).alias("__qid"),
        F.col(q_vec_col).cast("array<double>").alias("__qv"),
        F.col(q_label_col).alias("__qlabel"),
    )
    score = cosine(F.col("__v"), F.col("__qv"))
    if round_scores is not None:
        score = F.round(score + F.lit(1e-9), round_scores)
    scored = (
        df.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("__v"),
            F.col(label_col).alias("__label"),
        )
        .crossJoin(F.broadcast(q))
        .where(
            F.col("__label").isNotNull()
            & F.col("__qlabel").isNotNull()
            & (F.col("__label") != F.col("__qlabel"))
        )
        .select("__qid", id_col, F.col("__label").alias("neg_label"), score.alias("cosine"))
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(F.col("__qid").alias(q_id_col), id_col, "neg_label", "cosine")
    )


def cosine_topk_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 16,
    max_hamming: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucket filter + exact rerank.

    Candidates are rows whose signature is within ``max_hamming`` bits of
    the query's (hamming on signatures approximates angle). The signature
    filter is a scan-side predicate — at scale, signatures would be a stored
    column (computed at ingest) so the filter prunes before any vector math.
    """
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    q_sig = 0
    for i, p in enumerate(planes):
        if sum(x * y for x, y in zip(query_vec, p)) >= 0:
            q_sig |= 1 << i
    vec = F.col(vec_col).cast("array<double>")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cand = df.withColumn("__sig", signature_bits(vec, planes)).where(
        F.bit_count(F.col("__sig").bitwiseXOR(F.lit(q_sig).cast("long"))) <= max_hamming
    )
    return (
        cand.select(F.col(id_col), cosine(vec, q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def embedding_near_dup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = 16,
    band_bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= t).

    LSH banding on hyperplane signatures proposes candidates (pairs agreeing
    on at least one band of ``band_bits`` signature bits); exact cosine
    verifies. Dimension is read from the first row.
    """
    first = df.select(F.size(vec_col)).first()
    if first is None:
        # schema-correct empty result: the id type must match the non-empty
        # path or downstream unions break only in the empty case
        id_type = dict(df.dtypes)[id_col]
        return df.sparkSession.createDataFrame(
            [], f"id_a {id_type}, id_b {id_type}, cosine double"
        )
    dim = first[0]
    planes = _hyperplanes(dim, n_planes, seed)
    vec = F.col(vec_col).cast("array<double>")
    sig = fan_out(df.select(F.col(id_col).alias("__id"), vec.alias("__v"))).withColumn(
        "__sig", signature_bits(F.col("__v"), planes)
    )
    n_bands = max(1, n_planes // band_bits)
    keyed = sig.select(
        "__id",
        "__v",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("__sig"), b * band_bits)
                    .bitwiseAND(F.lit((1 << band_bits) - 1).cast("long"))
                    for b in range(n_bands)
                ]
            )
        ).alias("__band", "__key"),
    )
    # distinct on the ID pair alone, vectors joined back after: a distinct
    # keyed on full embedding arrays would shuffle dim x 8 bytes x 2 per
    # duplicated band collision (same pattern as minhash_lsh_candidates)
    pairs = (
        keyed.alias("x")
        .join(
            keyed.alias("y"),
            (F.col("x.__band") == F.col("y.__band"))
            & (F.col("x.__key") == F.col("y.__key"))
            & (F.col("x.__id") < F.col("y.__id")),
        )
        .select(F.col("x.__id").alias("id_a"), F.col("y.__id").alias("id_b"))
        .distinct()
    )
    vecs = sig.select("__id", "__v")
    return (
        pairs.join(vecs.withColumnsRenamed({"__id": "id_a", "__v": "__va"}), "id_a")
        .join(vecs.withColumnsRenamed({"__id": "id_b", "__v": "__vb"}), "id_b")
        .select("id_a", "id_b", cosine(F.col("__va"), F.col("__vb")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_centroids: int = 16,
    centroids: list[tuple[int, list[float]]] | None = None,
    round_scores: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023,
    arXiv:2303.09540 — public method): cluster the embeddings, compare
    pairs only WITHIN a cluster, and drop every member whose cosine to a
    lower-id member of its cluster reaches ``threshold`` (the repo's
    deterministic first-wins rule, same as dedup_exact). Returns one row
    per input id: (id, cluster, kept).

    Scale shape: the cluster key bounds the candidate space — the
    self-join shuffles once on ``cluster`` and never materializes a
    cross-cluster pair, so total pair work is sum(|cluster|^2) instead of
    N^2. With k-means centroids sized so clusters hold ~C items
    (n_centroids ~ N/C) this is linear in N; the LSH-banded
    :func:`embedding_near_dup` is the alternative when no good clustering
    exists. Like SemDeDup itself, cross-cluster near-duplicates are
    missed by design — the paper's (documented) recall trade for
    linearity.

    ``centroids`` defaults to ivf_assign's deterministic sampled init
    (first n by id; fully SQL-restatable — what the golden's oracle
    checks); pass :func:`kmeans_fit` output in production.
    ``round_scores`` compares cosines on a rounded grid so an
    exact-threshold boundary cannot split engines in oracle checks."""
    assigned, _ = ivf_assign(df, id_col, vec_col, n_centroids, centroids)
    slim = assigned.select(
        F.col(id_col).alias("__id"),
        F.col("__cluster"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    cos = cosine(F.col("x.__v"), F.col("y.__v"))
    if round_scores is not None:
        cos = F.round(cos + F.lit(1e-9), round_scores)
    dropped = (
        slim.alias("x")
        .join(
            slim.alias("y"),
            (F.col("x.__cluster") == F.col("y.__cluster"))
            & (F.col("x.__id") < F.col("y.__id")),
        )
        .where(cos >= F.lit(threshold))
        .select(F.col("y.__id").alias("__id"))
        .distinct()
    )
    return (
        slim.join(dropped.withColumn("__dropped", F.lit(True)), "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.col("__cluster").alias("cluster"),
            F.coalesce(~F.col("__dropped"), F.lit(True)).alias("kept"),
        )
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN index
# ---------------------------------------------------------------------------

def _argmax_cluster(vec: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """Cluster id of the most-cosine-similar broadcast centroid (ties ->
    lowest id). Centroids are unit-normalized driver-side so the score
    dot(v, unit_c) is proportional to the true cosine (row norm is a
    positive per-row constant — argmax-invariant, so not computed).
    Unrolled struct-max over literal centroid arrays: stays in whole-stage
    codegen, no UDF, no shuffle."""
    if len(centroids) == 1:  # greatest() needs >= 2 args
        return F.lit(centroids[0][0])
    best = F.greatest(
        *[
            F.struct(
                dot(vec, F.array(*[F.lit(x) for x in _unit(c)])).alias("sim"),
                F.lit(-ci).alias("neg_cluster"),
            )
            for ci, c in centroids
        ]
    )
    return -best["neg_cluster"]


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 16,
    n_iter: int = 5,
) -> list[tuple[int, list[float]]]:
    """Spherical k-means (Lloyd's) over an embedding column; returns
    ``[(cluster_id, unit_centroid)]`` for :func:`ivf_assign`.

    Deterministic init (first ``k`` vectors by id). Each sweep is one
    broadcast-argmax assignment pass + one per-dimension mean: the vectors
    are unit-normalized per row, posexploded to (cluster, dim, component)
    and hash-aggregated, so the shuffle carries k × dim partial sums per
    map partition — never the vectors. The spherical update
    unit(sum(v/|v|)) maximizes mean assigned cosine, making it
    non-decreasing sweep to sweep (summing RAW vectors would let one
    large-norm vector dominate a cluster and break the guarantee). Empty
    clusters keep their previous centroid. Driver state is k × dim floats
    per sweep — trivial at any corpus size; cost is n_iter × (one scan +
    one k×dim-wide shuffle).
    """
    rows = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .orderBy(F.col(id_col))
        .limit(k)
        .collect()
    )
    centroids = [(i, _unit([float(x) for x in r[1]])) for i, r in enumerate(rows)]
    vec = F.col(vec_col).cast("array<double>")
    for _ in range(n_iter):
        assigned = df.select(
            _argmax_cluster(vec, centroids).alias("__cluster"),
            vec.alias("__v"),
            norm(vec).alias("__norm"),
        )
        sums = (
            assigned.select(
                "__cluster", "__norm", F.posexplode("__v").alias("__dim", "__x")
            )
            .groupBy("__cluster", "__dim")
            # zero-norm vectors contribute 0 to the mean direction; a plain
            # division would yield NULL (Spark divide-by-zero), NULL-poison
            # the sum for all-zero clusters, and crash _unit with None
            .agg(
                F.sum(
                    F.when(F.col("__norm") > 0, F.col("__x") / F.col("__norm"))
                    .otherwise(F.lit(0.0))
                ).alias("__s")
            )
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in sums:
            by_cluster.setdefault(r["__cluster"], {})[r["__dim"]] = r["__s"]
        new = []
        for ci, old in centroids:
            dims = by_cluster.get(ci)
            if dims:
                mean = [dims.get(d, 0.0) for d in range(len(old))]
                new.append((ci, _unit(mean)))
            else:
                new.append((ci, old))  # empty cluster: keep previous centroid
        centroids = new
    return centroids


def _unit(v: list[float]) -> list[float]:
    n = math.sqrt(sum(x * x for x in v)) or 1.0
    return [x / n for x in v]


def ivf_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Partition vectors into ``n_centroids`` inverted lists.

    Default centroids are the first ``n_centroids`` vectors by id —
    deterministic "sampled init"; pass :func:`kmeans_fit` output for
    trained lists (tighter clusters -> better probe recall). Returns
    (assigned DataFrame with a ``__cluster`` column, centroid list).

    Scale shape: the centroid table is tiny and broadcast; assignment is one
    narrow pass (argmax over n_centroids dot products per row). At ingest
    you'd persist the output partitioned/bucketed BY ``__cluster`` so probe
    queries prune whole files — the batch analogue of an IVF index.
    """
    if centroids is None:
        rows = (
            df.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
            .orderBy(F.col(id_col))
            .limit(n_centroids)
            .collect()
        )
        centroids = [(i, [float(x) for x in r[1]]) for i, r in enumerate(rows)]
    vec = F.col(vec_col).cast("array<double>")
    assigned = df.withColumn("__cluster", _argmax_cluster(vec, centroids))
    return assigned, centroids


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN: train / encode / ADC top-k
# ---------------------------------------------------------------------------

def _pq_prepped(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Materialize (id, raw vector, L2 norm) behind a fan_out exchange so
    the compute-heavy assignment/mean work parallelizes on small inputs and
    the norm is computed once per row (training's subvector normalization
    references it per element; CollapseProject cannot re-inline its
    aggregate lineage past the exchange). Zero vectors get norm 1."""
    vec = F.col(vec_col).cast("array<double>")
    return fan_out(
        df.select(
            F.col(id_col).alias("__id"),
            vec.alias("__v"),
            F.when(norm(vec) > 0, norm(vec)).otherwise(F.lit(1.0)).alias("__n"),
        )
    )

def _pq_codes_udf(codebooks: list[list[list[float]]], round_scores: int | None = None):
    """Arrow-batched assignment: nearest codeword per subspace by L2 on the
    normalized vector, as argmax of X_sub @ C.T - |c|^2/2 (ties -> lowest
    code via numpy first-argmax). PQ assignment is the one place the
    expression route fails: unrolled literal dots (m × 2^nbits × d_sub terms)
    blow Janino's 64 KB method limit and the whole stage silently falls
    back to interpreted execution, while HOF lambdas never enter codegen at
    all (PERFORMANCE.md finding 1) — a vectorized numpy matmul per batch is
    the honest fast path.

    ``round_scores`` quantizes the assignment score to a nudge-rounded
    decimal grid before the argmax (the ivf_assign ``round_scores`` idiom):
    a BLAS dot and a SQL left-to-right dot can differ in the last ulp, so
    a fixed-oracle golden assigns on the grid where both engines agree.
    Tie-break asymmetry, documented not fixed: ``np.round`` here is
    banker's rounding (half-to-even) while every Spark/DuckDB
    ``F.round``/``round`` site in the repo rounds half away from zero —
    the shared 1e-9 nudge pushes exact half-grid scores off the boundary
    before either rule fires, so the rules only diverge on a score landing
    EXACTLY on a half after the nudge (probability ~0 for dot products of
    trained centroids; sweep-verified hash-stable at all three scales)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    mats = [np.asarray(b, dtype=np.float64) for b in codebooks]
    halves = [0.5 * (mm * mm).sum(axis=1) for mm in mats]
    m, d_sub = len(mats), mats[0].shape[1]

    @pandas_udf("array<int>")
    def enc(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        x = np.stack(v.to_numpy()).astype(np.float64)
        n = np.linalg.norm(x, axis=1)
        n[n == 0] = 1.0
        x = x / n[:, None]
        codes = np.empty((x.shape[0], m), dtype=np.int32)
        for sp in range(m):
            s = x[:, sp * d_sub:(sp + 1) * d_sub] @ mats[sp].T - halves[sp]
            if round_scores is not None:
                s = np.round(s + 1e-9, round_scores)
            codes[:, sp] = np.argmax(s, axis=1)
        return pd.Series([c.tolist() for c in codes])

    return enc


def pq_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    nbits: int = 5,
    n_iter: int = 3,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks: split each L2-normalized
    vector into ``m`` subvectors and run Lloyd's k-means with ``2**nbits``
    codewords in EVERY subspace simultaneously. Returns
    ``codebooks[s][code] -> subcentroid`` for :func:`pq_encode` /
    :func:`pq_topk`.

    Deterministic init (subvectors of the first ``2**nbits`` vectors by
    id). Each sweep is ONE corpus scan — all m subspace assignments come
    from one Arrow-batched numpy pass (:func:`_pq_codes_udf`), exploded to
    (subspace, code, dim, component) and hash-aggregated, so the shuffle
    carries m × 2^nbits × d_sub partial sums per map partition, never the
    vectors. Driver state is the codebooks (m × 2^nbits × d_sub floats).
    Empty codes keep their previous codeword."""
    first = df.select(F.size(vec_col)).first()
    if first is None:
        raise ValueError("pq_train: empty input")
    dim = int(first[0])
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    d_sub, ncw = dim // m, 1 << nbits

    seed_rows = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))
        .orderBy(F.col(id_col))
        .limit(ncw)
        .collect()
    )
    if len(seed_rows) < ncw:
        raise ValueError(f"pq_train: need >= {ncw} vectors, got {len(seed_rows)}")
    seeds = [_unit([float(x) for x in r["__v"]]) for r in seed_rows]
    books = [[s[sp * d_sub:(sp + 1) * d_sub] for s in seeds] for sp in range(m)]

    prepped = _pq_prepped(df, id_col, vec_col)
    for _ in range(n_iter):
        coded = prepped.select(
            "__v", "__n", _pq_codes_udf(books)("__v").alias("__codes")
        )
        entries = coded.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(sp).alias("s"),
                            F.element_at("__codes", sp + 1).alias("c"),
                            F.transform(
                                F.slice(F.col("__v"), sp * d_sub + 1, d_sub),
                                lambda x: x / F.col("__n"),
                            ).alias("sv"),
                        )
                        for sp in range(m)
                    ]
                )
            ).alias("__e")
        )
        sums = (
            entries.select(
                F.col("__e.s").alias("__s"),
                F.col("__e.c").alias("__c"),
                F.posexplode("__e.sv").alias("__d", "__x"),
            )
            .groupBy("__s", "__c", "__d")
            .agg(F.sum("__x").alias("__sum"), F.count(F.lit(1)).alias("__n"))
            .collect()
        )
        acc: dict[tuple[int, int], dict[int, tuple[float, int]]] = {}
        for r in sums:
            acc.setdefault((r["__s"], r["__c"]), {})[r["__d"]] = (r["__sum"], r["__n"])
        for sp in range(m):
            for code in range(ncw):
                dims = acc.get((sp, code))
                if dims:
                    books[sp][code] = [
                        dims[d][0] / dims[d][1] if d in dims else 0.0
                        for d in range(d_sub)
                    ]
    return books


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
    round_scores: int | None = None,
) -> DataFrame:
    """Encode each L2-normalized vector as ``m`` codes (id, codes:
    array<int>) — dim × 8 bytes becomes m × nbits bits per vector, the
    compressed representation an ANN index stores at scale. One narrow
    Arrow-batched pass above the fan_out exchange — no shuffle, no join.
    ``round_scores`` assigns codes on the nudge-rounded grid (see
    :func:`_pq_codes_udf`) for cross-engine-verifiable encodings."""
    prepped = _pq_prepped(df, id_col, vec_col)
    return prepped.select(
        F.col("__id").alias(id_col),
        _pq_codes_udf(codebooks, round_scores)("__v").alias("codes"),
    )


def pq_topk(
    encoded: DataFrame,
    id_col: str,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    round_scores: int | None = None,
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC) over PQ
    codes: the per-(subspace, code) dot-product table against the
    normalized query is built driver-side (m × 2^nbits floats) and folded
    into the plan as literals, so scoring a row is m array lookups + a sum
    — no vector math, no join, no shuffle; the global top-k is a
    TakeOrderedAndProject. Scores approximate cosine(query, vector).
    ``round_scores`` ranks on the nudge-rounded grid (the ivf fixed-oracle
    idiom) so a raw-rank k-boundary tie can't admit a different member per
    engine in a cross-engine compare."""
    qu = _unit([float(x) for x in query_vec])
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    tables = [
        [
            sum(a * b for a, b in zip(qu[sp * d_sub:(sp + 1) * d_sub], c))
            for c in codebooks[sp]
        ]
        for sp in range(m)
    ]
    score = None
    for sp in range(m):
        term = F.element_at(
            F.array(*[F.lit(v) for v in tables[sp]]),
            F.element_at(F.col("codes"), sp + 1) + 1,
        )
        score = term if score is None else score + term
    if round_scores is not None:
        score = F.round(score + F.lit(1e-9), round_scores)
    return (
        encoded.select(F.col(id_col), score.alias("adc_score"))
        .orderBy(F.desc("adc_score"), F.col(id_col))
        .limit(k)
    )


def ivf_pq_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    m: int = 8,
    nbits: int = 4,
    train_iters: int = 2,
    pq_iters: int = 2,
) -> tuple[DataFrame, list[tuple[int, list[float]]], list[list[list[float]]]]:
    """Build an IVF-PQ index: coarse spherical k-means clusters for probe
    pruning + product-quantization codes for in-cluster scoring. Returns
    ``(index_df(id, __cluster, codes), centroids, codebooks)``.

    This is the build-once/query-many split of a production ANN index
    (FAISS IVFPQ shape): at scale the index DataFrame is persisted
    partitioned/bucketed BY ``__cluster`` so a probe query reads
    n_probe/n_centroids of the files, and each stored row is m × nbits
    bits instead of dim × 8 bytes. Codes are computed on the full
    normalized vector (shared codebooks across clusters), not the
    classical per-cluster residual — one codebook set, one Arrow pass,
    at the cost of some quantization error vs residual encoding.
    """
    trained = (
        kmeans_fit(df, id_col, vec_col, k=n_centroids, n_iter=train_iters)
        if train_iters > 0
        else None
    )
    assigned, centroids = ivf_assign(df, id_col, vec_col, n_centroids, centroids=trained)
    books = pq_train(df, id_col, vec_col, m=m, nbits=nbits, n_iter=pq_iters)
    vec = F.col(vec_col).cast("array<double>")
    index_df = fan_out(
        assigned.select(
            F.col(id_col).alias("__id"), F.col("__cluster"), vec.alias("__v")
        )
    ).select(
        F.col("__id").alias(id_col),
        "__cluster",
        _pq_codes_udf(books)("__v").alias("codes"),
    )
    return index_df, centroids, books


def ivf_pq_topk(
    index_df: DataFrame,
    id_col: str,
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Query an :func:`ivf_pq_index`: prune to the ``n_probe`` clusters
    whose centroids best match the query, then ADC-score the survivors.

    Query-time cost is pure pruned-scan arithmetic — the cluster filter
    is a partition-prunable predicate, scoring is m array-literal lookups
    + a sum per row (:func:`pq_topk`), and the result is a global
    TakeOrdered. No vector column is read, no Python runs, no shuffle.
    """
    qu = _unit([float(x) for x in query_vec])

    def csim(c: list[float]) -> float:
        return sum(a * b for a, b in zip(qu, _unit(c)))

    probes = [
        ci for ci, _ in sorted(centroids, key=lambda t: (-csim(t[1]), t[0]))[:n_probe]
    ]
    return pq_topk(
        index_df.where(F.col("__cluster").isin(probes)),
        id_col,
        query_vec,
        codebooks,
        k=k,
    )


def cosine_topk_ivf(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_iters: int = 0,
    round_scores: int | None = None,
) -> DataFrame:
    """Approximate top-k: probe the ``n_probe`` inverted lists whose
    centroids are most similar to the query, exact-cosine rerank inside.

    ``train_iters > 0`` runs that many spherical k-means sweeps first
    (:func:`kmeans_fit`) instead of the raw sampled-init lists.

    ``round_scores`` ranks on the nudge-ROUNDED cosine instead of the raw
    double — required when an oracle hash-compares the result (raw-rank
    k-boundary ties can round to equal grid values and admit a different
    member per engine; the corpus determinism rule in golden.py).

    With cluster-partitioned storage the probe filter becomes partition
    pruning (reads n_probe/n_centroids of the data); here it is a scan-side
    predicate on the assignment column.
    """
    trained = (
        kmeans_fit(df, id_col, vec_col, k=n_centroids, n_iter=train_iters)
        if train_iters > 0
        else None
    )
    assigned, centroids = ivf_assign(df, id_col, vec_col, n_centroids, centroids=trained)
    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0

    def csim(c: list[float]) -> float:
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        return sum(a * b for a, b in zip(query_vec, c)) / (qn * cn)

    probes = [ci for ci, _ in sorted(centroids, key=lambda t: (-csim(t[1]), t[0]))[:n_probe]]
    vec = F.col(vec_col).cast("array<double>")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    score = cosine(vec, q)
    if round_scores is not None:
        score = F.round(score + F.lit(1e-9), round_scores)
    return (
        assigned.where(F.col("__cluster").isin(probes))
        .select(F.col(id_col), score.alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def int8_quantize_stats(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scale: int = 6,
    round_mse: int = 8,
) -> DataFrame:
    """Per-vector symmetric int8 quantization audit: ``(id, scale,
    max_abs_err, mse)`` for codes ``round(x / scale)`` with
    ``scale = max(|x|) / 127`` — the stats a pipeline checks BEFORE
    committing to a 4x-smaller embedding store for ANN (PQ's cruder
    cousin; reference has no embedding ops, north-star extension).

    Everything is JVM-side array HOFs over doubles — no UDF, no shuffle,
    and each row is independent, so the pass is embarrassingly parallel at
    any scale. Rounding of codes uses ``floor(x/scale + 0.5)`` rather than
    an engine ``round()`` so ties break identically in any engine an
    oracle restates this in (half-up everywhere, including negatives:
    -2.5 -> -2). A zero vector has scale 0 and, by convention, zero error
    (every code is 0). ``floor`` returns LONG in Spark and DOUBLE in
    DuckDB; both re-enter double arithmetic unchanged.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    t = df.select(F.col(id_col), v.alias("__v"))
    s = t.select(
        id_col,
        "__v",
        (F.array_max(F.transform("__v", F.abs)) / F.lit(127.0)).alias("__scale"),
    )
    sc = F.col("__scale")
    errs = F.when(
        (sc.isNull()) | (sc == 0), F.transform("__v", lambda x: F.lit(0.0))
    ).otherwise(
        F.transform("__v", lambda x: F.abs(F.floor(x / sc + F.lit(0.5)) * sc - x))
    )
    e = s.select(id_col, sc.alias("__scale"), errs.alias("__errs"))
    n = F.size("__errs")
    mse = F.when(n == 0, F.lit(0.0)).otherwise(
        F.aggregate("__errs", F.lit(0.0), lambda acc, x: acc + x * x) / n
    )
    mx = F.when(n == 0, F.lit(0.0)).otherwise(F.array_max("__errs"))
    return e.select(
        F.col(id_col),
        F.round(F.coalesce(sc, F.lit(0.0)) + F.lit(1e-9), round_scale).alias("scale"),
        F.round(mx + F.lit(1e-9), round_scale).alias("max_abs_err"),
        F.round(mse + F.lit(1e-9), round_mse).alias("mse"),
    )


def cosine_topk_truncate_rerank(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    coarse_dims: int = 16,
    coarse_k: int = 50,
    round_scores: int = 6,
) -> DataFrame:
    """Two-stage ANN by dimension truncation (the Matryoshka-retrieval
    shape): stage 1 scores cosine on only the FIRST ``coarse_dims``
    components and keeps the top ``coarse_k`` candidates; stage 2 reranks
    those by exact full-dimension cosine and returns the top ``k``.

    This is the third scale path in the ANN family, orthogonal to LSH
    (bucketing) and IVF (clustering): the coarse pass reads a 4x-narrower
    vector per row (with a sliced column store, 4x less I/O), and both
    stages are TakeOrderedAndProject — per-partition top-N then a merge of
    per-partition heads, never a global sort. The rerank side is
    ``coarse_k`` rows, i.e. free.

    Deterministic and oracle-restatable: scores at BOTH stages are
    nudge-rounded to ``round_scores`` before ranking with an id tiebreak,
    so candidate-set membership cannot flip on cross-engine double noise.
    """
    if coarse_dims <= 0 or coarse_k < k:
        raise ValueError(
            f"need coarse_dims > 0 and coarse_k >= k, got {coarse_dims}, {coarse_k}/{k}"
        )
    # a query shorter than coarse_dims would zip_with NULL-padded slices
    # and silently score every row NULL (k rows chosen by id tiebreak) —
    # fail loudly instead; full-dim consistency with the corpus is the
    # caller's contract as in the other ANN entry points
    if len(query_vec) < coarse_dims:
        raise ValueError(
            f"query_vec has {len(query_vec)} dims, fewer than coarse_dims={coarse_dims}"
        )
    q_full = F.array(*[F.lit(float(x)) for x in query_vec])
    q_coarse = F.array(*[F.lit(float(x)) for x in query_vec[:coarse_dims]])
    v = F.col(vec_col).cast("array<double>")
    coarse = (
        df.select(
            F.col(id_col),
            v.alias("__v"),
            F.round(
                cosine(F.slice(v, 1, coarse_dims), q_coarse) + F.lit(1e-9),
                round_scores,
            ).alias("__cs"),
        )
        .orderBy(F.desc("__cs"), F.col(id_col))
        .limit(coarse_k)
    )
    return (
        coarse.select(
            F.col(id_col),
            F.round(cosine(F.col("__v"), q_full) + F.lit(1e-9), round_scores).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def embedding_outliers(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "label",
    z_threshold: float = 3.0,
    round_dist: int = 6,
    round_z: int = 4,
) -> DataFrame:
    """Embedding-store QA: flag vectors whose cosine distance to their
    GROUP centroid is a z-score outlier — the cheap screen for mislabeled
    rows, corrupt embeddings, and drift before an index build. Output:
    ``(id, group, dist, z, outlier)``; a single-member group has no
    sample stddev, so its z is NULL and ``outlier`` false by convention.

    Scale shape: posexplode -> (group, dim) hash aggregate for the
    centroids (the reduce side carries group x dim cells, never vectors),
    centroids re-assembled and BROADCAST back (groups x dim doubles — KBs
    for any realistic label space), distances in one narrow pass, then a
    second tiny (group) aggregate for mean/stddev, broadcast again. Two
    corpus scans, no corpus-sized shuffle. ``z`` compares AFTER nudge-
    rounding so the flag cannot flip on cross-engine double noise."""
    v = F.col(vec_col).cast("array<double>")
    base = df.select(F.col(id_col), F.col(group_col), v.alias("__v"))
    cent = (
        base.select(group_col, F.posexplode("__v").alias("__pos", "__x"))
        .groupBy(group_col, "__pos")
        .agg(F.avg("__x").alias("__cx"))
        .groupBy(group_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__cx"))),
                lambda s: s["__cx"],
            ).alias("__cent")
        )
    )
    with_dist = base.join(F.broadcast(cent), group_col).select(
        id_col,
        group_col,
        (F.lit(1.0) - cosine(F.col("__v"), F.col("__cent"))).alias("__dist"),
    )
    stats = with_dist.groupBy(group_col).agg(
        F.avg("__dist").alias("__mu"), F.stddev("__dist").alias("__sd")
    )
    # sd == 0 (all group distances identical) must be NULL z in BOTH
    # engines: Spark's x/0.0 is NULL but DuckDB's ieee division yields
    # Inf/NaN, so an unguarded divide diverges from the oracle the moment
    # a fixture grows a constant-distance group. Guard here, NULLIF there.
    z = F.when(
        F.col("__sd") > 0,
        F.round(
            (F.col("__dist") - F.col("__mu")) / F.col("__sd") + F.lit(1e-9), round_z
        ),
    )
    return with_dist.join(F.broadcast(stats), group_col).select(
        F.col(id_col),
        F.col(group_col),
        F.round(F.col("__dist") + F.lit(1e-9), round_dist).alias("dist"),
        z.alias("z"),
        F.coalesce(z > F.lit(float(z_threshold)), F.lit(False)).alias("outlier"),
    )


def ivf_recall_audit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    q_id_col: str,
    q_vec_col: str,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    round_scores: int = 6,
) -> DataFrame:
    """Measured recall@k of the IVF probe path against exact brute force,
    per query: ``(q_id, n_ivf, n_hits, recall)`` where ``n_hits`` counts
    exact-top-k members the probe also returned and ``recall`` =
    n_hits / k. This is the go/no-go QA an ANN rollout runs before
    trusting probes at scale — "measure, don't guess" for the
    n_probe/n_centroids trade.

    Deterministic by construction: sampled-init centroids (first
    ``n_centroids`` vectors by id), both sides ranked on the nudge-rounded
    cosine grid with the id tiebreak, so the audit itself is
    oracle-checkable — an audit that flakes is worse than none.

    Scale shape: ONE corpus scan for the exact side (query set broadcast,
    WindowGroupLimit caps the shuffle at queries x k) plus one
    cluster-pruned scan for the probe side (per-query probe sets are a
    broadcast (queries x n_probe) dim joined on the assignment column —
    with cluster-partitioned storage that filter is partition pruning);
    the final intersect joins two (queries x k)-bounded frames.
    """
    assigned, centroids = ivf_assign(df, id_col, vec_col, n_centroids)
    q = queries.select(
        F.col(q_id_col).alias("__qid"),
        F.col(q_vec_col).cast("array<double>").alias("__qv"),
    )
    # per-query probe sets: tiny centroid dim x query set, top-n_probe by
    # (cosine desc, cid) — the same tie rule ivf_assign's argmax uses
    cent = queries.sparkSession.createDataFrame(
        [(ci, c) for ci, c in centroids], "cid int, cv array<double>"
    )
    # probe selection also ranks on the ROUNDED grid: a centroid
    # near-tie resolved by the last double bit could otherwise pick a
    # different probe set per engine and flake the audit's own oracle
    wq = Window.partitionBy("__qid").orderBy(
        F.desc(
            F.round(cosine(F.col("cv"), F.col("__qv")) + F.lit(1e-9), round_scores)
        ),
        F.col("cid"),
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("__pr", F.row_number().over(wq))
        .where(F.col("__pr") <= n_probe)
        .select("__qid", "__qv", "cid")
    )
    score = F.round(cosine(F.col("__v"), F.col("__qv")) + F.lit(1e-9), round_scores)
    wk = Window.partitionBy("__qid").orderBy(F.desc("cosine"), F.col(id_col))
    ivf_topk = (
        assigned.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"), "__cluster"
        )
        .join(F.broadcast(probes), F.col("__cluster") == F.col("cid"))
        .select("__qid", id_col, score.alias("cosine"))
        .withColumn("__rn", F.row_number().over(wk))
        .where(F.col("__rn") <= k)
        .select("__qid", F.col(id_col).alias("__ivf_id"))
    )
    # positional rename: with queries drawn from the corpus itself,
    # q_id_col == id_col and the batch output's two id columns collide
    exact_topk = cosine_topk_batch(
        df, id_col, vec_col, queries, q_id_col, q_vec_col, k=k,
        round_scores=round_scores,
    ).toDF("__qid", "__ex_id", "__cos").select("__qid", "__ex_id")
    hits = exact_topk.join(
        ivf_topk,
        (exact_topk["__qid"] == ivf_topk["__qid"])
        & (F.col("__ex_id") == F.col("__ivf_id")),
    ).groupBy(exact_topk["__qid"].alias("__hq")).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    n_ivf = ivf_topk.groupBy("__qid").agg(F.count(F.lit(1)).alias("n_ivf"))
    return (
        q.select("__qid")
        .join(n_ivf, "__qid", "left")
        .join(hits, F.col("__qid") == F.col("__hq"), "left")
        .select(
            F.col("__qid").alias(q_id_col),
            F.coalesce(F.col("n_ivf"), F.lit(0)).cast("long").alias("n_ivf"),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(k)) + F.lit(1e-9), 6
            ).alias("recall"),
        )
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str,
    rank_col: str = "rank",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of retriever result
    lists: ``rrf_score = sum over lists of 1/(k + rank)``, the standard
    score-free way to merge heterogeneous retrievers (BM25 + dense ANN)
    without calibrating their score scales. Returns (id, rrf_score,
    n_lists). Callers rank on (quantized rrf_score DESC, id): the
    summation is over <= len(rankings) terms, so the 1e-6 rounding grid
    absorbs any float association noise before ties are broken.

    Scale shape: inputs are top-k lists (bounded), so the union +
    id-keyed aggregate is list-sized, not corpus-sized."""
    if not rankings:
        raise ValueError("rrf_fuse: rankings must be non-empty")
    if k < 1:
        raise ValueError(f"rrf_fuse: k must be >= 1: {k}")
    u = rankings[0].select(id_col, rank_col)
    for r in rankings[1:]:
        u = u.unionByName(r.select(id_col, rank_col))
    return u.groupBy(id_col).agg(
        F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col))).alias(
            "rrf_score"
        ),
        F.count(F.lit(1)).alias("n_lists"),
    )


def mmr_rerank(
    cand: DataFrame,
    query_col: str,
    id_col: str,
    rel_col: str,
    emb_col: str,
    k: int = 5,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell-Goldstein 1998)
    per query group: greedily select k candidates maximizing
    ``lam * rel - (1 - lam) * max_sim_to_already_selected`` (cosine
    similarity; the first pick sees max-sim 0), the standard retrieval
    diversifier between ANN/hybrid top-N and the context window.
    Returns (query, rank 1..k, id, mmr_score).

    Scale shape: candidates are a BOUNDED per-query top-N list, so the
    greedy (k passes over an N x N cosine matrix) is constant work per
    group, run as one Arrow-batched applyInPandas keyed by query —
    distributed across queries, never across the corpus.

    Determinism: relevance and pairwise cosines are nudge-quantized to
    the 1e-6 grid BEFORE the greedy, every score recomputes with the
    same literal arithmetic on grid values, scores re-quantize before
    comparison, and ties break by ascending id — so selection is
    identical on any engine or partitioning (the kmeans quantized-state
    idiom), and an unrolled SQL restatement can follow every pick."""
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1]: {lam}")

    out_schema = (
        f"{query_col} long, rank int, {id_col} long, mmr_score double"
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        q = pdf[query_col].iloc[0]
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        rel = np.round(
            pdf[rel_col].to_numpy(dtype=np.float64)[order] + 1e-9, 6
        )
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf[emb_col]]
        )[order]
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0.0] = 1.0
        sims = np.round((mat @ mat.T) / np.outer(norms, norms) + 1e-9, 6)
        n = len(ids)
        max_sim = np.zeros(n)
        picked = np.zeros(n, dtype=bool)
        rows = []
        for rank in range(1, min(k, n) + 1):
            score = np.round(lam * rel - (1.0 - lam) * max_sim + 1e-9, 6)
            score[picked] = -np.inf
            best = int(np.argmax(score))  # ids ascending: first argmax
            rows.append((q, rank, int(ids[best]), float(score[best])))
            picked[best] = True
            max_sim = np.maximum(max_sim, sims[:, best])
        return pd.DataFrame(
            rows, columns=[query_col, "rank", id_col, "mmr_score"]
        )

    return cand.groupBy(query_col).applyInPandas(greedy, out_schema)
