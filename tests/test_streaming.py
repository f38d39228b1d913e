"""Streaming extension: the batch goldens are the oracle — feed the same
events parquet through readStream and compare aggregates."""

import pytest
from pyspark.sql import functions as F

from mr_dice_spark.catalog import Catalog
from mr_dice_spark.streaming import (
    read_events_stream,
    session_window_stats,
    tumbling_window_stats,
    sliding_window_counts,
)
from mr_dice_spark.streaming.windows import run_stream_to_memory


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return read_events_stream(spark, f"{sf_dir}/events.parquet")


def _collect_sorted(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tumbling_stream_matches_batch(spark, sf_dir, events_stream):
    batch = tumbling_window_stats(Catalog(spark, sf_dir).events)
    q = run_stream_to_memory(tumbling_window_stats(events_stream), "tumbling_t")
    got = spark.sql("SELECT * FROM tumbling_t")
    cols = ["window_start_ms", "event_type", "n_events"]
    assert _collect_sorted(got, cols) == _collect_sorted(batch, cols)
    q.stop()


def test_sliding_stream_matches_batch(spark, sf_dir, events_stream):
    batch = sliding_window_counts(Catalog(spark, sf_dir).events)
    q = run_stream_to_memory(sliding_window_counts(events_stream), "sliding_t")
    got = spark.sql("SELECT * FROM sliding_t")
    cols = ["window_start_ms", "window_end_ms", "event_type", "n_events"]
    assert _collect_sorted(got, cols) == _collect_sorted(batch, cols)
    q.stop()


def test_session_stream_matches_batch_sessionize(spark, sf_dir, events_stream):
    """session_window (streaming) vs the gaps-and-islands batch operator:
    identical session starts and sizes."""
    from mr_dice_spark.operators.sessionize import session_stats

    batch = session_stats(Catalog(spark, sf_dir).events, "user_id", "ts", 1800)
    q = run_stream_to_memory(session_window_stats(events_stream), "session_t")
    got = spark.sql("SELECT user_id, start_ms, n_events FROM session_t")
    cols = ["user_id", "start_ms", "n_events"]
    assert _collect_sorted(got, cols) == _collect_sorted(
        batch.select("user_id", "start_ms", F.col("n_events")), cols
    )
    q.stop()


def test_stateful_ema_stream_matches_batch(spark, sf_dir, events_stream):
    """applyInPandasWithState EMA over a finite stream == batch EMA.

    With update mode each user may emit once per micro-batch; the LAST
    emission per user carries the final state — compare that against batch.
    """
    from mr_dice_spark.streaming.stateful import user_value_ema

    batch = {
        r["user_id"]: (r["n_events"], round(r["ema"], 9))
        for r in user_value_ema(Catalog(spark, sf_dir).events).collect()
    }
    q = run_stream_to_memory(user_value_ema(events_stream), "ema_t", output_mode="update")
    rows = spark.sql(
        "SELECT user_id, n_events, ema FROM ("
        "  SELECT *, ROW_NUMBER() OVER "
        "    (PARTITION BY user_id ORDER BY n_events DESC) AS rn FROM ema_t"
        ") WHERE rn = 1"
    ).collect()
    got = {r["user_id"]: (r["n_events"], round(r["ema"], 9)) for r in rows}
    assert got == batch
    q.stop()


def test_stream_to_parquet_exactly_once(spark, sf_dir, tmp_path, events_stream):
    from mr_dice_spark.streaming.windows import stream_to_parquet

    out, ckpt = str(tmp_path / "landed"), str(tmp_path / "ckpt")
    q = stream_to_parquet(events_stream, out, ckpt, partition_by=("event_type",))
    q.stop()
    landed = spark.read.parquet(out)
    batch = Catalog(spark, sf_dir).events
    assert landed.count() == batch.count()
    # re-running against the same checkpoint must not duplicate rows
    q2 = stream_to_parquet(
        read_events_stream(spark, f"{sf_dir}/events.parquet"), out, ckpt
    )
    q2.stop()
    assert spark.read.parquet(out).count() == batch.count()
    # partition pruning works on the landed layout
    n_purchase = landed.where(F.col("event_type") == "purchase").count()
    assert n_purchase == batch.where(F.col("event_type") == "purchase").count()


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    """Purchases joined to same-user views within 30 min — streaming result
    must equal the identical batch join (inner joins emit eagerly; the
    watermark only bounds state)."""
    from mr_dice_spark.streaming import read_events_stream, stream_stream_interval_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")

    def build(df_l, df_r):
        j = stream_stream_interval_join(
            df_l.where(F.col("event_type") == "purchase"),
            df_r.where(F.col("event_type") == "view"),
            key="user_id", within="30 minutes",
        )
        return j.select(
            F.col("l.event_id").alias("purchase_id"),
            F.col("r.event_id").alias("view_id"),
        )

    ev = Catalog(spark, sf_dir).events
    batch = build(ev, ev)
    s1 = read_events_stream(spark, f"{sf_dir}/events.parquet")
    s2 = read_events_stream(spark, f"{sf_dir}/events.parquet")
    q = run_stream_to_memory(build(s1, s2), "ssjoin_t", output_mode="append")
    got = spark.sql("SELECT * FROM ssjoin_t")
    cols = ["purchase_id", "view_id"]
    assert _collect_sorted(got, cols) == _collect_sorted(batch, cols)
    assert len(_collect_sorted(got, cols)) > 0
    q.stop()


def test_dedup_stream_matches_batch_keyset(spark, sf_dir):
    """Watermarked streaming dedup on (user_id, event_type): the surviving
    KEY SET must equal batch dropDuplicates (which row survives per key is
    arrival-order-dependent in both engines, so only keys compare)."""
    from mr_dice_spark.streaming import dedup_stream, read_events_stream

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = Catalog(spark, sf_dir).events
    batch_keys = _collect_sorted(
        dedup_stream(ev, ["user_id", "event_type"]), ["user_id", "event_type"]
    )
    s = read_events_stream(spark, f"{sf_dir}/events.parquet")
    q = run_stream_to_memory(
        dedup_stream(s, ["user_id", "event_type"]), "sdedup_t", output_mode="append"
    )
    got = spark.sql("SELECT user_id, event_type FROM sdedup_t")
    assert _collect_sorted(got, ["user_id", "event_type"]) == batch_keys
    q.stop()


def test_stream_upsert_snapshot_matches_batch_merge(spark, sf_dir, tmp_path):
    """foreachBatch upsert into the versioned snapshot store: the final
    CURRENT snapshot must equal a batch latest-wins merge over the same
    data, and replaying the stream from scratch (new checkpoint, same
    store) must be a no-op thanks to idempotent latest-wins."""
    from mr_dice_spark.operators.merge import merge_latest_wins
    from mr_dice_spark.streaming import read_events_stream
    from mr_dice_spark.streaming.upsert import read_snapshot, stream_upsert_to_snapshot

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    store = str(tmp_path / "store")
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "event_type", "value"
    )
    stream_upsert_to_snapshot(
        stream, store, keys=["user_id"], version_col="ts",
        checkpoint=str(tmp_path / "ckpt1"), tiebreakers=["event_type"],
    )
    got = read_snapshot(spark, store)
    batch = merge_latest_wins(
        Catalog(spark, sf_dir).events.select("user_id", "ts", "event_type", "value"),
        ["user_id"], "ts", ["event_type"],
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b

    # replay with a fresh checkpoint: same final state (idempotent upsert)
    stream2 = read_events_stream(spark, f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "event_type", "value"
    )
    stream_upsert_to_snapshot(
        stream2, store, keys=["user_id"], version_col="ts",
        checkpoint=str(tmp_path / "ckpt2"), tiebreakers=["event_type"],
    )
    assert sorted(map(tuple, read_snapshot(spark, store).collect())) == b


def test_stream_upsert_replay_batch_id_collision(spark, sf_dir, tmp_path):
    """batch_id 0 colliding with CURRENT == snap_000000000000 in the three
    replay shapes: (a) same checkpoint crash-replay is skipped (idempotency
    key = checkpoint token + batch id), (b) a NEW checkpoint over the same
    store is NOT skipped — stage-then-rename lets it read the snapshot it
    replaces without FAILED_READ_FILE, and (c) new source data arriving as
    the new checkpoint's batch 0 must survive into the merged snapshot
    (the round-2 review found a batch_id-only guard silently dropped it)."""
    from mr_dice_spark.streaming import read_events_stream
    from mr_dice_spark.streaming.upsert import read_snapshot, stream_upsert_to_snapshot

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = str(tmp_path / "src")
    ev = Catalog(spark, sf_dir).events.select("user_id", "ts", "event_type", "value")
    ev.limit(200).coalesce(1).write.parquet(src)
    store = str(tmp_path / "store")

    def run(ckpt: str) -> None:
        stream_upsert_to_snapshot(
            read_events_stream(spark, src), store, keys=["user_id"],
            version_col="ts", checkpoint=str(tmp_path / ckpt),
            tiebreakers=["event_type"],
        )

    run("ckpt1")
    before = sorted(map(tuple, read_snapshot(spark, store).collect()))
    assert before  # one micro-batch committed
    # (a)+(b): same data, fresh checkpoint -> re-merge is a no-op state-wise
    run("ckpt2")
    assert sorted(map(tuple, read_snapshot(spark, store).collect())) == before

    # (c) new data lands as batch 0 of ANOTHER fresh checkpoint while
    # CURRENT is still snap_000000000000 — it must be merged, not skipped
    extra = ev.orderBy("user_id", "ts").limit(300).coalesce(1)
    extra.write.mode("append").parquet(src)
    run("ckpt3")
    after = sorted(map(tuple, read_snapshot(spark, store).collect()))
    from mr_dice_spark.operators.merge import merge_latest_wins

    expect = sorted(
        map(
            tuple,
            merge_latest_wins(
                spark.read.parquet(src), ["user_id"], "ts", ["event_type"]
            ).collect(),
        )
    )
    assert after == expect


def test_stream_upsert_forced_reprocess_same_checkpoint_path(spark, sf_dir, tmp_path):
    """The standard ops move to force reprocessing — delete the checkpoint
    directory and rerun at the SAME path — must mint a new run token and
    merge the new run's batch 0 (a path-derived token made this silently
    skip new data; round-2 second-pass review finding)."""
    import shutil as _shutil

    from mr_dice_spark.operators.merge import merge_latest_wins
    from mr_dice_spark.streaming import read_events_stream
    from mr_dice_spark.streaming.upsert import read_snapshot, stream_upsert_to_snapshot

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = str(tmp_path / "src")
    ev = Catalog(spark, sf_dir).events.select("user_id", "ts", "event_type", "value")
    ev.limit(150).coalesce(1).write.parquet(src)
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    def run() -> None:
        stream_upsert_to_snapshot(
            read_events_stream(spark, src), store, keys=["user_id"],
            version_col="ts", checkpoint=ckpt, tiebreakers=["event_type"],
        )

    run()
    assert read_snapshot(spark, store).count() > 0
    _shutil.rmtree(ckpt)  # force full reprocessing
    ev.orderBy("user_id", "ts").limit(400).coalesce(1).write.mode("append").parquet(src)
    run()  # same checkpoint PATH, new run: batch 0 must merge, not skip
    got = sorted(map(tuple, read_snapshot(spark, store).collect()))
    expect = sorted(
        map(
            tuple,
            merge_latest_wins(
                spark.read.parquet(src), ["user_id"], "ts", ["event_type"]
            ).collect(),
        )
    )
    assert got == expect


def test_streaming_exactness_under_multi_microbatch_replay(spark, sf_dir, tmp_path):
    """The streaming goldens claim a beyond-fixture watermark makes a
    finite replay EXACT under ANY micro-batching. Force a real 4-batch
    replay (4 parquet files, maxFilesPerTrigger=1) and check both
    operators: dedup still equals DISTINCT (no state eviction between
    batches), and the stream-stream self-join still finds CROSS-batch
    pairs (each side's buffered state survives to meet later batches)."""
    from mr_dice_spark.streaming import (
        dedup_stream,
        read_events_stream,
        stream_stream_interval_join,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = Catalog(spark, sf_dir).events.limit(2000)
    src = str(tmp_path / "ev4")
    ev.repartition(4).write.mode("overwrite").parquet(src)
    n_files = len([p for p in __import__("os").listdir(src) if p.endswith(".parquet")])
    assert n_files >= 4  # precondition: a genuinely multi-batch replay

    batch = spark.read.parquet(src)
    want_keys = sorted(
        (r["user_id"], r["event_type"])
        for r in batch.select("user_id", "event_type").distinct().collect()
    )
    s = read_events_stream(spark, src, max_files_per_trigger=1)
    q = run_stream_to_memory(
        dedup_stream(s, ["user_id", "event_type"], watermark="3650 days")
        .select("user_id", "event_type"),
        "mb_dedup",
        output_mode="append",
    )
    try:
        got = sorted(
            (r["user_id"], r["event_type"])
            for r in spark.table("mb_dedup").collect()
        )
        assert got == want_keys
    finally:
        q.stop()

    from pyspark.sql import functions as F

    cond_pairs = (
        batch.alias("a")
        .join(
            batch.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") >= F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 30 minutes"))
            & (F.col("a.event_id") != F.col("b.event_id")),
        )
        .select(F.col("a.event_id").alias("l"), F.col("b.event_id").alias("r"))
    )
    want_pairs = sorted((r["l"], r["r"]) for r in cond_pairs.collect())
    left = read_events_stream(spark, src, max_files_per_trigger=1)
    right = read_events_stream(spark, src, max_files_per_trigger=1)
    j = stream_stream_interval_join(
        left, right, key="user_id", within="30 minutes", watermark="3650 days"
    ).where(F.col("l.event_id") != F.col("r.event_id"))
    q2 = run_stream_to_memory(
        j.select(F.col("l.event_id").alias("l"), F.col("r.event_id").alias("r")),
        "mb_join",
        output_mode="append",
    )
    try:
        got_pairs = sorted((r["l"], r["r"]) for r in spark.table("mb_join").collect())
        assert got_pairs == want_pairs
    finally:
        q2.stop()


def test_heavy_hitters_stream_matches_batch(spark, sf_dir, events_stream):
    """Streaming windowed counts + top-k finisher == the identical batch
    plan; tiebreak is (n DESC, key) deterministic."""
    from pyspark.sql import functions as F

    from mr_dice_spark.catalog import Catalog
    from mr_dice_spark.streaming.windows import (
        heavy_hitters_topk,
        run_stream_to_memory,
        windowed_key_counts,
    )

    nn = F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    batch = heavy_hitters_topk(
        windowed_key_counts(Catalog(spark, sf_dir).events.where(nn)),
        "event_type",
        3,
    )
    want = sorted(tuple(r) for r in batch.collect())
    q = run_stream_to_memory(
        windowed_key_counts(events_stream.where(nn)),
        "mb_hh",
        output_mode="complete",
    )
    try:
        got = sorted(
            tuple(r)
            for r in heavy_hitters_topk(spark.table("mb_hh"), "event_type", 3).collect()
        )
        assert got == want
    finally:
        q.stop()


def test_heavy_hitters_topk_tiebreak_and_guard(spark):
    """Equal counts rank by key ascending; k validates."""
    import pytest

    from mr_dice_spark.streaming.windows import heavy_hitters_topk

    df = spark.createDataFrame(
        [(0, "b", 5), (0, "a", 5), (0, "c", 9), (1, "z", 1)],
        "window_start_ms long, event_type string, n long",
    )
    rows = heavy_hitters_topk(df, "event_type", 2).orderBy(
        "window_start_ms", "rank"
    ).collect()
    assert [(r["window_start_ms"], r["event_type"], r["rank"]) for r in rows] == [
        (0, "c", 1), (0, "a", 2), (1, "z", 1)
    ]
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters_topk(df, "event_type", 0)
