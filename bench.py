"""Benchmark harness: runs the headline golden queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "extended": {name: sec}, "sf": ...}.

Isolation (VERDICT r6 next-#3): the headline set and the extended heavy set
each run in their OWN fresh process/JVM, spawned by this orchestrator with
SPARK_GRAFT_BENCH_MODE=headline|extended. Round 6 showed the 127 s extended
workload sharing a JVM with the headline queries drifts the floor-dominated
headline timings 1.1-1.4x (heap/GC/codegen-cache state), breaking
cross-round comparability; a fresh JVM per phase removes that coupling.
Setting the mode env var directly runs just that phase (same JSON shape).

Each query is fully materialized (noop sink) so the timing covers
scan -> shuffle -> result, not just plan construction. A warmup query
runs first so JVM/codegen startup isn't attributed to the first query.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_MODE_VAR = "SPARK_GRAFT_BENCH_MODE"


def _run_headline(spark, sf_dir: str) -> dict[str, float]:
    from mr_dice_spark.golden import GOLDEN, bench_queries

    # warmup: JVM + codegen + parquet footer caches
    GOLDEN["q01_pricing_summary"].spark(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name, q in sorted(bench_queries().items()):
        # min of repeated runs reflects steady-state throughput (what a
        # resident engine sees); the first run pays one-off codegen.
        # Materialize through the noop sink: count() alone would let
        # Catalyst prune the aggregate/projection expressions it doesn't
        # need for row counting, under-measuring the query.
        # row count first: a sanity signal AND a per-query warmup, so the
        # timed runs never pay codegen compilation or re-execute afterwards
        n = q.spark(spark, sf_dir).count()
        best = None
        # best-of-3: measured run-to-run noise on this box is ~±20%; the
        # min of three is a materially tighter steady-state estimate than
        # min of two for ~15s of extra bench wall clock
        for _ in range(3):
            # operators persist() shared sub-frames, and Spark's cache
            # manager matches canonicalized plans — without clearing, the
            # second run would read the first run's cache and under-measure
            spark.catalog.clearCache()
            # localCheckpoint blocks (minhash's shingle materialization)
            # are freed by the ContextCleaner only after a GC notices the
            # dead RDD refs; nudge so queries later in the alphabet don't
            # pay earlier queries' storage debt (same fix as scale_probe)
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            df = q.spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
    return timings


def _run_extended(spark, sf_dir: str) -> dict[str, float]:
    # Extended set: the round-5+ heavy operator families (fuzzy join,
    # graph, ER, winnowing overlap, BPE train, LSH clustering). Reported
    # under a separate key so the headline total stays comparable to
    # rounds 1-5.
    #
    # WARM CONVENTION (VERDICT r7 next-#5): every entry runs once
    # UNTIMED first — that run absorbs the query's own codegen
    # compilation and JIT warmth — then caches are cleared so the timed
    # runs re-execute the full scan->shuffle->sink pipeline with a warm
    # JVM. Rationale: the r7 fresh-JVM isolation split exposed ~20%
    # cold-JIT inflation on the python-heavy entries (bpe_train
    # 5.1->6.4 s, er_best_match 4.0->4.8 s r6->r7 — the old shared JVM
    # had 60+ headline executions of warmth; PERFORMANCE.md:1313-1325),
    # so cross-round extended comparisons were dominated by warmup
    # noise, not code. Correctness of every entry is the sweep/driver's
    # job, not bench's.
    #
    # WARM-MEDIAN-3 for EVERY entry (VERDICT r9 next-#3, widening the r8
    # >= 15 s rule): two consecutive rounds burned a judge/builder cycle
    # adjudicating one-draw ambient outliers — triangle_counts 29.2 s in
    # r8 (19.5 s warm-median locally), label_propagation 10.88 s in r9
    # (8.6 s warm-median) — and the second sat BELOW the old 15 s cutoff,
    # i.e. single warm samples maximized draw variance exactly where
    # round-over-round ratios get scrutinized. So: one untimed warmup,
    # then three timed runs, median reported, for every extended entry
    # (~70 s of extra bench wall clock once per round — cheap next to
    # the recurring adjudication cost).
    from statistics import median

    from mr_dice_spark.golden import GOLDEN, bench_extended_queries

    GOLDEN["q01_pricing_summary"].spark(spark, sf_dir).count()

    def _one_run(q, timed: bool) -> float | None:
        # operators persist() shared sub-frames and localCheckpoint
        # blocks linger until a GC notices dead RDD refs — clear both
        # before EACH run so the timed run measures real execution,
        # not the warm run's cache (same discipline as headline)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        df = q.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0 if timed else None

    extended: dict[str, float] = {}
    for name, q in sorted(bench_extended_queries().items()):
        _one_run(q, timed=False)
        samples = [_one_run(q, timed=True) for _ in range(3)]
        extended[name] = round(median(samples), 4)
        print(
            f"# ext {name}: {extended[name]:.3f}s (warm median-of-3)",
            file=sys.stderr,
        )
    return extended


def _phase_main(mode: str, sf_dir: str, sf: str) -> None:
    from mr_dice_spark.session import get_spark

    spark = get_spark(app_name=f"mr-dice-bench-{mode}")
    spark.sparkContext.setLogLevel("ERROR")
    queries = _run_headline(spark, sf_dir) if mode == "headline" else _run_extended(spark, sf_dir)
    print(json.dumps({"mode": mode, "queries": queries}))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    mode = os.environ.get(_MODE_VAR, "")
    if mode in ("headline", "extended"):
        _phase_main(mode, sf_dir, sf)
        return

    phase_out: dict[str, dict[str, float]] = {}
    for phase in ("headline", "extended"):
        env = dict(os.environ, **{_MODE_VAR: phase})
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=sys.stderr,
            text=True,
        )
        if proc.returncode != 0:
            raise SystemExit(f"bench phase {phase} failed ({proc.returncode})")
        last = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
        phase_out[phase] = json.loads(last)["queries"]

    timings = phase_out["headline"]
    extended = phase_out["extended"]
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "golden_corpus_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "extended": extended,
                "extended_total": round(sum(extended.values()), 4),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
