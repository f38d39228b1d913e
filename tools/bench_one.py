"""Time individual golden queries with the bench's exact methodology.

Headline entries: count() sanity+warmup, then best-of-3 noop-sink runs.
Extended entries: one untimed warm run, then warm median-of-3.
Fresh JVM per invocation (run this script once per A/B side).

Usage: python tools/bench_one.py winnowing_overlap_topk triangle_counts_copurchase
"""

from __future__ import annotations

import os
import sys
import time
from statistics import median

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mr_dice_spark.golden import GOLDEN, bench_extended_queries  # noqa: E402
from mr_dice_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    spark = get_spark(app_name="bench-one")
    spark.sparkContext.setLogLevel("ERROR")
    extended = set(bench_extended_queries())
    GOLDEN["q01_pricing_summary"].spark(spark, sf_dir).count()

    def one_run(q, timed: bool) -> float | None:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        df = q.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0 if timed else None

    for name in names:
        q = GOLDEN[name]
        if name in extended:
            one_run(q, timed=False)
            samples = [one_run(q, timed=True) for _ in range(3)]
            print(f"# {name}: {median(samples):.3f}s (warm median-of-3) "
                  f"samples={[round(s, 3) for s in samples]}", file=sys.stderr)
        else:
            n = q.spark(spark, sf_dir).count()
            samples = [one_run(q, timed=True) for _ in range(3)]
            print(f"# {name}: {min(samples):.3f}s (best-of-3, {n} rows) "
                  f"samples={[round(s, 3) for s in samples]}", file=sys.stderr)


if __name__ == "__main__":
    main()
