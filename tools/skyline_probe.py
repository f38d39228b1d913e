"""Skyline distributed-path probe (VERDICT r6 next-#7): time skyline_2d's
continuous-dimension branch at a scale where it actually ENGAGES, and
compare it against the broadcast/single-task-window branch forced onto
the same input — evidence the distributed prefix-min path carries its
weight (correctness of the branch is pinned by tests/test_quota.py; this
records the timing row for PERFORMANCE.md).

Input: sf0.1 lineitem with a = l_extendedprice (continuous, ~600 k rows,
hundreds of thousands of distinct values) minimized against
b = l_quantity. Run: python tools/skyline_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mr_dice_spark.catalog import Catalog  # noqa: E402
from mr_dice_spark.operators.topk import skyline_2d  # noqa: E402
from mr_dice_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="skyline-probe")
    spark.sparkContext.setLogLevel("ERROR")
    li = Catalog(spark, sf_dir).lineitem.select("l_extendedprice", "l_quantity")
    n_distinct = li.select("l_extendedprice").distinct().count()

    def timed(label: str, domain) -> tuple[float, int]:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.monotonic()
        rows = skyline_2d(
            li, "l_extendedprice", "l_quantity", broadcast_a_domain=domain
        ).count()
        el = time.monotonic() - t0
        print(f"# {label}: {el:.2f}s ({rows} frontier rows)", file=sys.stderr)
        return el, rows

    # warmup (parquet footers + codegen)
    timed("warmup(distributed)", None)
    dist_s, dist_rows = timed("distributed prefix-min (forced, no probe job)", None)
    # low threshold exercises probe-then-distributed (the default route a
    # continuous column takes)
    routed_s, _ = timed("probe->distributed (broadcast_a_domain=1000)", 1000)
    bcast_s, bcast_rows = timed(
        "single-task window (forced broadcast branch)", 10**9
    )
    assert dist_rows == bcast_rows, "branches disagree on the frontier"
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "distinct_a": n_distinct,
                "frontier_rows": dist_rows,
                "distributed_s": round(dist_s, 2),
                "probe_plus_distributed_s": round(routed_s, 2),
                "single_task_window_s": round(bcast_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
