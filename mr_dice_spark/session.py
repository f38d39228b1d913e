"""SparkSession factory.

Tuned for the two deployment shapes we care about:

* local[N] single-JVM testing (the driver's environment), and
* a large multi-executor cluster reading ~100 TB, where the same settings
  (AQE, skew-join handling, partition coalescing, Arrow transfers) are the
  ones that matter.

Everything expressed through this session is plain DataFrame/SQL so Catalyst
owns the physical strategy; nothing here assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "mr-dice-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    - AQE on: runtime partition coalescing, skew-join splitting, and
      dynamic join-strategy switching replan around the exact hazards
      (skewed keys, mis-sized shuffles) that a static plan hits at 100 TB.
    - ``spark.sql.shuffle.partitions`` starts at 2x cores; AQE coalesces
      down, and on a real cluster this would be sized to executors.
    - UTC session timezone so timestamp semantics match the ANSI oracle.
    - Arrow enabled: every pandas_udf / applyInPandas boundary is batched.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 2 * cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # the driver's events table stores TIMESTAMP(NANOS); read as long and
        # let Catalog convert (Catalog also sets this at runtime for sessions
        # it didn't create)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Spark's default 10 MB auto-broadcast threshold, NOT raised: the
        # broadcast build is serial (driver collect + hash build, plus
        # per-executor fan-out on a real cluster), and a measured 64 MB
        # override made 10x-grown filtered join sides broadcast at 2-3x
        # the cost of the parallel shuffle join (q03 2.40 s -> 1.01 s,
        # q21 3.74 s -> 2.98 s at 10x just by reverting; PERFORMANCE.md
        # finding 10). Operators that KNOW a side is bounded hint
        # broadcast() explicitly, which ignores this threshold.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    active = SparkSession.getActiveSession()
    if active is not None:
        # REUSE without re-applying defaults: getOrCreate would push this
        # call's configs onto the existing session (documented PySpark
        # behavior), silently clobbering the creator's explicit settings
        # (shuffle partitions, broadcast threshold) mid-run. Only the
        # caller's explicit extra_conf is applied.
        for k, v in (extra_conf or {}).items():
            active.conf.set(k, v)
        return active
    builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
