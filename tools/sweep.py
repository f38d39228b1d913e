"""Full-corpus oracle-parity sweep at an arbitrary scale factor.

Runs every golden's Spark side AND its DuckDB oracle through the same
order-insensitive compare the driver uses (tests/oracle.py), at sf0.1 by
default — 10x the driver's compare scale. Designed after the round-5
incident where an unguarded sweep filled the disk: DuckDB spills
quadratic oracles (the ER linkage cross join alone wrote 26 GB of .tmp,
and an unbounded run reached 81 GB and took the host down).

Guards:
- per-golden wall guard (default 180 s, soft: measured and reported,
  the golden is not killed mid-query — Spark/DuckDB calls are not
  interruptible from Python without killing the JVM);
- free-disk floor checked BEFORE each golden (default 20 GiB): below
  it the sweep stops cleanly instead of wedging the host;
- an explicit fallback map for goldens whose ORACLE (not operator) is
  super-linear: they are compared at sf0.01 — the driver's own scale —
  and reported as such. The Spark side is still executed at the sweep
  scale so operator regressions cannot hide behind the fallback.

Usage:
  python tools/sweep.py                     # full corpus at sf0.1
  python tools/sweep.py fuzzy er_best      # name-substring filter
  SWEEP_SF_DIR=/root/testdata/sf0.01 python tools/sweep.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mr_dice_spark.golden import GOLDEN  # noqa: E402
from mr_dice_spark.session import get_spark  # noqa: E402
from tests.oracle import compare_spark_duckdb  # noqa: E402

# goldens whose DuckDB ORACLE is super-linear in the corpus (quadratic
# cross joins / pair materializations): compare at the driver's scale,
# run the Spark side at sweep scale. Keyed with the reason so the
# report is honest about WHY.
ORACLE_BOUND = {
    "er_best_match_linkage": "oracle is a 225M-levenshtein cross join at sf0.1 (26 GB spill)",
    # (hll_rollup_distinct_users moved to TOLERANCE_COMPARE below: its
    # sf0.1 regime — sketch past the exact sparse mode, estimate 1488 vs
    # 1500 — now gets a real sweep-scale verdict within the sketch's
    # error bound instead of only the sf0.01 fallback.)
    "er_linkage_bcubed": "oracle embeds the same 225M-levenshtein ER cross join",
    "er_linkage_ari": "oracle embeds the same 225M-levenshtein ER cross join",
}

# goldens whose sweep-scale compare is a TOLERANCE check instead of a
# hash: the Spark result and the oracle run BOTH at sweep scale, rows
# are matched on the key columns, and every value column must agree
# within rel_tol. This is how the HLL golden's approximate regime
# (sketch past its exact sparse mode at sf0.1) gets a real sf0.1
# verdict rather than only the sf0.01 fallback.
TOLERANCE_COMPARE = {
    # 2% rel tol: HLL lgk=12 rsd is ~1.6%; measured sf0.1 error is 0.8%
    "hll_rollup_distinct_users": {"keys": ["event_type"], "rel_tol": 0.02},
}

MIN_FREE_GIB = float(os.environ.get("SWEEP_MIN_FREE_GIB", "20"))
WALL_GUARD = float(os.environ.get("SWEEP_WALL_GUARD", "180"))


def compare_tolerance(spark_df, oracle_sql: str, sf_dir: str,
                      keys: list[str], rel_tol: float) -> tuple[bool, str]:
    """Key-matched relative-tolerance compare (approximate-regime
    verdict): same DuckDB view setup as the exact compare, but values
    must agree within rel_tol instead of hashing equal."""
    from tests.oracle import duckdb_conn

    import decimal

    got = {tuple(r[k] for k in keys): r.asDict() for r in spark_df.collect()}
    con = duckdb_conn(sf_dir)
    try:
        res = con.sql(oracle_sql)
        cols = res.columns
        # Coerce DECIMAL/HUGEINT to float the way tests/oracle.py's
        # Arrow path does, so the numeric-tolerance branch below sees
        # plain floats instead of decimal.Decimal falling through to a
        # strict != against a Spark float (ADVICE r6).
        exp_rows = [
            {
                c: float(v) if isinstance(v, decimal.Decimal) else v
                for c, v in zip(cols, row)
            }
            for row in res.fetchall()
        ]
    finally:
        con.close()
    if len(got) != len(exp_rows):
        return False, f"row count {len(got)} vs {len(exp_rows)}"
    worst = 0.0
    for er in exp_rows:
        key = tuple(er[k] for k in keys)
        if key not in got:
            return False, f"missing key {key}"
        gr = got[key]
        for c, ev in er.items():
            if c in keys:
                continue
            gv = gr[c]
            if isinstance(ev, (int, float)) and isinstance(gv, (int, float)):
                rel = abs(gv - ev) / max(1.0, abs(ev))
                worst = max(worst, rel)
                if rel > rel_tol:
                    return False, f"{c}@{key}: {gv} vs {ev} (rel {rel:.4f} > {rel_tol})"
            elif gv != ev:
                return False, f"{c}@{key}: {gv!r} != {ev!r}"
    return True, f"within rel_tol={rel_tol} (worst {worst:.4f})"


def free_gib(path: str = "/root") -> float:
    return shutil.disk_usage(path).free / (1 << 30)


def main() -> int:
    sf_dir = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.1")
    fallback_sf = os.environ.get("SWEEP_FALLBACK_SF_DIR", "/root/testdata/sf0.01")
    filters = sys.argv[1:]
    names = [
        n for n in GOLDEN
        if not filters or any(f in n for f in filters)
    ]
    spark = get_spark(
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=32,
    )
    n_pass = n_fail = n_rows_only = 0
    failures: list[str] = []
    for i, name in enumerate(names, 1):
        if free_gib() < MIN_FREE_GIB:
            print(f"!! STOP: free disk below {MIN_FREE_GIB} GiB floor", flush=True)
            break
        g = GOLDEN[name]
        t0 = time.time()
        try:
            if g.oracle is None:
                cnt = g.spark(spark, sf_dir).count()
                verdict, note = "rows-only", f"{cnt} rows"
                n_rows_only += 1
            elif name in TOLERANCE_COMPARE:
                spec = TOLERANCE_COMPARE[name]
                ok, msg = compare_tolerance(
                    g.spark(spark, sf_dir), g.oracle, sf_dir,
                    spec["keys"], spec["rel_tol"],
                )
                verdict = "pass@tol" if ok else "FAIL"
                note = msg
                n_pass += ok
                n_fail += not ok
                if not ok:
                    failures.append(name)
            elif name in ORACLE_BOUND:
                # operator at sweep scale (regressions can't hide)...
                cnt = g.spark(spark, sf_dir).count()
                # ...full compare at the driver scale
                ok, msg = compare_spark_duckdb(
                    g.spark(spark, fallback_sf), g.oracle, fallback_sf
                )
                verdict = "pass@fallback" if ok else "FAIL"
                note = f"{cnt} rows at sweep sf; {msg}; {ORACLE_BOUND[name]}"
                n_pass += ok
                n_fail += not ok
                if not ok:
                    failures.append(name)
            else:
                ok, msg = compare_spark_duckdb(g.spark(spark, sf_dir), g.oracle, sf_dir)
                verdict, note = ("pass" if ok else "FAIL"), msg
                n_pass += ok
                n_fail += not ok
                if not ok:
                    failures.append(name)
        except Exception as e:  # noqa: BLE001 — sweep must report, not die
            verdict, note = "ERROR", f"{type(e).__name__}: {e}"
            n_fail += 1
            failures.append(name)
        wall = time.time() - t0
        guard = " [OVER GUARD]" if wall > WALL_GUARD else ""
        print(f"[{i}/{len(names)}] {name}: {verdict} {wall:.1f}s{guard} — {note}",
              flush=True)
    print(f"\nSWEEP DONE: {n_pass} pass, {n_rows_only} rows-only, "
          f"{n_fail} fail — failures: {failures}", flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
