"""Regenerate QUERIES.md from the @golden registry.

Run: python tools/gen_queries_md.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mr_dice_spark.golden import GOLDEN  # noqa: E402


def main() -> None:
    lines = [
        "# Golden query corpus",
        "",
        "Auto-generated from the `@golden` registry (`tools/gen_queries_md.py`).",
        "Every entry is a `queries()` key in `__spark_entry__.py`; entries with an",
        "oracle are hash-compared against DuckDB at sf0.01 by the driver and by",
        "`tests/test_golden.py`. `bench` entries form the `bench.py` headline set.",
        "",
        f"**{len(GOLDEN)} queries, {sum(1 for q in GOLDEN.values() if q.oracle)} with SQL oracles** "
        f"({sum(1 for q in GOLDEN.values() if not q.oracle)} rows-only: approximate/stateful ops "
        "whose outputs are checked by dedicated property/tolerance tests instead).",
        "",
        "| query | tags | oracle | bench |",
        "|---|---|---|---|",
    ]
    for name in sorted(GOLDEN):
        q = GOLDEN[name]
        lines.append(
            f"| {name} | {', '.join(q.tags)} | {'sql' if q.oracle else 'rows-only'} "
            f"| {'yes' if q.bench else ''} |"
        )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(GOLDEN)} queries")


if __name__ == "__main__":
    main()
