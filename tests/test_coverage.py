"""Lifetime driver-coverage badge: the never-driver-checked golden set
must stay drainable within ONE 50-slot window, and every such golden must
be explicitly scheduled (in the current `_CHECK_FIRST` window or named in
the ROUND-N WINDOW QUEUE comment) — so the corpus can never again outgrow
the verification channel silently (round-5 VERDICT carried 39 unverified
goldens as its largest finding; this pins the invariant in CI)."""

from __future__ import annotations

import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_checked() -> set[str]:
    import glob

    covered: set[str] = set()
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(f) as fh:
            covered |= set(json.load(fh).keys())
    return covered


def test_never_driver_checked_set_fits_one_window():
    """The actionable form of the invariant: goldens with no driver row
    that are NOT in the current window (i.e. what remains after the
    imminent driver run) must fit one 50-slot window, so the next
    rotation can always finish the job. Counting in-window unchecked
    rows against the budget would false-alarm precisely when a round
    does the right thing and fills its window with unchecked goldens
    (round 6 carried 47 of 51 unchecked rows in-window, remainder 4)."""
    import __spark_entry__ as entry
    from mr_dice_spark.golden import GOLDEN

    never = set(GOLDEN) - _driver_checked()
    remainder = never - set(entry._CHECK_FIRST)
    assert len(remainder) <= 50, (
        f"{len(remainder)} goldens would still lack a driver CORRECTNESS "
        "row after the current window runs — more than the next 50-slot "
        "window can drain. Rotate the window in __spark_entry__.py before "
        f"adding more goldens: {sorted(remainder)}"
    )


def test_every_unchecked_golden_is_scheduled():
    """A golden without a driver row must be in the current window (it
    gets its row this round) or named in the WINDOW QUEUE comment (the
    next rotation leads with it)."""
    import __spark_entry__ as entry
    from mr_dice_spark.golden import GOLDEN

    never = set(GOLDEN) - _driver_checked()
    window = set(entry._CHECK_FIRST)
    with open(os.path.join(REPO, "__spark_entry__.py")) as fh:
        src = fh.read()
    m = re.search(r"ROUND-\d+ WINDOW QUEUE.*?\]", src, re.S)
    queue_text = m.group(0) if m else ""
    unscheduled = [
        n
        for n in sorted(never)
        if n not in window
        # Word-boundary match so a golden whose name is a substring of
        # a queued golden's name (foo vs foo_v2) doesn't silently count
        # as scheduled (ADVICE r6). \b treats _ as a word char, so the
        # full name must appear delimited by non-identifier chars.
        and not re.search(rf"\b{re.escape(n)}\b", queue_text)
    ]
    assert not unscheduled, (
        "goldens with no driver row, not in _CHECK_FIRST, and not named "
        f"in the WINDOW QUEUE comment: {unscheduled} — add them to the "
        "window (displacing a re-verification slot with a justifying "
        "comment) or to the queue comment in the same commit that adds "
        "the golden."
    )


def _freshness_horizon(n_goldens: int) -> int:
    """The re-verification freshness horizon, in rounds, derived from
    corpus size. A 50-slot window with 1 pinned flagship refreshes at
    most 49 goldens per round, so perfect round-robin over N goldens
    has period ceil((N-1)/49): a golden's age just before its own slot
    comes around again is exactly that period. Any horizon tighter than
    the period is pigeonhole-infeasible (the original hard-5 badge
    broke the moment the corpus passed 5x50=250 driver-checked goldens;
    VERDICT r7's own round-9 plan tripped it at 74 mandatory slots).
    One round of slack absorbs queue-drain rounds that spend slots on
    never-checked goldens instead of re-verification. Floor of 5 keeps
    the original strictness while the corpus is small."""
    import math

    return max(5, math.ceil((n_goldens - 1) / 49) + 1)


def _latest_rows() -> tuple[dict[str, int], int]:
    """(latest driver round per golden, the round being built)."""
    import glob

    latest: dict[str, int] = {}
    rounds = []
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        rounds.append(rnd)
        with open(f) as fh:
            for name in json.load(fh):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest, (max(rounds) + 1 if rounds else 0)


def test_no_golden_driver_row_older_than_horizon():
    """Age badge (round-6 VERDICT stretch, horizon derived round 8):
    every golden whose most recent driver CORRECTNESS row is more than
    the corpus-derived horizon old must be in the CURRENT window (it
    gets a fresh row this round). Rows-only goldens count their latest
    no_oracle appearance; goldens with no row at all are the other
    tests' job."""
    import __spark_entry__ as entry
    from mr_dice_spark.golden import GOLDEN

    latest, current = _latest_rows()
    if not current:
        pytest.skip("no driver CORRECTNESS files yet")
    horizon = _freshness_horizon(len(GOLDEN))
    window = set(entry._CHECK_FIRST)
    stale = [
        f"{n} (last r{latest[n]})"
        for n in sorted(GOLDEN)
        if n in latest and latest[n] < current - horizon and n not in window
    ]
    assert not stale, (
        f"goldens whose latest driver row is >{horizon} rounds old and "
        f"who are not in the current window: {stale} — rotate them into "
        "_CHECK_FIRST (the re-verification backlog must drain, not grow)."
    )


def test_next_round_window_arithmetic_stays_feasible():
    """The treadmill guard (round-8): AFTER the imminent driver run
    stamps every in-window golden with a fresh row, the NEXT round's
    badge-mandatory set (stale-beyond-horizon rows) plus the pinned
    flagship must still fit a 50-slot window — otherwise this round's
    rotation has wedged the next one, which is exactly how VERDICT r7's
    prescribed round-9 plan (1 + 47 stale + 26 queue = 74) would have
    failed under the old hard-5 horizon."""
    import __spark_entry__ as entry
    from mr_dice_spark.golden import GOLDEN

    latest, current = _latest_rows()
    if not current:
        pytest.skip("no driver CORRECTNESS files yet")
    horizon = _freshness_horizon(len(GOLDEN))
    window = set(entry._CHECK_FIRST)
    projected = {
        n: (current if n in window else latest.get(n, 0))
        for n in GOLDEN
        if n in latest or n in window
    }
    next_stale = [
        n for n, r in projected.items() if r < (current + 1) - horizon
    ]
    assert len(next_stale) + 1 <= 50, (
        f"after this round runs, round {current + 1} would owe "
        f"{len(next_stale)} stale re-verifications plus the flagship — "
        f"more than one 50-slot window: {sorted(next_stale)}"
    )
