#!/usr/bin/env python
"""Cert-age ledger check — mechanizes the §7.4g rotation schedule.

The rotation schedule previously lived only in a `_PRIORITY` header
comment and SURVEY prose, so it could silently drift between sessions
(VERDICT r8 item 3). This check recomputes the ledger from ground
truth — the driver's own CORRECTNESS_r*.json files — and FAILS when:

  1. any registry op has NO green driver row in any round (never
     certified, or its name drifted from the correctness history);
  2. any op's LATEST driver row is red (a shipped regression);
  3. any op OUTSIDE the staged front window would exceed the 6-round
     cert-age cap after the upcoming round certifies (the window ops
     are about to be re-certified, so they are exempt);
  4. the staged front window deviates from the schedule: it must be
     exactly the oldest-N ops ordered by (latest-green round, position
     within that round's file) — modulo ops elevated for a same-round
     re-cert after a code change (VERDICT r7 item 3), declared via
     CERT_AGE_ELEVATED as a comma-separated op list. A declared
     elevated op MUST actually sit inside the window.

Usage: python tools/cert_age_check.py [--window N]   (default 50)
Exit 0 = ledger healthy and the staged window matches the schedule.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MAX_CERT_AGE = 6  # rounds; steady-state bound of the §7.4g schedule


def green(row: dict) -> bool:
    if row.get("err"):
        return False
    # rows-only ops lack the match fields; only an explicit False fails
    return all(
        row.get(k) is not False
        for k in ("rows_match", "schema_match", "hash_match")
    )


def build_ledger(
    rounds: dict[int, dict[str, dict]],
) -> tuple[dict[str, tuple[int, int]], dict[str, tuple[int, bool]], int]:
    """(latest_green, latest_seen, upcoming_round) from round->rows maps."""
    latest_green: dict[str, tuple[int, int]] = {}
    latest_seen: dict[str, tuple[int, bool]] = {}
    for rnd in sorted(rounds):
        for pos, (op, row) in enumerate(rounds[rnd].items()):
            ok = green(row)
            latest_seen[op] = (rnd, ok)
            if ok:
                latest_green[op] = (rnd, pos)
    upcoming = max(rounds) + 1
    return latest_green, latest_seen, upcoming


def check(
    ops: list[str],
    n: int,
    rounds: dict[int, dict[str, dict]],
    elevated: set[str] = frozenset(),
    max_age: int = MAX_CERT_AGE,
) -> tuple[list[str], str]:
    """Return (errors, summary). Empty errors == ledger healthy."""
    latest_green, latest_seen, upcoming = build_ledger(rounds)
    window = ops[:n]
    errors: list[str] = []

    never = [o for o in ops if o not in latest_green]
    if never:
        errors.append(f"ops with NO green driver row in any round: {never}")

    red = [o for o in ops if o in latest_seen and not latest_seen[o][1]]
    if red:
        errors.append(f"ops whose LATEST driver row is red: {red}")

    stale = [
        f"{o} (cert r{latest_green[o][0]}, age {upcoming - latest_green[o][0]})"
        for o in ops
        if o in latest_green
        and o not in window
        and upcoming - latest_green[o][0] > max_age
    ]
    if stale:
        errors.append(
            f"ops outside the staged window exceeding the "
            f"{max_age}-round cert-age cap at round r{upcoming}: {stale}"
        )

    unknown_elev = sorted(elevated - set(ops))
    if unknown_elev:
        errors.append(f"CERT_AGE_ELEVATED names unknown ops: {unknown_elev}")
    outside_elev = sorted((elevated & set(ops)) - set(window))
    if outside_elev:
        # the edited-op rule elevates to the window FRONT the same round
        errors.append(
            f"CERT_AGE_ELEVATED ops not in the staged window: {outside_elev}"
        )

    if not never:
        elev_in_window = [o for o in window if o in elevated]
        by_age = sorted(
            (o for o in ops if o not in elev_in_window),
            key=lambda o: latest_green[o],
        )
        expected = set(elev_in_window) | set(by_age[: n - len(elev_in_window)])
        if set(window) != expected:
            extra = sorted(set(window) - expected)
            missing = sorted(expected - set(window))
            errors.append(
                f"staged window deviates from the cert-age schedule: "
                f"unexpected {extra}; should contain {missing}"
            )

    hist = Counter(r for r, _ in latest_green.values())
    summary = (
        f"ledger: {len(latest_green)}/{len(ops)} ops green, "
        f"upcoming round r{upcoming}, latest-green histogram "
        f"{dict(sorted(hist.items()))}"
    )
    if window and all(o in latest_green for o in window):
        summary += (
            f", window[{n}] certs "
            f"r{latest_green[window[0]][0]}..r{latest_green[window[-1]][0]}"
        )
    return errors, summary


def main() -> None:
    elevated = set(filter(None, os.environ.get("CERT_AGE_ELEVATED", "").split(",")))

    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not files:
        print("error: no CORRECTNESS_r*.json files found", file=sys.stderr)
        sys.exit(2)
    rounds = {
        int(re.search(r"r0*(\d+)", os.path.basename(f)).group(1)): json.load(open(f))
        for f in files
    }

    import __spark_entry__ as E

    ops = list(E.queries())
    if "--window" in sys.argv:
        n = int(sys.argv[sys.argv.index("--window") + 1])
    else:
        # default window: at least the historical 50, grown to hold
        # the over-age mandatory block PLUS every declared elevation
        # (r13 optimization round: edited ops are appended after the
        # mandatory block rather than displacing it — the window must
        # cover both; the driver re-runs the full registry, so a
        # larger staged window never starves an over-age op of its
        # re-cert slot)
        latest_green, _, upcoming = build_ledger(rounds)
        overage = sum(
            1
            for o in ops
            if o in latest_green
            and upcoming - latest_green[o][0] > MAX_CERT_AGE
        )
        n = max(50, overage + len(elevated & set(ops)))
    errors, summary = check(ops, n, rounds, elevated)
    print(summary)
    for e in errors:
        print(f"FAIL {e}")
    sys.exit(1 if errors else 0)


if __name__ == "__main__":
    main()
