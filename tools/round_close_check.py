#!/usr/bin/env python
"""Round-close checklist runner — one command, one PASS/FAIL summary.

Encodes the pre-close protocol SURVEY §7.4 hands from round to round
(so it stops drifting between sessions):

  1. driver-window parity (first N registry ops) at sf0.01
  2. full-registry parity at sf0.001 (cheap full-surface pass)
  3. driver-canonicalizer probe (sort + hash halves) on every op
  4. entry() smoke on a VANILLA local[8] session (rows + schema)
  5. pytest collect-only count (the suite itself runs separately —
     this just pins the count so a silent collection break is loud)

Heavier evidence (sf0.1 / adversarial sweeps, hostile combos, bench)
stays manual — it needs judgment about machine load; this script is
the mechanical floor every round must clear. Each step shells out to
the single-purpose tool so the checklist can't diverge from what the
tools actually do.

Usage: python tools/round_close_check.py [--window N]   (default 50)
Exit 0 = all steps green.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PY = sys.executable


def window_ops(n: int) -> list[str]:
    import __spark_entry__ as E

    return list(E.queries())[:n]


def run(label: str, cmd: list[str]) -> tuple[str, bool, str]:
    p = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=7200
    )
    tail = (p.stdout or p.stderr).strip().splitlines()
    return label, p.returncode == 0, tail[-1] if tail else ""


def main() -> None:
    n = 50
    if "--window" in sys.argv:
        n = int(sys.argv[sys.argv.index("--window") + 1])
    ops = window_ops(n)

    steps = [
        (
            f"window[{n}] parity @ sf0.01",
            [PY, "tools/parity_sweep.py", "/root/testdata/sf0.01", *ops],
        ),
        (
            "full registry parity @ sf0.001",
            [PY, "tools/parity_sweep.py", "/root/testdata/sf0.001"],
        ),
        (
            "driver canon probe (sort+hash)",
            [PY, "tools/driver_canon_probe.py", "/root/testdata/sf0.001"],
        ),
        (
            "entry() smoke (vanilla session)",
            [
                PY,
                "-c",
                (
                    "import sys; sys.path.insert(0, %r);\n"
                    "from pyspark.sql import SparkSession\n"
                    "s = SparkSession.builder.master('local[8]').getOrCreate()\n"
                    "s.sparkContext.setLogLevel('ERROR')\n"
                    "import __spark_entry__ as E\n"
                    "rows = E.entry(s).collect()\n"
                    "assert rows and len(rows[0]) >= 2, rows\n"
                    "print(f'entry ok: {len(rows)} rows')"
                )
                % REPO,
            ],
        ),
        (
            "pytest collection intact",
            [PY, "-m", "pytest", "tests/", "--collect-only", "-q"],
        ),
    ]
    results = [run(label, cmd) for label, cmd in steps]
    print()
    ok = True
    for label, good, tail in results:
        print(f"[{'PASS' if good else 'FAIL'}] {label}: {tail}")
        ok &= good
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
