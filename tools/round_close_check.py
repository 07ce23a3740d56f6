#!/usr/bin/env python
"""Round-close checklist runner — one command, one PASS/FAIL summary.

Encodes the pre-close protocol SURVEY §7.4 hands from round to round
(so it stops drifting between sessions):

  1. driver-window parity (first N registry ops) at sf0.01
  2. full-registry parity at sf0.001 (cheap full-surface pass)
  3. driver-canonicalizer probe (sort + hash halves) on every op
  4. entry() smoke on a VANILLA local[8] session (rows + schema)
  5. pytest collect-only count >= EXPECTED_MIN_TESTS (the suite
     itself runs separately — this pins the COUNT, not just the exit
     code, so a silently-dropped test file is loud; round-7 ADVICE)
  6. adversarial-fixture parity over the certification window: the
     hostile-values fixture is regenerated fresh (deterministic value
     pools) and the window ops must match DuckDB on it, so the
     window's cross-engine agreement is re-proven each round to be a
     property of the EXPRESSIONS, not of the friendly fixture
     (round-8 addition; previously a manual sweep)
  7. docs drift: regenerate OPERATORS.md + PLANS.md and fail if the
     working tree changes (VERDICT r7 item 4 — two r7 commits were
     manual line-number refreshes; a stale index must never ship)
  8. cert-age ledger: recompute latest-green per op from the
     CORRECTNESS_r*.json files and fail if any op's cert age would
     exceed 6 rounds after the upcoming round, any latest row is red,
     or the staged front window deviates from the §7.4g rotation
     schedule (VERDICT r8 item 3 — the schedule can no longer drift
     silently between sessions; edited-op elevations are declared via
     CERT_AGE_ELEVATED, which this runner inherits from the env)
  9. edited-op elevation audit: hash every registered op's TRANSITIVE
     source (op function + package-internal helpers + oracle) against
     the previous driver drop's tree and fail if any changed-hash op
     is absent from CERT_AGE_ELEVATED ∪ the staged window (VERDICT r9
     item 3 — manual enumeration missed a shared-helper adopter;
     tools/op_change_check.py)

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
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PY = sys.executable

# Floor for step 5: the suite had this many tests when the floor was
# last raised (round 11). Raise it whenever tests are added; a collect
# run BELOW it means a file silently fell out of collection.
EXPECTED_MIN_TESTS = 1024

# Standing edited-op rule: ops whose CODE changed this round sit in the
# window for a same-round re-cert; declared to cert_age_check
# (and to tests/test_cert_age_check.py's live-repo invocation) via the
# CERT_AGE_ELEVATED env. r12 — the extremes-probe hardening wave
# (tools/probe_r12_extremes.py; full registry swept on a fixture with
# ids within 64 of int64 max incl. the exact max, order/ship dates
# ending mid-9999, events at 10-digit epochs, and 16 hostile JSON prop
# shapes; 257/291 matched, every non-match adjudicated):
#   ID-DERIVATION OVERFLOW CLASS (Spark-side ANSI stage-kills on
#   hash-scale ids; every fix is a modular pre-reduction or wider
#   construct, bit-identical wherever the naive form didn't overflow,
#   mirrored in the oracle):
#     tpcdi_prospect_match — p_id wraparound re-key near int64 max;
#     tpcdi_dim_broker — phone (k%1e7)*7919%1e7;
#     tpcdi_dim_company/_dim_security/_financial/
#       tpcdi_audit_reconciliation/tpcdi_batch_e2e — the shared
#       FINWIRE fixture builder's sh13/FIN-measure products, key
#       pre-reduced so the char(13)/char(17) fields stay pure pads;
#     tpcdi_scd2_dimaccount — account_id (k%2^61)*4+...;
#     audit_data_quality — composite lineitem pk as a '-'-joined
#       string (the k*100+linenumber scalar also silently collided
#       for linenumber >= 100);
#     graph_pagerank / graph_label_propagation — edge dst
#       (id%cnt)*7+13k mod cnt;
#     sample_negative_pairs — BOTH pair-key operands pre-reduced
#       mod 2^31 before *1000 and the LCG;
#     str_concat_phone — area code (k%1e3)*7%1e3;
#     agg_first_last — lexicographic struct (epoch-sec, event_id)
#       min_by/max_by key (the epoch*1e7+id scalar overflowed AND
#       silently interleaved ids >= 1e7); oracle = HUGEINT
#       epoch*2^64+id, exact-integer epoch floor.
#   HOSTILE-JSON CLASS (one bad payload must not kill a stage):
#     json_extract — regex-gated try_cast BIGINT (was bare CAST AS
#       INT: killed on int64-range k), lenient numeric-string
#       convention documented;
#     json_variant_extract — try_parse_json + try_variant_get BIGINT
#       (VARIANT_DUPLICATE_KEY and INVALID_VARIANT_CAST both
#       stage-killed from data);
#     udtf_map_in_pandas — strict typed-int extraction with
#       first-duplicate-key json.loads hook, json_type-gated oracle
#       (a 20-digit JSON integer OverflowError-killed the Arrow
#       batch).
#   DATE-CEILING CONTRACT: tpcdi_scd2_incremental (+ tpcdi_batch_e2e
#     transitively) — _batch_date_shift raises a named ValueError
#     when the synthetic batch shift would cross 9999-12-31 (the
#     DATE type cannot host it in either engine).
#   Plus the two ADVICE items committed earlier this round:
#     agg_approx_percentile (mechanical flag gate) and the
#     _split_bucket shiftright hardening reaching sample_split_assign,
#     sample_temperature_mixture, sample_stratified_exact,
#     pipeline_corpus_curation, pipeline_pretrain_e2e.
#   Second probe pass (complete, non-truncated log) found three more
#   Spark-side killers; two fixed this round:
#     sink_compact_small_files — DECIMAL(38,0) key checksum (BIGINT
#       sum of hash-scale keys overflows Spark-side; DuckDB silently
#       widens to HUGEINT);
#     sink_merge_upsert — insert-key quotient pre-reduced mod
#       floor(2^63/40) so the *40 cannot overflow at an int64-max key.
# Deferred to r13 (enumerated in SURVEY §7.4o; recipes pinned
# executable in tests/test_r13_prep.py): the FLOOR(EPOCH)
# double-rounding oracle migration (11 ops), bit_ops shift semantics,
# the FINWIRE CIK char(10) width guards, scan_xml_flatten's
# writer-side custkey*10 reduction, and str_encode_b64_hex's
# CRLF-strip (Spark base64 MIME-chunks past 57-byte payloads) —
# the 50-window's 25-mandatory-r5 budget could not hold these.
ROUND_ELEVATIONS = (
    "agg_approx_percentile,agg_first_last,audit_data_quality,"
    "graph_label_propagation,graph_pagerank,json_extract,"
    "json_variant_extract,pipeline_corpus_curation,pipeline_pretrain_e2e,"
    "sample_negative_pairs,sample_split_assign,sample_stratified_exact,"
    "sample_temperature_mixture,str_concat_phone,tpcdi_audit_reconciliation,"
    "tpcdi_batch_e2e,tpcdi_dim_broker,tpcdi_dim_company,tpcdi_dim_security,"
    "tpcdi_financial,tpcdi_prospect_match,tpcdi_scd2_dimaccount,"
    "tpcdi_scd2_incremental,udtf_map_in_pandas,"
    "sink_compact_small_files,sink_merge_upsert"
)


def window_ops(n: int) -> list[str]:
    import __spark_entry__ as E

    return list(E.queries())[:n]


def run(label: str, cmd: list[str]) -> tuple[str, bool, str]:
    try:
        p = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, timeout=7200
        )
    except subprocess.TimeoutExpired:
        # a hung step is a FAIL row, not a checklist crash (r7 ADVICE)
        return label, False, "timeout after 7200s"
    if p.returncode == 0:
        tail = (p.stdout or p.stderr).strip().splitlines()
        return label, True, tail[-1] if tail else ""
    # on failure the real error is usually on stderr — prefer it, but
    # keep the stdout tail too so a tool that reports failures on
    # stdout (e.g. parity_sweep's MISMATCH lines) stays visible
    err_tail = [ln for ln in p.stderr.strip().splitlines() if ln.strip()]
    out_tail = [ln for ln in p.stdout.strip().splitlines() if ln.strip()]
    parts = [t[-1] for t in (err_tail, out_tail) if t]
    return label, False, " | ".join(parts)


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
        (
            "regen adversarial fixture",
            [PY, "tools/adversarial_fixture.py", "/tmp/spark_graft_adversarial"],
        ),
        (
            f"window[{n}] parity @ adversarial",
            [PY, "tools/parity_sweep.py", "/tmp/spark_graft_adversarial", *ops],
        ),
        ("regen OPERATORS.md", [PY, "tools/gen_operators_md.py"]),
        ("regen PLANS.md", [PY, "tools/gen_plans_md.py"]),
        (
            "docs drift (tree clean after regen)",
            ["git", "diff", "--stat", "--exit-code",
             "OPERATORS.md", "PLANS.md"],
        ),
        (
            "cert-age ledger & rotation schedule",
            [PY, "tools/cert_age_check.py", "--window", str(n)],
        ),
        (
            "edited-op elevation audit",
            [PY, "tools/op_change_check.py", "--window", str(n)],
        ),
    ]
    os.environ.setdefault("CERT_AGE_ELEVATED", ROUND_ELEVATIONS)
    results = [run(label, cmd) for label, cmd in steps]
    print()
    ok = True
    for label, good, tail in results:
        if label == "pytest collection intact" and good:
            # exit 0 is not enough: compare the COLLECTED COUNT
            # against the pinned floor (a dropped file still exits 0)
            m = re.search(r"(\d+) tests collected", tail)
            count = int(m.group(1)) if m else -1
            good = count >= EXPECTED_MIN_TESTS
            tail = f"{count} tests collected (floor {EXPECTED_MIN_TESTS})"
        print(f"[{'PASS' if good else 'FAIL'}] {label}: {tail}")
        ok &= good
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
