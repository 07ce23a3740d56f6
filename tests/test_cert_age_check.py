"""Unit tests for tools/cert_age_check.py — the mechanized §7.4g
cert-age ledger (VERDICT r8 item 3).

The live check runs against the real CORRECTNESS_r*.json files and the
real registry; these tests drive the pure `check()` core with
synthetic ledgers so every failure mode is exercised, including the
ones the healthy repo can't produce (red rows, stale tails, deviated
windows, misdeclared elevations).
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from cert_age_check import MAX_CERT_AGE, check, green  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GREEN = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
RED = {"rows_match": False, "schema_match": True, "hash_match": False, "err": None}
ERR = {"err": "boom"}
ROWS_ONLY = {"err": None, "spark_rows": 5}


def test_green_row_classifier():
    assert green(GREEN)
    assert green(ROWS_ONLY)  # rows-only checks lack match fields
    assert not green(RED)
    assert not green(ERR)


def _rounds_linear(ops, per_round):
    """Certify `ops` green in consecutive-round blocks of `per_round`."""
    rounds, i = {}, 0
    for rnd in range(1, (len(ops) + per_round - 1) // per_round + 1):
        rounds[rnd] = {o: dict(GREEN) for o in ops[i : i + per_round]}
        i += per_round
    return rounds


def test_healthy_rotation_passes():
    ops = [f"op{i:03d}" for i in range(12)]
    rounds = _rounds_linear(ops, 4)  # r1: 0-3, r2: 4-7, r3: 8-11
    # staged window = the 4 oldest (r1 block) at the front
    errors, summary = check(ops, 4, rounds)
    assert errors == []
    assert "12/12 ops green" in summary
    assert "upcoming round r4" in summary


def test_red_latest_row_fails():
    ops = ["a", "b"]
    rounds = {1: {"a": dict(GREEN), "b": dict(GREEN)}, 2: {"a": dict(RED)}}
    errors, _ = check(ops, 2, rounds)
    assert any("LATEST driver row is red" in e and "'a'" in e for e in errors)


def test_err_row_counts_as_red():
    ops = ["a"]
    rounds = {1: {"a": dict(GREEN)}, 2: {"a": dict(ERR)}}
    errors, _ = check(ops, 1, rounds)
    assert any("LATEST driver row is red" in e for e in errors)


def test_never_certified_op_fails():
    ops = ["a", "ghost"]
    rounds = {1: {"a": dict(GREEN)}}
    errors, _ = check(ops, 1, rounds)
    assert any("NO green driver row" in e and "ghost" in e for e in errors)


def test_stale_op_outside_window_fails():
    # op 'old' certified r1 only; upcoming round is r8 => age 7 > 6,
    # and it is NOT in the staged window => must fail.
    ops = ["fresh", "old"]
    rounds = {1: {"old": dict(GREEN), "fresh": dict(GREEN)}}
    rounds.update({r: {"fresh": dict(GREEN)} for r in range(2, 8)})
    errors, _ = check(ops, 1, rounds)  # window = ['fresh'] — deviates too
    assert any("cert-age cap" in e and "old" in e for e in errors)


def test_stale_op_inside_window_is_exempt():
    # same ledger, but 'old' IS the staged window => about to re-cert.
    ops = ["old", "fresh"]
    rounds = {1: {"old": dict(GREEN), "fresh": dict(GREEN)}}
    rounds.update({r: {"fresh": dict(GREEN)} for r in range(2, 8)})
    errors, _ = check(ops, 1, rounds)
    assert errors == []


def test_window_deviation_fails():
    ops = [f"op{i}" for i in range(6)]
    rounds = _rounds_linear(ops, 3)  # r1: op0-2, r2: op3-5
    # staged window holds a YOUNG op (op3, r2) while op2 (r1) waits
    deviant = ["op0", "op1", "op3", "op2", "op4", "op5"]
    errors, _ = check(deviant, 3, rounds)
    assert any(
        "deviates" in e and "op3" in e and "op2" in e for e in errors
    ), errors


def test_elevated_op_excuses_deviation():
    ops = [f"op{i}" for i in range(6)]
    rounds = _rounds_linear(ops, 3)
    deviant = ["op0", "op1", "op3", "op2", "op4", "op5"]
    # op3 was edited this round and elevated per VERDICT r7 item 3
    errors, _ = check(deviant, 3, rounds, elevated={"op3"})
    assert errors == []


def test_elevated_op_outside_window_fails():
    ops = [f"op{i}" for i in range(6)]
    rounds = _rounds_linear(ops, 3)
    errors, _ = check(ops, 3, rounds, elevated={"op5"})
    assert any("not in the staged window" in e and "op5" in e for e in errors)


def test_unknown_elevated_op_fails():
    ops = ["a"]
    rounds = {1: {"a": dict(GREEN)}}
    errors, _ = check(ops, 1, rounds, elevated={"bogus"})
    assert any("unknown ops" in e and "bogus" in e for e in errors)


def test_age_exactly_at_cap_passes():
    # cert r1, upcoming r7 => age 6 == MAX_CERT_AGE: allowed, not over.
    ops = ["edge", "fresh"]
    rounds = {1: {"edge": dict(GREEN), "fresh": dict(GREEN)}}
    rounds.update({r: {"fresh": dict(GREEN)} for r in range(2, 7)})
    assert MAX_CERT_AGE == 6
    errors, _ = check(["edge", "fresh"], 1, rounds)
    # 'edge' is in the window (position 0) — also verify the pure age
    # rule by checking the non-window op 'fresh' (age 1) passes
    assert errors == []


def test_live_repo_ledger_is_healthy():
    """The shipped registry + real CORRECTNESS files must pass — this
    is the same invocation round_close_check runs as its final step,
    INCLUDING its CERT_AGE_ELEVATED declaration (the single source of
    truth for this round's edited-op elevations)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from round_close_check import ROUND_ELEVATIONS
    finally:
        sys.path.pop(0)
    env = dict(os.environ, CERT_AGE_ELEVATED=ROUND_ELEVATIONS)
    p = subprocess.run(
        [sys.executable, "tools/cert_age_check.py"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert p.returncode == 0, p.stdout + p.stderr
    assert "FAIL" not in p.stdout


def test_live_repo_elevations_without_declaration_fail_loudly():
    """Guard the guard: if ops are elevated in _PRIORITY, the bare
    (undeclared) invocation must FAIL on the schedule deviation rather
    than silently accepting an arbitrary window order. Skips the
    assertion content when no elevation is declared (steady-state
    rounds), where bare == declared and both must pass."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from round_close_check import ROUND_ELEVATIONS
    finally:
        sys.path.pop(0)
    env = dict(os.environ)
    env.pop("CERT_AGE_ELEVATED", None)
    p = subprocess.run(
        [sys.executable, "tools/cert_age_check.py"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    if ROUND_ELEVATIONS:
        assert p.returncode == 1, p.stdout + p.stderr
        assert "deviates" in p.stdout
    else:
        assert p.returncode == 0, p.stdout + p.stderr


def test_missing_fixture_dir_is_usage_error():
    """parity_sweep must exit 2 on a nonexistent explicit fixture dir
    (round-8 ADVICE: a failed adversarial regen previously made the
    window sweep silently fall through to the friendly fixture)."""
    p = subprocess.run(
        [
            sys.executable,
            "tools/parity_sweep.py",
            "/tmp/spark_graft_no_such_fixture_dir",
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert p.returncode == 2
    assert "does not exist" in p.stderr


def test_unknown_op_name_is_usage_error():
    """parity_sweep must reject mistyped op names instead of silently
    shrinking the sweep (round-8 ADVICE)."""
    p = subprocess.run(
        [
            sys.executable,
            "tools/parity_sweep.py",
            "/root/testdata/sf0.001",
            "definitely_not_an_op",
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert p.returncode == 2
    assert "unknown op name" in p.stderr
