"""Tests for tools/op_change_check.py — the mechanized edited-op
elevation rule (VERDICT r9 item 3).

Round 9 proved the manual elevation enumeration drops shared-helper
adopters: `win_range_time_interval` picked up the rewritten
`_util.epoch_s` through `from ._util import epoch_s` and nobody
declared it. The tool hashes each op's transitive source (op function
+ every package-internal function/class reached through the import
graph, including FUNCTION-LOCAL imports resolved from bytecode, +
module-level data constants + the oracle SQL) and fails when a
changed-hash op is neither elevated nor in the staged window.

Two live invocations are pinned here:
  * the CURRENT tree vs the last driver drop must pass under this
    round's ROUND_ELEVATIONS (same contract as the cert-age ledger
    live test);
  * the ROUND-9 close tree vs the ROUND-8 driver drop — replayed on
    permanent history commits — must flag exactly
    `win_range_time_interval`, reproducing by machine the breach the
    round-9 judge found by hand (the tool's acceptance criterion,
    VERDICT r9 item 3).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# permanent history pins: the r8 / r9 driver drops (the commits that
# ADDED CORRECTNESS_r08/r09.json — the trees those certifications ran
# against)
R8_DROP = "53ddbffdd085380ee7a39dc63987d3736b50940c"
R9_DROP = "bdb3b226c7829e1dd12de87c5be5b6c4ade25771"

# round-9's declared elevations, verbatim from its round_close_check
R9_ELEVATIONS = (
    "stream_session_window,agg_first_last,join_asof_latest,"
    "join_asof_tolerance,dedup_latest_by_key,win_lag_change,"
    "win_running_distinct,win_sessionize_gap,win_interpolate_linear,"
    "stream_watermark_late,stream_foreachbatch_upsert,"
    "stream_stream_join,tpcdi_dim_trade,events_funnel,"
    "str_levenshtein_link,str_collate_ci,dedup_url_canonical,"
    "scan_python_datasource,scan_csv_malformed,scan_xml_flatten,"
    "xml_roundtrip_builtin"
)


def _run(args, env_extra=None, timeout=600):
    env = dict(os.environ)
    env.pop("CERT_AGE_ELEVATED", None)
    env.update(env_extra or {})
    return subprocess.run(
        [sys.executable, "tools/op_change_check.py", *args],
        cwd=REPO, capture_output=True, text=True, timeout=timeout, env=env,
    )


def test_dump_is_deterministic_across_processes(tmp_path):
    """Hash inputs must be free of process artifacts (memory
    addresses, set iteration order, checkout paths) — the r10 build
    caught __file__ consts and dataclass-generated-method reprs
    faking 289 changed ops."""
    a, b = tmp_path / "a.json", tmp_path / "b.json"
    for f in (a, b):
        p = _run(["--dump", str(f), "--repo", REPO])
        assert p.returncode == 0, p.stderr[-2000:]
    ha, hb = json.load(open(a)), json.load(open(b))
    assert ha == hb
    assert len(ha) == 291


def test_live_repo_changed_ops_are_all_elevated_or_windowed():
    """Same contract as the cert-age live test: the shipped tree vs
    the last driver drop must pass under the declared elevations."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from round_close_check import ROUND_ELEVATIONS
    finally:
        sys.path.pop(0)
    p = _run([], env_extra={"CERT_AGE_ELEVATED": ROUND_ELEVATIONS})
    assert p.returncode == 0, p.stdout + p.stderr[-2000:]
    assert "FAIL" not in p.stdout


def test_r9_replay_flags_the_missed_epoch_s_adopter():
    """Acceptance criterion (VERDICT r9 item 3): against the r8
    baseline, the r9 close tree's changed set must cover all 21
    declared elevations and the check must FAIL on exactly
    win_range_time_interval — the shared-helper adopter the manual
    list missed."""
    # --repo needs a real checkout: materialize the r9 tree ourselves
    # so the tool's own worktree handling stays exercised for --base
    import tempfile

    with tempfile.TemporaryDirectory(prefix="r9_replay_") as tmp:
        wt = os.path.join(tmp, "r9")
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, R9_DROP],
            cwd=REPO, capture_output=True, text=True, check=True,
        )
        try:
            p = _run(
                ["--base", R8_DROP, "--repo", wt],
                env_extra={"CERT_AGE_ELEVATED": R9_ELEVATIONS},
            )
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=REPO, capture_output=True, text=True,
            )
    assert p.returncode == 1, p.stdout + p.stderr[-2000:]
    lines = [ln for ln in p.stdout.splitlines() if ln.startswith("FAIL")]
    assert len(lines) == 1
    assert "['win_range_time_interval']" in lines[0]
    # every declared elevation is in the reported changed set (the
    # tool reproduces the round's enumeration, not a subset)
    changed_line = next(ln for ln in p.stdout.splitlines() if "changed" in ln)
    for op in R9_ELEVATIONS.split(","):
        assert f"'{op}'" in changed_line, op
