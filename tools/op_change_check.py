#!/usr/bin/env python
"""Edited-op elevation check — mechanizes the standing edited-op rule
(VERDICT r7 item 3) that round 9 proved manual enumeration cannot
uphold: `win_range_time_interval` adopted the rewritten `_util.epoch_s`
via a shared helper and was missed by the hand-kept elevation list
(VERDICT r9 finding 1 / item 3).

For every registered op this tool hashes the op's TRANSITIVE SOURCE —
the op function itself (whose `@_op` decorator source embeds the
oracle SQL) plus every package-internal function/class it reaches
through the import graph (walked over code-object `co_names` /nested
code consts, so `from ._util import epoch_s` adopters are found
mechanically), plus any package-module-level data constants it reads
(option dicts, SQL strings). It computes the same hashes for the
previous round's committed tree (a detached `git worktree` of the
last commit that ADDED a CORRECTNESS_r*.json — the driver's drop, so
the tree the last certification actually ran against) and FAILS if
any op whose hash changed is absent from CERT_AGE_ELEVATED ∪ the
staged front window (both about to be re-certified; everything else
would carry a cert that certifies dead code).

Validated against history (SURVEY §7.4m): run with the round-9 close
tree as --repo and the round-8 driver drop as --base, it reports
exactly the 21 declared r9 elevations + the two scheduled-window
edits + `win_range_time_interval`, and FAILS on the latter — the
breach the judge found by hand.

Usage:
  python tools/op_change_check.py [--base REF] [--window N] [--repo DIR]
  python tools/op_change_check.py --dump FILE --repo DIR   (internal)
Exit 0 = every changed op is elevated or in the staged window.
"""

from __future__ import annotations

import dis
import hashlib
import importlib
import importlib.util
import inspect
import json
import os
import subprocess
import sys
import tempfile

PKG = "tpc_di_etl_using_pyspark_spark"
SCRIPT = os.path.abspath(__file__)
DEFAULT_REPO = os.path.dirname(os.path.dirname(SCRIPT))


def _source_of(obj) -> str:
    try:
        return inspect.getsource(obj)
    except (OSError, TypeError):
        # no retrievable source (e.g. dataclass-GENERATED methods —
        # their behavior derives from the class source, which is
        # hashed separately): a stable token, never repr(), whose
        # memory address would fake a change on every process
        return f"<no-source:{getattr(obj, '__qualname__', type(obj).__name__)}>"


def _walk(fn, seen: dict) -> None:
    """Collect package-internal deps of `fn` into seen{key: source}."""
    code = getattr(fn, "__code__", None)
    if code is None:
        return
    g = getattr(fn, "__globals__", {})
    pkg_of_fn = (getattr(fn, "__module__", "") or "").rpartition(".")[0]
    stack, names = [code], set()
    while stack:
        co = stack.pop()
        names.update(co.co_names)
        names.update(co.co_freevars)
        for c in co.co_consts:
            if inspect.iscode(c):
                stack.append(c)
        # FUNCTION-LOCAL imports (from ..x import Y inside the op
        # body) never appear in module globals — resolve them from
        # the bytecode: IMPORT_NAME is preceded by LOAD_CONST level
        # and LOAD_CONST fromlist (r10; scan_python_datasource's
        # DataSource class and stream_stream_join's interval-join
        # helper were invisible to the globals-only walk).
        consts: list = [None, None]
        for ins in dis.get_instructions(co):
            if ins.opname == "LOAD_CONST":
                consts = [consts[1], ins.argval]
            elif ins.opname == "IMPORT_NAME":
                level, fromlist = consts
                if not isinstance(level, int):
                    continue
                relname = "." * level + (ins.argval or "")
                try:
                    absname = (
                        importlib.util.resolve_name(relname, pkg_of_fn)
                        if level
                        else ins.argval
                    )
                except (ImportError, ValueError):
                    continue
                if not absname or not absname.startswith(PKG):
                    continue
                try:
                    mod = importlib.import_module(absname)
                except ImportError:
                    continue
                for nm in fromlist or ():
                    if hasattr(mod, nm):
                        _visit(getattr(mod, nm), nm, seen)
    # closure cells too (decorated/nested helpers)
    for cell in getattr(fn, "__closure__", None) or ():
        try:
            v = cell.cell_contents
        except ValueError:
            continue
        _visit(v, f"<cell:{id(v)}>", seen)
    for name in sorted(names):
        if name in g:
            _visit(g[name], name, seen)


def _visit(v, name: str, seen: dict) -> None:
    # unwrap pandas_udf / partial-style wrappers to the python callable
    inner = getattr(v, "func", None)
    if inner is not None and callable(inner):
        _visit(inner, name, seen)
    mod = getattr(v, "__module__", "") or ""
    if inspect.isfunction(v) and mod.startswith(PKG):
        key = f"{mod}.{v.__qualname__}"
        if key not in seen:
            seen[key] = _source_of(v)
            _walk(v, seen)
    elif inspect.isclass(v) and mod.startswith(PKG):
        key = f"{mod}.{v.__qualname__}"
        if key not in seen:
            seen[key] = _source_of(v)
            for m in vars(v).values():
                if inspect.isfunction(m):
                    _walk(m, seen)
    elif inspect.ismodule(v) and (getattr(v, "__name__", "") or "").startswith(
        PKG
    ):
        # a module object reached as a value (`from . import _util`
        # then `_util.helper(...)`) — conservatively hash the module's
        # FULL source: per-attribute resolution would need the
        # referencing co_names here, and a coarse hash only ever
        # over-flags (forcing an elevation), never masks. Without
        # this, the exact shared-helper-adopter class the tool exists
        # to catch (the r9 breach) would re-open on a module-attribute
        # import style (ADVICE r10).
        key = f"<module>.{v.__name__}"
        if key not in seen:
            seen[key] = _source_of(v)
    elif isinstance(v, (str, int, float, bool, tuple, list, dict, frozenset)):
        # module-level data an op reads (SQL strings, option dicts):
        # attribute to the referencing name — behavior-bearing state.
        # Dunders (__file__, __name__, …) are interpreter/checkout
        # artifacts, not behavior — a checkout-path difference must
        # not read as an op edit.
        if name.startswith("__"):
            return
        if isinstance(v, frozenset):
            # set iteration order is hash-randomized per process
            v = sorted(map(repr, v))
        # key carries a digest of the VALUE, not just the referencing
        # name: two same-named constants reachable from one op's walk
        # (e.g. package-internal `_OPTS` dicts in two modules) would
        # otherwise collide last-writer-wins, masking a real change to
        # one behind the unchanged other (ADVICE r10). Every distinct
        # observed value now contributes its own entry, order-free.
        rv = repr(v)
        key = f"<const>.{name}#{hashlib.sha256(rv.encode()).hexdigest()[:12]}"
        seen[key] = rv


def compute_hashes(repo: str) -> dict[str, str]:
    sys.path.insert(0, repo)
    from tpc_di_etl_using_pyspark_spark.plans.registry import (  # noqa: E402
        all_oracles,
        all_queries,
    )

    oracles = all_oracles()
    out = {}
    for op, fn in all_queries().items():
        seen: dict[str, str] = {}
        _visit(fn, op, seen)
        _walk(fn, seen)
        blob = json.dumps(
            [oracles.get(op, ""), sorted(seen.items())], ensure_ascii=False
        )
        out[op] = hashlib.sha256(blob.encode()).hexdigest()
    return out


def baseline_ref(repo: str) -> str:
    """The last commit that ADDED a CORRECTNESS file = the tree the
    previous certification ran against (the driver commits the JSON on
    top of the round's final code)."""
    return subprocess.run(
        ["git", "log", "-1", "--format=%H", "--diff-filter=A",
         "--", "CORRECTNESS_r*.json"],
        cwd=repo, capture_output=True, text=True, check=True,
    ).stdout.strip()


def hashes_at(repo: str, ref: str) -> dict[str, str]:
    with tempfile.TemporaryDirectory(prefix="op_change_base_") as tmp:
        wt = os.path.join(tmp, "tree")
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, ref],
            cwd=repo, capture_output=True, text=True, check=True,
        )
        try:
            dump = os.path.join(tmp, "hashes.json")
            p = subprocess.run(
                [sys.executable, SCRIPT, "--dump", dump, "--repo", wt],
                capture_output=True, text=True,
            )
            if p.returncode != 0:
                raise RuntimeError(f"baseline dump failed: {p.stderr[-2000:]}")
            return json.load(open(dump))
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=repo, capture_output=True, text=True,
            )


def main() -> None:
    args = sys.argv[1:]

    def opt(flag, default=None):
        return args[args.index(flag) + 1] if flag in args else default

    repo = os.path.abspath(opt("--repo", DEFAULT_REPO))
    if "--dump" in args:
        json.dump(compute_hashes(repo), open(opt("--dump"), "w"), indent=0)
        return

    n = int(opt("--window", "50"))
    ref = opt("--base") or baseline_ref(repo)
    base = hashes_at(repo, ref)
    cur = compute_hashes(repo)

    sys.path.insert(0, repo)
    from tpc_di_etl_using_pyspark_spark.plans.registry import all_queries

    window = set(list(all_queries())[:n])
    elevated = set(
        filter(None, os.environ.get("CERT_AGE_ELEVATED", "").split(","))
    )
    changed = sorted(
        op for op, h in cur.items() if base.get(op) != h
    )
    missing = [op for op in changed if op not in window and op not in elevated]
    print(
        f"base {ref[:12]}: {len(changed)} op(s) with changed transitive "
        f"source: {changed}"
    )
    if missing:
        print(
            f"FAIL changed ops neither declared in CERT_AGE_ELEVATED nor in "
            f"the staged window[{n}] (their last cert certifies dead code): "
            f"{missing}"
        )
        sys.exit(1)
    print("all changed ops are elevated or in the staged window")


if __name__ == "__main__":
    main()
