#!/usr/bin/env python
"""Merge every SWEEP_SF10*.json artifact into the one-row-per-registry-key
sf10 ledger table (round-6 verdict #1: "SWEEP_SF10.md carries a 399-row
table, every key value-proven or explicitly size-contracted with its
reason; zero mismatches").

Merge policy (round-7 verdict #4 — a value divergence must never print
as an environmental hiccup):

- artifacts are ordered by mtime; within a key, the LATEST evidence of
  each kind wins;
- a key whose newest evidence is a completed compare with
  ``hash_match: false`` (or rows/schema false) renders as **MISMATCH**,
  distinct from an execution ERROR — even if an older artifact passed;
- a clean pass supersedes any OLDER mismatch or environmental error;
- keys never attempted, or only ever errored, print as OPEN with the
  latest error snippet.

Usage: python scripts/sf10_ledger.py [repo_dir] > ledger.md
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _artifact_time(repo: str, f: str) -> float:
    """Stable recency for artifact ordering: the file's last git commit
    time, falling back to mtime for uncommitted files.  Plain mtime is
    NOT recoverable after a fresh checkout (every file gets the checkout
    instant, observed round 9), which silently scrambled the
    latest-evidence arbitration this module depends on."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "--", os.path.basename(f)],
            cwd=repo,
            capture_output=True,
            text=True,
            timeout=30,
        ).stdout.strip()
        if out:
            return float(out)
    except Exception:
        pass
    return os.path.getmtime(f)


def merge(repo: str) -> dict[str, dict]:
    # per key, the most recent record of each kind: pass / mismatch / error
    latest: dict[str, dict[str, tuple[int, dict]]] = {}
    # round-10 rule: .partial scratch can NEVER be cited as evidence —
    # refuse to run while any sits in the repo root (archive it first)
    partials = glob.glob(os.path.join(repo, "*.json.partial"))
    if partials:
        raise SystemExit(
            "sf10_ledger: refusing to merge with .partial scratch present: "
            + ", ".join(sorted(os.path.basename(p) for p in partials))
        )
    files = sorted(
        glob.glob(os.path.join(repo, "SWEEP_SF10*.json")),
        key=lambda f: (_artifact_time(repo, f), os.path.basename(f)),
    )
    for idx, f in enumerate(files):
        if ".timing" in f:
            continue
        try:
            d = json.load(open(f))
        except Exception:
            continue
        if not isinstance(d, dict):
            continue
        src = os.path.basename(f)
        for k, v in d.items():
            if not isinstance(v, dict) or "hash_match" not in v:
                continue
            ok = bool(v.get("rows_match") and v.get("schema_match") and v.get("hash_match"))
            err = v.get("err") or ""
            # A record is a MISMATCH only if the compare actually
            # COMPLETED and disagreed: the oracle produced rows
            # (oracle_rows set), or a match flag is true (flags are only
            # set by a completed compare), or the err text is one of the
            # comparator's own problem strings.  An exception repr with
            # no completed compare — even with spark_rows populated
            # (engine ran, oracle died) — is an execution ERROR.
            compared = (
                v.get("oracle_rows") is not None
                or v.get("rows_match")
                or v.get("schema_match")
                or err.startswith(("row count", "columns:", "values differ", "hash "))
            )
            if ok:
                kind = "pass"
            elif compared:
                kind = "mismatch"
            else:
                kind = "error"
            rec = {
                "ok": ok,
                "kind": kind,
                "rows": v.get("spark_rows"),
                "err": (v.get("err") or "")[:90],
                "src": src,
            }
            latest.setdefault(k, {})[kind] = (idx, rec)
    best: dict[str, dict] = {}
    for k, kinds in latest.items():
        # newest mismatch outranks an older pass; a newer pass clears it
        order = sorted(kinds.items(), key=lambda kv: kv[1][0], reverse=True)
        newest_kind, (newest_idx, newest_rec) = order[0]
        if newest_kind == "error" and ("pass" in kinds or "mismatch" in kinds):
            # an environmental error never hides an earlier VERDICT —
            # neither a clean pass nor a value MISMATCH (round-8 advice:
            # a divergence must never print as OPEN).  Pass-vs-mismatch
            # arbitration stays recency-based: the newer of the two wins.
            p = kinds.get("pass")
            m = kinds.get("mismatch")
            if p and m:
                best[k] = m[1] if m[0] > p[0] else p[1]
            else:
                best[k] = (p or m)[1]
        else:
            best[k] = newest_rec
    return best


def main() -> int:
    repo = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    import __spark_entry__ as entrymod

    keys = sorted(entrymod.queries())
    best = merge(repo)
    n_pass = sum(1 for k in keys if best.get(k, {}).get("ok"))
    n_mismatch = sum(
        1 for k in keys if best.get(k, {}).get("kind") == "mismatch"
    )
    n_open = len(keys) - n_pass - n_mismatch
    print(
        f"## sf10 ledger — {n_pass}/{len(keys)} value-proven, "
        f"{n_mismatch} MISMATCH, {n_open} open\n"
    )
    print("| key | status | rows | artifact / note |")
    print("|---|---|---|---|")
    for k in keys:
        b = best.get(k)
        if b and b["ok"]:
            print(f"| {k} | pass | {b['rows']} | {b['src']} |")
        elif b and b["kind"] == "mismatch":
            print(
                f"| {k} | **MISMATCH** | {b['rows']} | "
                f"value divergence: {b['err'] or 'hash_match=false'} ({b['src']}) |"
            )
        elif b:
            print(f"| {k} | OPEN | — | last error: {b['err']} ({b['src']}) |")
        else:
            print(f"| {k} | OPEN | — | never attempted |")
    extra = sorted(set(best) - set(keys))
    if extra:
        print(f"\n(artifact keys no longer in the registry: {', '.join(extra)})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
