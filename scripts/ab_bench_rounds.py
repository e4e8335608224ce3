#!/usr/bin/env python
"""Same-box interleaved bench A/B across repo states (round-10 verdict
item 1): attribute the r9 headline "regression" to code vs host.

Each arm is a git worktree pinned at a commit; every cycle runs all
arms in rotating order (a,b,c / b,c,a / c,a,b ...) so each arm sees
every position within each noise window.  Every bench run records the
/proc/stat steal+system fraction measured across exactly its own wall
window (the BENCH_NOTES.md round-10 rule: no bench number without its
own contention reading).

Usage:
  python scripts/ab_bench_rounds.py OUT.json SF_DIR BENCH_RUNS CYCLES \
      name1=path1 name2=path2 [...]

Writes OUT.json after every run (crash-safe, partial results usable).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time


def _stat_snap():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return list(map(int, parts[1:]))


def _stat_frac(a, b):
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d) or 1
    # fields: user nice system idle iowait irq softirq steal
    return {
        "steal_pct": round(100 * d[7] / tot, 2),
        "system_pct": round(100 * d[2] / tot, 2),
        "idle_pct": round(100 * d[3] / tot, 2),
    }


def run_bench(path: str, sf_dir: str, bench_runs: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["BENCH_RUNS"] = str(bench_runs)
    env.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count()))
    s0 = _stat_snap()
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, os.path.join(path, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=path,
    )
    wall = time.time() - t0
    cpu = _stat_frac(s0, _stat_snap())
    line = None
    for ln in reversed(out.stdout.strip().splitlines()):
        if ln.startswith("{"):
            line = ln
            break
    if out.returncode != 0 or line is None:
        return {
            "error": (out.stderr or "")[-2000:],
            "rc": out.returncode,
            "wall_s": round(wall, 1),
            "cpu": cpu,
        }
    rec = json.loads(line)
    return {
        "total": rec["value"],
        "queries": rec["queries"],
        "ref_query_s": rec.get("ref_query_s"),
        "load_1m_start": rec.get("load_1m_start"),
        "wall_s": round(wall, 1),
        "cpu": cpu,
    }


def main() -> None:
    out_path, sf_dir = sys.argv[1], sys.argv[2]
    bench_runs, cycles = int(sys.argv[3]), int(sys.argv[4])
    arms = {}
    for spec in sys.argv[5:]:
        name, path = spec.split("=", 1)
        arms[name] = path
    names = list(arms)
    result = {
        "sf_dir": sf_dir,
        "bench_runs": bench_runs,
        "cycles": cycles,
        "arms": {n: {"path": p, "runs": []} for n, p in arms.items()},
        "order": [],
    }
    for cyc in range(cycles):
        order = names[cyc % len(names):] + names[: cyc % len(names)]
        result["order"].append(order)
        for name in order:
            rec = run_bench(arms[name], sf_dir, bench_runs)
            rec["cycle"] = cyc
            result["arms"][name]["runs"].append(rec)
            _summarize(result)
            with open(out_path, "w") as f:
                json.dump(result, f, indent=1)
            tag = rec.get("total", rec.get("error", "?"))
            print(f"cycle {cyc} arm {name}: total={tag} "
                  f"steal={rec['cpu']['steal_pct']}% wall={rec['wall_s']}s",
                  flush=True)


def _summarize(result: dict) -> None:
    summ: dict = {}
    per_q: dict = {}
    for name, arm in result["arms"].items():
        ok = [r for r in arm["runs"] if "total" in r]
        if not ok:
            continue
        summ[name] = {
            "n": len(ok),
            "total_median": round(statistics.median(r["total"] for r in ok), 3),
            "totals": [r["total"] for r in ok],
            "steal_pcts": [r["cpu"]["steal_pct"] for r in ok],
        }
        per_q[name] = {}
        for q in ok[0]["queries"]:
            per_q[name][q] = round(
                statistics.median(r["queries"][q] for r in ok), 3
            )
    result["summary"] = summ
    # per-query ratios of every arm vs the first arm
    names = [n for n in result["arms"] if n in per_q]
    if len(names) >= 2:
        base = names[0]
        ratios = {}
        for other in names[1:]:
            ratios[f"{other}/{base}"] = {
                q: round(per_q[other][q] / per_q[base][q], 3)
                for q in per_q[base]
                if per_q[base][q] > 0 and q in per_q[other]
            }
        result["per_query_medians"] = per_q
        result["per_query_ratios"] = ratios


if __name__ == "__main__":
    main()
