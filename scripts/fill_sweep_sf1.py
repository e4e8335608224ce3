#!/usr/bin/env python
"""Fill SWEEP_SF1.md's result placeholders from real run artifacts:

    python scripts/fill_sweep_sf1.py

Inputs (all produced by this round's sweep chain):
  - SWEEP_SF1_results.json         driver-schema per-key results at sf1
  - SWEEP_SF1_results.timing.json  per-key (spark_s, oracle_s, compare_s)
  - BENCH_SF1.json                 bench.py output at sf1
  - BENCH_r03.json                 the recorded sf0.1 bench (comparison)

Replaces the <!-- SWEEP_RESULT -->, <!-- BENCH_RESULT --> and
<!-- SLOW_KEYS --> markers with generated sections.  Idempotent: reruns
regenerate the same blocks from the same inputs.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    with open(f"{REPO}/SWEEP_SF1_results.json") as fh:
        results = json.load(fh)
    with open(f"{REPO}/SWEEP_SF1_results.timing.json") as fh:
        timing = json.load(fh)
    with open(f"{REPO}/BENCH_SF1.json") as fh:
        bench1 = json.load(fh)
    with open(f"{REPO}/BENCH_r03.json") as fh:
        bench01 = json.load(fh)
    if "parsed" in bench01:  # driver wrapper: {n, rc, cpus, sf, tail, parsed}
        bench01 = bench01["parsed"]

    n = len(results)
    ok = sum(
        1
        for r in results.values()
        if r["rows_match"] and r["schema_match"] and r["hash_match"] and not r["err"]
    )
    fails = sorted(k for k, r in results.items() if not (
        r["rows_match"] and r["schema_match"] and r["hash_match"] and not r["err"]
    ))
    total_s = timing["total_s"]
    sweep_block = (
        f"**{ok}/{n} keys green** (rows + schema + value-hash vs the DuckDB\n"
        f"oracle, vanilla ANSI-on session) in {total_s:.0f}s wall"
        f" ({total_s / 60:.0f} min), artifacts `SWEEP_SF1_results.json` /"
        f" `.timing.json`.\n"
    )
    if fails:
        sweep_block += "\nFailing keys: " + ", ".join(f"`{k}`" for k in fails) + "\n"

    q1 = bench1["queries"]
    q0 = bench01["queries"]
    rows = []
    for k in q1:
        if k in q0 and q0[k] > 0:
            rows.append((k, q0[k], q1[k], q1[k] / q0[k]))
    rows.sort()
    bench_lines = [
        f"sf1 headline total **{bench1['value']:.2f}s** vs sf0.1 "
        f"{bench01['value']:.2f}s — **{bench1['value'] / bench01['value']:.2f}×** "
        "wall for 10× rows (contract: within 2× of 10× per query, i.e. "
        "ratio ≤ 20).",
        "",
        "| query | sf0.1 s | sf1 s | ratio |",
        "|---|---|---|---|",
    ]
    for k, a, b, r in rows:
        flag = " ⚠" if r > 20 else ""
        bench_lines.append(f"| {k} | {a:.3f} | {b:.3f} | {r:.1f}×{flag} |")
    only_new = sorted(set(q1) - set(q0))
    if only_new:
        bench_lines.append("")
        bench_lines.append(
            "New this round (no sf0.1 r03 baseline): "
            + ", ".join(f"`{k}` {q1[k]:.2f}s" for k in only_new)
        )
    bench_block = "\n".join(bench_lines) + "\n"

    keys_t = timing["keys"]
    slow = sorted(
        (
            (k, t["spark_s"], t["oracle_s"], t["compare_s"])
            for k, t in keys_t.items()
            if t["spark_s"] + t["oracle_s"] + t["compare_s"] > 15
        ),
        key=lambda x: -(x[1] + x[2] + x[3]),
    )
    slow_lines = [
        f"{len(slow)} keys over 15s wall; per-phase split (the oracle/compare"
        " columns price the HARNESS, not the engine):",
        "",
        "| key | spark s | oracle s | compare s |",
        "|---|---|---|---|",
    ]
    for k, a, b, c in slow[:40]:
        slow_lines.append(f"| {k} | {a:.1f} | {b:.1f} | {c:.1f} |")
    spark_total = sum(t["spark_s"] for t in keys_t.values())
    oracle_total = sum(t["oracle_s"] for t in keys_t.values())
    cmp_total = sum(t["compare_s"] for t in keys_t.values())
    slow_lines.append("")
    slow_lines.append(
        f"Sweep-wide phase totals: spark {spark_total:.0f}s, oracle "
        f"{oracle_total:.0f}s, compare {cmp_total:.0f}s — "
        f"{'the oracle side dominates' if oracle_total > spark_total else 'the engine side dominates'}."
    )
    slow_block = "\n".join(slow_lines) + "\n"

    with open(f"{REPO}/SWEEP_SF1.md") as fh:
        md = fh.read()

    def fill(marker: str, block: str, text: str) -> str:
        # replace marker (and any previously generated block after it,
        # up to the next heading) with marker + fresh block
        pat = re.compile(re.escape(marker) + r"(?:\n(?:(?!\n## ).)*)?", re.DOTALL)
        return pat.sub(marker + "\n\n" + block.rstrip() + "\n", text, count=1)

    md = fill("<!-- SWEEP_RESULT -->", sweep_block, md)
    md = fill("<!-- BENCH_RESULT -->", bench_block, md)
    md = fill("<!-- SLOW_KEYS -->", slow_block, md)
    with open(f"{REPO}/SWEEP_SF1.md", "w") as fh:
        fh.write(md)
    print(f"filled SWEEP_SF1.md: {ok}/{n} green, {len(slow)} slow keys")
    return 0


if __name__ == "__main__":
    sys.exit(main())
