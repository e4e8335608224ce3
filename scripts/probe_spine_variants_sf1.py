#!/usr/bin/env python
"""Guide §1.1 variant probe for the round-10 dedup-spine cut: measure
the committed form (A) against two further checkpoint increments, all
interleaved in one shared JVM at sf1:

  A: skinny member-map ckpt only (the committed text_group_spine)
  B: A + lazy ckpt of the rep minhash signature and the LSH pair list
     (_rep_lsh_pairs wrapped; payloads: doc_id + 8 hashes / 2 longs)
  C: B + lazy ckpt of the shingle-hash table (_shingle_hashes wrapped;
     payload: (doc_id, int64) per shingle — heavier, ~16 B × |shingles|)

    python scripts/probe_spine_variants_sf1.py [sf_dir] [runs] [keys...]

Writes PROBE_SPINE_VARIANTS.json.  The winner gets committed hard-coded;
the probe records why.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandasqlite_spark.functions import dedup  # noqa: E402

DEFAULT_KEYS = [
    "dedup-jaccard-verify",
    "dedup-containment",
    "dedup-near",
    "dedup-threshold-curve",
]

_REAL_PAIRS = dedup._rep_lsh_pairs
_REAL_SH = dedup._shingle_hashes


def _ckpt_pairs(rep_frame):
    sig = dedup.minhash_signatures(rep_frame).localCheckpoint(eager=False)
    return dedup.candidate_pairs(dedup.lsh_bands(sig)).localCheckpoint(
        eager=False
    )


def _ckpt_sh(docs):
    return _REAL_SH(docs).localCheckpoint(eager=False)


VARIANTS = {
    "A_skinny": lambda: (_set(_REAL_PAIRS, _REAL_SH)),
    "B_sig_pairs": lambda: (_set(_ckpt_pairs, _REAL_SH)),
    "C_sh_too": lambda: (_set(_ckpt_pairs, _ckpt_sh)),
}


def _set(pairs_fn, sh_fn):
    dedup._rep_lsh_pairs = pairs_fn
    dedup._shingle_hashes = sh_fn


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    keys = sys.argv[3:] or DEFAULT_KEYS

    import __spark_entry__ as entry
    from pandasqlite_spark.session import get_spark

    spark = get_spark("probe_spine_variants")
    qs = entry.queries()
    warm = "/root/testdata/sf0.001"
    out: dict = {"sf_dir": sf_dir, "runs": n_runs, "keys": {}}

    # identity across variants at sf0.001 (the spine A/B already pins
    # base-vs-A; this pins A-vs-B-vs-C)
    ident = {}
    for key in keys:
        vals = []
        for name, setter in VARIANTS.items():
            setter()
            vals.append(
                sorted(tuple(r) for r in qs[key](spark, warm).collect())
            )
        ident[key] = vals[0] == vals[1] == vals[2]
        print("identity", key, ident[key], flush=True)
    out["identity"] = ident

    for key in keys:
        for name, setter in VARIANTS.items():
            setter()
            qs[key](spark, warm).write.mode("overwrite").format("noop").save()
        runs: dict = {name: [] for name in VARIANTS}
        for _ in range(n_runs):
            for name, setter in VARIANTS.items():
                setter()
                spark.sparkContext.setJobDescription(f"{key} [{name}]")
                t0 = time.perf_counter()
                qs[key](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                runs[name].append(round(time.perf_counter() - t0, 3))
        out["keys"][key] = {
            name: {"runs": r, "median": round(statistics.median(r), 3)}
            for name, r in runs.items()
        }
        print(key, out["keys"][key], flush=True)
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "PROBE_SPINE_VARIANTS.json"),
                "w") as fh:
            json.dump(out, fh, indent=1)
    _set(_REAL_PAIRS, _REAL_SH)


if __name__ == "__main__":
    main()
