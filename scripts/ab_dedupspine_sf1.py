#!/usr/bin/env python
"""Interleaved A/B + identity harness for the round-10 dedup-spine
lineage cut (skinny member-map checkpoint + live-lineage rep_frame) and
the fused connected-components convergence probe.

BASE arm = the pre-round-10 forms, reconstructed faithfully:
  - ``text_group_spine`` monkeypatched to the old un-checkpointed
    m = elig ⋈ groupBy(text) derivation (re-planned per branch, text
    joined on the text key — exactly the r9 plan shape);
  - ``connected_components`` monkeypatched to the old 3-job probe
    (ss.count == e.count, then exceptAll).

OPT arm = the committed module as-is.

    python scripts/ab_dedupspine_sf1.py [sf_dir] [runs_per_arm]

Identity: full sorted-row comparison base-vs-opt at sf0.001 and
sf0.01, row count + value hash at the bench sf_dir.  Writes
AB_DEDUPSPINE_SF1.json.
"""

from __future__ import annotations

import hashlib
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pandasqlite_spark.functions import dedup  # noqa: E402
from pandasqlite_spark.functions.text import tokens  # noqa: E402

KEYS = [
    "dedup-jaccard-verify",
    "dedup-containment",
    "dedup-cross-source-leakage",
    "dedup-near",
    "dedup-threshold-curve",
    "dedup-connected-components",
    "dedup-cluster-representative",
]

_REAL_SPINE = dedup.text_group_spine
_REAL_CC = dedup.connected_components


def _ref_spine(docs):
    """Pre-round-10 spine: no checkpoint, member map re-derived per
    consumer via the text-keyed join (the old exact_text_groups)."""
    elig = docs.filter(F.size(tokens()) >= 3).select("doc_id", "text")
    reps = elig.groupBy("text").agg(
        F.min("doc_id").alias("rep_doc"), F.count(F.lit(1)).alias("n_members")
    )
    m = elig.join(reps, "text")
    skinny = m.select("doc_id", "rep_doc", "n_members")
    rep_frame = m.filter(F.col("doc_id") == F.col("rep_doc")).select(
        "doc_id", "text"
    )
    return skinny, rep_frame


def _ref_connected_components(edges, max_iter: int = 50):
    """Pre-round-10 connected_components: identical star contraction,
    old 3-job convergence probe (two counts + exceptAll)."""
    e = (
        edges.selectExpr("doc_a AS x", "doc_b AS y")
        .filter(F.col("x") != F.col("y"))
        .select(F.greatest("x", "y").alias("a"), F.least("x", "y").alias("b"))
        .distinct()
    )
    e = e.localCheckpoint(eager=True)
    for _ in range(max_iter):
        sym = e.selectExpr("a AS u", "b AS v").unionAll(
            e.selectExpr("b AS u", "a AS v")
        )
        m = sym.groupBy("u").agg(F.min("v").alias("mn"))
        m = m.select("u", F.least("u", "mn").alias("m"))
        ls = (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        mnb = ls.groupBy("a").agg(F.min("b").alias("m"))
        ss = (
            ls.join(mnb, "a")
            .filter(F.col("b") != F.col("m"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .unionByName(mnb.select(F.col("a"), F.col("m").alias("b")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        same = (
            ss.count() == e.count()
            and ss.exceptAll(e).limit(1).count() == 0
        )
        e = ss
        if same:
            break
    else:
        raise RuntimeError("ref CC did not converge")
    leaves = e.selectExpr("a AS doc_id", "b AS rep_id")
    centers = (
        e.select(F.col("b").alias("doc_id"))
        .distinct()
        .withColumn("rep_id", F.col("doc_id"))
    )
    return leaves.unionByName(centers)


def _base_on() -> None:
    dedup.text_group_spine = _ref_spine
    dedup.connected_components = _ref_connected_components


def _opt_on() -> None:
    dedup.text_group_spine = _REAL_SPINE
    dedup.connected_components = _REAL_CC


def _rows_key(df):
    rows = df.collect()
    return sorted(tuple(r) for r in rows)


def _rows_hash(df):
    rows = _rows_key(df)
    h = hashlib.sha256()
    for r in rows:
        h.update(repr(r).encode())
    return len(rows), h.hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import __spark_entry__ as entry
    from pandasqlite_spark.session import get_spark

    spark = get_spark("ab_dedupspine_sf1")
    qs = entry.queries()
    out: dict = {"sf_dir": sf_dir, "runs_per_arm": n_runs, "keys": {}}

    # identity first: small SFs full sorted rows, bench SF count+hash
    ident = {}
    for key in KEYS:
        ident[key] = {}
        for small in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            _base_on()
            rb = _rows_key(qs[key](spark, small))
            _opt_on()
            ro = _rows_key(qs[key](spark, small))
            ident[key][small] = (rb == ro, len(rb), len(ro))
        _base_on()
        hb = _rows_hash(qs[key](spark, sf_dir))
        _opt_on()
        ho = _rows_hash(qs[key](spark, sf_dir))
        ident[key][sf_dir] = (hb == ho, hb[0], ho[0])
        print("identity", key, ident[key], flush=True)
    out["identity"] = ident

    warm = "/root/testdata/sf0.001"
    for key in KEYS:
        for setter in (_base_on, _opt_on):
            setter()
            qs[key](spark, warm).write.mode("overwrite").format("noop").save()
        base, opt = [], []
        for _ in range(n_runs):
            for arm, setter in (("base", _base_on), ("opt", _opt_on)):
                setter()
                spark.sparkContext.setJobDescription(f"{key} [{arm}]")
                t0 = time.perf_counter()
                qs[key](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                (base if arm == "base" else opt).append(
                    round(time.perf_counter() - t0, 3)
                )
        out["keys"][key] = {
            "base_runs": base,
            "opt_runs": opt,
            "base_median": round(statistics.median(base), 3),
            "opt_median": round(statistics.median(opt), 3),
        }
        print(key, out["keys"][key], flush=True)
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "AB_DEDUPSPINE_SF1.json"), "w") as fh:
            json.dump(out, fh, indent=1)
    _opt_on()


if __name__ == "__main__":
    main()
