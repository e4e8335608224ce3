#!/usr/bin/env python
"""Round-9 A/B at sf1 for the two largest sf10 operator walls:

- fuzzy-join-levenshtein: DP-per-distinct-name-pair (HEAD) vs the old
  DP-per-candidate-ID-pair (reference, reconstructed inline);
- dedup-band-tuning: lineage-cut checkpoints (HEAD) vs the
  no-checkpoint plan (reference, reconstructed inline).

Interleaved noop-sink runs + a full value-identity collect per key.

Usage: python scripts/ab_fuzzy_band_sf1.py [sf_dir] [n_runs]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pandasqlite_spark.functions.analytics import (  # noqa: E402
    fuzzy_pairs,
    q_fuzzy_join_levenshtein,
)
from pandasqlite_spark.functions.dedup import (  # noqa: E402
    BAND_TUNING_CAP,
    N_HASHES,
    jaccard_verify,
    lsh_bands,
    minhash_signatures,
    q_dedup_band_tuning,
)
from pandasqlite_spark.operators.common import load  # noqa: E402
from pandasqlite_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
N_RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def ref_fuzzy_pairs(parts, block_cols=("p_brand", "p_size"), max_dist=10,
                    sample_mod=None):
    """Pre-round-9 fuzzy_pairs: DP per candidate ID pair."""
    a = parts.select(F.col("p_partkey").alias("pa"),
                     F.col("p_name").alias("name_a"),
                     *[F.col(c) for c in block_cols])
    b = parts.select(F.col("p_partkey").alias("pb"),
                     F.col("p_name").alias("name_b"),
                     *[F.col(c) for c in block_cols])
    cand = a.join(b, list(block_cols)).filter(
        (F.col("pa") < F.col("pb"))
        & (F.abs(F.length("name_a") - F.length("name_b")) <= max_dist)
    )
    if sample_mod is not None:
        cand = cand.filter(
            (F.col("pa").cast("bigint") * 31 + F.col("pb").cast("bigint"))
            % sample_mod == 0
        )
    return (
        cand.withColumn("dist", F.expr(f"levenshtein(name_a, name_b, {max_dist})"))
        .filter(F.col("dist") >= 0)
        .select("pa", "pb", "dist")
        .orderBy("pa", "pb")
    )


def ref_fuzzy_readout(spark, d):
    pairs = ref_fuzzy_pairs(load(spark, d, "part"), sample_mod=16)
    return (
        pairs.groupBy("dist")
        .agg(F.count(F.lit(1)).alias("n_pairs"),
             F.countDistinct("pa").alias("n_left_parts"))
        .orderBy("dist")
    )


def ref_band_tuning(docs, configs=(8, 4, 2), k=N_HASHES, tau=0.5):
    """Pre-round-9 band_tuning: no lineage cuts."""
    sig = minhash_signatures(docs, k=k, portable=True)
    rows = None
    for b in configs:
        r = k // b
        capture = round(1.0 - (1.0 - tau ** r) ** b, 6)
        bands_df = lsh_bands(sig, bands=b, k=k)
        bsz = bands_df.groupBy("band", "band_sig").agg(F.count(F.lit(1)).alias("n"))
        cost = bsz.agg(
            F.sum(F.expr("n * (n - 1) DIV 2")).cast("bigint").alias("n_candidate_slots"),
            F.sum(F.when(F.col("n") > BAND_TUNING_CAP, 1).otherwise(0))
            .cast("bigint").alias("n_mega_buckets"),
            F.lit(None).cast("bigint").alias("n_sampled"),
            F.lit(None).cast("bigint").alias("n_verified"),
        )
        small = bsz.filter(F.col("n") <= BAND_TUNING_CAP).select("band", "band_sig")
        bs = bands_df.join(small, ["band", "band_sig"])
        a, bb = bs.alias("a"), bs.alias("b")
        sampled = (
            a.join(bb, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.band_sig") == F.col("b.band_sig"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .filter((F.col("doc_a") * 31 + F.col("doc_b")) % 16 == 0)
            .distinct()
        )
        ver = jaccard_verify(docs, sampled)
        vagg = ver.agg(
            F.lit(None).cast("bigint").alias("n_candidate_slots"),
            F.lit(None).cast("bigint").alias("n_mega_buckets"),
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.when(F.col("jaccard") >= tau, 1).otherwise(0))
            .cast("bigint").alias("n_verified"),
        )
        row = (
            cost.unionByName(vagg)
            .agg(F.max("n_candidate_slots").alias("n_candidate_slots"),
                 F.max("n_mega_buckets").alias("n_mega_buckets"),
                 F.max("n_sampled").alias("n_sampled"),
                 F.max("n_verified").alias("n_verified"))
            .select(F.lit(b).alias("bands"), F.lit(r).alias("rows_per_band"),
                    "n_candidate_slots", "n_mega_buckets", "n_sampled",
                    "n_verified",
                    F.floor(F.col("n_verified") * F.lit(1_000_000).cast("bigint")
                            / F.expr("nullif(n_sampled, 0)")).cast("bigint")
                    .alias("precision_x1m"),
                    F.lit(capture).alias("capture_at_tau"))
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows.orderBy("bands")


def main() -> None:
    spark = get_spark("ab_fuzzy_band")
    d = SF_DIR
    spark.read.parquet(f"{d}/part.parquet").limit(1).count()
    out = {"sf_dir": d, "n_runs": N_RUNS}

    docs = load(spark, d, "documents")
    arms = {
        "fuzzy_new": lambda: q_fuzzy_join_levenshtein(spark, d),
        "fuzzy_old": lambda: ref_fuzzy_readout(spark, d),
        "band_new": lambda: q_dedup_band_tuning(spark, d),
        "band_old": lambda: ref_band_tuning(docs),
    }
    runs: dict[str, list[float]] = {k: [] for k in arms}
    for _ in range(N_RUNS):
        for name, build in arms.items():
            spark.sparkContext.setJobDescription(name)
            runs[name].append(round(_noop(build()), 3))
    spark.sparkContext.setJobDescription(None)
    out["runs"] = runs
    out["medians"] = {k: statistics.median(v) for k, v in runs.items()}

    # value identity (sampled readout rows + full pair list for fuzzy)
    out["fuzzy_readout_identical"] = (
        sorted(map(tuple, q_fuzzy_join_levenshtein(spark, d).collect()))
        == sorted(map(tuple, ref_fuzzy_readout(spark, d).collect()))
    )
    parts01 = load(spark, "/root/testdata/sf0.01", "part")
    out["fuzzy_pairs_identical_sf001"] = (
        sorted(map(tuple, fuzzy_pairs(parts01).collect()))
        == sorted(map(tuple, ref_fuzzy_pairs(parts01).collect()))
    )
    out["band_identical"] = (
        sorted(map(tuple, q_dedup_band_tuning(spark, d).collect()))
        == sorted(map(tuple, ref_band_tuning(docs).collect()))
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
