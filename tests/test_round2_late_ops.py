"""Property tests for the late-round-2 operators (stickiness, ship
latency, hapax ratio, common neighbors, Theil, heatmap, mislabel scan,
LSH band tuning, threshold curve) — invariants the value-hash oracle
can't express directly."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pandasqlite_spark.functions.analytics import (
    hour_weekday_heatmap,
    ship_latency,
    stickiness_dau_mau,
    theil_index,
)
from pandasqlite_spark.functions.dedup import band_tuning, threshold_curve
from pandasqlite_spark.functions.graph import common_neighbor_candidates
from pandasqlite_spark.functions.similarity import mislabel_scan
from pandasqlite_spark.functions.text import hapax_ratio
from pandasqlite_spark.operators.common import load, load_events


def test_stickiness_bounds(spark, sf_dir):
    rows = stickiness_dau_mau(load_events(spark, sf_dir)).collect()
    assert rows
    for r in rows:
        # avg-DAU can never exceed MAU; stickiness ∈ (0, 1]
        assert 0 < r.stickiness <= 1.0
        assert r.avg_dau <= r.mau


def test_ship_latency_max_bounds_mean(spark, sf_dir):
    # NOTE: the synthetic generator draws l_shipdate independently of
    # o_orderdate, so delays can be negative here — the invariant is
    # max ≥ mean, not non-negativity.
    rows = ship_latency(
        load(spark, sf_dir, "orders"), load(spark, sf_dir, "lineitem")
    ).collect()
    assert rows
    assert all(r.n_lines > 0 and r.max_delay >= r.avg_delay_days for r in rows)


def test_hapax_ratio_bounds(spark, sf_dir):
    rows = hapax_ratio(load(spark, sf_dir, "documents")).collect()
    assert rows
    for r in rows:
        assert 0 <= r.hapax <= r.vocab
        assert 0.0 <= r.hapax_ratio <= 1.0


def test_common_neighbors_excludes_existing_edges(spark):
    # path graph 1-2-3-4 plus hub 5 connected to 1,2,3: pair (1,3)
    # shares {2, 5}; (1, 2) is an edge and must NOT appear.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 5), (2, 5), (3, 5)], ["src", "dst"]
    )
    out = common_neighbor_candidates(edges, min_common=2).collect()
    got = {(r.a, r.b): r.cn for r in out}
    assert (1, 3) in got and got[(1, 3)] == 2
    assert all((a, b) not in got for a, b in [(1, 2), (2, 3), (3, 4)])
    # Jaccard ×1e6 stays in [0, 1e6]
    assert all(0 <= r.jaccard_x1m <= 1_000_000 for r in out)


def test_theil_bounds(spark, sf_dir):
    rows = theil_index(
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "nation"),
        load(spark, sf_dir, "region"),
    ).collect()
    assert rows
    for r in rows:
        # 0 ≤ T ≤ ln(n) (up to the 1e-6 rounding of the output)
        assert -1e-6 <= r.theil <= math.log(r.n_nations) + 1e-6


def test_heatmap_shares_sum_to_one(spark, sf_dir):
    rows = hour_weekday_heatmap(load_events(spark, sf_dir)).collect()
    assert all(0 <= r.weekday <= 6 and 0 <= r.hour <= 23 for r in rows)
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3


def test_mislabel_scan_is_bottom_k(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    out = mislabel_scan(emb, bottom_k=10).collect()
    assert len(out) == 10
    assert all(-1.0 - 1e-9 <= r.own_centroid_cos <= 1.0 + 1e-9 for r in out)
    # returned in ascending-cos order: the WORST-aligned vectors first
    cosines = [r.own_centroid_cos for r in out]
    assert cosines == sorted(cosines)


def test_band_tuning_monotone(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    rows = {r.bands: r for r in band_tuning(docs).collect()}
    assert set(rows) == {2, 4, 8}
    # more bands (fewer rows per band) → candidate volume only grows,
    # and the theoretical capture probability at τ only grows too
    assert (
        rows[2].n_candidate_slots
        <= rows[4].n_candidate_slots
        <= rows[8].n_candidate_slots
    )
    assert rows[2].capture_at_tau <= rows[4].capture_at_tau <= rows[8].capture_at_tau
    for r in rows.values():
        assert r.n_mega_buckets >= 0
        assert r.n_sampled <= r.n_candidate_slots
        if r.n_sampled:
            assert r.n_verified <= r.n_sampled
            assert 0 <= r.precision_x1m <= 1_000_000
        else:
            assert r.precision_x1m is None


def test_threshold_curve_monotone(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    rows = threshold_curve(docs).collect()
    taus = [r.tau for r in rows]
    assert taus == sorted(taus)
    # raising τ can only shrink both the pair set and the flagged docs
    pair_counts = [r.n_pairs for r in rows]
    doc_counts = [r.n_docs_in_pairs for r in rows]
    assert pair_counts == sorted(pair_counts, reverse=True)
    assert doc_counts == sorted(doc_counts, reverse=True)


def test_threshold_curve_tau_above_one_is_empty(spark, sf_dir):
    # exact-group intra pairs (Jaccard exactly 1.0) must not leak into a
    # τ > 1 row: no pair can satisfy jaccard >= 1.5, so both counts are 0
    docs = load(spark, sf_dir, "documents")
    rows = {r.tau: r for r in threshold_curve(docs, taus=(1.0, 1.5)).collect()}
    assert rows[1.5].n_pairs == 0
    assert rows[1.5].n_docs_in_pairs == 0
    # while τ = 1.0 still captures the exact-duplicate complete graphs
    assert rows[1.0].n_pairs >= 0


def test_epoch_schedule_respects_cap(spark, sf_dir):
    from pandasqlite_spark.functions.sampling import epoch_schedule

    rows = epoch_schedule(load(spark, sf_dir, "documents")).collect()
    assert rows
    for r in rows:
        assert 0 < r.epochs <= 4.0
        if r.capped:
            assert r.epochs == 4.0


def test_reorder_interval_shares(spark, sf_dir):
    from pandasqlite_spark.functions.analytics import reorder_interval_histogram

    rows = reorder_interval_histogram(load(spark, sf_dir, "orders")).collect()
    assert rows
    assert all(r.week_bucket >= 0 and r.n > 0 for r in rows)
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3


def test_modularity_bounds(spark, sf_dir):
    import __spark_entry__ as entrymod

    row = entrymod.queries()["graph-modularity"](spark, sf_dir).collect()[0]
    # Newman Q is bounded in [-0.5, 1]; a community count and edge
    # count must both be positive on this graph
    assert -0.5 - 1e-9 <= row.modularity <= 1.0 + 1e-9
    assert row.n_communities > 0 and row.m_edges > 0


def test_convert_latency_shares(spark, sf_dir):
    from pandasqlite_spark.functions.analytics import convert_latency_histogram

    rows = convert_latency_histogram(load_events(spark, sf_dir)).collect()
    assert rows
    assert all(r.bucket_6h >= 0 and r.n_users > 0 for r in rows)
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3


def test_quantization_error_bounds(spark, sf_dir):
    from pandasqlite_spark.functions.similarity import quantization_error

    rows = quantization_error(load(spark, sf_dir, "embeddings")).collect()
    assert len(rows) == 64
    for r in rows:
        # symmetric rounding: mean error ~0.25, never above the 0.5
        # rounding bound unless the clamp bites
        assert 0.0 <= r.mean_abs_err <= 0.5 + 1e-9
        assert r.max_abs_err >= r.mean_abs_err


def test_slo_burn_alert_consistency(spark, sf_dir):
    from pandasqlite_spark.functions.analytics import slo_burn

    rows = slo_burn(load_events(spark, sf_dir)).collect()
    assert rows
    for r in rows:
        assert r.n_err <= r.n_total
        assert r.burn_1h >= 0 and r.burn_6h >= 0
        # alert implies both windows over their thresholds
        if r.alert:
            assert r.burn_1h > 1.2 and r.burn_6h > 1.1


def test_hamming_topk_bounds(spark, sf_dir):
    from pandasqlite_spark.functions.similarity import hamming_topk

    rows = hamming_topk(load(spark, sf_dir, "embeddings")).collect()
    assert len(rows) == 10
    dists = [r.hamming for r in rows]
    assert dists == sorted(dists)
    assert all(0 <= d <= 64 for d in dists)
    assert all(r.vec_id != 0 for r in rows)


def test_abtest_srm_consistent_with_lift_arms(spark, sf_dir):
    from pandasqlite_spark.functions.analytics import abtest_srm_check

    row = abtest_srm_check(load_events(spark, sf_dir)).collect()[0]
    assert row.n_a > 0 and row.n_b > 0
    assert row.srm_chisq >= 0
    # flag must agree with the statistic it is derived from
    assert row.srm_violated == (row.srm_chisq > 3.841459)


def test_hamming_recall_bounds(spark, sf_dir):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["simsearch-hamming-recall"](spark, sf_dir).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0 <= r.n_hit <= 5
        assert abs(r.recall_at_5 - r.n_hit / 5.0) < 1e-9


def test_freshness_gate_invariants(spark, sf_dir):
    from pandasqlite_spark.functions.analytics import freshness_gate

    rows = freshness_gate(load_events(spark, sf_dir)).collect()
    assert rows
    assert any(r.lag_hours == 0.0 for r in rows)  # the high-water type itself
    for r in rows:
        assert r.lag_hours >= 0
        assert r.stale == (r.lag_hours > 2.0)
