"""Edge-case tests for the winsorized mean and top-k user journeys."""

from __future__ import annotations

import datetime as dt

from pandasqlite_spark.functions.analytics import top_user_paths, winsorized_mean


def test_winsorized_mean_clips_outlier(spark):
    # 20 well-behaved values + one huge outlier: the raw mean is
    # dragged, the winsorized mean clips the outlier to the P95 bound.
    rows = [("A", float(i), i) for i in range(1, 21)] + [("A", 10000.0, 99)]
    orders = spark.createDataFrame(
        rows, "o_orderpriority string, o_totalprice double, o_orderkey bigint"
    )
    out = winsorized_mean(orders).collect()[0]
    assert out.n_rows == 21
    # ceil(0.95*21) = 20 → P95 bound is the 20th smallest value (20.0)
    assert out.p95 == 20.0
    assert out.raw_mean > 480  # outlier dominates
    assert out.winsorized_mean < 15  # clipped to sane range
    # ceil(0.05*21) = 2 → low clip at the 2nd smallest value
    assert out.p5 == 2.0


def test_top_paths_counts_exact_journeys(spark):
    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = []
    eid = 0
    # 3 users follow view>click, 1 user follows click>view
    for uid, seq in [(1, "vc"), (2, "vc"), (3, "vc"), (4, "cv")]:
        for i, ch in enumerate(seq):
            rows.append(
                (uid, eid, t0 + i * s, "view" if ch == "v" else "click")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, event_type string"
    )
    out = top_user_paths(ev).collect()
    assert (out[0].path, out[0].n_users) == ("view>click", 3)
    assert (out[1].path, out[1].n_users) == ("click>view", 1)


def test_top_paths_truncates_at_depth(spark):
    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [(1, i, t0 + i * s, "view") for i in range(8)]  # 8 events, depth 5
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, event_type string"
    )
    out = top_user_paths(ev).collect()
    assert out[0].path == ">".join(["view"] * 5)


def test_log2_histogram_exact_power_boundaries(spark):
    from pandasqlite_spark.functions.analytics import log2_histogram

    orders = spark.createDataFrame(
        [(float(v),) for v in [1.0, 1.99, 2.0, 3.5, 4.0, 7.99, 8.0]],
        "o_totalprice double",
    )
    out = {r.bucket: r for r in log2_histogram(orders).collect()}
    # bucket b covers [2^(b-1), 2^b): exact powers of two land in the
    # HIGHER bucket with no log() boundary drift
    assert out[1].n_orders == 2 and out[1].lo_dollars == 1  # 1.0, 1.99
    assert out[2].n_orders == 2 and out[2].lo_dollars == 2  # 2.0, 3.5
    assert out[3].n_orders == 2 and out[3].lo_dollars == 4  # 4.0, 7.99
    assert out[4].n_orders == 1 and out[4].lo_dollars == 8  # 8.0


def test_lttb_keeps_edges_and_picks_spike(spark):
    import datetime as dt

    from pandasqlite_spark.functions.timeseries import lttb_downsample

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # 400 seconds of flat signal with one huge spike at t=150
    for i in range(400):
        v = 100.0 if i == 150 else 1.0
        rows.append((i, t0 + dt.timedelta(seconds=i), v))
    ev = spark.createDataFrame(rows, "event_id bigint, ts timestamp, value double")
    out = lttb_downsample(ev, buckets=4).collect()
    by_bucket = {r.bucket: r for r in out}
    assert by_bucket[0].event_id == 0      # first point kept exactly
    assert by_bucket[3].event_id == 399    # last point kept exactly
    # the spike lives in bucket 1 (t in [100, 200)) and must be picked
    assert by_bucket[1].event_id == 150 and by_bucket[1].value == 100.0


def test_sorted_neighborhood_finds_adjacent_near_dups(spark):
    from pandasqlite_spark.functions.dedup import sorted_neighborhood_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),   # near-dup of 1
            (3, "zzz completely different text here now"),
        ],
        "doc_id bigint, text string",
    )
    pairs = {(r.doc_a, r.doc_b) for r in sorted_neighborhood_pairs(docs).collect()}
    assert (1, 2) in pairs  # shared prefix sorts them adjacent


def test_quantile_normalize_maps_source_rank_to_global_values(spark):
    from pandasqlite_spark.functions.text import quantile_normalize

    # source A has tiny docs (1..3), source B huge (101..103); after
    # normalization both sources span the GLOBAL value range.
    rows = [(i, "A", i) for i in (1, 2, 3)] + [(i, "B", 100 + i) for i in (1, 2, 3)]
    docs = spark.createDataFrame(
        [(10 * n + {"A": 0, "B": 1}[src], src, x) for n, (i, src, x) in enumerate(rows, 1)],
        "doc_id bigint, source string, n_chars bigint",
    )
    out = quantile_normalize(docs).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r.norm_x)
    # each source's min/max rank maps to the global min/max value
    assert min(by_src["A"]) == 1 and max(by_src["A"]) == 103
    assert min(by_src["B"]) == 1 and max(by_src["B"]) == 103
