"""Round-3 regression tests for the ADVICE/VERDICT fixes:

1. events-lcs-journeys: DP carry-through for sequences shorter than
   LCS_N (the fixed (24,24) read used to see zeroed cells and emit 0).
2. events-slo-burn: the trailing-6h frame runs over a gap-filled hour
   grid, so a quiet gap no longer stretches the slow window.
3. simsearch-lsh-buckets: Spark Rademacher buckets equal a numpy
   recomputation from the same ±1 sign matrix (and the DuckDB oracle
   emits the identical chain — covered by the driver sweep).
4. events-dp-laplace-counts: the shifted uniform can never sit on the
   u = −1/2 boundary, so ln(1−2|u|) is always finite.
"""

from __future__ import annotations

import datetime

import numpy as np
import pyspark.sql.functions as F


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_lcs_short_sequences_carry_through(spark, tmp_path):
    from pandasqlite_spark.functions.timeseries import q_events_lcs_journeys

    t0 = datetime.datetime(2024, 1, 1)

    def ev(i, uid, typ):
        return (i, t0 + datetime.timedelta(minutes=i), uid, typ, 1.0, "{}")

    # user 1 (busiest, 5 events): a b c d e ; user 2 (4 events): b x d e
    # LCS = b d e -> 3.  Both well under LCS_N=24: the old code read a
    # zeroed out-of-range cell and returned 0 here.
    rows = [
        ev(1, 1, "a"), ev(2, 1, "b"), ev(3, 1, "c"), ev(4, 1, "d"), ev(5, 1, "e"),
        ev(6, 2, "b"), ev(7, 2, "x"), ev(8, 2, "d"), ev(9, 2, "e"),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = q_events_lcs_journeys(spark, sf_dir).collect()[0]
    assert out.len_a == 5 and out.len_b == 4
    assert out.lcs_len == 3


def test_slo_burn_gap_filled_grid(spark, tmp_path):
    from pandasqlite_spark.functions.analytics import q_events_slo_burn

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # hour 0: 10 ok; hours 1-4: silent; hour 5: 10 errors
    for i in range(10):
        eid += 1
        rows.append((eid, t0 + datetime.timedelta(seconds=i), 1, "view", 1.0, "{}"))
    for i in range(10):
        eid += 1
        rows.append(
            (eid, t0 + datetime.timedelta(hours=5, seconds=i), 1, "error", 1.0, "{}")
        )
    sf_dir = _write_events(spark, tmp_path, rows)
    out = {r.hr: r for r in q_events_slo_burn(spark, sf_dir).collect()}
    hrs = sorted(out)
    assert len(hrs) == 6  # gap-filled: all six wall-clock hours present
    quiet = out[hrs[1]]
    assert quiet.n_total == 0 and quiet.burn_1h == 0.0
    # 6h window at the last hour spans hours 0-5: 10 err / 20 total
    last = out[hrs[-1]]
    assert abs(last.burn_6h - (10 / 20) / 0.2) < 1e-9
    assert last.burn_1h == 1.0 / 0.2  # all-error hour


def test_lsh_buckets_match_numpy(spark, sf_dir):
    from pandasqlite_spark.functions.similarity import (
        _rademacher_signs,
        lsh_bucket_ids,
        load,
    )

    emb = load(spark, sf_dir, "embeddings").limit(50)
    got = {
        r.vec_id: r.bucket
        for r in lsh_bucket_ids(emb).select("vec_id", "bucket").collect()
    }
    signs = np.array(_rademacher_signs(), dtype="float64")  # (8, 64)
    for r in emb.select("vec_id", "embedding").collect():
        v = np.array(r.embedding, dtype="float64")
        bits = (signs @ v) >= 0
        want = int((bits * (1 << np.arange(8))).sum())
        assert got[r.vec_id] == want, r.vec_id


def test_dp_laplace_noise_always_finite(spark, sf_dir):
    from pandasqlite_spark.functions.analytics import q_events_dp_laplace

    rows = q_events_dp_laplace(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.noise is not None and np.isfinite(r.noise)
        assert r.released is not None and np.isfinite(r.released)


def test_fast_compare_agrees_with_canon(spark, sf_dir, monkeypatch):
    """The vectorized hash fast path must agree with the tuple-canon
    slow path: equal frames pass, a single perturbed value fails."""
    import numpy as np

    from tests import util as U

    monkeypatch.setattr(U, "_FAST_COMPARE_MIN_ROWS", 1)
    df = spark.createDataFrame(
        [(i, float(i) / 3.0, f"s{i}", None if i % 7 == 0 else i % 3)
         for i in range(500)],
        "a long, b double, c string, d int",
    )
    pdf = df.toPandas()
    assert U.compare(df, pdf) == []
    bad = pdf.copy()
    bad.loc[123, "b"] = 99.5
    problems = U.compare(df, bad)
    assert problems and "values differ" in problems[0]
    # cross-type false-match guard: int 5 must not equal string '5'
    sa = spark.createDataFrame([(5,)], "x string").selectExpr("CAST(x AS STRING) AS x")
    import pandas as pd
    assert U.compare(sa, pd.DataFrame({"x": [5]}))  # non-empty problems
