"""Property tests for the Count-Min sketch, embedding dimension stats,
Matryoshka recall, and the referential profile."""

from __future__ import annotations

import datetime as dt

from pandasqlite_spark.functions.sketches import countmin_estimates
from pandasqlite_spark.functions.similarity import (
    embedding_dim_stats,
    matryoshka_recall,
)
from pandasqlite_spark.functions.analytics import referential_profile

SF_DIR = "/root/testdata/sf0.001"


def _events(spark, user_counts):
    t = dt.datetime(2024, 1, 1)
    rows = []
    for uid, n in user_counts.items():
        rows += [(int(uid), t)] * n
    return spark.createDataFrame(rows, "user_id bigint, ts timestamp")


def test_countmin_never_underestimates(spark):
    # 200 keys hash into 3×64 counters: collisions are certain, so some
    # overcount must be positive — but NONE may be negative (the CMS
    # one-sided error guarantee).
    ev = _events(spark, {uid: 1 + uid % 5 for uid in range(200)})
    out = countmin_estimates(ev).collect()
    assert len(out) == 200
    assert all(r.overcount >= 0 for r in out)
    assert any(r.overcount > 0 for r in out)
    assert all(r.cms_est == r.true_cnt + r.overcount for r in out)


def test_countmin_exact_when_no_collisions(spark):
    # 2 keys in 192 counters: w.h.p. no collisions in any row → exact.
    ev = _events(spark, {1: 7, 2: 3})
    out = {r.user_id: r for r in countmin_estimates(ev).collect()}
    assert out[1].cms_est == 7 and out[2].cms_est == 3


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )


def test_dim_stats_flags_collapsed_dimension(spark):
    # dim 0 is constant (variance 0 → low_var); dim 1 alternates ±1.
    vecs = [[0.5, 1.0], [0.5, -1.0], [0.5, 1.0], [0.5, -1.0]]
    out = {r.dim: r for r in embedding_dim_stats(_emb(spark, vecs)).collect()}
    assert out[0].variance == 0.0 and out[0].low_var
    assert out[1].variance == 1.0 and not out[1].low_var
    assert out[0].mean_x == 0.5 and out[1].mean_x == 0.0


def test_matryoshka_perfect_recall_when_tail_dims_are_zero(spark):
    # All information lives in the first 16 dims → truncation changes
    # nothing → recall@5 = 1.0 for every query.
    import random

    rng = random.Random(7)
    vecs = []
    for _ in range(20):
        v = [rng.uniform(-1, 1) for _ in range(16)] + [0.0] * 48
        vecs.append(v)
    out = matryoshka_recall(_emb(spark, vecs)).collect()
    assert len(out) == 8
    assert all(r.recall_at_5 == 1.0 for r in out)


def test_referential_profile_tpch_keys_intact(spark):
    out = {r.relationship: r for r in referential_profile(spark, SF_DIR).collect()}
    assert len(out) == 7
    # every TPC-H FK must be clean in the generated data
    for rel, r in out.items():
        assert r.n_orphans == 0 and r.intact, rel
        assert r.n_child > 0
