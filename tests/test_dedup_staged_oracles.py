"""Every staged dedup oracle twin (ORACLES_BIG) must return exactly the
registry oracle's rows — the twins restate the uncollapsed LSH oracles
through the exact-collapse theorem for the sf10 verifier, and this
equivalence is what makes a twin-backed sf10 pass a real value proof."""

from __future__ import annotations

import pytest

from pandasqlite_spark.functions import curate, dedup, graph, similarity
from pandasqlite_spark.functions.analytics import ORACLES_BIG as AN_BIG
from pandasqlite_spark.functions.analytics import ORACLES as AN_ORACLES
from tests.util import compare_frames, duckdb_connection

ORACLES = {
    **dedup.ORACLES,
    **similarity.ORACLES,
    **curate.ORACLES,
    **graph.ORACLES,
    **AN_ORACLES,
}
ORACLES_BIG = {
    **dedup.ORACLES_BIG,
    **similarity.ORACLES_BIG,
    **curate.ORACLES_BIG,
    **graph.ORACLES_BIG,
    **AN_BIG,
}


@pytest.mark.parametrize("key", sorted(ORACLES_BIG))
def test_staged_twin_matches_registry_oracle(key, sf_dir):
    con = duckdb_connection(sf_dir)
    base = con.execute(ORACLES[key]).df()
    con2 = duckdb_connection(sf_dir)
    big = con2.execute(ORACLES_BIG[key]).df()
    assert len(base) == len(big), (key, len(base), len(big))
    problems = compare_frames(big, base)
    assert not problems, (key, problems)


# Every staged twin ever registered, pinned by name: a module that
# rebinds its ORACLES_BIG with a second dict literal (instead of
# merging) silently drops earlier twins from registry.oracle_sql_big()
# and the sf10 sweep falls back to the verifier-infeasible registry
# oracle (round-7 advice: `corpus-coverage-select` was lost that way).
PINNED_BIG_KEYS = {
    "corpus-coverage-select",
    "dedup-cluster-representative",
    "dedup-connected-components",
    "dedup-containment",
    "dedup-cross-source-leakage",
    "dedup-embedding-bucketed",
    "dedup-jaccard-verify",
    "dedup-minhash-estimate",
    "dedup-minhash-pairs",
    "dedup-minhash-signature",
    "dedup-near",
    "dedup-semantic",
    "dedup-threshold-curve",
    "graph-bfs-hops",
    "graph-kcore-peel",
    "graph-modularity",
    "graph-pagerank",
    "rank-similarity-join",
    "simsearch-ivf-derived",
    "simsearch-mmr-rerank",
    "simsearch-nprobe-curve",
    "skyline-pareto",
}


def test_no_staged_twin_silently_dropped():
    from pandasqlite_spark.operators import registry

    big = registry.oracle_sql_big()
    missing = PINNED_BIG_KEYS - set(big)
    assert not missing, f"staged twins lost from oracle_sql_big(): {sorted(missing)}"
