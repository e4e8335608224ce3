"""Every staged dedup oracle twin (ORACLES_BIG) must return exactly the
registry oracle's rows — the twins restate the uncollapsed LSH oracles
through the exact-collapse theorem for the sf10 verifier, and this
equivalence is what makes a twin-backed sf10 pass a real value proof."""

from __future__ import annotations

import pytest

from pandasqlite_spark.functions import curate, dedup, similarity
from pandasqlite_spark.functions.analytics import ORACLES_BIG as AN_BIG
from pandasqlite_spark.functions.analytics import ORACLES as AN_ORACLES
from tests.util import compare_frames, duckdb_connection

ORACLES = {**dedup.ORACLES, **similarity.ORACLES, **curate.ORACLES, **AN_ORACLES}
ORACLES_BIG = {
    **dedup.ORACLES_BIG,
    **similarity.ORACLES_BIG,
    **curate.ORACLES_BIG,
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
