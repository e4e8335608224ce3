"""Zero-row-input robustness — the EMPTY_SWEEP.md crash classes.

At scale, the empty relation is what every job sees after partition
pruning or a selective filter; these tests pin the fixes for the three
*crashing* classes the full empty-input sweep found (driver-side
collect-assumes-rows, negative-length slice, schema-less read-back of
an empty write).  The full 391-key empty sweep itself is
``scripts/driver_sweep.py testdata_empty`` (artifact:
``EMPTY_SWEEP.json``); this suite keeps its crash findings from
regressing at pytest speed.
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EMPTY_DIR = os.path.join(ROOT, "testdata_empty")

# one representative per crashing class + the collect()-adjacent fixes;
# (key, expected_row_count_on_empty) — None means "any count, just must
# not raise and must carry the declared schema"
CASES = [
    ("embedding-farthest-points", 0),  # class 1: collect()[0] argmax
    ("embedding-pca-ok", 1),           # class 1: next() on merged partials
    ("simsearch-mmr-rerank", 0),       # class 1: greedy loop best=None
    ("events-holt-winters", 0),        # class 2: slice(xs, 8, size-7)
    ("events-burst-viterbi", 0),       # class 2: slice(xs, 2, size-1)
    ("scan-partitioned", 0),           # class 3: empty partitionBy write
    ("join-dpp-prune", 0),             # class 3: empty partitionBy write
    ("write-roundtrip-parquet", 0),    # class 3: empty partitionBy write
    ("scan-xml", 0),                   # class 3: rows-less XML document
    ("graph-modularity", 0),           # undefined statistic -> no row
    ("agg-bootstrap-ci", 1),           # scalar picks survive as NULLs
]


@pytest.fixture(scope="module", autouse=True)
def empty_dir():
    if not os.path.exists(os.path.join(EMPTY_DIR, "lineitem.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "scripts", "gen_empty.py")],
            check=True,
        )
    return EMPTY_DIR


@pytest.mark.parametrize("key,expected", CASES, ids=[c[0] for c in CASES])
def test_empty_input_runs_clean(spark, key, expected):
    import __spark_entry__ as entry

    df = entry.queries()[key](spark, EMPTY_DIR)
    rows = df.collect()
    assert df.schema.fields, f"{key}: result lost its schema on empty input"
    if expected is not None:
        assert len(rows) == expected, f"{key}: {len(rows)} rows, wanted {expected}"


def test_single_row_holt_linear_runs_clean(spark):
    """n=1 series: the linear model needs its 2-day seed window —
    emits nothing instead of a negative-length slice error."""
    import __spark_entry__ as entry

    single = os.path.join(ROOT, "testdata_single")
    if not os.path.exists(os.path.join(single, "events.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "scripts", "gen_single.py")],
            check=True,
        )
    assert entry.queries()["events-holt-linear"](spark, single).count() == 0


def test_pca_empty_matches_oracle_shape(spark):
    """The empty-corpus PCA row is the oracle's empty-aggregate row."""
    import __spark_entry__ as entry

    row = entry.queries()["embedding-pca-ok"](spark, EMPTY_DIR).collect()[0]
    assert (row.n, row.total_var, row.max_axis_var, row.pc1_dominates) == (
        0,
        None,
        None,
        True,
    )


def test_referential_intact_is_boolean_on_empty(spark):
    """COUNT-based orphan counts keep `intact` non-NULL on empty children."""
    import __spark_entry__ as entry

    rows = entry.queries()["validate-referential"](spark, EMPTY_DIR).collect()
    assert len(rows) == 7
    assert all(r.n_orphans == 0 and r.intact is True for r in rows)
