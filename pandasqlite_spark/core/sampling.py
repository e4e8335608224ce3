"""Value sampling and enum-value enumeration, distributed.

Reference semantics being re-expressed:

- ``snapshot_data(df)`` — 5 sample values per column, keys lowercased
  (reference ``pandasqlite/pandasqlite.py:290-302``).  The reference
  uses ``df.sample(5)`` (no replacement) and therefore *errors* on
  frames with fewer than 5 rows; we return what exists instead.
- ``distinct_enum_values(df, enum_columns)`` — distinct values of
  ENUM-typed columns (reference ``pandasqlite/pandasqlite.py:283-287``).

Scale posture: sampling never collects more than a bounded number of
rows to the driver; distinct values use ``collect_set`` with a cap so a
mis-typed high-cardinality column can't OOM the driver.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SNAPSHOT_N = 5
_ENUM_VALUE_CAP = 1000


def snapshot_data(df: DataFrame, n: int = SNAPSHOT_N, seed: int = 42) -> dict[str, list]:
    """``{lowercased column name: [up to n sample values]}``.

    One Spark job for all columns: take a bounded random slice, then
    slice per column driver-side.  At 100 TB this reads a handful of
    parquet row groups (TABLESAMPLE-style), not the table.
    """
    bound = max(n * 20, 100)
    # Seeded Bernoulli sample, bounded by limit(): on a sorted or
    # partition-clustered table, limit() heads alone would show the LLM
    # one enum value / one date range (first-rows bias — the reference's
    # df.sample(5) is random for the same reason).  limit() keeps the
    # scan bounded at scale: Spark stops launching tasks once the limit
    # is satisfied, so only a few partitions are ever read.
    rows = df.sample(fraction=0.5, seed=seed).limit(bound).collect()
    if len(rows) < n:  # tiny frame: the Bernoulli draw may under-fill
        rows = df.limit(bound).collect()
    rng = random.Random(seed)
    out: dict[str, list] = {}
    for c in df.columns:
        vals = [r[c] for r in rows if r[c] is not None]
        if len(vals) < n:  # keep NULLs if the column is mostly null
            vals = [r[c] for r in rows]
        # seeded draw across the whole slice, not its head — the
        # reference's df.sample(5) is uniform for the same reason
        out[c.lower()] = rng.sample(vals, n) if len(vals) > n else vals
    return out


def distinct_enum_values(df: DataFrame, enum_columns: list[str]) -> dict[str, list]:
    """Distinct values per ENUM column, one aggregate job for all columns."""
    cols = [c for c in enum_columns if c in df.columns]
    if not cols:
        return {}
    aggs = [F.slice(F.sort_array(F.collect_set(F.col(c))), 1, _ENUM_VALUE_CAP).alias(c) for c in cols]
    row = df.agg(*aggs).collect()[0]
    return {c: list(row[c]) for c in cols}
