"""Content-based identity for ingested data.

The reference derives table/database/cache identity from
``md5(df.to_string())`` per frame and ``md5`` of the concatenation for
the batch (reference ``pandasqlite/pandasqlite.py:75-76, 98-99``).  That
materializes the full dataset on one node — non-viable at 100 TB.

The rebuild preserves the contract ("same data ⇒ same hash ⇒ cache
hit", order of rows irrelevant in spirit) with a **distributed,
order-insensitive** hash:

    per row:   h = xxhash64(all columns)           (JVM-side, codegen'd)
    combine:   (bit_xor(h), sum(h), count(*), schema-string) → md5 hex

XOR alone cancels duplicate row pairs; SUM alone is weak to swaps;
together with the count and the schema string the collision surface is
negligible for cache-keying purposes.  One Spark job, no driver
materialization, no sort, no shuffle beyond a scalar aggregate.

For small in-memory pandas frames we stay faithful to the reference's
``md5(df.to_string())`` so hashes are stable for the same frames a
reference user would ingest.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_pandas(df: pd.DataFrame) -> str:
    """Reference-faithful content hash of a small in-memory frame
    (semantics of reference ``pandasqlite/pandasqlite.py:98-99``)."""
    return hashlib.md5(df.to_string().encode("utf-8")).hexdigest()


def hash_spark(df: DataFrame) -> str:
    """Distributed, order-insensitive content hash of a Spark DataFrame."""
    cols = [F.col(c) for c in df.columns]
    row_h = F.xxhash64(*cols)
    agg = df.select(row_h.alias("h")).agg(
        F.expr("bit_xor(h)").alias("x"),
        F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    x, s, n = agg.collect()[0]
    schema_sig = ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields)
    payload = f"{x}|{s}|{n}|{schema_sig}"
    return hashlib.md5(payload.encode("utf-8")).hexdigest()


def combine_hashes(hashes: list[str]) -> str:
    """Batch hash over per-frame hashes (semantics of reference
    ``pandasqlite/pandasqlite.py:75-76``: md5 of the concatenation)."""
    return hashlib.md5("".join(hashes).encode("utf-8")).hexdigest()
