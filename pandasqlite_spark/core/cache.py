"""Ingestion cache: metadata keyed by content hash, data as parquet.

Reference semantics (``pandasqlite/pandasqlite.py:21, 77, 81-86,
175-177``): pickle ``ingestion_results`` under ``$PANDASQLITE_CACHE_DIR``
(default ``cache/``) keyed by the batch hash, and reuse the SQLite DB
file named by the same hash.  Reference bug kept out: the DB path there
is hardcoded to ``cache/`` regardless of the env var; we honor the
configured dir for both.

Rebuild: metadata as JSON (it is JSON-shaped by construction), table
data as hash-named parquet directories — so a cache hit re-registers
parquet (a metadata operation) instead of re-writing data.  Parquet
keeps the 100 TB path open: partitioned, column-pruned, predicate-
pushdown-friendly storage instead of a single SQLite file.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

ENV_VAR = "PANDASQLITE_SPARK_CACHE_DIR"


def cache_dir() -> Path:
    return Path(os.environ.get(ENV_VAR, "cache"))


def _meta_path(batch_hash: str) -> Path:
    return cache_dir() / f"{batch_hash}.json"


def table_path(frame_hash: str) -> Path:
    return cache_dir() / "tables" / frame_hash


def load_metadata(batch_hash: str) -> list[dict] | None:
    p = _meta_path(batch_hash)
    if not p.exists():
        return None
    return json.loads(p.read_text())


def save_metadata(batch_hash: str, ingestion_results: list[dict]) -> None:
    p = _meta_path(batch_hash)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(ingestion_results, indent=1, default=str))


def save_table(df: DataFrame, frame_hash: str) -> str:
    """Persist a frame as hash-named parquet (idempotent by content hash)."""
    path = table_path(frame_hash)
    if not (path / "_SUCCESS").exists():
        df.write.mode("overwrite").parquet(str(path))
    return str(path)


def register_table(spark: SparkSession, frame_hash: str) -> DataFrame:
    """Re-register a cached table as a temp view named by its hash."""
    df = spark.read.parquet(str(table_path(frame_hash)))
    df.createOrReplaceTempView(f"`{frame_hash}`")
    return df
