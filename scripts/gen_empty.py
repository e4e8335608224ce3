#!/usr/bin/env python
"""Generate zero-row parquet twins of every driver table.

    python scripts/gen_empty.py [src_sf_dir] [dst_dir]

Reads only the SCHEMA of each ``<table>.parquet`` under the source SF
dir (default ``/root/testdata/sf0.001``) and writes an empty parquet
with the identical arrow schema to the destination (default
``testdata_empty/`` in the repo).  Feeding the resulting dir to
``scripts/driver_sweep.py`` exercises every registry key against
zero-row inputs — the shape every 100 TB job hits after partition
pruning — with the DuckDB oracle running on the same empty files, so
NULL-on-empty semantics are compared, not assumed.
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_empty",
    )
    os.makedirs(dst, exist_ok=True)
    for name in TABLES:
        schema = pq.read_schema(os.path.join(src, f"{name}.parquet"))
        out = os.path.join(dst, f"{name}.parquet")
        pq.write_table(schema.empty_table(), out)
        print(f"{name}: 0 rows, {len(schema)} cols -> {out}")


if __name__ == "__main__":
    main()
