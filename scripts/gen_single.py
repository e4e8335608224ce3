#!/usr/bin/env python
"""Generate ONE-ROW parquet twins of every driver table.

    python scripts/gen_single.py [src_sf_dir] [dst_dir]

Keeps the first row (arrow row order) of each ``<table>.parquet`` from
the source SF dir (default ``/root/testdata/sf0.001``), preserving the
schema exactly.  The n=1 relation is the other degenerate shape every
100 TB job eventually sees (a filter that matches one record, a
singleton partition): it exercises sample-variance n−1 denominators,
windows with no peers, self-joins with no second row, and every
"top two / first pair" contract — with the DuckDB oracle evaluated on
the same single row, so divergences are compared, not assumed.
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

from gen_empty import TABLES


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_single",
    )
    os.makedirs(dst, exist_ok=True)
    for name in TABLES:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t.slice(0, 1), os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: 1 row, {t.num_columns} cols")


if __name__ == "__main__":
    main()
