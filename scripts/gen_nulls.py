#!/usr/bin/env python
"""Generate NULL-heavy parquet twins of every driver table.

    python scripts/gen_nulls.py [src_sf_dir] [dst_dir]

Takes the source SF dir (default ``/root/testdata/sf0.001``) and nulls
a deterministic ~1/3 of the values in every NON-KEY column — row
``i``'s column ``j`` goes NULL when ``(i + 7*j) % 3 == 0``, so nulls
are staggered across columns rather than row-aligned.  Join/identity
keys stay non-null (the operators' relational contracts assume key
integrity, as any warehouse's NOT NULL constraints would), but every
measure, date, flag, text, and embedding column carries nulls — the
shape real ingested data has.

Feeding the result to ``driver_sweep.py`` compares Spark's and
DuckDB's null semantics on identical data: SUM/AVG ignore-null rules,
null grouping keys, null placement in ORDER BY/windows, null
propagation through arithmetic, collect_list vs list(), concat_ws —
everything a 100 TB pipeline silently relies on.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from gen_empty import TABLES

#: identity / join keys kept non-null per table
KEYS = {
    "region": {"r_regionkey"},
    "nation": {"n_nationkey", "n_regionkey"},
    "customer": {"c_custkey", "c_nationkey"},
    "supplier": {"s_suppkey", "s_nationkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey", "o_custkey"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"},
    "events": {"event_id", "user_id"},
    "documents": {"doc_id"},
    "embeddings": {"vec_id"},
}


def generate(src: str, dst: str, keep: set[str] | None = None) -> None:
    """Write the null twins of ``src`` into ``dst``.  ``keep`` is a set
    of ``table.column`` names to leave NON-NULL on top of the key
    columns — the null-contract sweep uses this to build per-contract
    twins (everything else still nulled)."""
    keep = keep or set()
    os.makedirs(dst, exist_ok=True)
    for name in TABLES:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        n = t.num_rows
        idx = np.arange(n)
        cols = []
        for j, field in enumerate(t.schema):
            col = t.column(j)
            if field.name in KEYS[name] or f"{name}.{field.name}" in keep:
                cols.append(col)
                continue
            mask = pa.array((idx + 7 * j) % 3 == 0)
            combined = pa.chunked_array([col.combine_chunks()])
            nulled = pa.compute.if_else(
                mask, pa.nulls(n, type=field.type), combined.chunk(0)
            )
            cols.append(nulled)
        out = pa.table(cols, schema=t.schema)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"))
        nulls = sum(c.null_count for c in out.columns)
        print(f"{name}: {n} rows, {nulls} nulls injected")


def main() -> None:
    argv = list(sys.argv[1:])
    keep: set[str] = set()
    if "--keep" in argv:
        i = argv.index("--keep")
        keep = {c.strip() for c in argv[i + 1].split(",") if c.strip()}
        del argv[i : i + 2]
    src = argv[0] if len(argv) > 0 else "/root/testdata/sf0.001"
    dst = argv[1] if len(argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_nulls",
    )
    generate(src, dst, keep)


if __name__ == "__main__":
    main()
