#!/usr/bin/env python
"""Deterministic sf1 (or sfN) synthesis from the driver's sf0.1 tables.

The driver ships sf0.001/0.01/0.1 only; the round-2 verdict's top item
is proving the engine above sf0.1.  This script scales the star schema
by exact replication with FK-consistent key offsets, so every
referential relationship of the source survives at 10× (or K×):

    python scripts/gen_sf.py [--out /root/repo/testdata_sf1] [--k 10]

Per replica r in 0..K-1 (r=0 is the verbatim source):
  - region/nation: copied once (fixed dimensions, like TPC-H).
  - supplier/part/customer/orders/lineitem: every PK/FK gets
    ``key + r * (max_key+1)`` with offsets applied consistently on both
    sides of each FK edge (l_orderkey↔o_orderkey, o_custkey↔c_custkey,
    l_partkey↔p_partkey, l_suppkey↔s_suppkey); nationkeys stay.
  - events: event_id/user_id offset; timestamps unchanged (hourly
    densities scale 10×, the realistic direction for a busier system).
  - documents: doc_id offset; replicas 0..K/2-1 keep the text verbatim
    (EXACT duplicates — the dedup keys see real 10-way clusters),
    replicas K/2.. append a version suffix (NEAR duplicates for the
    MinHash/SimHash paths); n_chars is recomputed after any edit.
  - embeddings: vec_id offset; the vector is np.roll'd by r — K
    distinct, norm-preserving variants instead of degenerate
    exact-duplicate geometry.

Schemas are preserved bit-for-bit (asserted): the same loaders, the
same DuckDB views, the same timestamp units.  Output is git-ignored —
regenerate with this script rather than committing ~100 MB of parquet.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

FIXED = ["region", "nation"]
SCALED = [
    "supplier",
    "part",
    "customer",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# table -> columns carrying that table's own key family
KEY_COLS = {
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "customer": {"c_custkey": "customer"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}


def _offsets(tables: dict[str, pa.Table]) -> dict[str, int]:
    """One offset per key FAMILY = max(key)+1 over the family's home."""
    out = {}
    out["supplier"] = pc.max(tables["supplier"]["s_suppkey"]).as_py() + 1
    out["part"] = pc.max(tables["part"]["p_partkey"]).as_py() + 1
    out["customer"] = pc.max(tables["customer"]["c_custkey"]).as_py() + 1
    out["orders"] = pc.max(tables["orders"]["o_orderkey"]).as_py() + 1
    out["events"] = pc.max(tables["events"]["event_id"]).as_py() + 1
    out["events_user"] = pc.max(tables["events"]["user_id"]).as_py() + 1
    out["documents"] = pc.max(tables["documents"]["doc_id"]).as_py() + 1
    out["embeddings"] = pc.max(tables["embeddings"]["vec_id"]).as_py() + 1
    return out


def _replica(name: str, t: pa.Table, r: int, k: int, off: dict[str, int]) -> pa.Table:
    if r == 0:
        return t
    cols = {}
    for field in t.schema:
        col = t[field.name]
        fam = KEY_COLS.get(name, {}).get(field.name)
        if fam is not None:
            col = pc.add(col, pa.scalar(r * off[fam], type=field.type))
        cols[field.name] = col
    if name == "documents":
        if r >= (k + 1) // 2:  # near-dup half: version-suffixed text
            text = pc.binary_join_element_wise(
                cols["text"].combine_chunks().cast(pa.string()),
                pa.scalar(f" v{r}"),
                "",
            )
            cols["text"] = text
            cols["n_chars"] = pc.utf8_length(text).cast(t.schema.field("n_chars").type)
    if name == "embeddings":
        emb = t["embedding"].combine_chunks()
        arrs = emb.to_pylist()
        rolled = [np.roll(np.asarray(v, dtype="float32"), r).tolist() for v in arrs]
        cols["embedding"] = pa.array(rolled, type=t.schema.field("embedding").type)
    return pa.table(cols, schema=t.schema)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/testdata_sf1")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--src", default=SRC)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    tables = {n: pq.read_table(f"{args.src}/{n}.parquet") for n in FIXED + SCALED}
    off = _offsets(tables)

    for name in FIXED:
        pq.write_table(tables[name], f"{args.out}/{name}.parquet", version="2.6")
        print(f"{name}: {tables[name].num_rows} rows (copied)")

    for name in SCALED:
        src = tables[name]
        reps = [_replica(name, src, r, args.k, off) for r in range(args.k)]
        big = pa.concat_tables(reps)
        pq.write_table(big, f"{args.out}/{name}.parquet", version="2.6")
        got = pq.read_schema(f"{args.out}/{name}.parquet")
        want = pq.read_schema(f"{args.src}/{name}.parquet")
        assert got.types == want.types and got.names == want.names, (
            name,
            got,
            want,
        )
        print(f"{name}: {src.num_rows} -> {big.num_rows} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
