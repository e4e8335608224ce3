"""Driver-mimicking comparator: row-count + schema + order-insensitive
value comparison between a Spark DataFrame and a DuckDB oracle query."""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pandas as pd

from pandasqlite_spark.operators.common import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # cap the oracle's RAM and give it a spill directory: DuckDB's
    # default (80% of RAM) let the simsearch-mmr-rerank sf10 oracle
    # grow a 112 GB RSS and the kernel OOM-killed the whole sweep —
    # a bounded oracle spills (or fails with a catchable error the
    # per-key harness records) instead of taking the process down.
    # Env-tunable so small-SF pytest runs keep the (tiny) default hit.
    mem = os.environ.get("ORACLE_DUCKDB_MEM", "24GB")
    con.sql(f"SET memory_limit='{mem}'")
    # anchor the spill dir to the repo (not the CWD): /tmp-cwd verify
    # runs would otherwise scatter .tmp/ dirs wherever the harness was
    # launched from, outside the repo's .gitignore.  Env-overridable
    # alongside ORACLE_DUCKDB_MEM.
    spill = os.environ.get(
        "ORACLE_DUCKDB_SPILL",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".tmp",
            "duckdb_oracle_spill",
        ),
    )
    con.sql(f"SET temp_directory='{spill}'")
    for t in TABLES:
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        # bit-exact float comparison, except signed zero: -0.0 == 0.0
        # numerically (DuckDB rounds tiny negatives to -0.0 where the
        # same Spark expression lands +0.0) — +0.0 folds the sign away
        return (v + 0.0).hex()
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
        return tuple(_norm(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _norm(v.item())
    if isinstance(v, bytes):
        return v.hex()
    return v


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_norm(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def _tag_value(v) -> str:
    """Type-tagged canonical string for one value — same normalization
    as ``_norm`` (float hex, isoformat, tuple-ified arrays) with an
    explicit type prefix so '5' (string) can never hash-collide with 5
    (int) across engines."""
    if v is None:
        return "None"
    if not isinstance(v, (list, tuple, dict)) and not hasattr(v, "__len__"):
        try:
            if pd.isna(v):
                return "None"
        except (TypeError, ValueError):
            pass
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "None"
        # signed zero: -0.0 == 0.0 numerically but differs bitwise —
        # DuckDB rounds tiny negatives to -0.0 where Spark lands +0.0
        return f"float:{(v + 0.0).hex()}"
    if isinstance(v, int):
        return f"int:{v}"
    if isinstance(v, str):
        return f"str:{v}"
    if hasattr(v, "item") and not isinstance(v, (list, tuple, dict)):
        try:
            return _tag_value(v.item())
        except (ValueError, AttributeError):
            pass
    n = _norm(v)
    return f"obj:{n!r}"


def _canon_strings(df: pd.DataFrame) -> pd.Series:
    """One canonical string per row, mostly vectorized: int/float/bool
    columns stringify through cheap dtype-level branches (floats via
    the same bit-exact ``.hex()`` as ``_norm``), object/temporal
    columns through the per-value ``_tag_value`` map.  Equivalent
    discriminating power to ``canon`` with type tags, but far cheaper
    on multi-million-row frames — the comparator, not the engines, was
    the long pole of the sf1 sweep on row-wise keys."""
    import numpy as np

    cols = sorted(df.columns)
    parts = []
    for c in cols:
        s = df[c]
        kind = getattr(s.dtype, "kind", "O")
        if kind in "iu" and not s.isna().any():
            p = "int:" + s.astype("int64").astype(str)
        elif kind in "iu":
            # nullable Int64/Int32 WITH nulls (streamed-comparator
            # chunks): .map on a masked array containing NA hands the
            # callback FLOATS (7 -> 7.0), which would canon an int
            # column as "float:..." in null-bearing chunks only —
            # convert to object first so ints stay ints
            p = (
                s.astype(object)
                .map(lambda v: "None" if v is None or v is pd.NA else f"int:{int(v)}")
                .astype(str)
            )
        elif kind == "f":
            # bit-exact via the raw float64 bits (bijective with .hex(),
            # fully vectorized — the per-value hex map was 140s+ on one
            # 6M-row key of the sf1 sweep); NaNs canonicalize to None
            arr = s.to_numpy(dtype="float64", na_value=float("nan"))
            arr = arr + 0.0  # -0.0 -> +0.0 (IEEE), same canon as _tag_value
            bits = arr.view("int64").astype(str)
            p = pd.Series("float:" + pd.Series(bits, index=s.index), index=s.index)
            p[np.isnan(arr)] = "None"
        elif kind == "b":
            p = s.map(lambda v: f"bool:{bool(v)}")
        elif kind == "M":
            # normalize the storage unit (duckdb: us, arrow: ns) before
            # taking epoch bits so identical instants stringify equally
            sn = s
            if getattr(s.dtype, "tz", None) is not None:
                sn = s.dt.tz_convert("UTC").dt.tz_localize(None)
            sn = sn.astype("datetime64[ns]")
            vals = sn.to_numpy(dtype="datetime64[ns]").view("int64").astype(str)
            p = pd.Series("ts:" + pd.Series(vals, index=s.index), index=s.index)
            p[sn.isna()] = "None"
        elif kind == "O" and pd.api.types.infer_dtype(s, skipna=True) == "string":
            p = ("str:" + s.astype("string")).fillna("None").astype(str)
        else:
            p = s.map(_tag_value)
        parts.append(p.astype(str))
    out = parts[0]
    for p in parts[1:]:
        out = out + "\x1f" + p
    return out


_FAST_COMPARE_MIN_ROWS = 100_000


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Returns a list of mismatch descriptions (empty = match)."""
    return compare_frames(spark_df.toPandas(), oracle_pdf)


def compare_frames(got: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """compare() after the Spark side is already collected — lets the
    sweep time (spark collect, oracle, compare) as separate phases."""
    problems = []
    if sorted(got.columns) != sorted(oracle_pdf.columns):
        problems.append(f"columns: spark={sorted(got.columns)} oracle={sorted(oracle_pdf.columns)}")
        return problems
    if len(got) != len(oracle_pdf):
        problems.append(f"row count: spark={len(got)} oracle={len(oracle_pdf)}")
        # fall through: value diff still useful on count mismatch
    if len(got) >= _FAST_COMPARE_MIN_ROWS and len(got) == len(oracle_pdf):
        import numpy as np

        ca = _canon_strings(got)
        cb = _canon_strings(oracle_pdf)
        hu_a = pd.util.hash_pandas_object(ca, index=False).to_numpy()
        hu_b = pd.util.hash_pandas_object(cb, index=False).to_numpy()
        if np.array_equal(np.sort(hu_a), np.sort(hu_b)):
            # Hash-multiset equality uses 64-bit row hashes: a collision
            # pairing a spark-only row with a DIFFERENT oracle-only row
            # would silently mask a divergence.  Birthday bound: for n
            # rows the chance any two distinct canonical strings share a
            # hash is < n²/2⁶⁴ (≈ 2e-6 at n=6M), and masking further
            # requires the collision to land symmetrically in both
            # frames.  To bound the residual risk, spot-check the rows
            # carrying the k smallest hashes (deterministic sample; the
            # same hashes select corresponding rows on both sides when
            # no collision occurred) through the exact canon path.
            # Compare through the SAME _canon_strings domain the hashes
            # came from — canon()'s stricter tz handling (round-4
            # ADVICE) could report a spurious "collision" for a key
            # that legitimately hash-matched (e.g. tz-aware-UTC vs
            # naive timestamps, which _canon_strings normalizes).
            k = 16
            idx_a = np.argsort(hu_a, kind="stable")[:k]
            idx_b = np.argsort(hu_b, kind="stable")[:k]
            if list(ca.iloc[idx_a]) != list(cb.iloc[idx_b]):
                problems.append(
                    "hash multisets equal but exact spot-check differs "
                    "(64-bit collision masking a divergence)"
                )
            return problems
        # mismatch: derive example rows from the hash multiset diff
        # instead of the O(n) python tuple path (which took 10+ min on
        # multi-million-row frames during the sf1 sweep)
        only_a = np.setdiff1d(hu_a, hu_b)
        only_b = np.setdiff1d(hu_b, hu_a)
        ex_a = got.iloc[np.flatnonzero(np.isin(hu_a, only_a))[:3]].to_dict("records")
        ex_b = oracle_pdf.iloc[np.flatnonzero(np.isin(hu_b, only_b))[:3]].to_dict("records")
        problems.append(
            f"values differ (hash multiset); spark-only~{ex_a} oracle-only~{ex_b}"
        )
        return problems
    a, b = canon(got), canon(oracle_pdf)
    if a != b:
        # hoist the sets: evaluating set(map(tuple, b)) inside the
        # comprehension condition rebuilds it PER ROW — O(n²), the
        # livelock that ate the first sf1 sweep's diagnostics
        set_b, set_a = set(map(tuple, b)), set(map(tuple, a))
        diff_a = [r for r in a if r not in set_b][:3]
        diff_b = [r for r in b if r not in set_a][:3]
        problems.append(f"values differ; spark-only={diff_a} oracle-only={diff_b}")
    return problems


def _chunk_hashes(pdf: pd.DataFrame, spot, k=16):
    """Canon-hash one chunk; fold the k smallest (hash, canon) pairs
    into ``spot`` (a list used as a bounded max-heap via heapq with
    negated keys) for the post-hoc exact spot-check."""
    import heapq

    import numpy as np

    ca = _canon_strings(pdf)
    h = pd.util.hash_pandas_object(ca, index=False).to_numpy()
    take = min(k, len(h))
    if take:
        idx = np.argpartition(h, take - 1)[:take]
        for i in idx:
            item = (-int(h[i]), str(ca.iloc[i]))
            if len(spot) < k:
                heapq.heappush(spot, item)
            elif item > spot[0]:
                heapq.heapreplace(spot, item)
    return h


def compare_streamed(
    spark_df,
    duck_con,
    oracle_sql: str,
    *,
    chunk_rows: int = 2_000_000,
    scratch_dir: str | None = None,
    stats: dict | None = None,
) -> list[str]:
    """Order-insensitive value comparison that never materializes either
    side as ONE pandas frame — for full-projection keys whose 60M-row
    result held ~77 GB RSS through ``toPandas`` + canon (the round-6
    sf10 exclusion this replaces).

    The Spark side writes its result to scratch parquet (distributed
    write, engine memory untouched) and is re-read in bounded pyarrow
    batches; the DuckDB side streams through ``fetch_record_batch``.
    Each chunk converts to pandas with Arrow-backed NULLABLE integer
    dtypes on BOTH sides (plain ``to_pandas`` widens an int chunk that
    happens to contain nulls to float64, which would canon the same
    value differently across chunks), runs the same ``_canon_strings``
    canonicalization as the in-memory fast path, and contributes 64-bit
    row hashes; the verdict compares the SORTED HASH MULTISETS (memory:
    8 bytes/row/side) plus an exact spot-check of the k smallest-hash
    canon strings — identical discriminating power to the in-memory
    ``compare_frames`` fast path."""
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.dataset as pads

    def _to_pandas(batch: pa.RecordBatch | pa.Table) -> pd.DataFrame:
        mapper = {
            pa.int8(): pd.Int8Dtype(), pa.int16(): pd.Int16Dtype(),
            pa.int32(): pd.Int32Dtype(), pa.int64(): pd.Int64Dtype(),
            pa.uint8(): pd.UInt8Dtype(), pa.uint16(): pd.UInt16Dtype(),
            pa.uint32(): pd.UInt32Dtype(), pa.uint64(): pd.UInt64Dtype(),
            pa.bool_(): pd.BooleanDtype(),
        }.get
        return batch.to_pandas(types_mapper=mapper)

    tmp = tempfile.mkdtemp(prefix="stream_cmp_", dir=scratch_dir)
    problems: list[str] = []
    try:
        out = f"{tmp}/spark_result"
        spark_df.write.mode("overwrite").parquet(out)
        ds = pads.dataset(out, format="parquet")
        spark_cols = sorted(ds.schema.names)

        spot_a: list = []
        a_parts = []
        for batch in ds.to_batches(batch_size=chunk_rows):
            if batch.num_rows:
                a_parts.append(_chunk_hashes(_to_pandas(batch), spot_a))
        ha = np.concatenate(a_parts) if a_parts else np.empty(0, dtype="uint64")

        reader = duck_con.execute(oracle_sql).fetch_record_batch(chunk_rows)
        # schema from the READER, not the first batch: a zero-batch
        # oracle would otherwise be assumed schema-equal to the Spark
        # side and a 0-vs-0-row comparison could mask a column mismatch
        oracle_cols = sorted(reader.schema.names)
        spot_b: list = []
        b_parts = []
        while True:
            try:
                batch = reader.read_next_batch()
            except StopIteration:
                break
            if batch.num_rows:
                b_parts.append(_chunk_hashes(_to_pandas(batch), spot_b))
        hb = np.concatenate(b_parts) if b_parts else np.empty(0, dtype="uint64")

        if stats is not None:
            stats["spark_rows"] = int(len(ha))
            stats["oracle_rows"] = int(len(hb))
        if spark_cols != oracle_cols:
            return [f"columns: spark={spark_cols} oracle={oracle_cols}"]
        if len(ha) != len(hb):
            problems.append(f"row count: spark={len(ha)} oracle={len(hb)}")
            return problems
        if not np.array_equal(np.sort(ha), np.sort(hb)):
            only_a = np.setdiff1d(ha, hb)
            only_b = np.setdiff1d(hb, ha)
            problems.append(
                f"values differ (streamed hash multiset): "
                f"{len(only_a)} spark-only / {len(only_b)} oracle-only hashes"
            )
            return problems
        # k-min spot-check through the exact canon strings (same
        # collision-bounding argument as compare_frames)
        if sorted(spot_a) != sorted(spot_b):
            problems.append(
                "hash multisets equal but k-min canon spot-check differs "
                "(64-bit collision masking a divergence)"
            )
        return problems
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
