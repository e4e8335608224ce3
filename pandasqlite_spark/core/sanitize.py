"""Column-name sanitization, semantics-compatible with the reference.

The reference rewrites every column name with
``re.sub('[^0-9a-zA-Z]+', '_', col)`` (reference
``pandasqlite/pandasqlite.py:94``) so that e.g. ``Unit cost`` becomes
``Unit_cost`` before the frame is stored.  We keep exactly those
semantics (runs of non-alphanumerics collapse to a single ``_``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_SANITIZE_RE = re.compile(r"[^0-9a-zA-Z]+")


def sanitize_column_name(name: str) -> str:
    """Collapse every run of non-alphanumeric characters to ``_``."""
    return _SANITIZE_RE.sub("_", name)


def sanitize_columns(df: DataFrame) -> DataFrame:
    """Return ``df`` with every column renamed via :func:`sanitize_column_name`.

    Dedupes collisions (``a b`` and ``a.b`` both map to ``a_b``) by
    suffixing ``_2``, ``_3``, ... — the reference would silently collide
    inside SQLite; we refuse to lose columns.
    """
    seen: dict[str, int] = {}
    out = []
    for c in df.columns:
        s = sanitize_column_name(c)
        n = seen.get(s, 0)
        seen[s] = n + 1
        out.append(s if n == 0 else f"{s}_{n + 1}")
    return df.toDF(*out)
