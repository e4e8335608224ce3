"""Render a ``CREATE TABLE`` DDL string from a Spark schema.

The reference obtains its schema-of-record by storing the frame in
SQLite and *reflecting* the table back into a ``CREATE TABLE`` statement
(reference ``pandasqlite/pandasqlite.py:116-120``).  Spark schemas are
first-class, so we render directly from ``df.schema`` — no store/reflect
round-trip.  The rendered shape mirrors the reflected SQLite DDL the
LLM prompt expects (quoted identifiers, one column per line).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StringType,
    StructType,
    TimestampType,
)

# SQLite-affinity-flavoured names for the prompt (SURVEY.md §1.2), so a
# prompt built against the rebuild looks like one built against the
# reference's reflected DDL.
_TYPE_NAMES: list[tuple[type, str]] = [
    (ByteType, "BIGINT"),
    (ShortType, "BIGINT"),
    (IntegerType, "BIGINT"),
    (LongType, "BIGINT"),
    (FloatType, "FLOAT"),
    (DoubleType, "FLOAT"),
    (BooleanType, "BIGINT"),
    (StringType, "TEXT"),
    (DateType, "DATE"),
    (TimestampType, "TIMESTAMP"),
    (BinaryType, "BLOB"),
]


def sql_type_name(dt: DataType) -> str:
    if isinstance(dt, DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, ArrayType):
        return f"ARRAY<{sql_type_name(dt.elementType)}>"
    if isinstance(dt, MapType):
        return f"MAP<{sql_type_name(dt.keyType)},{sql_type_name(dt.valueType)}>"
    for cls, name in _TYPE_NAMES:
        if isinstance(dt, cls):
            return name
    return dt.simpleString().upper()


def render_create_table(table_name: str, schema: StructType) -> str:
    """``CREATE TABLE "<name>" (\n\t"col" TYPE, ...\n)`` text for prompts."""
    cols = ",\n".join(f'\t"{f.name}" {sql_type_name(f.dataType)}' for f in schema.fields)
    return f'CREATE TABLE "{table_name}" (\n{cols}\n)'
