"""Custom source surface — the Spark 4 Python Data Source API.

The built-in sources (parquet/CSV/JSON/ORC/binaryFile, exercised by the
``scan-*`` keys in ``operators/``) cover every format the reference can
ingest via pandas (`/root/reference/pandasqlite/pandasqlite.py:57` takes
pre-read DataFrames; `test.py:35-39` reads CSVs).  This package covers
the *extension* point: sources Spark has no reader for, implemented as
Python Data Sources with real partition planning so they scale out like
any file scan.
"""
