"""Core pipeline: ingest, metadata enrichment, text2sql, dialect rewriting."""
