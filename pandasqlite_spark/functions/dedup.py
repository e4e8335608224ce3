"""Filled in at M4."""

QUERIES: dict = {}
ORACLES: dict = {}
