"""Unit pin of scripts/sf10_ledger.py's merge policy — round-8 advice:
a value MISMATCH followed by a NEWER environmental error (and no pass)
must render as MISMATCH, never as OPEN."""

import importlib.util
import json
import os
import time

spec = importlib.util.spec_from_file_location(
    "sf10_ledger",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts", "sf10_ledger.py"),
)
ledger = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ledger)


def _write(tmp, name, recs, mtime):
    p = os.path.join(tmp, name)
    with open(p, "w") as f:
        json.dump(recs, f)
    os.utime(p, (mtime, mtime))
    return p


PASS = {"rows_match": True, "schema_match": True, "hash_match": True,
        "spark_rows": 10, "oracle_rows": 10, "err": None}
MISMATCH = {"rows_match": True, "schema_match": True, "hash_match": False,
            "spark_rows": 10, "oracle_rows": 10, "err": "values differ at row 3"}
ERROR = {"rows_match": False, "schema_match": False, "hash_match": False,
         "spark_rows": None, "oracle_rows": None,
         "err": "OutOfMemoryException: allocation failed"}


def test_newer_error_never_hides_a_mismatch(tmp_path):
    tmp = str(tmp_path)
    t = time.time()
    _write(tmp, "SWEEP_SF10_a.json", {"k": MISMATCH}, t - 100)
    _write(tmp, "SWEEP_SF10_b.json", {"k": ERROR}, t - 50)
    best = ledger.merge(tmp)
    assert best["k"]["kind"] == "mismatch"


def test_newer_error_never_hides_a_pass(tmp_path):
    tmp = str(tmp_path)
    t = time.time()
    _write(tmp, "SWEEP_SF10_a.json", {"k": PASS}, t - 100)
    _write(tmp, "SWEEP_SF10_b.json", {"k": ERROR}, t - 50)
    best = ledger.merge(tmp)
    assert best["k"]["kind"] == "pass" and best["k"]["ok"]


def test_error_with_pass_and_newer_mismatch_is_mismatch(tmp_path):
    tmp = str(tmp_path)
    t = time.time()
    _write(tmp, "SWEEP_SF10_a.json", {"k": PASS}, t - 100)
    _write(tmp, "SWEEP_SF10_b.json", {"k": MISMATCH}, t - 80)
    _write(tmp, "SWEEP_SF10_c.json", {"k": ERROR}, t - 50)
    best = ledger.merge(tmp)
    assert best["k"]["kind"] == "mismatch"


def test_error_with_mismatch_and_newer_pass_is_pass(tmp_path):
    tmp = str(tmp_path)
    t = time.time()
    _write(tmp, "SWEEP_SF10_a.json", {"k": MISMATCH}, t - 100)
    _write(tmp, "SWEEP_SF10_b.json", {"k": PASS}, t - 80)
    _write(tmp, "SWEEP_SF10_c.json", {"k": ERROR}, t - 50)
    best = ledger.merge(tmp)
    assert best["k"]["kind"] == "pass"


def test_newer_mismatch_outranks_older_pass(tmp_path):
    tmp = str(tmp_path)
    t = time.time()
    _write(tmp, "SWEEP_SF10_a.json", {"k": PASS}, t - 100)
    _write(tmp, "SWEEP_SF10_b.json", {"k": MISMATCH}, t - 50)
    best = ledger.merge(tmp)
    assert best["k"]["kind"] == "mismatch"


def test_only_errors_render_open(tmp_path):
    tmp = str(tmp_path)
    _write(tmp, "SWEEP_SF10_a.json", {"k": ERROR}, time.time() - 100)
    best = ledger.merge(tmp)
    assert best["k"]["kind"] == "error"
