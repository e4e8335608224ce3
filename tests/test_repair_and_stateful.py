"""Repair loop + custom stateful streaming operator."""

from __future__ import annotations

import pandas as pd
import pytest

from pandasqlite_spark.core.ingest import ingest
from pandasqlite_spark.core.llm import FakeLLM
from pandasqlite_spark.core.text2sql import run_with_repair


class RepairingLLM(FakeLLM):
    """First text2sql answer references a bogus column; once the prompt
    carries the analyzer's [ERROR] feedback, answer correctly."""

    def __call__(self, prompt: str) -> str:
        if "sanity check" in prompt.lower():
            return "YES"
        if "[QUESTION]" in prompt:
            if "[ERROR]" in prompt:
                return "```sql\nSELECT COUNT(*) AS n FROM table\n```"
            return "```sql\nSELECT no_such_column FROM table\n```"
        return super().__call__(prompt)


def test_run_with_repair_fixes_analysis_error(spark):
    pdf = pd.DataFrame({"a": [1, 2, 3]})
    results, _, _ = ingest(spark, [pdf], persist=False)
    llm = RepairingLLM()
    out = run_with_repair(spark, "count rows", results, llm).collect()
    assert out[0]["n"] == 3


def test_run_with_repair_raises_after_budget(spark):
    pdf = pd.DataFrame({"a": [1]})
    results, _, _ = ingest(spark, [pdf], persist=False)
    always_bad = lambda p: "```sql\nSELECT nope FROM table\n```"
    with pytest.raises(Exception):
        run_with_repair(spark, "q", results, always_bad, max_repairs=1)


def test_stateful_user_profiles(spark, sf_dir):
    """Drive the applyInPandasWithState operator to completion and check
    the final per-user profile equals the batch aggregate."""
    from pyspark.sql import functions as F

    from pandasqlite_spark.operators.common import load_events
    from pandasqlite_spark.streaming.events import read_events_stream, run_stream_to_memory
    from pandasqlite_spark.streaming.stateful import user_profiles_stream

    stream = user_profiles_stream(read_events_stream(spark, sf_dir))
    name, _ = run_stream_to_memory(stream, mode="update")
    # update mode may emit several rows per user across batches; the
    # finite source yields one batch here, but take the max-n row per
    # user to be robust
    got = (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .collect()
    )
    want = {
        r["user_id"]: r["n"]
        for r in load_events(spark, sf_dir).groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    got_map = {r["user_id"]: r["n_events"] for r in got}
    assert got_map == want
