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


def test_streaming_cep_matches_across_batch_boundary():
    """Drive _detect_sequence directly with two batches where the
    pattern straddles the boundary: click+purchase arrive in batch 1,
    the closing error in batch 2.  The carried last-2 state must
    complete the match, and re-delivery of context must not re-emit."""
    import pandas as pd

    from pandasqlite_spark.streaming.stateful import _detect_sequence

    class FakeState:
        def __init__(self):
            self.exists = False
            self.hasTimedOut = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

        def remove(self):
            self.exists = False

        def setTimeoutDuration(self, ms):
            raise Exception("NoTimeout")

    st = FakeState()
    b1 = pd.DataFrame(
        {"event_type": ["click", "purchase"], "us": [1_000_000, 2_000_000],
         "event_id": [11, 12], "user_id": [7, 7]}
    )
    out1 = pd.concat(list(_detect_sequence((7,), iter([b1]), st)), ignore_index=True)
    assert len(out1) == 0
    b2 = pd.DataFrame(
        {"event_type": ["error", "view"], "us": [3_000_000, 4_000_000],
         "event_id": [13, 14], "user_id": [7, 7]}
    )
    out2 = pd.concat(list(_detect_sequence((7,), iter([b2]), st)), ignore_index=True)
    assert list(out2["start_id"]) == [11]
    assert list(out2["span_s"]) == [2.0]
    # a third batch with no closing event emits nothing new
    b3 = pd.DataFrame(
        {"event_type": ["error"], "us": [5_000_000], "event_id": [15], "user_id": [7]}
    )
    out3 = pd.concat(list(_detect_sequence((7,), iter([b3]), st)), ignore_index=True)
    assert len(out3) == 0


def test_streaming_pattern_tws_uses_spark4_api(spark, sf_dir):
    """events-streaming-pattern-tws must be served by
    transformWithStateInPandas in this environment (the vendored-
    protobuf shim + RocksDB provider make it runnable); a silent
    degradation to the applyInPandasWithState fallback fails here even
    though the RESULT contract is identical."""
    from pandasqlite_spark.streaming import stateful
    from pandasqlite_spark.streaming.events import (
        q_events_streaming_pattern,
        q_events_streaming_pattern_tws,
    )

    tws = q_events_streaming_pattern_tws(spark, sf_dir).collect()
    assert stateful.LAST_PATTERN_API["api"] == "tws"
    legacy = q_events_streaming_pattern(spark, sf_dir).collect()
    assert [tuple(r) for r in tws] == [tuple(r) for r in legacy]


def test_repair_loop_on_realistic_transcript(spark):
    """A recorded-style transcript (chatty preamble + wrong column on
    turn 1, SQLite-isms + double-quoted literal on turn 2) through
    run_with_repair: the first attempt must fail analysis, the repair
    prompt must carry the previous SQL and the analyzer error, and the
    repaired turn must execute correctly after dialect rewriting —
    the full prompt → extract → rewrite → repair → execute loop on
    completions NOT crafted to parse cleanly."""
    import pandas as pd

    from pandasqlite_spark import FakeLLM, ReplayLLM, ingest
    from pandasqlite_spark.core.text2sql import run_with_repair

    pdf = pd.DataFrame(
        {
            "Product Line": ["Camping", "Golf", "Camping"],
            "Revenue!": [120.0, 80.0, 40.0],
        }
    )
    results, _, _ = ingest(spark, [pdf], FakeLLM())  # enrichment turns

    tname = results[0]["hash"]

    transcript = [
        # turn 1: prose wrapper + fenced SQL, but invents a column name
        (
            "Sure! To compute revenue per product line, you can aggregate"
            " the revenue column grouped by the line, like this:\n\n"
            f"```sql\nSELECT product_category, SUM(Revenue_) AS total\n"
            f"FROM {tname} GROUP BY product_category ORDER BY 1;\n```\n"
            "Let me know if you need anything else!"
        ),
        # turn 2 (after the error feedback): right column, but leans on
        # SQLite habits — GROUP_CONCAT and a double-quoted literal
        (
            "Apologies — `product_category` does not exist; the column is"
            " `Product_Line`. Here is the corrected query:\n\n"
            f'```sql\nSELECT Product_Line, SUM(Revenue_) AS total,\n'
            f"       GROUP_CONCAT(Product_Line) AS lines\n"
            f'FROM {tname}\nWHERE Product_Line <> "Running"\n'
            f"GROUP BY Product_Line ORDER BY Product_Line;\n```"
        ),
    ]
    llm = ReplayLLM(transcript)
    df = run_with_repair(spark, "total revenue per product line", results, llm)
    rows = [(r[0], r[1]) for r in df.collect()]
    assert rows == [("Camping", 160.0), ("Golf", 80.0)]
    # the repair prompt carried the failing SQL and the analyzer error
    assert len(llm.prompts) == 2
    assert "[PREVIOUS ATTEMPT]" in llm.prompts[1]
    assert "product_category" in llm.prompts[1]
    assert "[ERROR]" in llm.prompts[1]


# ---------------------------------------------------------------------------
# ReplayLLM failure-transcript breadth (round-3 verdict item 8): each
# recorded transcript reproduces one realistic completion defect, and
# each test asserts the SPECIFIC repair that fired — not just that some
# answer eventually came back.
# ---------------------------------------------------------------------------


def _gosales_frame():
    import pandas as pd

    return pd.DataFrame(
        {
            "Product Line": ["Camping", "Golf", "Camping", "Running"],
            "Revenue!": [120.0, 80.0, 40.0, 10.0],
        }
    )


def test_replay_wrong_table_name_repaired(spark):
    """Turn 1 invents a friendly table name (`sales_data`) instead of
    the hash-named view; the analyzer's TABLE_OR_VIEW_NOT_FOUND must be
    fed back, and turn 2's corrected reference must execute."""
    from pandasqlite_spark import FakeLLM, ReplayLLM, ingest
    from pandasqlite_spark.core.text2sql import run_with_repair

    results, _, _ = ingest(spark, [_gosales_frame()], FakeLLM())
    tname = results[0]["hash"]
    llm = ReplayLLM(
        [
            "```sql\nSELECT SUM(Revenue_) AS total FROM sales_data\n```",
            f"My mistake — the table is `{tname}`:\n\n"
            f"```sql\nSELECT SUM(Revenue_) AS total FROM {tname}\n```",
        ]
    )
    out = run_with_repair(spark, "total revenue", results, llm).collect()
    assert out[0]["total"] == 250.0
    assert len(llm.prompts) == 2
    assert "[ERROR]" in llm.prompts[1]
    # the repair prompt names the missing table so the model can act
    assert "sales_data" in llm.prompts[1]


def test_replay_unfenced_sql_parses_via_fallback(spark):
    """Turn 1 wraps unfenced SQL in prose (the raw-text fallback then
    feeds unparseable text to Catalyst); turn 2 is BARE SQL with no
    fence at all — the fallback must execute it as-is, proving fence
    extraction is an optimization, not a requirement."""
    from pandasqlite_spark import FakeLLM, ReplayLLM, ingest
    from pandasqlite_spark.core.text2sql import run_with_repair

    results, _, _ = ingest(spark, [_gosales_frame()], FakeLLM())
    tname = results[0]["hash"]
    llm = ReplayLLM(
        [
            "Here is the query you asked for:\n"
            f"SELECT COUNT(*) AS n FROM {tname}\n"
            "It counts all rows.",
            f"SELECT COUNT(*) AS n FROM {tname}",
        ]
    )
    out = run_with_repair(spark, "how many rows", results, llm).collect()
    assert out[0]["n"] == 4
    assert len(llm.prompts) == 2
    assert "```" not in llm.transcript[1]


def test_replay_refusal_then_answer(spark):
    """Turn 1 is a refusal with no SQL at all; the loop must treat it
    as a failed attempt, carry the refusal text as [PREVIOUS ATTEMPT],
    and execute turn 2's real answer."""
    from pandasqlite_spark import FakeLLM, ReplayLLM, ingest
    from pandasqlite_spark.core.text2sql import run_with_repair

    results, _, _ = ingest(spark, [_gosales_frame()], FakeLLM())
    tname = results[0]["hash"]
    refusal = "I'm sorry, I can't write SQL for that request."
    llm = ReplayLLM(
        [
            refusal,
            f"```sql\nSELECT MAX(Revenue_) AS top FROM {tname}\n```",
        ]
    )
    out = run_with_repair(spark, "largest revenue", results, llm).collect()
    assert out[0]["top"] == 120.0
    assert "[PREVIOUS ATTEMPT]" in llm.prompts[1]
    assert refusal.split(",")[0] in llm.prompts[1]


def test_replay_sqlite_isms_rewritten_first_try(spark):
    """A completion leaning on SQLite habits (GROUP_CONCAT, MIN(a,b),
    a GLOB double-quoted pattern, printf) must execute on the FIRST
    attempt — the dialect rewriter, not the repair loop, is the fix;
    a second prompt would mean the rewriter missed something."""
    from pandasqlite_spark import FakeLLM, ReplayLLM, ingest
    from pandasqlite_spark.core.text2sql import run_with_repair

    results, _, _ = ingest(spark, [_gosales_frame()], FakeLLM())
    tname = results[0]["hash"]
    llm = ReplayLLM(
        [
            "Sure:\n```sql\n"
            "SELECT GROUP_CONCAT(Product_Line) AS lines,\n"
            "       MIN(1, 2) AS m,\n"
            "       printf('%d rows', COUNT(*)) AS label\n"
            f'FROM {tname} WHERE Product_Line GLOB "Camp*"\n'
            "```",
        ]
    )
    df = run_with_repair(spark, "camping lines", results, llm)
    row = df.collect()[0]
    assert len(llm.prompts) == 1  # no repair turn fired
    assert row["m"] == 1
    assert row["label"] == "2 rows"
    assert sorted(row["lines"].split(",")) == ["Camping", "Camping"]


def test_glob_dynamic_and_metachar_forms_execute(spark):
    """The round-4 ADVICE GLOB forms must actually EXECUTE on Spark
    with GLOB semantics: a literal pattern carrying LIKE metachars
    (%/_ literal, * wildcard), and a column-valued pattern (per-row
    glob built in SQL)."""
    from pandasqlite_spark.core.dialect import rewrite_sqlite_to_spark

    spark.createDataFrame(
        [("a%b-tail", "a%b*"), ("axb-tail", "a%b*"), ("Camping", "Camp?ng")],
        "name string, pat string",
    ).createOrReplaceTempView("glob_t")
    # literal pattern: % is LITERAL under GLOB (axb-tail must not match)
    sql = rewrite_sqlite_to_spark(
        "SELECT name FROM glob_t WHERE name GLOB 'a%b*'"
    )
    got = sorted(r["name"] for r in spark.sql(sql).collect())
    assert got == ["a%b-tail"]
    # column-valued pattern: each row matched against its own glob
    sql2 = rewrite_sqlite_to_spark(
        'SELECT name FROM glob_t WHERE name GLOB "pat"',
        identifiers={"name", "pat"},
    )
    got2 = sorted(r["name"] for r in spark.sql(sql2).collect())
    assert got2 == ["Camping", "a%b-tail"]
    # character class
    sql3 = rewrite_sqlite_to_spark(
        "SELECT name FROM glob_t WHERE name GLOB '[Cc]amp*'"
    )
    got3 = sorted(r["name"] for r in spark.sql(sql3).collect())
    assert got3 == ["Camping"]


def test_replay_exhausted_transcript_raises(spark):
    """A loop that needs more turns than the recording has must raise
    (the ReplayLLM contract), not silently recycle completions."""
    import pytest as _pytest

    from pandasqlite_spark import FakeLLM, ReplayLLM, ingest
    from pandasqlite_spark.core.text2sql import run_with_repair

    results, _, _ = ingest(spark, [_gosales_frame()], FakeLLM())
    llm = ReplayLLM(["```sql\nSELECT nope FROM nowhere\n```"])
    with _pytest.raises(Exception):
        run_with_repair(spark, "q", results, llm, max_repairs=2)


def test_missing_group_by_repaired_deterministically(spark):
    """SQLite's bare-non-grouped-beside-aggregate shape (SURVEY
    §2.B-15) is repaired WITHOUT a second LLM call: the arbitrary-row
    pick becomes any_value().  The LLM here answers only the first
    prompt — a repair re-ask would return garbage and fail."""
    pdf = pd.DataFrame({"city": ["oslo", "bergen", "oslo"], "pop": [1, 2, 1]})
    results, _, _ = ingest(spark, [pdf], persist=False)
    calls = []

    def llm(prompt):
        if "sanity check" in prompt:
            return "YES"
        calls.append(prompt)
        if "[ERROR]" in prompt:
            return "```sql\nTOTALLY NOT SQL\n```"
        return "```sql\nSELECT GROUP_CONCAT(city) AS cs, MIN(pop, 500) AS m FROM table\n```"

    out = run_with_repair(spark, "cities and min pop", results, llm).collect()
    assert len(out) == 1
    assert out[0]["m"] in (1, 2)  # any_value over least(pop,500)
    assert set(out[0]["cs"].split(",")) <= {"oslo", "bergen"}
    assert len(calls) == 1  # deterministic fix, no LLM repair round


def test_bare_aggregate_rewrite_shapes():
    from pandasqlite_spark.core.dialect import rewrite_bare_aggregate as r

    # the §2.B-15 shape: wrap the bare expression, keep the aggregate
    assert (
        r("SELECT count(*) AS n, city FROM t")
        == "SELECT count(*) AS n, any_value(city) AS `city` FROM t"
    )
    # alias preserved — and a SINGLE max() aggregate promotes the bare
    # item to max_by (SQLite guarantees the extremum row's values for
    # this one shape; any_value would be an arbitrary row)
    assert (
        r("SELECT max(pop), city AS c FROM t")
        == "SELECT max(pop), max_by(city, pop) AS c FROM t"
    )
    # conservative bail-outs: CTEs, set ops, windows, no aggregate and
    # no GROUP BY, fully-grouped select list — all unchanged
    for s in (
        "SELECT count(*), city FROM t GROUP BY city",
        "WITH x AS (SELECT 1) SELECT count(*), city FROM t",
        "SELECT count(*), city FROM t UNION SELECT 1, 'a'",
        "SELECT sum(pop) OVER (), city FROM t",
        "SELECT city, pop FROM t",
        "SELECT * FROM t GROUP BY city",
    ):
        assert r(s) == s


def test_bare_aggregate_rewrite_group_by_present():
    """The MISSING_AGGREGATION twin: SQLite's arbitrary-row pick for
    select items outside an existing GROUP BY list."""
    from pandasqlite_spark.core.dialect import rewrite_bare_aggregate as r

    assert (
        r("SELECT city, pop FROM t GROUP BY city")
        == "SELECT city, any_value(pop) AS `pop` FROM t GROUP BY city"
    )
    # grouped-by-alias, positional GROUP BY, expression grouping, HAVING
    assert (
        r("SELECT city AS c, pop FROM t GROUP BY city")
        == "SELECT city AS c, any_value(pop) AS `pop` FROM t GROUP BY city"
    )
    assert (
        r("SELECT city, pop FROM t GROUP BY 1 ORDER BY city")
        == "SELECT city, any_value(pop) AS `pop` FROM t GROUP BY 1 ORDER BY city"
    )
    assert (
        r("SELECT upper(city), pop FROM t GROUP BY upper(city)")
        == "SELECT upper(city), any_value(pop) AS `pop` FROM t GROUP BY upper(city)"
    )
    assert (
        r("SELECT city, pop FROM t GROUP BY city HAVING count(*) > 1")
        == "SELECT city, any_value(pop) AS `pop` FROM t GROUP BY city"
        " HAVING count(*) > 1"
    )


def test_repair_missing_aggregation_group_by_present(spark):
    """End-to-end: a FakeLLM answer with the GROUP-BY-present
    arbitrary-row-pick shape repairs deterministically — no LLM
    repair round."""
    pdf = pd.DataFrame({"city": ["oslo", "bergen", "oslo"], "pop": [1, 2, 3]})
    results, _, _ = ingest(spark, [pdf], persist=False)
    tbl = results[0]["hash"]
    calls = []

    def llm(prompt):
        if "sanity check" in prompt:
            return "YES"
        calls.append(prompt)
        if "[ERROR]" in prompt:
            return "```sql\nTOTALLY NOT SQL\n```"
        return f"```sql\nSELECT city, pop FROM `{tbl}` GROUP BY city\n```"

    out = run_with_repair(spark, "a pop per city", results, llm).collect()
    assert len(calls) == 1  # deterministic fix, no LLM repair round
    got = {r_["city"]: r_["pop"] for r_ in out}
    assert set(got) == {"oslo", "bergen"}
    assert got["bergen"] == 2 and got["oslo"] in (1, 3)


def test_bare_aggregate_single_minmax_uses_extremum_row():
    """SQLite's documented exception: with exactly one min()/max()
    aggregate, bare columns come from the extremum row — the repair
    must emit max_by/min_by, not any_value (round-6 ADVICE)."""
    from pandasqlite_spark.core.dialect import rewrite_bare_aggregate as r

    assert (
        r("SELECT name, MAX(score) AS s FROM t")
        == "SELECT max_by(name, score) AS `name`, MAX(score) AS s FROM t"
    )
    assert (
        r("SELECT name, MIN(score) FROM t")
        == "SELECT min_by(name, score) AS `name`, MIN(score) FROM t"
    )
    # per-group with GROUP BY present
    assert (
        r("SELECT city, name, MAX(score) FROM t GROUP BY city")
        == "SELECT city, max_by(name, score) AS `name`, MAX(score)"
        " FROM t GROUP BY city"
    )
    # TWO aggregates (or min+another) → no extremum guarantee → any_value
    assert (
        r("SELECT name, MAX(a), MIN(b) FROM t")
        == "SELECT any_value(name) AS `name`, MAX(a), MIN(b) FROM t"
    )
    assert (
        r("SELECT name, COUNT(*), MAX(a) FROM t")
        == "SELECT any_value(name) AS `name`, COUNT(*), MAX(a) FROM t"
    )
    # DISTINCT inside the aggregate: min(DISTINCT x) == min(x), key on x
    assert (
        r("SELECT name, MIN(DISTINCT score) FROM t")
        == "SELECT min_by(name, score) AS `name`, MIN(DISTINCT score) FROM t"
    )


def test_repair_single_max_returns_extremum_row(spark):
    """End-to-end MISSING_GROUP_BY repair: `SELECT name, MAX(score)`
    must return the max row's name (SQLite semantics), deterministically
    — not an arbitrary row."""
    pdf = pd.DataFrame(
        {"name": ["lo", "hi", "mid"], "score": [1, 99, 50]}
    )
    results, _, _ = ingest(spark, [pdf], persist=False)
    tbl = results[0]["hash"]
    calls = []

    def llm(prompt):
        if "sanity check" in prompt:
            return "YES"
        calls.append(prompt)
        return f"```sql\nSELECT name, MAX(score) AS top FROM `{tbl}`\n```"

    out = run_with_repair(spark, "who has the top score", results, llm).collect()
    assert len(calls) == 1  # deterministic, no LLM repair round
    assert len(out) == 1
    assert out[0]["name"] == "hi" and out[0]["top"] == 99


def test_glob_round6_edges_execute(spark):
    """Round-6 ADVICE GLOB edges: mid-string ^ in a dynamic pattern is
    a literal (not a dead anchor), an unbalanced [ in the data yields
    no-match instead of a regex runtime error, and the negated-class
    leading-] literal form ([^]]) compiles and matches."""
    from pandasqlite_spark.core.dialect import (
        _glob_to_regex,
        rewrite_sqlite_to_spark,
    )

    # unit: [^]] / []a] forms produce valid Java regex
    assert _glob_to_regex("[^]]") == "^[^\\]]$"
    assert _glob_to_regex("[]a]") == "^[\\]a]$"

    spark.createDataFrame(
        [
            ("a^b", "a^b"),       # literal ^ mid-pattern must match itself
            ("ab", "a^b"),        # and not match the ^-less twin
            ("x[y", "x[y*"),      # unbalanced [ in the pattern: no crash
            ("camp", "[^]]amp"),  # negated class with literal ]
            ("]amp", "[^]]amp"),
        ],
        "name string, pat string",
    ).createOrReplaceTempView("glob_edge_t")
    sql = rewrite_sqlite_to_spark(
        'SELECT name FROM glob_edge_t WHERE name GLOB "pat"',
        identifiers={"name", "pat"},
    )
    got = sorted(r["name"] for r in spark.sql(sql).collect())
    # a^b matches its literal; ab does not; x[y row must not ERROR
    # (SQLite: unterminated class matches nothing); camp matches
    # [^]]amp; ]amp does not
    assert got == ["a^b", "camp"]
    # literal-pattern path: [^]] class via RLIKE
    sql2 = rewrite_sqlite_to_spark(
        "SELECT name FROM glob_edge_t WHERE name GLOB '[^]]amp'"
    )
    got2 = sorted(r["name"] for r in spark.sql(sql2).collect())
    assert got2 == ["camp"]
