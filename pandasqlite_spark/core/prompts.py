"""Prompt assembly for metadata enrichment and text2sql.

Re-expresses the reference's prompt contracts (reference
``pandasqlite/pandasqlite.py:129-171`` for the four enrichment prompts,
``:185-244`` for the five-section text2sql prompt) with one deliberate
divergence: the ``[INSTRUCTION]`` section targets **Spark SQL**, not
SQLite (SURVEY.md §7 guiding choice) — the LLM is the code generator, so
we point it at the execution dialect instead of transpiling afterwards.

The multi-turn chat template is pluggable; the default renders
role-tagged plain text.  The reference hardcodes the Llama-3 chat
template (``pandasqlite.py:185``); supply ``llama3_chat`` for that.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pandasqlite_spark.core.dialect import rewrite_table_placeholder

Message = tuple[str, str]  # (role, content)

SEMANTIC_TYPES = ("TEXT", "NUMBER", "ENUM")


def column_types_prompt(samples: dict[str, list]) -> str:
    """Classify each column as TEXT, NUMBER or ENUM from sampled values
    (contract of reference ``pandasqlite/pandasqlite.py:129-134``)."""
    rendered = json.dumps({c: [str(v) for v in vs] for c, vs in samples.items()}, indent=1)
    return (
        "Classify each column of a table by its sampled values. The only "
        "allowed types are TEXT, NUMBER, ENUM. Use ENUM for columns that "
        "hold a small set of repeating categorical values. Respond with a "
        "single JSON object mapping every column name to its type, and "
        "nothing else.\n\nSampled values per column:\n" + rendered
    )


def column_descriptions_prompt(table_ddl: str, samples: dict[str, list]) -> str:
    """One-line description per column; sampled data must not be echoed
    (contract of reference ``pandasqlite/pandasqlite.py:136-142``)."""
    rendered = json.dumps({c: [str(v) for v in vs] for c, vs in samples.items()}, indent=1)
    return (
        "Write a concise one-line description of each column of the table "
        "below. The sampled data must not be revealed in the descriptions. "
        "Respond with a single JSON object mapping every column name to its "
        "description, and nothing else.\n\nSchema:\n" + table_ddl
        + "\n\nSampled values per column:\n" + rendered
    )


def enum_descriptions_prompt(column: str, values: list) -> str:
    """Per-value description dict for one ENUM column (contract of
    reference ``pandasqlite/pandasqlite.py:144-156``; NaN values are
    rendered as the string ``"NaN"`` before parsing)."""
    rendered = "\n".join(f"- {v}" for v in values)
    return (
        f"Write a short description of each value of the categorical column "
        f"'{column}'. Respond with a single JSON object mapping every value "
        "to its description, and nothing else.\n\nValues:\n" + rendered
    )


def sql_curriculum_prompt(table_ddl: str, samples: dict[str, list]) -> str:
    """Up to 7 (question, sql, difficulty 1-5) pairs of rising difficulty
    (contract of reference ``pandasqlite/pandasqlite.py:158-171``).

    Conventions carried over from the reference prompt: refer to the
    table as ``table`` (rewritten to the real name later); infer types
    from the data as provided — do not turn string values into numbers
    or booleans; wrap aggregation arguments in parentheses, e.g.
    ``MIN(column_name)``.  Dialect retargeted: Spark SQL.
    """
    rendered = json.dumps({c: [str(v) for v in vs] for c, vs in samples.items()}, indent=1)
    return (
        "Produce a SQL curriculum for the table below: up to 7 pairs of a "
        "natural-language question and its Spark SQL solution, of rising "
        "difficulty from 1 to 5. Refer to the table as table. Infer the "
        "types from the data as provided, so do not turn string values "
        "into numbers or booleans. For aggregation functions wrap the "
        "columns in parentheses, e.g. MIN(column_name). Respond with a "
        "single JSON array of objects with keys question, sql, difficulty, "
        "and nothing else.\n\nSchema:\n" + table_ddl
        + "\n\nSampled values per column:\n" + rendered
    )


# ---------------------------------------------------------------------------
# text2sql prompt: [SCHEMA][VALUE_FORMAT][ENUMS][DOCUMENTATION][INSTRUCTION]
# + few-shot curriculum as multi-turn exchanges + [QUESTION]
# (structure of reference pandasqlite/pandasqlite.py:185-244)
# ---------------------------------------------------------------------------

INSTRUCTION = (
    "[INSTRUCTION]\n"
    "Translate the question of the user into a valid SQL statement "
    "compliant to Spark SQL (Apache Spark). Wrap the SQL statement in a "
    "markdown code block (```sql). COMMENTS STRICTLY FORBIDDEN. Only "
    "reference tables and columns that appear in [SCHEMA]. Use single "
    "quotes for string literals and backticks for identifiers that need "
    "quoting."
)


def assemble_messages(
    question: str,
    ingestions: list[dict],
    documentation: str | None = None,
) -> list[Message]:
    """Build the multi-turn prompt as (role, content) messages."""
    schema = "\n\n".join(i["ddl"] for i in ingestions)
    value_format = "\n".join(
        json.dumps(i["value_format"], default=str) for i in ingestions
    )

    enum_lines: list[str] = []
    for i in ingestions:
        for col, vals in (i.get("enum_descriptions") or {}).items():
            for val, desc in (vals or {}).items():
                enum_lines.append(f"{col}.{val}: {desc}")
    enums = "\n".join(enum_lines) if enum_lines else "No enums."

    docs = []
    for i in ingestions:
        if i.get("context"):
            docs.append(str(i["context"]))
    if documentation:
        docs.append(documentation)
    # Reference quirk (pandasqlite.py:214-215, for/else): the default
    # line is ALWAYS appended.  We keep the default only when nothing
    # else exists — a deliberate fix, documented here.
    docs_text = "\n".join(docs) if docs else "No documentation provided."

    system = (
        "[SCHEMA]\n" + schema
        + "\n\n[VALUE_FORMAT]\n" + value_format
        + "\n\n[ENUMS]\n" + enums
        + "\n\n[DOCUMENTATION]\n" + docs_text
        + "\n\n" + INSTRUCTION
    )

    messages: list[Message] = [("system", system)]
    for i in ingestions:
        for item in i.get("sql_curriculum") or []:
            q, sql = item.get("question"), item.get("sql")
            if not q or not sql:
                continue
            sql = rewrite_table_placeholder(sql, i["hash"])
            messages.append(("user", q))
            messages.append(("assistant", f"```sql\n{sql}\n```"))
    messages.append(("user", "[QUESTION]\n" + question))
    return messages


def render_plain(messages: list[Message]) -> str:
    """Default template: role-tagged plain text."""
    return "\n\n".join(f"<{role}>\n{content}" for role, content in messages)


def llama3_chat(messages: list[Message]) -> str:
    """Llama-3 chat template (public format), as the reference uses
    (``pandasqlite/pandasqlite.py:185``)."""
    parts = ["<|begin_of_text|>"]
    for role, content in messages:
        parts.append(f"<|start_header_id|>{role}<|end_header_id|>\n\n{content}<|eot_id|>")
    parts.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
    return "".join(parts)


PromptTemplate = Callable[[list[Message]], str]
