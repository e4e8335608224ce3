"""Opt-in LIVE watsonx.ai round trip (round-6 verdict #8).

Skipped unless WATSONX_APIKEY + WATSONX_URL + WATSONX_PROJECT_ID are
set: the supported offline contract is the stub-backed HTTP path in
test_core.py; this test exists so an operator WITH credentials can
verify the genuine service end-to-end with one command:

    WATSONX_APIKEY=... WATSONX_URL=https://us-south.ml.cloud.ibm.com \
    WATSONX_PROJECT_ID=... python -m pytest tests/test_watsonx_live.py
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

_CREDS = ("WATSONX_APIKEY", "WATSONX_URL", "WATSONX_PROJECT_ID")


@pytest.mark.skipif(
    not all(os.environ.get(k) for k in _CREDS),
    reason="live watsonx round trip is opt-in: set "
    + "/".join(_CREDS)
    + " (offline contract: the stubbed HTTP path in test_core.py)",
)
def test_live_ingest_text2sql_roundtrip(spark, tmp_path, monkeypatch):
    from pandasqlite_spark.core.ingest import ingest
    from pandasqlite_spark.core.llm import watsonx_http_backend
    from pandasqlite_spark.core.text2sql import run_with_repair

    monkeypatch.chdir(tmp_path)  # ingest cache writes under $PWD/cache
    llm = watsonx_http_backend(
        os.environ["WATSONX_URL"],
        api_key=os.environ["WATSONX_APIKEY"],
        iam_url="https://iam.cloud.ibm.com/identity/token",
        project_id=os.environ["WATSONX_PROJECT_ID"],
    )
    pdf = pd.DataFrame(
        {
            "Product line": ["Camping Equipment", "Golf Equipment", "Camping Equipment"],
            "Revenue": [120.5, 80.0, 59.5],
        }
    )
    results, _, _ = ingest(spark, [pdf], llm)
    assert results and results[0]["ddl"]
    out = run_with_repair(
        spark, "What is the total revenue per product line?", results, llm
    ).toPandas()
    assert len(out) == 2
    assert abs(float(out.select_dtypes("number").iloc[:, -1].sum()) - 260.0) < 1e-6
