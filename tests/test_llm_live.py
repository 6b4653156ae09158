"""Opt-in live-LLM integration (R5): exercises HttpLLMClient against a
real Ollama/OpenAI-style /api/generate endpoint.

Skipped unless SPARK_GRAFT_LLM_URL is set (no serving stack exists in
the build sandbox); SPARK_GRAFT_LLM_MODEL optionally picks the model.
Run e.g.:

    SPARK_GRAFT_LLM_URL=http://localhost:11434/api/generate \
    SPARK_GRAFT_LLM_MODEL=deepseek-r1:7b python -m pytest tests/test_llm_live.py
"""

from __future__ import annotations

import os

import pytest

LLM_URL = os.environ.get("SPARK_GRAFT_LLM_URL")
LLM_MODEL = os.environ.get("SPARK_GRAFT_LLM_MODEL", "deepseek-r1:7b")

pytestmark = pytest.mark.skipif(
    not LLM_URL, reason="SPARK_GRAFT_LLM_URL not set (live endpoint opt-in)"
)


def test_http_client_generates():
    from ai_data_pipeline_spark.operators.llm_map import HttpLLMClient

    client = HttpLLMClient(LLM_URL, LLM_MODEL)
    outs = client.generate(["Reply with the single word: pong"])
    assert len(outs) == 1
    assert isinstance(outs[0], str) and outs[0].strip()


def test_llm_map_end_to_end_live(spark):
    """The full R5 mapInPandas path against the live endpoint: one
    client per task, responses parsed by the R6 fallback chain."""
    from ai_data_pipeline_spark.operators.json_fallback import validate_qa
    from ai_data_pipeline_spark.operators.llm_map import HttpLLMClient, llm_map

    df = spark.createDataFrame(
        [(1, "Spark distributes computation across a cluster of executors.")],
        "chunk_id BIGINT, chunk_text STRING",
    )
    out = llm_map(df, lambda: HttpLLMClient(LLM_URL, LLM_MODEL))
    rows = validate_qa(out).collect()
    assert len(rows) == 1
    assert rows[0]["raw_response"].strip()
