"""Opt-in real-model embedding integration (R15): proves the
``embed_text`` encoder seam carries an actual sentence-transformers
model, not just the deterministic fake the oracle uses.

Skipped unless sentence-transformers is importable (not present in
the build sandbox). SPARK_GRAFT_ST_MODEL optionally picks the model
(default: the reference's all-MiniLM-L6-v2, `rag_chatbot/main.py:20`).
"""

from __future__ import annotations

import os

import pytest

try:  # pragma: no cover - absent in the sandbox
    import sentence_transformers  # noqa: F401

    _HAVE_ST = True
except ImportError:
    _HAVE_ST = False

pytestmark = pytest.mark.skipif(
    not _HAVE_ST, reason="sentence-transformers not installed (real-model opt-in)"
)

_MODEL = os.environ.get("SPARK_GRAFT_ST_MODEL", "all-MiniLM-L6-v2")
_CACHE: dict = {}


def _st_encoder(texts):  # pragma: no cover - needs the real model
    from sentence_transformers import SentenceTransformer

    model = _CACHE.setdefault("m", SentenceTransformer(_MODEL))
    return model.encode(list(texts)).tolist()


def test_embed_text_with_real_model(spark):  # pragma: no cover
    from ai_data_pipeline_spark.operators.embedding import embed_text

    df = spark.createDataFrame(
        [(1, "spark distributes computation"), (2, "an unrelated sentence about cooking")],
        "doc_id BIGINT, text STRING",
    )
    rows = embed_text(df, "text", encoder=_st_encoder).collect()
    dims = {len(r["embedding"]) for r in rows}
    assert len(dims) == 1 and dims.pop() > 0  # fixed-dim real vectors
    assert rows[0]["embedding"] != rows[1]["embedding"]
