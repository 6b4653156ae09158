"""Embedding transform (reference R15): text → fixed-dim vector via
an Arrow-batched pandas UDF with a pluggable encoder.

The reference embeds with ``SentenceTransformer("all-MiniLM-L6-v2")``
(`rag_chatbot/main.py:20-23`) — a per-process model encode over the
whole corpus in RAM. Here the encoder is a seam: production plugs a
real model (loaded once per executor inside the UDF closure); this
container has no embedding model, so the default is a DETERMINISTIC
FAKE — md5-derived components in [-1, 1) — that exercises the real
Spark plumbing (Arrow batches, schema, partitioning) and is exactly
reproducible in SQL for the DuckDB oracle (q49).

Scale: encode is compute-bound and embarrassingly parallel — one
`spread()` upstream buys full-cluster parallelism; the UDF sees
Arrow batches (spark.sql.execution.arrow.maxRecordsPerBatch), so a
real model amortizes its forward pass across the batch. The model
itself should be loaded lazily per worker (module/global cache), not
per batch, and never broadcast through the closure at real size.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

EMBED_DIM_DEFAULT = 64

Encoder = Callable[[list[str]], list[list[float]]]


def fake_text_encoder(texts: list[str], dim: int = EMBED_DIM_DEFAULT) -> list[list[float]]:
    """Deterministic encoder stub: component i of a text's vector is
    byte (i mod 16) of md5(text + ":" + str(i // 16)), affinely mapped
    to [-1, 1) as (byte - 127.5) / 127.5.

    Every arithmetic step is IEEE-exact and reproducible in DuckDB
    SQL (see ``sql_embed_components``) — the oracle recomputes the
    same vectors from the same text. Replace with a real model in
    production:

        def st_encoder(texts):            # pragma: no cover
            from sentence_transformers import SentenceTransformer
            model = _model_cache.setdefault(
                "m", SentenceTransformer("all-MiniLM-L6-v2"))
            return model.encode(texts).tolist()
    """
    out: list[list[float]] = []
    n_chunks = (dim + 15) // 16
    for t in texts:
        raw = bytearray()
        for chunk in range(n_chunks):
            raw += hashlib.md5((t + f":{chunk}").encode("utf-8")).digest()
        out.append([(b - 127.5) / 127.5 for b in raw[:dim]])
    return out


def embed_text(
    df: DataFrame,
    text_col: str,
    out_col: str = "embedding",
    encoder: Encoder | None = fake_text_encoder,
) -> DataFrame:
    """Append an ``array<double>`` embedding column computed by
    ``encoder`` over Arrow batches (pandas UDF — the sanctioned
    Python touchpoint; never a row-at-a-time Python UDF)."""
    if encoder is None:
        raise NotImplementedError(
            "no embedding model available in this environment; "
            "pass encoder= (e.g. sentence-transformers-based) or use fake_text_encoder"
        )

    @F.pandas_udf(ArrayType(DoubleType()))
    def encode_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            texts = ["" if t is None else str(t) for t in s]
            yield pd.Series(encoder(texts))

    return df.withColumn(out_col, encode_udf(F.col(text_col)))


# --- DuckDB twin ------------------------------------------------------------

_HEXPOS = "(strpos('0123456789abcdef', substr(md5({t} || ':{c}'), {p}, 1)) - 1)"


def sql_embed_components(text_expr: str, dim: int = EMBED_DIM_DEFAULT) -> str:
    """DuckDB list expression recomputing ``fake_text_encoder``:
    byte k of md5 from its two hex digits, then (byte - 127.5)/127.5
    — identical IEEE steps to the Python encoder."""
    comps = []
    for i in range(dim):
        chunk, k = i // 16, i % 16
        hi = _HEXPOS.format(t=text_expr, c=chunk, p=2 * k + 1)
        lo = _HEXPOS.format(t=text_expr, c=chunk, p=2 * k + 2)
        comps.append(f"((16 * {hi} + {lo} - 127.5) / 127.5)")
    return "[" + ", ".join(comps) + "]"
