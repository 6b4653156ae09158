"""R6: the reference's 3-stage JSON validate/extract fallback
(`app/main.py:29-35,46-61`) as a single Catalyst expression.

Stages (first success wins, exactly the reference's order):
1. parse the raw response as JSON;
2. parse the contents of a ```` ```json {...} ``` ```` fenced block
   (DOTALL, non-greedy — `app/main.py:50`);
3. parse the first single-backtick span (`app/main.py:55`).

A record failing all three is NULL (dropped by the caller with a
side-count, R7). No UDF: from_json returns NULL on malformed input,
so the whole fallback is coalesce(from_json(...), ...) — fully
codegen'd, which matters when validating billions of LLM responses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

QA_SCHEMA = StructType(
    [
        StructField("question", StringType()),
        StructField("answer", StringType()),
    ]
)

FENCED_RE = r"(?s)```json\s*(\{.*?\})\s*```"
BACKTICK_RE = r"(?s)`(.*?)`"


def _try_parse(c: Column, schema) -> Column:
    """from_json that is NULL on malformed input.

    Spark's from_json(struct schema) returns a struct of NULLs for
    malformed JSON (PERMISSIVE), which would stop a coalesce chain —
    so parse-success is probed with a map schema (maps DO return
    NULL on malformed input) and the struct parse is gated on it.
    json.loads-parity: any valid JSON *object* counts as stage
    success even if the contract keys are absent (`app/main.py:46-61`
    records wrong-key objects as-is; validity is checked later).
    """
    ok = F.from_json(c, "map<string,string>").isNotNull()
    return F.when(ok, F.from_json(c, schema))


def extract_json(raw: Column | str, schema=QA_SCHEMA) -> Column:
    """3-stage fallback parse → struct (NULL if all stages fail)."""
    c = F.col(raw) if isinstance(raw, str) else raw
    stage1 = _try_parse(c, schema)
    stage2 = _try_parse(F.nullif(F.regexp_extract(c, FENCED_RE, 1), F.lit("")), schema)
    stage3 = _try_parse(F.nullif(F.regexp_extract(c, BACKTICK_RE, 1), F.lit("")), schema)
    return F.coalesce(stage1, stage2, stage3)


def validate_qa(df: DataFrame, raw_col: str = "raw_response") -> DataFrame:
    """Apply the fallback and split valid/invalid with a side-count
    observable (R7: `app/main.py:60-61,112-114`).

    Adds: qa struct, is_valid. Use ``df.observe`` upstream if you
    need streaming-safe counters.
    """
    parsed = df.withColumn("qa", extract_json(raw_col))
    return parsed.withColumn(
        "is_valid", F.col("qa").isNotNull() & F.col("qa.question").isNotNull() & F.col("qa.answer").isNotNull()
    )


def valid_records(
    df: DataFrame,
    raw_col: str = "raw_response",
    lineage: tuple[str, ...] = ("source_file", "window_index", "subchunk_index"),
) -> DataFrame:
    """R7+R8: keep valid records, flatten, attach lineage columns
    (`app/main.py:106-110` record shape)."""
    v = validate_qa(df, raw_col).filter(F.col("is_valid"))
    return v.select(
        F.col("qa.question").alias("question"),
        F.col("qa.answer").alias("answer"),
        *[F.col(c) for c in lineage if c in df.columns],
    )


def valid_records_with_metrics(
    df: DataFrame,
    raw_col: str = "raw_response",
    lineage: tuple[str, ...] = ("source_file", "window_index", "subchunk_index"),
):
    """R7's valid/invalid side-count as a single-pass ``Observation``
    (`app/main.py:112-117` keeps two Python counters; here the counts
    ride the same job that writes the records — no second scan, no
    accumulator double-count on task retries).

    Returns ``(records_df, observation)``; read
    ``observation.get`` AFTER an action on the returned frame:
    ``{"n_total": ..., "n_valid": ..., "n_invalid": ...}``.
    """
    from pyspark.sql import Observation

    obs = Observation("qa_validation")
    v = validate_qa(df, raw_col)
    observed = v.observe(
        obs,
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("is_valid"), 1).otherwise(0)).alias("n_valid"),
        F.sum(F.when(F.col("is_valid"), 0).otherwise(1)).alias("n_invalid"),
    )
    records = observed.filter(F.col("is_valid")).select(
        F.col("qa.question").alias("question"),
        F.col("qa.answer").alias("answer"),
        *[F.col(c) for c in lineage if c in df.columns],
    )
    return records, obs


def extract_json_python(raw: str) -> dict | None:
    """Pure-Python twin of ``extract_json`` (golden/oracle use): same
    3 stages in the same order, dict on success, None when all fail.
    Stage success mirrors the map-probe semantics: any valid JSON
    OBJECT counts, even without the contract keys."""
    import json as _json
    import re as _re

    def _try(s: str | None) -> dict | None:
        if not s:
            return None
        try:
            v = _json.loads(s)
        except Exception:  # noqa: BLE001 — any parse failure = stage miss
            return None
        return v if isinstance(v, dict) else None

    if raw is None:
        return None
    m2 = _re.search(FENCED_RE, raw)
    m3 = _re.search(BACKTICK_RE, raw)
    # Explicit is-not-None chain, NOT `or`: a successfully-parsed `{}`
    # is falsy but IS stage success (Spark's coalesce stops at the
    # non-null struct) — r06 ADVICE caught the truthiness fallthrough.
    for cand in (raw, m2.group(1) if m2 else None, m3.group(1) if m3 else None):
        parsed = _try(cand)
        if parsed is not None:
            return parsed
    return None
