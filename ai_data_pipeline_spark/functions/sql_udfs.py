"""SQL-defined functions (Spark 4 ``CREATE FUNCTION ... RETURN``):
the engine's scalar expression library exposed to pure-SQL users.

``spark.sql`` over registered views is this engine's SQL entry point
(catalog.register_views); ``register_sql_functions`` completes that
story — a SQL-only user gets the same tokenization / vector-math /
hash-family primitives the DataFrame operators are built from,
callable by name in any query.

Why SQL UDFs and not ``spark.udf.register``: a SQL UDF body is
INLINED into the calling plan as a Catalyst expression tree — it
codegens with the rest of the stage, costs zero serialization, and
predicates/pruning see through it. A registered Python UDF is an
opaque slow-path barrier. These are definitions, not new semantics:
each body mirrors the corresponding expression in functions/text.py,
functions/vector.py, or operators/dedup.py (tests assert equality
against the DataFrame forms).

Scale note: TEMPORARY functions are session-scoped — on a shared
cluster, persistent SQL UDFs would live in the metastore via
``CREATE FUNCTION`` without TEMPORARY; this container has no
metastore, so the session-scoped form is registered here and the
statement text is identical either way.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ai_data_pipeline_spark.functions.text import BPE_ISH_PATTERN, WS, WS_RUN

# Spark SQL string literals are backslash-escaped: double every
# backslash so the regex engine sees the explicit whitespace class
# (functions/text.py WS — the Java-\s-equivalent both engines share).
_WS_SQL = WS.replace("\\", "\\\\")
_WS_RUN_SQL = WS_RUN.replace("\\", "\\\\")

# name -> (signature, return type, body). Bodies are pure Spark SQL
# expressions — no Python at call time.
_DEFS: dict[str, tuple[str, str, str]] = {
    # --- vector math (functions/vector.py twins) ---
    "vec_dot": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)",
        "DOUBLE",
        "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 AS DOUBLE), (acc, v) -> acc + v)",
    ),
    "vec_norm": (
        "(a ARRAY<DOUBLE>)",
        "DOUBLE",
        "sqrt(aggregate(transform(a, x -> x * x), cast(0.0 AS DOUBLE), (acc, v) -> acc + v))",
    ),
    "vec_l2sq": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)",
        "DOUBLE",
        "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), cast(0.0 AS DOUBLE), (acc, v) -> acc + v)",
    ),
    "vec_cosine": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)",
        "DOUBLE",
        "vec_dot(a, b) / (vec_norm(a) * vec_norm(b))",
    ),
    # --- text (functions/text.py twins) ---
    "norm_text": (
        "(s STRING)",
        "STRING",
        f"trim(regexp_replace(regexp_replace(lower(s), '[^a-z0-9{_WS_SQL}]', ''),"
        f" '{_WS_RUN_SQL}', ' '))",
    ),
    "ws_tokens": (
        "(s STRING)",
        "ARRAY<STRING>",
        f"filter(split(trim(s), '{_WS_RUN_SQL}'), w -> length(w) > 0)",
    ),
    "token_count_ws": ("(s STRING)", "BIGINT", "cast(size(ws_tokens(s)) AS BIGINT)"),
    "token_count_bpe": (
        "(s STRING)",
        "BIGINT",
        # NB: Spark SQL string literals are backslash-escaped, so the
        # regex's backslashes must be doubled in the statement text
        f"cast(size(regexp_extract_all(s, '{BPE_ISH_PATTERN.replace(chr(92), chr(92) * 2)}', 0)) AS BIGINT)",
    ),
    "word_ngrams": (
        "(s STRING, n INT)",
        "ARRAY<STRING>",
        # the runtime-n form: transform over gram start positions.
        # (The DataFrame word_ngrams unrolls shifted slices for a
        # STATIC n to avoid re-splitting; here `ws_tokens(s)` is a
        # lambda-free argument evaluated once per call site by CSE,
        # and SQL users get arbitrary n.)
        "transform(sequence(1, greatest(size(ws_tokens(s)) - n + 1, 0)),"
        " i -> array_join(slice(ws_tokens(s), i, n), ' '))",
    ),
    # --- hash family (operators/dedup.md5_hash60 twin) ---
    "md5h60": (
        "(s STRING, seed INT)",
        "BIGINT",
        "cast(conv(substr(md5(CASE WHEN seed IS NULL THEN s"
        " ELSE concat(s, ':', cast(seed AS STRING)) END), 1, 15), 16, 10) AS BIGINT)",
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """CREATE OR REPLACE TEMPORARY FUNCTION for the whole library;
    returns the registered names. Idempotent."""
    for name, (sig, ret, body) in _DEFS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
            f"RETURNS {ret} RETURN {body}"
        )
    return list(_DEFS)
