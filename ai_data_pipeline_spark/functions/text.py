"""Text expressions: tokenization, shingling, normalization —
JVM-side higher-order functions (no UDFs), shared by the dedup and
text-analysis operators.

Indexing caution: Spark SQL array subscripts are 0-based, DuckDB's
are 1-based — every oracle twin below states its own indexing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish tokenizer: letter runs, digit runs, or single punctuation.
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokens with empties dropped (split on runs)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda w: F.length(w) > 0)


def token_count_ws(col: Column | str) -> Column:
    return F.size(ws_tokens(col)).cast("long")


def token_count_bpe_ish(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)).cast("long")


def word_ngrams(col: Column | str, n: int) -> Column:
    """Array of space-joined word n-grams (order preserved,
    duplicates kept). Spark arrays are 0-based: gram i spans words
    [i, i+n). DuckDB twin (1-based) in sql_word_ngrams."""
    ws = ws_tokens(col)
    if n == 1:
        return ws
    joiner = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(ws, i + F.lit(k)) for k in range(n)]
    )
    grams = F.transform(F.sequence(F.lit(1), F.size(ws) - (n - 1)), joiner)
    # guard: sequence(1, 0) would be DESCENDING [1,0], not empty
    return F.when(F.size(ws) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def sql_word_ngrams(text_expr: str, n: int) -> str:
    """DuckDB twin of word_ngrams (1-based lists)."""
    ws = f"list_filter(string_split_regex(trim({text_expr}), '\\s+'), w -> len(w) > 0)"
    if n == 1:
        return ws
    parts = " || ' ' || ".join(f"({ws})[i + {k}]" for k in range(n))
    return (
        f"list_transform(range(1, greatest(len({ws}) - {n - 1}, 0) + 1), i -> {parts})"
    )


def normalized_text(col: Column | str) -> Column:
    """Lowercase, strip non-alphanumerics, collapse whitespace — the
    canonical form for fingerprinting/dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", ""), r"\s+", " "))


SQL_NORMALIZED = (
    "trim(regexp_replace(regexp_replace(lower({x}), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))"
)
