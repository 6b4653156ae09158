"""Text expressions: tokenization, shingling, normalization —
JVM-side higher-order functions (no UDFs), shared by the dedup and
text-analysis operators.

Indexing caution: Spark SQL array subscripts are 0-based, DuckDB's
are 1-based — every oracle twin below states its own indexing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace: ONE explicit class on BOTH engines. Java regex \s is
# [ \t\n\x0b\f\r]; DuckDB's RE2 \s omits \x0b (vertical tab), so a
# Spark-\s / DuckDB-\s pair silently diverges on a \x0b in the
# corpus. WS below is exactly Java \s — every Spark-side result is
# bit-identical to the old \s form — and the DuckDB twins now agree
# on \x0b too. Compose as [{WS}] / [^…{WS}]; WS_RUN is a run. The
# escapes survive a DuckDB single-quoted literal verbatim; a SPARK
# SQL string literal unescapes backslashes, so double them there
# (see functions/sql_udfs.py).
WS = r" \t\n\x0b\f\r"
WS_RUN = rf"[{WS}]+"

# BPE-ish tokenizer: letter runs, digit runs, or single punctuation.
BPE_ISH_PATTERN = rf"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9{WS}]"


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokens with empties dropped (split on runs)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), WS_RUN), lambda w: F.length(w) > 0)


def token_count_ws(col: Column | str) -> Column:
    return F.size(ws_tokens(col)).cast("long")


def token_count_bpe_ish(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)).cast("long")


def word_ngrams(col: Column | str, n: int) -> Column:
    """Array of space-joined word n-grams (order preserved,
    duplicates kept). DuckDB twin (1-based) in sql_word_ngrams.

    Built from n shifted ``slice``s folded with ``zip_with`` so the
    token array is referenced a constant number of times. The naive
    form — ``transform(sequence(...), i -> element_at(ws, i+k))``
    with the token expression captured in the lambda — re-evaluates
    the full split per element (HOF lambdas don't CSE captured
    subtrees): ~2n re-splits of the text per row, measured 10x+
    slower on bigram counting at sf0.1."""
    ws = ws_tokens(col)
    if n == 1:
        return ws
    # m grams, each spanning tokens [k, k+n); slice k is the gram's
    # k-th word for every gram — equal-length arrays, so zip_with
    # never null-pads.
    m = F.greatest(F.size(ws) - (n - 1), F.lit(0))
    parts = [F.slice(ws, k + 1, m) for k in range(n)]
    grams = parts[0]
    for part in parts[1:]:
        grams = F.zip_with(grams, part, lambda a, b: F.concat_ws(" ", a, b))
    return grams


def sql_word_ngrams(text_expr: str, n: int) -> str:
    """DuckDB twin of word_ngrams (1-based lists)."""
    ws = f"list_filter(string_split_regex(trim({text_expr}), '{WS_RUN}'), w -> len(w) > 0)"
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
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(c), rf"[^a-z0-9{WS}]", ""), WS_RUN, " ")
    )


SQL_NORMALIZED = (
    f"trim(regexp_replace(regexp_replace(lower({{x}}), '[^a-z0-9{WS}]', '', 'g'),"
    f" '{WS_RUN}', ' ', 'g'))"
)
