"""Text analysis for training-data curation: language id, quality
scoring, token counting, fingerprinting.

All JVM-side expressions (no UDFs): these run per-document in the
scan stage with zero shuffle — exactly what you want when profiling
100 TB of raw text. Every function has a DuckDB-expressible twin
(same arithmetic, same division order) so outputs are oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ai_data_pipeline_spark.functions.text import (
    WS,
    token_count_bpe_ish,
    token_count_ws,
    normalized_text,
    ws_tokens,
)

# Tiny per-language stopword profiles for the n-gram/stopword
# heuristic language-ID. Real deployments swap in bigger profiles;
# the operator shape (score per language → argmax) is the point.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "fr": ("le", "la", "de", "et", "les"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "la", "de", "y", "los"),
    "zh": ("的", "是", "了", "在", "我"),
}


def stopword_ratio(text_col: str, stopwords: tuple[str, ...]) -> Column:
    """Fraction of whitespace tokens that are in ``stopwords``.

    Computed as int/int division (identical on DuckDB) — safe to
    emit raw.
    """
    toks = ws_tokens(text_col)
    hits = F.size(F.filter(toks, lambda w: w.isin(*stopwords)))
    n = F.size(toks)
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def lang_id(text_col: str) -> Column:
    """Heuristic language guess: argmax stopword-hit-count across
    LANG_STOPWORDS, ties broken by language code order; 'und'
    (undetermined) when no stopword hits at all."""
    # LINEAR expression tree: one struct per language fed to a single
    # greatest(). The obvious fold — best = when(cand > best, cand)
    # .otherwise(best) — references `best` twice per level, copying
    # the whole token-filter subtree 2^|langs| times; codegen then
    # compiles (and evaluates) an exponential expression. greatest()
    # over structs ordered by (hits, -code_index) keeps one copy per
    # language and the same argmax semantics: max hits wins, ties go
    # to the FIRST code in sorted order (max of the negated index).
    toks = ws_tokens(text_col)
    codes = sorted(LANG_STOPWORDS)
    def _hits(words: tuple[str, ...]) -> Column:
        return F.size(F.filter(toks, lambda w: w.isin(*words)))

    cands = [
        F.struct(_hits(LANG_STOPWORDS[c]).alias("h"), F.lit(-i).alias("ni"))
        for i, c in enumerate(codes)
    ]
    best = F.greatest(*cands)
    code = F.element_at(F.array(*[F.lit(c) for c in codes]), -best["ni"] + 1)
    return F.when(best["h"] > 0, code).otherwise(F.lit("und"))


def punct_ratio(text_col: str) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    c = F.col(text_col)
    total = F.length(c)
    punct = F.length(c) - F.length(F.regexp_replace(c, rf"[^\w{WS}]", ""))
    return F.when(total > 0, punct / total).otherwise(F.lit(0.0))


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality features: lengths, token counts, ratios.

    Output: [id, n_chars, n_tokens_ws, n_tokens_bpe, avg_token_len,
    stopword_ratio_en, punct_ratio].
    """
    toks = ws_tokens(text_col)
    n_tok = F.size(toks)
    total_tok_chars = F.aggregate(
        F.transform(toks, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.length(text_col).cast("long").alias("n_chars"),
        token_count_ws(text_col).alias("n_tokens_ws"),
        token_count_bpe_ish(text_col).alias("n_tokens_bpe"),
        F.when(n_tok > 0, total_tok_chars / n_tok).otherwise(F.lit(0.0)).alias("avg_token_len"),
        stopword_ratio(text_col, LANG_STOPWORDS["en"]).alias("stopword_ratio_en"),
        punct_ratio(text_col).alias("punct_ratio"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Canonical document fingerprint: md5 over normalized text plus
    a 16-bucket shard key (first hex nibble) for downstream
    partitioned dedup joins. Output: [id, fp, bucket]."""
    fp = F.md5(normalized_text(text_col).cast("binary"))
    return df.select(
        F.col(id_col).alias("id"),
        fp.alias("fp"),
        F.conv(F.substring(fp, 1, 1), 16, 10).cast("int").alias("bucket"),
    )


# Character-n-gram profiles for the second language-ID heuristic:
# counts of characteristic char n-grams (boundary-padded, lowercase).
# Same argmax shape as lang_id; n-grams catch languages that share
# stopword-free text (headlines, no-space scripts) where word lists
# miss. zh profiles are single CJK chars (no word boundaries).
LANG_CHAR_NGRAMS: dict[str, tuple[str, ...]] = {
    "en": (" the ", " and ", " of ", " to ", " a "),
    "fr": (" le ", " les ", " et ", " la ", " de "),
    "de": (" der ", " und ", " die ", " das ", " ist "),
    "es": (" el ", " los ", " y ", " la ", " de "),
    "zh": ("的", "是", "了", "在", "我"),
}


def substring_count(c: Column, pattern: str) -> Column:
    """Occurrences of ``pattern`` in ``c`` via the length-difference
    trick — pure JVM string ops, exact int result (the difference is
    always a multiple of the pattern length, so the division is an
    IEEE-exact small-integer ratio). DuckDB twin: same expression."""
    diff = F.length(c) - F.length(F.replace(c, F.lit(pattern), F.lit("")))
    return (diff / F.lit(len(pattern))).cast("long")


def lang_id_ngram(text_col: str) -> Column:
    """Char-n-gram language guess: argmax of profile-gram occurrence
    counts across LANG_CHAR_NGRAMS (boundary-padded lowercase text);
    'und' when nothing matches. Linear expression tree via the same
    greatest(struct) recipe as lang_id."""
    txt = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    codes = sorted(LANG_CHAR_NGRAMS)

    def _score(grams: tuple[str, ...]) -> Column:
        out = substring_count(txt, grams[0])
        for g in grams[1:]:
            out = out + substring_count(txt, g)
        return out

    cands = [
        F.struct(_score(LANG_CHAR_NGRAMS[c]).alias("h"), F.lit(-i).alias("ni"))
        for i, c in enumerate(codes)
    ]
    best = F.greatest(*cands)
    code = F.element_at(F.array(*[F.lit(c) for c in codes]), -best["ni"] + 1)
    return F.when(best["h"] > 0, code).otherwise(F.lit("und"))
