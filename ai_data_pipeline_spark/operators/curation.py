"""Corpus-curation operators: the reusable forms of the release-
pipeline passes (PII redaction, domain filtering, split assignment,
span-level dedup, resampling, robust smoothing). Each function emits
a DataFrame/Column plan of pure built-in expressions — no UDFs, no
driver-side loops — so Catalyst optimizes them like any user query
and the shuffle payloads stay scalar.

The q98/q99/q100/q109/q112/q113 registry entries are thin wrappers
over these; their DuckDB twins pin the semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ai_data_pipeline_spark.functions.text import WS_RUN

# Java∩RE2-portable subset (char classes, +, {n} — no lookaround), so
# Spark and any RE2-based engine (DuckDB, Go, Hyperscan-style
# scanners) match identical spans.
PII_EMAIL = "[a-z0-9]+@[a-z0-9.]+[a-z]"
PII_PHONE = "555-[0-9]{4}"


def mask_pii(
    text: Column | str,
    patterns: list[tuple[str, str]] | None = None,
) -> Column:
    """Masked text: each (regex, placeholder) applied in order.

    Replacement is global on both Spark (default) and RE2 engines
    (pass the 'g' flag there). Order matters when spans can nest —
    apply the longest/most-specific pattern first.
    """
    c = F.col(text) if isinstance(text, str) else text
    for pat, placeholder in patterns or [
        (PII_EMAIL, "<EMAIL>"),
        (PII_PHONE, "<PHONE>"),
    ]:
        c = F.regexp_replace(c, pat, placeholder)
    return c


def pii_counts(
    text: Column | str,
    patterns: list[str] | None = None,
) -> list[Column]:
    """Per-pattern match counts (long), same order as ``patterns``."""
    c = F.col(text) if isinstance(text, str) else text
    return [
        F.regexp_count(c, F.lit(p)).cast("long")
        for p in patterns or [PII_EMAIL, PII_PHONE]
    ]


def url_domain(text: Column | str) -> Column:
    """First https URL's domain ('' when absent — filter upstream when
    absence is meaningful)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract(c, r"https://([a-z0-9.]+)/", 1)


def split_bucket(text: Column | str, buckets: int = 100) -> Column:
    """Content-derived split bucket in [0, buckets): md5 of the raw
    text, first 4 hex digits mod ``buckets``. Identical across runs,
    partition layouts and cluster sizes (unlike randomSplit), and
    exact dups land in the same bucket — no train→test leakage
    through duplicates. DuckDB twin:
    ``('0x' || substr(md5(text), 1, 4))::BIGINT % buckets``.
    """
    c = F.col(text) if isinstance(text, str) else text
    return (
        F.conv(F.substring(F.md5(c.cast("binary")), 1, 4), 16, 10).cast("long")
        % buckets
    )


def assign_split(
    text: Column | str, train_pct: int = 90, val_pct: int = 5
) -> Column:
    """'train' / 'val' / 'test' from :func:`split_bucket` percents."""
    b = split_bucket(text)
    return (
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test")
    )


def segment_table(
    df: DataFrame, id_col: str, text_col: str, seg_tokens: int = 10
) -> DataFrame:
    """[id, seg] — consecutive ``seg_tokens``-token segments of the
    lower-cased whitespace tokenization (last segment ragged). The
    unit of span-level dedup (exact-substring proxy): segments
    shuffle, documents never do.
    """
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), WS_RUN),
        lambda w: F.length(w) > 0,
    )
    n_seg = F.ceil(F.size(toks) / F.lit(float(seg_tokens))).cast("int")
    # guard the empty doc: Spark's sequence(0, -1) DESCENDS
    segs = F.when(F.size(toks) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_seg - 1),
            lambda k: F.concat_ws(
                " ", F.slice(toks, k * seg_tokens + 1, seg_tokens)
            ),
        )
    )
    return df.select(F.col(id_col).alias("id"), F.explode(segs).alias("seg"))


def segment_dedup_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seg_tokens: int = 10,
    max_freq: int = 2,
) -> DataFrame:
    """Per-doc span-trim audit: [id, n_segments, n_dropped,
    retained_tok] where a segment seen more than ``max_freq`` times
    corpus-wide counts as dropped boilerplate. The global frequency
    is a COUNT window over the segment (exchange reused — never a
    groupBy+join-back)."""
    segs = segment_table(df, id_col, text_col, seg_tokens)
    freq = F.count(F.lit(1)).over(Window.partitionBy("seg"))
    seg_len = F.size(F.split(F.col("seg"), " ")).cast("long")
    flagged = segs.select(
        "id", seg_len.alias("seg_len"), (freq > max_freq).alias("dropped")
    )
    return flagged.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(F.when(F.col("dropped"), 1).otherwise(0))
        .cast("long")
        .alias("n_dropped"),
        F.sum(F.when(~F.col("dropped"), F.col("seg_len")).otherwise(0))
        .cast("long")
        .alias("retained_tok"),
    )


def gap_fill_hourly(
    df: DataFrame, time_col: str, key_col: str
) -> DataFrame:
    """[<key_col>, hour, n, is_gap] — the hourly spine from min to max
    observed hour crossed with distinct keys, left-joined with
    observed counts; missing cells zero-filled and flagged. The spine
    is hours×keys (tiny, broadcast side); the fact side partial-
    aggregates before its one exchange."""
    hours = df.agg(
        F.date_trunc("hour", F.min(time_col)).alias("h0"),
        F.date_trunc("hour", F.max(time_col)).alias("h1"),
    ).select(
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("interval 1 hour"))
        ).alias("hour")
    )
    keys = df.select(key_col).distinct()
    spine = hours.crossJoin(keys)
    counts = df.groupBy(
        F.date_trunc("hour", F.col(time_col)).alias("hour"), key_col
    ).agg(F.count(F.lit(1)).alias("n0"))
    return spine.join(counts, ["hour", key_col], "left").select(
        key_col,
        "hour",
        F.coalesce(F.col("n0"), F.lit(0)).cast("long").alias("n"),
        F.col("n0").isNull().alias("is_gap"),
    )


def rolling_median_int(value: Column | str, window: Window) -> Column:
    """Exact rolling median of an INTEGER column over a bounded row
    frame, as a double. Spark's median/percentile aggregates reject
    window frames (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the
    frame's values sort in-array (collect_list preserves frame
    order deterministically; the frame is small by construction).
    Integer inputs make the even-count midpoint an exact dyadic
    double — cross-engine-safe, unlike a median of raw doubles.
    """
    v = F.col(value) if isinstance(value, str) else value
    arr = F.sort_array(F.collect_list(v).over(window))
    n = F.size(arr)
    mid_hi = ((n + 1) / F.lit(2)).cast("int")
    return F.when(
        n % 2 == 1, F.element_at(arr, mid_hi).cast("double")
    ).otherwise(
        (
            F.element_at(arr, (n / F.lit(2)).cast("int"))
            + F.element_at(arr, (n / F.lit(2)).cast("int") + 1)
        )
        / F.lit(2.0)
    )


def remove_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Exact duplicate-SPAN removal: rewrite each document with every
    token span whose ``n``-gram already occurred earlier in the corpus
    dropped — the distributed form of the exact-substring dedup pass
    from the public train-data-dedup literature (suffix-array "exact
    substring" dedup, approximated at token-n-gram granularity, which
    is also what makes it shuffle-friendly).

    Semantics (single pass, deterministic):
    - corpus order = (``id_col``, position); the globally FIRST
      occurrence of each n-gram is kept, every later occurrence marks
      its ``[p, p+n)`` token span for removal (overlaps union);
    - a doc shorter than ``n`` tokens is never touched; a doc whose
      every token is covered comes back as the empty string;
    - output: ``[id_col, text_col]`` with surviving tokens rejoined by
      single spaces (whitespace is not preserved byte-for-byte — the
      tokenizer is ws_tokens, same as every other text operator here).

    Scale shape (all equi-keyed, no candidate pairs, no driver loop):
    one shuffle on the 8-byte gram hash where a WINDOW (not
    groupBy+join-back — CLAUDE.md's exchange-reuse rule) finds the
    global first occurrence; covered spans explode to ≤ n index rows
    PER OCCURRENCE (linear in corpus gram mass — a boilerplate gram
    repeated 1M times contributes 1M·n rows, never f²); one anti-join
    on (doc, index); one groupBy doc to rebuild. Hash note: spans key
    on xxhash64(gram) — a collision can only cause an extra drop, and
    only when the colliding gram also precedes in corpus order.
    """
    return _rebuild_minus_spans(
        docs, duplicate_span_starts(docs, id_col, text_col, n), id_col, text_col, n
    )


def duplicate_span_starts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """[id_col, p] — start index of every NON-FIRST occurrence of each
    corpus ``n``-gram (corpus order = (id, position); the globally
    first occurrence is the survivor). The span-derivation half of
    :func:`remove_duplicate_spans`, exposed so accounting-only
    consumers (q222 grades token counts, not rewritten strings) can
    skip the string-rebuild tail entirely: kept-token count per doc ≡
    token count − |∪ covered indexes| — rejoining non-empty tokens
    with single spaces and re-splitting is count-preserving, so the
    identity is exact, and it is the same formula the oracle uses."""
    from ai_data_pipeline_spark.functions.text import word_ngrams

    ident = F.col(id_col)
    grams = docs.select(
        ident,
        F.posexplode(word_ngrams(text_col, n)).alias("p", "gram"),
    ).select(id_col, "p", F.xxhash64("gram").alias("gh"))
    w = Window.partitionBy("gh")
    occ = F.struct(F.col(id_col), F.col("p"))
    return (
        grams.withColumn("first_occ", F.min(occ).over(w))
        .filter(occ != F.col("first_occ"))
        .select(id_col, "p")
    )


def covered_index_counts(
    spans: DataFrame, id_col: str, n: int
) -> DataFrame:
    """[id_col, n_cov] — size of the UNION of ``[p, p+n)`` index spans
    per document (overlaps counted once — the same distinct the
    rebuild path applies before its anti-join)."""
    return (
        spans.select(
            id_col,
            F.explode(F.sequence(F.col("p"), F.col("p") + (n - 1))).alias("idx"),
        )
        .distinct()
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_cov"))
    )


def _rebuild_minus_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
) -> DataFrame:
    """Rebuild ``docs`` with every token index covered by a ``[p, p+n)``
    span in ``spans`` (columns: id_col, p) dropped; surviving tokens
    rejoin with single spaces. Shared tail of remove_duplicate_spans /
    remove_contaminated_spans: span explode (≤ n index rows per span
    occurrence), one anti-join on (doc, index), one groupBy rebuild."""
    from ai_data_pipeline_spark.functions.text import ws_tokens

    ident = F.col(id_col)
    covered = spans.select(
        id_col, F.explode(F.sequence(F.col("p"), F.col("p") + (n - 1))).alias("idx")
    ).distinct()
    toks = docs.select(ident, F.posexplode(ws_tokens(text_col)).alias("idx", "tok"))
    kept = toks.join(covered, [id_col, "idx"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias(text_col)
    )
    # docs losing every token (or empty to begin with) must survive
    return docs.select(ident).join(rebuilt, id_col, "left").select(
        id_col, F.coalesce(F.col(text_col), F.lit("")).alias(text_col)
    )


def remove_contaminated_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Benchmark decontamination at the published gram length (GPT-3
    Appendix C / The Pile practice: 13-gram collision with a held-out
    evaluation set): rewrite each corpus document with every token
    span whose ``n``-gram also occurs ANYWHERE in ``benchmark``
    dropped. Span policy: exactly the colliding ``[p, p+n)`` token
    span is removed (overlaps union) — GPT-3 removes a 200-character
    window and splits the doc; the span form is the deterministic,
    token-accountable variant most open pipelines (The Pile, Dolma)
    converged on.

    Scale shape: the benchmark gram set is DISTINCT hashes (8-byte),
    so the collision probe is a LEFT SEMI equi-join — one row out per
    colliding corpus gram occurrence, never a pair explosion (no
    max_shingle_freq needed: a semi-join against a set cannot go f²).
    Real benchmarks are tiny vs the corpus, so AQE broadcasts the
    hash set and the probe runs AT THE SCAN; rebuild tail shared with
    remove_duplicate_spans. Hash note: xxhash64 collisions can only
    cause an extra (span) drop, same contract as the dedup pass.
    """
    from ai_data_pipeline_spark.functions.text import word_ngrams

    bench_ghs = (
        benchmark.select(F.explode(word_ngrams(text_col, n)).alias("gram"))
        .select(F.xxhash64("gram").alias("gh"))
        .distinct()
    )
    grams = corpus.select(
        F.col(id_col),
        F.posexplode(word_ngrams(text_col, n)).alias("p", "gram"),
    ).select(id_col, "p", F.xxhash64("gram").alias("gh"))
    hit = grams.join(bench_ghs, "gh", "left_semi").select(id_col, "p")
    return _rebuild_minus_spans(corpus, hit, id_col, text_col, n)


# --- Gopher-style document quality rules -------------------------------------
#
# The rule family published in Rae et al. 2021 ("Scaling Language
# Models: ... Gopher", Appendix A.1.1) and reused by most open
# training-data pipelines since (MassiveText, FineWeb): cheap
# structural predicates that remove boilerplate/garbage documents
# before any model-based scoring. Reference parity: the reference
# repo has no quality gate at all (its filter surface is the R7
# null-drop); this is part of the declared beyond-reference curation
# family, same tier as mask_pii/assign_split above.
#
# Engineering contract (same as the rest of this module):
# - pure built-in expressions, one narrow projection — no UDFs, no
#   shuffle; at 100 TB this runs AT THE SCAN and costs a map pass;
# - every threshold compares CROSS-MULTIPLIED integers (n_sym * 10
#   <= n_words), never a float ratio, so a future DuckDB oracle twin
#   is trivially bit-exact and no `0.1` literal ever meets IEEE
#   arithmetic;
# - explicit [ \t\r\n] whitespace classes (Spark F.trim strips only
#   ASCII spaces; Java vs RE2 \s disagree at the edges — CLAUDE.md).

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_WS_SPLIT = "[ \t\r\n]+"


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Per-document Gopher rule metrics + verdicts.

    Adds integer metric columns (``n_words``, ``word_chars``,
    ``n_alpha_words``, ``n_lines``, ``n_bullet_lines``,
    ``n_ellipsis_lines``, ``n_hash_sym``, ``n_stop_hits``), one
    boolean per rule (``r_word_count``, ``r_mean_word_len``,
    ``r_symbol_ratio``, ``r_bullet_lines``, ``r_ellipsis_lines``,
    ``r_alpha_words``, ``r_stopwords``) and ``gopher_keep`` (AND of
    all rules). Rules (Gopher A.1.1, the whitespace-token form):

    1. ``min_words <= n_words <= max_words``;
    2. mean word length in [3, 10]:
       ``3*n_words <= word_chars <= 10*n_words``;
    3. hash/ellipsis symbol-to-word ratio <= 0.1:
       ``10*n_sym <= n_words``;
    4. <= 90% of lines start with a bullet (- * •):
       ``10*n_bullet <= 9*n_lines``;
    5. <= 30% of lines end with an ellipsis (... or …):
       ``10*n_ellipsis <= 3*n_lines``;
    6. >= 80% of words contain an alphabetic character:
       ``5*n_alpha_words >= 4*n_words``;
    7. >= 2 distinct required stopwords present
       (the/be/to/of/and/that/have/with).
    """
    # NULL text scores as the empty document (fails r_word_count, so
    # gopher_keep is a real False — never NULL, which both keep- and
    # reject-filters would silently drop).
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(t, _WS_SPLIT), lambda w: w != F.lit(""))
    # Explicit [ \t\r] classes everywhere a line edge is tested:
    # F.trim/ltrim/rtrim strip ONLY ASCII spaces (CLAUDE.md), so a
    # tab-indented bullet or a CR-edged line would diverge from the
    # Python twin under trim-based checks.
    lines = F.filter(
        F.split(t, "\n"),
        lambda l: ~l.rlike("^[ \t\r]*$"),
    )
    ell = "(\\.\\.\\.|…)"
    out = df.withColumns(
        {
            "n_words": F.size(words).cast("long"),
            "word_chars": F.aggregate(
                words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
            ),
            "n_alpha_words": F.size(
                F.filter(words, lambda w: w.rlike("[A-Za-z]"))
            ).cast("long"),
            "n_lines": F.size(lines).cast("long"),
            "n_bullet_lines": F.size(
                F.filter(lines, lambda l: l.rlike("^[ \t]*[-*•]"))
            ).cast("long"),
            "n_ellipsis_lines": F.size(
                F.filter(lines, lambda l: l.rlike(ell + "[ \t\r]*$"))
            ).cast("long"),
            # '#' occurrences + ellipsis occurrences, counted by length
            # delta (replace, not regexp — no escaping traps)
            "n_hash_sym": (
                (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit(""))))
                + F.coalesce(F.regexp_count(t, F.lit(ell)), F.lit(0))
            ).cast("long"),
            "n_stop_hits": F.size(
                F.array_intersect(
                    F.array_distinct(F.transform(words, F.lower)),
                    F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
                )
            ).cast("long"),
        }
    )
    rules = {
        "r_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "r_mean_word_len": (3 * F.col("n_words") <= F.col("word_chars"))
        & (F.col("word_chars") <= 10 * F.col("n_words")),
        "r_symbol_ratio": 10 * F.col("n_hash_sym") <= F.col("n_words"),
        "r_bullet_lines": 10 * F.col("n_bullet_lines") <= 9 * F.col("n_lines"),
        "r_ellipsis_lines": 10 * F.col("n_ellipsis_lines") <= 3 * F.col("n_lines"),
        "r_alpha_words": 5 * F.col("n_alpha_words") >= 4 * F.col("n_words"),
        "r_stopwords": F.col("n_stop_hits") >= 2,
    }
    out = out.withColumns(rules)
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("gopher_keep", keep)


def distributed_prefix_sum(
    df: DataFrame,
    bucket_col: str,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cum",
) -> DataFrame:
    """Global running sum WITHOUT a global single-task window — the
    classic two-pass distributed prefix sum (the scale fix for q87's
    documented giant-group caveat).

    Contract: ``bucket_col`` must be MONOTONE in the global
    ``order_cols`` order (bucket boundaries are ranges of the leading
    order key), so "all rows of earlier buckets precede this bucket"
    holds. Pass 1 computes the within-bucket cumsum in parallel
    (window partitioned by bucket); pass 2 aggregates one total per
    bucket — a B-row frame — takes its exclusive running sum with a
    window ORDER BY bucket (single task over B rows, not the corpus),
    and broadcast-joins the per-bucket offset back. Result column
    ``out_col`` equals the single-window global cumsum bit-for-bit
    (integer addition is associative), at the cost of one extra
    metadata-sized exchange.
    """
    w_in = (
        Window.partitionBy(bucket_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = df.withColumn("_local_cum", F.sum(value_col).over(w_in))
    totals = df.groupBy(bucket_col).agg(F.sum(value_col).alias("_total"))
    w_off = (
        Window.orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        bucket_col,
        F.coalesce(F.sum("_total").over(w_off), F.lit(0)).alias("_offset"),
    )
    return (
        local.join(F.broadcast(offsets), bucket_col)
        .withColumn(out_col, F.col("_local_cum") + F.col("_offset"))
        .drop("_local_cum", "_offset")
    )


def c4_quality_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document C4 cleaning metrics + verdict (Raffel et al. 2020
    §2.2 — the other canonical structural pre-filter next to
    :func:`gopher_quality_flags`). Line rules: a line is RETAINED iff
    it ends in terminal punctuation (. ! ? ") and has ≥ 5 whitespace
    words. Document rules: drop when the text contains '{' (code), a
    'lorem ipsum' placeholder (case-insensitive), or keeps < 3 lines
    (the paper's ≥3-sentence rule at line granularity).

    Adds ``n_lines``, ``n_kept_lines``, ``kept_chars``, ``has_brace``,
    ``has_lorem`` and ``c4_keep``. Same conventions as the Gopher
    family: NULL text scores as the empty document (c4_keep is a real
    False), explicit [ \\t\\r] whitespace classes (F.trim strips only
    ASCII spaces), every metric an exact integer/boolean — the SQL
    twin recomputes them bit-for-bit. One narrow pure-Catalyst
    projection: no UDF, no shuffle, runs at the scan.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(F.split(t, "\n"), lambda l: ~l.rlike("^[ \t\r]*$"))
    kept = F.filter(
        lines,
        lambda l: l.rlike('[.!?"][ \t\r]*$')
        & (
            F.size(
                F.filter(F.split(l, "[ \t\r]+"), lambda w: w != F.lit(""))
            )
            >= 5
        ),
    )
    out = df.withColumns(
        {
            "n_lines": F.size(lines).cast("long"),
            "n_kept_lines": F.size(kept).cast("long"),
            "kept_chars": F.aggregate(
                kept, F.lit(0).cast("long"), lambda acc, l: acc + F.length(l)
            ),
            "has_brace": t.contains("{"),
            "has_lorem": F.lower(t).contains("lorem ipsum"),
        }
    )
    return out.withColumn(
        "c4_keep",
        ~F.col("has_brace")
        & ~F.col("has_lorem")
        & (F.col("n_kept_lines") >= 3),
    )
