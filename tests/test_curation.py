"""Unit tests for the reusable curation operators (the library forms
behind q98/q99/q100/q109/q112/q113 — those queries' DuckDB twins pin
cross-engine semantics; these pin the operator API on small frames)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ai_data_pipeline_spark.operators import curation as C


def test_mask_pii_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "write to bob99@mail.example.com or call 555-0199 now"),
         (2, "no pii here")],
        "id LONG, text STRING",
    )
    out = df.select(
        "id",
        C.mask_pii("text").alias("masked"),
        *[c.alias(f"c{i}") for i, c in enumerate(C.pii_counts("text"))],
    ).orderBy("id").collect()
    assert out[0]["masked"] == "write to <EMAIL> or call <PHONE> now"
    assert (out[0]["c0"], out[0]["c1"]) == (1, 1)
    assert out[1]["masked"] == "no pii here"
    assert (out[1]["c0"], out[1]["c1"]) == (0, 0)


def test_url_domain(spark):
    df = spark.createDataFrame(
        [(1, "see https://a.example.org/x page"), (2, "nothing")],
        "id LONG, text STRING",
    )
    got = {r["id"]: r["d"] for r in df.select("id", C.url_domain("text").alias("d")).collect()}
    assert got == {1: "a.example.org", 2: ""}


def test_assign_split_deterministic_and_dup_stable(spark):
    df = spark.createDataFrame(
        [(i, f"doc number {i} body") for i in range(50)] + [(99, "doc number 7 body")],
        "id LONG, text STRING",
    )
    rows = df.select("id", "text", C.assign_split("text").alias("s")).collect()
    by_text = {}
    for r in rows:
        by_text.setdefault(r["text"], set()).add(r["s"])
    # exact dups land in the same split
    assert all(len(v) == 1 for v in by_text.values())
    # rerun → identical assignment
    again = {r["id"]: r["s"] for r in df.select("id", C.assign_split("text").alias("s")).collect()}
    assert again == {r["id"]: r["s"] for r in rows}


def test_segment_table_ragged_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l"), (2, "   "), (3, "x y")],
        "id LONG, text STRING",
    )
    segs = C.segment_table(df, "id", "text", seg_tokens=5).collect()
    got = {}
    for r in segs:
        got.setdefault(r["id"], []).append(r["seg"])
    assert got[1] == ["a b c d e", "f g h i j", "k l"]
    assert 2 not in got          # empty doc → zero segments
    assert got[3] == ["x y"]


def test_segment_dedup_stats_flags_boilerplate(spark):
    boiler = "the same ten tokens repeated in every single doc here"
    rows = [(i, boiler + f" unique tail {i} x") for i in range(4)]
    df = spark.createDataFrame(rows, "id LONG, text STRING")
    out = {
        r["id"]: (r["n_segments"], r["n_dropped"], r["retained_tok"])
        for r in C.segment_dedup_stats(df, "id", "text", seg_tokens=10, max_freq=2).collect()
    }
    # the shared 10-token prefix segment occurs 4 times > max_freq → dropped;
    # each doc keeps only its 4-token ragged tail
    assert all(v == (2, 1, 4) for v in out.values()), out


def test_gap_fill_hourly_zero_fills(spark):
    df = spark.createDataFrame(
        [("a", "2024-01-01 00:10:00"), ("a", "2024-01-01 02:20:00"),
         ("b", "2024-01-01 01:30:00")],
        "k STRING, t STRING",
    ).select("k", F.col("t").cast("timestamp").alias("t"))
    out = {(r["k"], r["hour"].hour): (r["n"], r["is_gap"])
           for r in C.gap_fill_hourly(df, "t", "k").collect()}
    assert len(out) == 6  # 3 hours x 2 keys
    assert out[("a", 0)] == (1, False)
    assert out[("a", 1)] == (0, True)
    assert out[("b", 1)] == (1, False)
    assert out[("b", 0)] == (0, True)


def test_rolling_median_int_odd_even(spark):
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate([10, 2, 8, 4, 100])],
        "k LONG, i LONG, v LONG",
    )
    w = Window.partitionBy("k").orderBy("i").rowsBetween(-2, 0)
    got = [r["m"] for r in df.select("i", C.rolling_median_int("v", w).alias("m"))
           .orderBy("i").collect()]
    # frames: [10], [10,2], [10,2,8], [2,8,4], [8,4,100]
    assert got == [10.0, 6.0, 8.0, 4.0, 8.0]


class TestRemoveDuplicateSpans:
    def _run(self, spark, rows, n):
        from ai_data_pipeline_spark.operators.curation import remove_duplicate_spans

        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = remove_duplicate_spans(df, n=n).collect()
        return {r.doc_id: r.text for r in out}

    def test_later_copy_of_span_removed_first_kept(self, spark):
        shared = "one two three four"
        got = self._run(
            spark,
            [
                (1, f"intro {shared} outro"),
                (2, f"prefix words {shared} suffix words"),
            ],
            n=4,
        )
        # doc 1 (earlier in corpus order) keeps the span; doc 2 loses
        # exactly the 4-token window(s) containing it
        assert shared in got[1]
        assert "one" not in got[2] and "four" not in got[2]
        assert got[2].startswith("prefix words") and got[2].endswith("suffix words")

    def test_overlapping_spans_union(self, spark):
        # doc 2 repeats doc 1's entire text: every gram duplicates,
        # covered spans union to the whole doc -> empty rewrite
        text = "a b c d e f"
        got = self._run(spark, [(1, text), (2, text)], n=3)
        assert got[1] == text
        assert got[2] == ""

    def test_short_and_empty_docs_untouched(self, spark):
        got = self._run(spark, [(1, "too short"), (2, ""), (3, "x y z")], n=8)
        assert got == {1: "too short", 2: "", 3: "x y z"}

    def test_within_doc_repetition_also_dropped(self, spark):
        # the SECOND occurrence inside the same doc is a later
        # occurrence in (doc, pos) order -> dropped
        got = self._run(spark, [(1, "p q r s MID p q r s")], n=4)
        assert got[1].startswith("p q r s MID")
        assert got[1].count("p q r s") == 1

    def test_no_duplicate_ngram_survives_pass(self, spark):
        """Property on a repetitive corpus: after one pass, no n-gram
        of the ORIGINAL tokenization appears at two kept positions
        (single-pass guarantee from the span-union construction)."""
        from ai_data_pipeline_spark.functions.text import word_ngrams
        from pyspark.sql import functions as F

        rows = [
            (i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(40)))
            for i in range(12)
        ]
        from ai_data_pipeline_spark.operators.curation import remove_duplicate_spans

        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = remove_duplicate_spans(df, n=5)
        # grams present in the rewritten corpus, per occurrence
        grams = out.select(
            F.explode(word_ngrams("text", 5)).alias("g")
        )
        top = (
            grams.groupBy("g").count().agg(F.max("count").alias("m")).collect()[0]["m"]
        )
        # NB: rejoining can CREATE new adjacencies (tokens that were
        # never adjacent originally); those may repeat — the exact
        # single-pass guarantee is on original adjacencies, so assert
        # on docs whose kept tokens are contiguous prefixes/suffixes:
        # here every doc is either fully kept or fully span-covered,
        # so any surviving duplicate gram means the pass failed.
        assert top == 1


# --- Gopher quality rules -----------------------------------------------------


def _gopher_py(text: str | None) -> dict:
    """Reference recompute of gopher_quality_flags semantics.

    Explicit [ \\t\\r] whitespace classes, NOT str.strip()/lstrip() —
    mirrors the Spark side, which cannot use F.trim (ASCII-space-only)
    and tests line edges with rlike character classes instead.  NULL
    text scores as the empty document.
    """
    import re

    text = text if text is not None else ""
    words = [w for w in re.split(r"[ \t\r\n]+", text) if w != ""]
    lines = [
        l for l in text.split("\n") if not re.fullmatch(r"[ \t\r]*", l)
    ]
    n_words = len(words)
    word_chars = sum(len(w) for w in words)
    n_alpha = sum(1 for w in words if re.search("[A-Za-z]", w))
    n_bullet = sum(1 for l in lines if re.match(r"^[ \t]*[-*•]", l))
    n_ell = sum(1 for l in lines if re.search(r"(\.\.\.|…)[ \t\r]*$", l))
    n_sym = text.count("#") + len(re.findall(r"(\.\.\.|…)", text))
    from ai_data_pipeline_spark.operators.curation import GOPHER_STOPWORDS

    stops = len({w.lower() for w in words} & set(GOPHER_STOPWORDS))
    rules = {
        "r_word_count": 50 <= n_words <= 100_000,
        "r_mean_word_len": 3 * n_words <= word_chars <= 10 * n_words,
        "r_symbol_ratio": 10 * n_sym <= n_words,
        "r_bullet_lines": 10 * n_bullet <= 9 * len(lines),
        "r_ellipsis_lines": 10 * n_ell <= 3 * len(lines),
        "r_alpha_words": 5 * n_alpha >= 4 * n_words,
        "r_stopwords": stops >= 2,
    }
    rules["gopher_keep"] = all(rules.values())
    return rules


def test_gopher_rules_crafted_docs(spark):
    """One crafted failure per rule + one passing doc, checked against
    the pure-Python recompute AND hand-derived verdicts."""
    from ai_data_pipeline_spark.operators.curation import gopher_quality_flags

    good = "The quick brown fox jumps over the lazy dog and that " * 10
    docs = {
        "good": good,
        "too_short": "the cat sat on that mat with it",
        "long_words": " ".join(["supercalifragilistic"] * 80) + " the of",
        "symbol_heavy": ("# " * 60) + "the of and words here",
        "bullets": "\n".join(["- item the of"] * 20),
        "ellipsis": "\n".join(["we trailed off the of and..."] * 10),
        "numeric": " ".join(["12345"] * 100) + " the of",
        "no_stopwords": " ".join(["alpha beta gamma delta"] * 30),
        # edge whitespace: tab-indented bullets and CR/tab line edges
        # must match the explicit [ \t\r] classes (F.trim is
        # ASCII-space-only — ADVICE r07)
        "tab_bullets": "\n".join(["\t- item the of"] * 20),
        "tab_ellipsis": "\n".join(["we trailed off the of and...\t\r"] * 10),
        "null_text": None,
    }
    df = spark.createDataFrame(list(docs.items()), "name string, text string")
    got = {
        r["name"]: r.asDict()
        for r in gopher_quality_flags(df).collect()
    }
    for name, text in docs.items():
        want = _gopher_py(text)
        for k, v in want.items():
            assert got[name][k] == v, (name, k, got[name][k], v)
    assert got["good"]["gopher_keep"]
    assert not got["too_short"]["r_word_count"]
    assert not got["long_words"]["r_mean_word_len"]
    assert not got["symbol_heavy"]["r_symbol_ratio"]
    assert not got["bullets"]["r_bullet_lines"]
    assert not got["ellipsis"]["r_ellipsis_lines"]
    assert not got["numeric"]["r_alpha_words"]
    assert not got["no_stopwords"]["r_stopwords"]
    assert not got["tab_bullets"]["r_bullet_lines"]
    assert not got["tab_ellipsis"]["r_ellipsis_lines"]
    # NULL text = empty document: keep is a REAL False (never NULL)
    assert got["null_text"]["gopher_keep"] is False
    assert got["null_text"]["n_words"] == 0


def test_gopher_rules_corpus_matches_python(spark, sf_dir):
    """Full-corpus agreement with the Python recompute at sf0.001 —
    the oracle-grade check a future graded row will formalize."""
    from ai_data_pipeline_spark.catalog import load_table
    from ai_data_pipeline_spark.operators.curation import gopher_quality_flags

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = {
        r["doc_id"]: (r["gopher_keep"], r["n_words"], r["n_stop_hits"])
        for r in gopher_quality_flags(docs).collect()
    }
    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(got) == len(raw)
    import re as _re

    for doc_id, text in raw.items():
        want = _gopher_py(text)
        words = [w for w in _re.split(r"[ \t\r\n]+", text) if w]
        assert got[doc_id][0] == want["gopher_keep"], doc_id
        assert got[doc_id][1] == len(words), doc_id
    # discriminator sanity: the synthetic corpus is stopword-poor
    # word soup (r_stopwords correctly rejects all of it), but the
    # word-count rule must split it both ways
    n_pass_wc = sum(1 for _, n, _ in got.values() if 50 <= n <= 100_000)
    assert 0 < n_pass_wc < len(got)


# --- distributed prefix sum ---------------------------------------------------


def test_distributed_prefix_sum_matches_global_window(spark):
    """Two-pass bucketed prefix sum == the single global-window cumsum
    bit-for-bit (integer addition is associative), with the bucket
    offsets pass actually exercised (multiple non-empty buckets) and
    intentionally skewed bucket sizes."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ai_data_pipeline_spark.operators.curation import distributed_prefix_sum

    rows = [(i, (i * 13) % 7 + 1) for i in range(500)]
    df = (
        spark.createDataFrame(rows, "id long, val long")
        .withColumn("ok", F.expr("(id * 2654435761) % 1000003"))
        .withColumn("bucket", F.expr("ok div 100001"))
    )
    assert df.select("bucket").distinct().count() >= 5
    got = {
        r["id"]: r["cum"]
        for r in distributed_prefix_sum(df, "bucket", ["ok", "id"], "val").collect()
    }
    w = Window.orderBy("ok", "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r["id"]: r["cum"]
        for r in df.withColumn("cum", F.sum("val").over(w)).collect()
    }
    assert got == want


# --- C4 quality rules ----------------------------------------------------------


def _c4_py(text: str | None) -> dict:
    """Reference recompute of c4_quality_flags semantics (same
    explicit [ \\t\\r] classes as the engine, never str.strip)."""
    import re

    text = text if text is not None else ""
    lines = [l for l in text.split("\n") if not re.fullmatch(r"[ \t\r]*", l)]
    kept = [
        l
        for l in lines
        if re.search(r'[.!?"][ \t\r]*$', l)
        and len([w for w in re.split(r"[ \t\r]+", l) if w != ""]) >= 5
    ]
    has_brace = "{" in text
    has_lorem = "lorem ipsum" in text.lower()
    return {
        "n_lines": len(lines),
        "n_kept_lines": len(kept),
        "kept_chars": sum(len(l) for l in kept),
        "has_brace": has_brace,
        "has_lorem": has_lorem,
        "c4_keep": (not has_brace) and (not has_lorem) and len(kept) >= 3,
    }


def test_c4_rules_crafted_docs(spark):
    good_line = "This is a sentence with enough words to pass."
    docs = {
        "good": "\n".join([good_line] * 4),
        "brace": "\n".join([good_line] * 4) + "\nif (x) { y(); }",
        "lorem": "\n".join([good_line] * 3) + "\nLorem Ipsum dolor sit."
                 ,
        "too_few_kept": "\n".join([good_line] * 2) + "\nno punct here at all",
        "short_lines": "\n".join(["Tiny line."] * 6),      # <5 words each
        "no_terminal": "\n".join([good_line[:-1]] * 6),    # no punct
        "tab_edge": "\n".join([good_line + "\t"] * 3),     # punct then tab
        "null_text": None,
    }
    from ai_data_pipeline_spark.operators.curation import c4_quality_flags

    df = spark.createDataFrame(list(docs.items()), "name string, text string")
    got = {r["name"]: r.asDict() for r in c4_quality_flags(df).collect()}
    for name, text in docs.items():
        want = _c4_py(text)
        for k, v in want.items():
            assert got[name][k] == v, (name, k, got[name][k], v)
    assert got["good"]["c4_keep"]
    assert not got["brace"]["c4_keep"]
    assert not got["lorem"]["c4_keep"]
    assert not got["too_few_kept"]["c4_keep"]
    assert not got["short_lines"]["c4_keep"]
    assert not got["no_terminal"]["c4_keep"]
    assert got["tab_edge"]["c4_keep"]  # [ \t\r]* after the punct
    assert got["null_text"]["c4_keep"] is False
    assert got["null_text"]["n_lines"] == 0


def test_c4_rules_corpus_matches_python(spark, sf_dir):
    from ai_data_pipeline_spark.catalog import load_table
    from ai_data_pipeline_spark.operators.curation import c4_quality_flags

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = {
        r["doc_id"]: (r["c4_keep"], r["n_kept_lines"], r["kept_chars"])
        for r in c4_quality_flags(docs).collect()
    }
    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(got) == len(raw)
    for doc_id, text in raw.items():
        want = _c4_py(text)
        assert got[doc_id] == (
            want["c4_keep"], want["n_kept_lines"], want["kept_chars"]
        ), doc_id
