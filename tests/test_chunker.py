"""Chunker (R2→R3→R4) golden + property tests (SURVEY.md §5.2, §5.5).

The Spark pipeline must reproduce the pure-Python golden
implementation exactly; the splitter must satisfy its offset
invariants on arbitrary input: chunks match their claimed positions,
positions strictly increase, intervals cover the input with no gaps,
sizes are bounded.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ai_data_pipeline_spark.operators.chunker import (
    chunk_documents,
    chunk_pipeline_python,
    paginate_text,
    split_recursive,
    split_recursive_with_offsets,
)


def assert_valid_split(text: str, chunk_size: int, chunk_overlap: int):
    out = split_recursive_with_offsets(text, chunk_size, chunk_overlap)
    if text == "":
        assert out == []
        return out
    prev_start = -1
    cover_end = 0
    for start, chunk in out:
        assert text[start : start + len(chunk)] == chunk, "offset lie"
        assert start > prev_start, "starts must strictly increase"
        assert start <= cover_end, f"gap at {cover_end}..{start}"
        prev_start = start
        cover_end = max(cover_end, start + len(chunk))
        # size bound: violable only by a single unsplittable atom,
        # impossible with the default separators ("" always splits)
        assert len(chunk) <= chunk_size
    assert cover_end == len(text), "tail not covered"
    return out


def test_split_empty():
    assert split_recursive("") == []


def test_split_short_passthrough():
    assert split_recursive("hello world", chunk_size=1500) == ["hello world"]


def test_split_coverage_repetitive():
    assert_valid_split(("word " * 1000).strip(), 100, 20)


def test_split_respects_paragraphs():
    text = "para one is here.\n\npara two is here.\n\npara three."
    out = assert_valid_split(text, 25, 0)
    # with 0 overlap the chunks partition the text exactly
    assert "".join(c for _, c in out) == text


def test_split_long_unbroken_run():
    assert_valid_split("x" * 50, 10, 2)


def test_overlap_bounded():
    text = ("tok " * 500).strip()
    out = split_recursive_with_offsets(text, 100, 20)
    for (s1, c1), (s2, _) in zip(out, out[1:]):
        assert s1 + len(c1) - s2 <= 20, "carried overlap exceeds chunk_overlap"


@given(st.text(alphabet="ab \n", max_size=400), st.integers(20, 60), st.integers(0, 15))
@settings(max_examples=60, deadline=None)
def test_split_properties(text, chunk_size, overlap):
    assert_valid_split(text, chunk_size, overlap)


@given(st.text(max_size=300), st.integers(10, 80), st.integers(0, 9))
@settings(max_examples=40, deadline=None)
def test_split_properties_unicode(text, chunk_size, overlap):
    assert_valid_split(text, chunk_size, overlap)


def test_paginate_word_packing():
    pages = paginate_text("aa bb cc dd", page_chars=5)
    assert pages == ["aa bb", "cc dd"]
    assert paginate_text("", 5) == []


def test_golden_pipeline_shape():
    text = " ".join(f"w{i}" for i in range(300))
    out = chunk_pipeline_python(text, page_chars=100, chunk_size=200, chunk_overlap=40)
    assert out, "non-empty document must produce chunks"
    assert min(w for w, _, _ in out) == 1
    assert min(s for _, s, _ in out) == 1


def test_spark_matches_golden(spark):
    docs = [
        (1, " ".join(f"alpha{i}" for i in range(200))),
        (2, "short doc"),
        (3, ""),
        (4, " ".join("tok" for _ in range(500))),
        (5, "unicode ünïcødé " * 40),
    ]
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    got = {
        (r.doc_id, r.window_index, r.subchunk_index): r.chunk_text
        for r in chunk_documents(
            df, "doc_id", "text", page_chars=120, chunk_size=250, chunk_overlap=50
        ).collect()
    }
    want = {}
    for doc_id, text in docs:
        for w, s, chunk in chunk_pipeline_python(
            text, page_chars=120, chunk_size=250, chunk_overlap=50
        ):
            want[(doc_id, w, s)] = chunk
    assert got == want
