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


def test_q152_python_mirror_matches_chunk_pages_python_when_no_drops():
    """The q152 oracle mirror (original-page-number parity) coincides
    with chunk_pages_python (filtered-position parity) whenever no
    page is dropped."""
    from ai_data_pipeline_spark.operators.chunker import chunk_pages_python
    from ai_data_pipeline_spark.plans.pipeline_queries import (
        _Q152_CHUNK_OVERLAP,
        _Q152_CHUNK_SIZE,
        _q152_chunks_python,
    )

    pages = [f"page {i} " + "lorem ipsum " * 40 for i in range(7)]
    assert _q152_chunks_python(pages) == [
        c
        for _, _, c in chunk_pages_python(
            pages, 2, 2, _Q152_CHUNK_SIZE, _Q152_CHUNK_OVERLAP
        )
    ]


def test_q152_python_mirror_uses_original_page_parity_on_drops():
    """With a dropped (space-only) page the mirror must follow the
    Spark plan: the odd-page filter tests ORIGINAL page_no parity,
    the ±2 window spans ROW positions of the kept sequence."""
    from ai_data_pipeline_spark.plans.pipeline_queries import _q152_chunks_python

    pages = ["a", " ", "b", "c", "d"]  # original page 2 is dropped
    # kept rows: (1,a) (3,b) (4,c) (5,d); odd original pages 1, 3, 5
    assert _q152_chunks_python(pages) == [
        "a\n\nb\n\nc",        # row 0 of kept, window rows 0..2
        "a\n\nb\n\nc\n\nd",   # row 1 of kept, window rows 0..3
        "b\n\nc\n\nd",        # row 3 of kept, window rows 1..3
    ]
