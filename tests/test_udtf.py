"""Native Python UDTF surface (Spark 4 lateral table functions)."""

from ai_data_pipeline_spark.operators.udtf_ops import FixedWindowChunks, register_udtfs


def _expected(text: str, size: int, overlap: int):
    out, step, idx = [], size - overlap, 0
    for start in range(0, max(len(text), 1), step):
        chunk = text[start : start + size]
        if not chunk:
            break
        out.append((idx, start, chunk))
        if start + size >= len(text):
            break
        idx += 1
    return out


def test_udtf_lateral_sql(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xy"), (3, None)], "doc_id long, text string"
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        """
        SELECT doc_id, c.chunk_index, c.chunk_start, c.chunk_text
        FROM udtf_docs, LATERAL fixed_window_chunks(text, 4, 2) c
        ORDER BY doc_id, c.chunk_index
        """
    ).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_index"], r["chunk_start"], r["chunk_text"])
        )
    assert got[1] == _expected("abcdefghij", 4, 2)
    assert got[2] == _expected("xy", 4, 2)
    assert 3 not in got  # null text yields no rows
    # every character covered; consecutive chunks overlap by 2
    chunks = [c for _, _, c in got[1]]
    assert "".join(c[:2] for c in chunks) + chunks[-1][2:] == "abcdefghij"


def test_udtf_rejects_bad_params(spark):
    register_udtfs(spark)
    spark.createDataFrame([(1, "abcdef")], "doc_id long, text string").createOrReplaceTempView(
        "udtf_docs2"
    )
    rows = spark.sql(
        "SELECT * FROM udtf_docs2, LATERAL fixed_window_chunks(text, 0, 0) c"
    ).collect()
    assert rows == []  # size<=0 yields nothing rather than crashing


def test_udtf_chunk_properties():
    """Property: chunks tile the text exactly — stride = size-overlap,
    every char covered, no chunk exceeds size (pure-Python check of
    the UDTF kernel)."""
    from hypothesis import given, strategies as st

    @given(
        st.text(min_size=0, max_size=200),
        st.integers(min_value=1, max_value=50),
        st.integers(min_value=0, max_value=49),
    )
    def check(text, size, overlap):
        if overlap >= size:
            return
        rows = list(FixedWindowChunks.func().eval(text, size, overlap))
        if not text:
            assert rows == []
            return
        assert all(len(c) <= size for _, _, c in rows)
        assert [s for _, s, _ in rows] == [
            i * (size - overlap) for i in range(len(rows))
        ]
        # coverage: union of [start, start+len) spans [0, len(text))
        covered = set()
        for _, s, c in rows:
            covered.update(range(s, s + len(c)))
        assert covered == set(range(len(text)))

    check()


def test_polymorphic_udtf_schema_from_args(spark):
    """SplitFixed's analyze() derives the column set from the
    constant parts argument at PLAN time; short rows null-pad and
    the tail folds into the last column."""
    from ai_data_pipeline_spark.operators.udtf_ops import SplitFixed

    spark.udtf.register("split_fixed_t", SplitFixed)
    spark.createDataFrame(
        [("a|b|c|d",), ("x",), (None,)], "line string"
    ).createOrReplaceTempView("poly_v")
    out = spark.sql(
        "SELECT s.* FROM poly_v, LATERAL split_fixed_t(line, '|', 3) s"
    )
    assert [f.name for f in out.schema.fields] == ["part0", "part1", "part2"]
    rows = sorted(
        [tuple(r) for r in out.collect()], key=lambda t: (t[0] is None, t)
    )
    assert rows == [("a", "b", "c|d"), ("x", None, None)]
    wide = spark.sql(
        "SELECT s.* FROM poly_v, LATERAL split_fixed_t(line, '|', 5) s"
    )
    assert len(wide.schema.fields) == 5


def test_polymorphic_udtf_rejects_bad_parts(spark):
    import pytest as _pytest

    from ai_data_pipeline_spark.operators.udtf_ops import SplitFixed

    spark.udtf.register("split_fixed_bad", SplitFixed)
    with _pytest.raises(Exception, match="constant positive int"):
        spark.sql(
            "SELECT * FROM LATERAL split_fixed_bad('a', '|', 0)"
        ).collect()
