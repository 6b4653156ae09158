"""Embedding transform (R15): pandas-UDF plumbing + encoder seam.

Reference semantics: `rag_chatbot/main.py:20-23` — corpus texts →
float vector matrix, row i ↔ text i. Here the identity is carried by
the row (doc_id), not position, and the encoder is pluggable.
"""

import math

import pytest

from pyspark.sql import functions as F

from ai_data_pipeline_spark.operators.embedding import (
    EMBED_DIM_DEFAULT,
    embed_text,
    fake_text_encoder,
)


def test_fake_encoder_deterministic_and_bounded():
    v1 = fake_text_encoder(["hello", "world"])
    v2 = fake_text_encoder(["hello", "world"])
    assert v1 == v2
    assert len(v1[0]) == EMBED_DIM_DEFAULT
    assert all(-1.0 <= x < 1.0 for v in v1 for x in v)
    assert v1[0] != v1[1]


def test_fake_encoder_dim_not_multiple_of_16():
    (v,) = fake_text_encoder(["x"], dim=20)
    assert len(v) == 20
    # first 16 components come from chunk 0, rest from chunk 1
    assert v[:16] == fake_text_encoder(["x"], dim=16)[0]


def test_embed_text_matches_local_encoder(spark):
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, None)], "id long, txt string"
    )
    rows = {r["id"]: r["e"] for r in embed_text(df, "txt", "e").collect()}
    assert rows[1] == pytest.approx(fake_text_encoder(["alpha"])[0], abs=0.0)
    assert rows[2] == pytest.approx(fake_text_encoder(["beta"])[0], abs=0.0)
    # nulls encode as empty string, not as null/crash
    assert rows[3] == pytest.approx(fake_text_encoder([""])[0], abs=0.0)


def test_embed_text_requires_encoder(spark):
    df = spark.createDataFrame([(1, "a")], "id long, txt string")
    with pytest.raises(NotImplementedError):
        embed_text(df, "txt", encoder=None)


def test_embed_then_knn_is_self_nearest(spark):
    texts = [(i, f"document number {i}") for i in range(8)]
    df = spark.createDataFrame(texts, "id long, txt string")
    emb = embed_text(df, "txt")
    from ai_data_pipeline_spark.functions.vector import array_lit, cosine

    q = fake_text_encoder(["document number 3"])[0]
    top = (
        emb.withColumn("cos", cosine(F.col("embedding"), array_lit(q), EMBED_DIM_DEFAULT))
        .orderBy(F.desc("cos"))
        .first()
    )
    assert top["id"] == 3
    assert math.isclose(top["cos"], 1.0, abs_tol=1e-12)


def test_streaming_embed_upsert_pipeline(spark, tmp_path):
    """EP2 as a stream: documents arrive incrementally → pandas-UDF
    embedding → foreachBatch keyed upsert. Re-delivered doc_ids do
    not duplicate or overwrite — the incremental embedding-table
    build a production corpus needs."""
    import json as _json

    from ai_data_pipeline_spark.sources.sinks import foreach_batch_upsert

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out = str(tmp_path / "emb")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema("doc_id long, text string").json(str(in_dir))
    emb = embed_text(stream, "text")
    q = foreach_batch_upsert(emb, out, ckpt, ["doc_id"]).start()
    try:
        (in_dir / "b1.json").write_text(
            "\n".join(_json.dumps({"doc_id": i, "text": f"doc {i}"}) for i in (1, 2))
        )
        q.processAllAvailable()
        (in_dir / "b2.json").write_text(
            "\n".join(
                _json.dumps(r)
                for r in [{"doc_id": 2, "text": "CHANGED"}, {"doc_id": 3, "text": "doc 3"}]
            )
        )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["doc_id"]: r["embedding"] for r in spark.read.parquet(out).collect()}
    assert set(rows) == {1, 2, 3}
    # doc 2 kept its first embedding (keyed upsert, not overwrite)
    assert rows[2] == fake_text_encoder(["doc 2"])[0]
    assert rows[3] == fake_text_encoder(["doc 3"])[0]


def test_ep2_ep3_full_rag_loop(spark, tmp_path):
    """EP2+EP3 end-to-end (rag_chatbot/main.py:8-47 as DataFrames):
    JSONL Q&A corpus → project → embed questions → materialized
    embedding table → 1-NN retrieval with threshold rejection. A
    matching question returns its answer; a garbage query hits the
    sentinel."""
    import json as _json

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ai_data_pipeline_spark.operators.similarity import (
        knn_l2_with_threshold,
        queries_df,
    )
    from ai_data_pipeline_spark.sources.readers import read_jsonl

    corpus_path = tmp_path / "training.jsonl"
    qa = [
        {"question": "what is spark", "answer": "a distributed engine",
         "source_file": "a.pdf", "window_index": 1, "subchunk_index": 1},
        {"question": "what is parquet", "answer": "a columnar format",
         "source_file": "a.pdf", "window_index": 1, "subchunk_index": 2},
    ]
    corpus_path.write_text("\n".join(_json.dumps(r) for r in qa))

    # EP2: read → project → embed → materialize
    emb_path = str(tmp_path / "emb")
    corpus = read_jsonl(spark, str(corpus_path)).select("question", "answer")
    embed_text(corpus, "question").write.parquet(emb_path)
    table = (
        spark.read.parquet(emb_path)
        .withColumn(
            "vec_id", F.row_number().over(Window.orderBy("question")).cast("long")
        )
    )

    # EP3: embed the user query the same way, 1-NN + rejection
    good_q = fake_text_encoder(["what is spark"])[0]
    bad_q = fake_text_encoder(["completely unrelated gibberish zzz"])[0]
    out = knn_l2_with_threshold(
        table,
        queries_df(spark, [good_q, bad_q]),
        threshold=1.0,
        sentinel="I don't have information on that subject.",
        answer_col="answer",
    ).orderBy("qid").collect()
    assert out[0]["accepted"] and out[0]["answer"] == "a distributed engine"
    assert not out[1]["accepted"]
    assert out[1]["answer"] == "I don't have information on that subject."


def test_sql_embed_components_bitexact_with_python_encoder():
    """The DuckDB twin of fake_text_encoder must reproduce the Python
    doubles BIT-FOR-BIT (the q62 full-precision lesson: a 1-ulp input
    drift is invisible behind thresholds but breaks raw-cosine
    parity). Pure DuckDB — no Spark job."""
    import duckdb

    from ai_data_pipeline_spark.operators.embedding import (
        EMBED_DIM_DEFAULT,
        fake_text_encoder,
        sql_embed_components,
    )

    texts = ["hello world", "", "Sparse GRAFT r05 ✓ unicode", "a" * 500]
    con = duckdb.connect()
    expr = sql_embed_components("t", EMBED_DIM_DEFAULT)
    for text in texts:
        con.execute("CREATE OR REPLACE TABLE one AS SELECT ? AS t", [text])
        got = con.execute(f"SELECT {expr} FROM one").fetchone()[0]
        want = [float(x) for x in fake_text_encoder([text])[0]]
        assert [float(g) for g in got] == want, text[:30]


def test_sql_lit_list_roundtrips_doubles_bitexact():
    """sql_lit_list must produce TRUE doubles in DuckDB — bare
    numeric literals parse as DECIMAL whose internal DOUBLE cast is
    not correctly rounded for high-scale values."""
    import duckdb

    from ai_data_pipeline_spark.functions.vector import sql_lit_list

    vals = [0.12156862745098039, -0.9921568627450981, 1e-17, -3.0, 0.1]
    got = duckdb.connect().execute(f"SELECT {sql_lit_list(vals)}").fetchone()[0]
    assert [float(g) for g in got] == vals
    # and the elements are DOUBLE, not DECIMAL
    t = duckdb.connect().sql(f"SELECT {sql_lit_list(vals)} AS l").types[0]
    assert str(t) == "DOUBLE[]"
