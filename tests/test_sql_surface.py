"""Spark SQL as the query language (SURVEY §7: no bespoke parser —
``spark.sql`` over registered views IS the SQL entry point). Proves
the declared tables are queryable by name and that a SQL text query
and the DataFrame plan produce identical results.
"""

from ai_data_pipeline_spark.catalog import TABLE_NAMES, register_views
from ai_data_pipeline_spark.plans import relational as R
from tests.conftest import SF_SMOKE


def test_register_views_all_tables(spark):
    register_views(spark, SF_SMOKE)
    for name in TABLE_NAMES:
        assert spark.sql(f"SELECT * FROM {name} LIMIT 1").count() >= 0


def test_sql_text_matches_dataframe_plan(spark):
    register_views(spark, SF_SMOKE)
    sql_rows = spark.sql(
        """
        SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
        """
    ).collect()
    from pyspark.sql import functions as F

    c = spark.table("customer")
    n = spark.table("nation")
    df_rows = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("n_name")
        .collect()
    )
    assert [tuple(r) for r in sql_rows] == [tuple(r) for r in df_rows]


def test_null_safe_equality(spark):
    """<=> (eqNullSafe): NULL <=> NULL is TRUE, NULL <=> x is FALSE —
    the §2B null-safe predicate claim, DataFrame and SQL forms."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, None), (2, "a"), (3, None), (4, "b")], "id long, v string"
    )
    got = {r["id"] for r in df.filter(F.col("v").eqNullSafe(F.lit(None))).collect()}
    assert got == {1, 3}
    df.createOrReplaceTempView("nulleq_t")
    got_sql = {
        r["id"] for r in spark.sql("SELECT id FROM nulleq_t WHERE v <=> NULL").collect()
    }
    assert got_sql == {1, 3}
    assert spark.sql("SELECT NULL <=> NULL AS x").first()["x"] is True


def test_bag_semantics_set_ops(spark):
    """intersectAll/exceptAll keep multiplicities (q15 covers the
    set-semantics forms)."""
    a = spark.createDataFrame([(1,), (1,), (2,), (3,)], "x long")
    b = spark.createDataFrame([(1,), (2,), (2,)], "x long")
    assert sorted(r["x"] for r in a.intersectAll(b).collect()) == [1, 2]
    assert sorted(r["x"] for r in a.exceptAll(b).collect()) == [1, 3]


def test_percentile_approx_error_bound(spark):
    """percentile_approx must land within the declared accuracy of
    the exact discrete percentile (engine-specific sketch — bounded
    here, excluded from oracle queries like approx_count_distinct)."""
    from pyspark.sql import functions as F
    from ai_data_pipeline_spark.catalog import load_table

    o = load_table(spark, SF_SMOKE, "orders")
    row = o.agg(
        F.percentile_approx("o_totalprice", 0.5, 1000).alias("approx"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
    ).first()
    assert abs(row["approx"] - row["exact"]) <= 0.02 * abs(row["exact"])


def test_plain_python_udf_surface(spark):
    """Row-at-a-time Python UDF: supported (§2B UDF surface) but the
    slow path — engine hot paths use built-ins / Arrow-batched
    pandas UDFs instead. Registered both for DataFrame and SQL use."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType

    @F.udf(IntegerType())
    def vowels(s):
        return sum(1 for ch in (s or "") if ch in "aeiou") if s is not None else None

    df = spark.createDataFrame([("spark",), ("engine",), (None,)], "w string")
    got = [r["n"] for r in df.select(vowels("w").alias("n")).collect()]
    assert got == [1, 3, None]
    spark.udf.register("vowels_sql", vowels)
    assert spark.sql("SELECT vowels_sql('aequeous') AS n").first()["n"] == 6


def test_sql_udf_library_matches_dataframe_forms(spark):
    """functions/sql_udfs.py: every SQL-defined function agrees with
    the DataFrame expression it mirrors, on real corpus text."""
    from pyspark.sql import functions as F

    from ai_data_pipeline_spark.catalog import load_table
    from ai_data_pipeline_spark.functions import text as T
    from ai_data_pipeline_spark.functions import vector as V
    from ai_data_pipeline_spark.functions.sql_udfs import register_sql_functions
    from ai_data_pipeline_spark.operators.dedup import md5_hash60

    names = register_sql_functions(spark)
    assert "vec_cosine" in names and "word_ngrams" in names

    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    docs.createOrReplaceTempView("sqludf_docs")
    got = spark.sql(
        """
        SELECT doc_id,
               norm_text(text)            AS nt,
               token_count_ws(text)       AS tc,
               token_count_bpe(text)      AS tb,
               word_ngrams(text, 3)       AS g3,
               md5h60(text, 7)            AS h7
        FROM sqludf_docs
        """
    )
    want = docs.select(
        "doc_id",
        T.normalized_text("text").alias("nt"),
        T.token_count_ws("text").alias("tc"),
        T.token_count_bpe_ish("text").alias("tb"),
        T.word_ngrams("text", 3).alias("g3"),
        md5_hash60(F.col("text"), 7).alias("h7"),
    )
    assert got.exceptAll(want).union(want.exceptAll(got)).count() == 0

    # cast to array<double> on BOTH sides: the SQL UDF signature is
    # ARRAY<DOUBLE> (implicit float→double cast at the call), so the
    # DataFrame twin must fold in double too for bit-identity
    emb = (
        load_table(spark, SF_SMOKE, "embeddings")
        .limit(20)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    emb.createOrReplaceTempView("sqludf_emb")
    pairs_sql = spark.sql(
        """
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               vec_dot(a.embedding, b.embedding)    AS d,
               vec_l2sq(a.embedding, b.embedding)   AS l2,
               vec_cosine(a.embedding, b.embedding) AS cs
        FROM sqludf_emb a JOIN sqludf_emb b ON a.vec_id < b.vec_id
        """
    )
    pairs_df = (
        emb.alias("a")
        .join(emb.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            V.dot("a.embedding", "b.embedding").alias("d"),
            V.squared_l2("a.embedding", "b.embedding").alias("l2"),
            V.cosine("a.embedding", "b.embedding").alias("cs"),
        )
    )
    assert pairs_sql.exceptAll(pairs_df).union(pairs_df.exceptAll(pairs_sql)).count() == 0
