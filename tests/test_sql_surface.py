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
