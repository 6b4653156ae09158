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
