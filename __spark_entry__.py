"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``ai_data_pipeline_spark/``; this module is
pure wiring.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ai_data_pipeline_spark.plans import relational


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: revenue by nation (3-way join + agg) at sf0.001."""
    return relational.q03_revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(relational.QUERIES)
    try:
        from ai_data_pipeline_spark.plans import pipeline_queries

        out.update(pipeline_queries.QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable SQL twins for every oracle-expressible query."""
    out: dict[str, str] = {}
    out.update(relational.ORACLE)
    try:
        from ai_data_pipeline_spark.plans import pipeline_queries

        out.update(pipeline_queries.ORACLE)
    except ImportError:
        pass
    return out
