"""Local oracle harness: run a declared query on Spark and DuckDB and
compare canonicalized results, mimicking the driver's t2 gate
(row-count + column set + order-insensitive value comparison).

Used by tests/test_oracle.py so every queries()/oracle_sql() pair is
validated locally before the driver ever sees it.
"""

from __future__ import annotations

import datetime as _dt
import math
from typing import Any

import duckdb

from ai_data_pipeline_spark.catalog import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon_value(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-trip through a fixed decimal rendering: queries already
        # round in-query, this only absorbs repr noise like 0.1+0.2
        return f"{v:.6f}"
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _canon_rows(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    # driver sorts columns by name before hashing — do the same
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        out.append(tuple(_canon_value(row[i]) for i in order))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    """Return a comparison report dict; report["match"] is the verdict."""
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)

    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    report: dict[str, Any] = {
        "spark_rows": len(spark_rows),
        "duck_rows": len(duck_rows),
        "spark_cols": sorted(spark_cols),
        "duck_cols": sorted(duck_cols),
    }
    report["cols_match"] = sorted(spark_cols) == sorted(duck_cols)
    report["count_match"] = len(spark_rows) == len(duck_rows)
    if report["cols_match"] and report["count_match"]:
        s = _canon_rows(spark_rows, spark_cols)
        d = _canon_rows(duck_rows, duck_cols)
        report["values_match"] = s == d
        if not report["values_match"]:
            diffs = [(a, b) for a, b in zip(s, d) if a != b]
            report["first_diffs"] = diffs[:5]
    else:
        report["values_match"] = False
    report["match"] = bool(
        report["cols_match"] and report["count_match"] and report["values_match"]
    )
    return report
