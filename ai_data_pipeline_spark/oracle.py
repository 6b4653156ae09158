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
        # FULL-precision rendering (r05): the driver hashes exact
        # values, so the local gate must too — the float policy
        # guarantees bit-identical doubles, and a query that needs
        # rounding to pass locally is a latent driver red
        return repr(v)
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


def _spark_dtype_class(simple: str) -> str:
    s = simple.lower()
    if s.startswith("array<"):
        return "list"
    if s.startswith(("struct<", "map<")):
        return "nested"
    if s.startswith("decimal"):
        return "decimal"
    if s in ("tinyint", "smallint", "int", "bigint", "long", "integer"):
        return "int"
    if s in ("float", "double"):
        return "float"
    if s.startswith("timestamp"):
        return "ts"
    return {"string": "str", "date": "date", "boolean": "bool", "binary": "bytes"}.get(
        s, f"other:{s}"
    )


def _duck_dtype_class(name: str) -> str:
    s = str(name).upper()
    if s.endswith("[]"):
        return "list"
    if s.startswith(("STRUCT", "MAP")):
        return "nested"
    if s.startswith("DECIMAL"):
        return "decimal"
    if s == "HUGEINT":
        # deliberately its OWN class: DuckDB SUM(int) widens to
        # HUGEINT and the driver's schema gate has tripped on it —
        # the oracle must CAST(... AS BIGINT) explicitly
        return "hugeint"
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if s in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if s.startswith("TIMESTAMP"):
        return "ts"
    return {"VARCHAR": "str", "DATE": "date", "BOOLEAN": "bool", "BLOB": "bytes"}.get(
        s, f"other:{s}"
    )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    """Return a comparison report dict; report["match"] is the verdict."""
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)
    spark_types = {
        f.name: _spark_dtype_class(f.dataType.simpleString())
        for f in spark_df.schema.fields
    }

    rel = con.sql(sql)
    duck_cols = list(rel.columns)
    duck_types = {
        c: _duck_dtype_class(t) for c, t in zip(rel.columns, rel.types)
    }
    duck_rows = rel.fetchall()

    report: dict[str, Any] = {
        "spark_rows": len(spark_rows),
        "duck_rows": len(duck_rows),
        "spark_cols": sorted(spark_cols),
        "duck_cols": sorted(duck_cols),
    }
    report["cols_match"] = sorted(spark_cols) == sorted(duck_cols)
    # coarse dtype classes per shared column: catches int-vs-double,
    # HUGEINT-uncast, string-vs-ts drifts the value canon can mask
    # locally but the driver's schema gate rejects
    dtype_mismatch = {
        c: (spark_types[c], duck_types[c])
        for c in set(spark_cols) & set(duck_cols)
        if spark_types[c] != duck_types[c]
    }
    report["dtype_mismatch"] = dtype_mismatch
    report["dtypes_match"] = not dtype_mismatch
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
        report["cols_match"]
        and report["dtypes_match"]
        and report["count_match"]
        and report["values_match"]
    )
    return report
