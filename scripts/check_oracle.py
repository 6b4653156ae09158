"""Quick local gate: run every declared query against the duckdb
oracle at a small SF and print a one-line verdict per query.

Usage: python scripts/check_oracle.py [sf_dir] [query_name ...]

Set SPARK_GRAFT_VANILLA=1 to run under a BARE SparkSession (no
engine confs) — exactly the session the grading driver builds. Any
query green under get_spark() but red here depends on a session conf
it should be setting at runtime (the events-encoding class of bug).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from ai_data_pipeline_spark.oracle import compare, duckdb_connection
from ai_data_pipeline_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    if os.environ.get("SPARK_GRAFT_VANILLA"):
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("oracle-check-vanilla")
            .getOrCreate()
        )
    else:
        spark = get_spark("oracle-check")
    con = duckdb_connection(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                n = df.count()
                print(f"  {name:<36} rows-only  rows={n}  {time.time()-t0:.1f}s")
                continue
            rep = compare(df, con, oracles[name])
            ok = "OK " if rep["match"] else "FAIL"
            print(
                f"{ok} {name:<36} rows={rep['spark_rows']}/{rep['duck_rows']} "
                f"cols={rep['cols_match']} vals={rep['values_match']}  {time.time()-t0:.1f}s"
            )
            if not rep["match"]:
                failed.append(name)
                print("     spark cols:", rep["spark_cols"])
                print("     duck  cols:", rep["duck_cols"])
                for a, b in rep.get("first_diffs", []):
                    print("     spark:", a)
                    print("     duck :", b)
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"ERR  {name:<36} {type(exc).__name__}: {exc}")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
