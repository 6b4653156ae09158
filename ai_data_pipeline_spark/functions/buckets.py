"""Integer log2 bucket ladders — the cross-engine-safe histogram
bucketing primitive.

``floor(log2(x))`` computed through doubles can disagree between
engines by one ulp near exact powers of two; a generated integer CASE
ladder (x < 2^k comparisons) cannot. Shared by the Zipf/fluency/
degree/novelty/latency histogram queries in both plan modules.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def log2_bucket_case(col: Column | str, max_pow: int = 40) -> Column:
    """floor(log2(x)) for x ≥ 1 as an integer CASE ladder (long)."""
    c = F.col(col) if isinstance(col, str) else col
    expr = F.lit(max_pow)
    for k in range(max_pow, 0, -1):
        expr = F.when(c < F.lit(1 << k), k - 1).otherwise(expr)
    return expr.cast("long")


def sql_log2_bucket_case(col: str, max_pow: int = 40) -> str:
    """DuckDB twin of :func:`log2_bucket_case` (identical boundaries)."""
    clauses = " ".join(
        f"WHEN {col} < {1 << k} THEN {k - 1}" for k in range(1, max_pow + 1)
    )
    return f"CAST(CASE {clauses} ELSE {max_pow} END AS BIGINT)"
