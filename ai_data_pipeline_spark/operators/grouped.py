"""Grouped-map operators (``applyInPandas``): per-group pandas
kernels for logic that needs the whole group in memory at once —
the batch UDAF/UDTF-style seam of the UDF surface (SURVEY §2B).

Use sparingly: a grouped-map materializes each group as ONE pandas
frame on ONE executor, so groups must individually fit in memory
(fine for per-source / per-user groups; wrong for a single giant
group — pre-aggregate or window instead). Everything expressible as
built-in window/agg functions should stay JVM-side; this seam is for
genuinely imperative per-group logic (model scoring per group,
complex resampling, library calls).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType


def group_min_max_normalize(
    df: DataFrame,
    group_cols: Iterable[str],
    value_col: str,
    out_col: str = "norm",
) -> DataFrame:
    """Append ``out_col`` = (x - min) / (max - min) within each group
    (0.0 for constant groups). Arithmetic is a single IEEE division
    of exact integer-valued doubles, so results are bit-identical to
    the SQL window formulation — the q51 oracle hash-checks this
    whole applyInPandas path against DuckDB.

    Scale: one shuffle on the group key; each group processed as one
    Arrow batch. The same result is expressible as two window
    functions (min/max over the group) — prefer that form when the
    kernel is this simple; this operator exists to pin the
    grouped-map plumbing with an exactly-checkable kernel.
    """
    group_cols = list(group_cols)
    schema = StructType(df.schema.fields + [StructField(out_col, DoubleType())])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf[value_col].min(), pdf[value_col].max()
        if hi == lo:
            pdf[out_col] = 0.0
        else:
            pdf[out_col] = (pdf[value_col] - lo) / float(hi - lo)
        return pdf

    return df.groupBy(*group_cols).applyInPandas(kernel, schema)
