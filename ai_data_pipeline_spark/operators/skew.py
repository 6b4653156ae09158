"""Skew-mitigation recipes for 100 TB joins and aggregations.

AQE's skew-join splitting (on in session.py) handles most sort-merge
skew transparently; these are the explicit recipes for when a single
hot key still dominates — e.g. joining a clickstream against a user
table where one bot user is 10% of all rows, or counting by a key
with a power-law head.

Salting changes DISTRIBUTION only, never results: the big side gets
a pseudo-random salt per ROW (splitting one hot key across S
partitions); the small side is replicated S× with every salt value so
each split still finds its match. Join output is exactly the plain
join's output; the salt columns never escape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with an S-way salt on the key.

    big: the skewed fact side — each row gets salt = xxhash64(all
    columns) % S (content-derived: deterministic for a given row, no
    rand() → retries/speculative tasks see the same salt).
    small: replicated S× via explode (keep it broadcast-small; S×|small|
    rows shuffle otherwise).
    """
    sb = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salts))
    )
    ss = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)).cast("array<bigint>"))
    )
    out = sb.join(ss, [on, "_salt"], how)
    return out.drop("_salt")


def salted_count(
    df: DataFrame,
    key: str,
    salts: int = 8,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase count for a power-law key: partial count on
    (key, salt) — map-side combine already bounds this, but the salt
    also splits the single hot REDUCE partition — then final sum on
    key. Output: [<key>, n].

    salt_cols: columns the content-derived salt hashes (default: all
    of df's columns). They must VARY WITHIN a key, or every row of a
    hot key gets the same salt and the (key, salt) partial collapses
    back to the plain GROUP BY — e.g. df.select(key) alone is
    degenerate. Pass the frame with a row-varying column (an id, a
    timestamp) included, or name such columns here explicitly.
    """
    cols = salt_cols if salt_cols is not None else df.columns
    if set(cols) <= {key}:
        raise ValueError(
            "salted_count salt must hash a column that varies within "
            f"the key; got salt_cols={cols!r} == key only (degenerate: "
            "one salt per key, no hot-partition split)"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_pn"))
    )
    return partial.groupBy(key).agg(F.sum("_pn").alias("n"))
