"""Generate an 8x-scaled copy of the sf0.1 documents/embeddings/
events tables under tmp_scale/ (gitignored) for the scaling probe.

Replication is similarity-preserving-within-replica only: each
replica's texts get a replica token interleaved every 8 words, so
within-replica near-dup structure survives while cross-replica
shingle overlap collapses — the scaled corpus behaves like 8x more
DATA, not 8x more COPIES (copies would turn the near-dup join
quadratic by construction and measure the wrong thing).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ai_data_pipeline_spark.catalog import load_table
from ai_data_pipeline_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tmp_scale")
FACTOR = int(os.environ.get("SCALE_FACTOR", "8"))


def main() -> int:
    spark = get_spark("make-scale-data")
    os.makedirs(DST, exist_ok=True)

    docs = load_table(spark, SRC, "documents")
    reps = spark.range(FACTOR).withColumnRenamed("id", "rep")
    scaled_docs = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            # interleave a replica marker token every 8 words
            F.array_join(
                F.zip_with(
                    F.split(F.col("text"), " "),
                    F.sequence(F.lit(0), F.size(F.split(F.col("text"), " ")) - 1),
                    lambda w, i: F.when(
                        i % 8 == 0, F.concat(F.lit("r"), F.col("rep").cast("string"), F.lit("x"), w)
                    ).otherwise(w),
                ),
                " ",
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    scaled_docs.repartition(32).write.mode("overwrite").parquet(f"{DST}/documents.parquet")

    emb = load_table(spark, SRC, "embeddings")
    scaled_emb = (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
            "label",
            # perturb one component per replica so vectors differ
            F.transform(
                F.col("embedding"),
                lambda x, i: F.when(i == F.col("rep") % 64, x * 0.5).otherwise(x),
            ).alias("embedding"),
        )
    )
    scaled_emb.repartition(32).write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")

    # events.ts ships as TIMESTAMP(NANOS) or timestamp[us] depending on
    # testdata generation — go through normalize_event_time (the dual-
    # encoding contract) and write back a µs timestamp, which
    # load_events handles on read.
    from ai_data_pipeline_spark.catalog import normalize_event_time

    ev = normalize_event_time(load_table(spark, SRC, "events"))
    year_us = F.col("rep") * F.lit(86400 * 365).cast("long") * F.lit(1_000_000).cast("long")
    scaled_ev = ev.crossJoin(F.broadcast(reps)).select(
        (F.col("event_id") + F.col("rep") * 1_000_000_000).alias("event_id"),
        F.timestamp_micros(F.expr("ts_ns div 1000") + year_us).alias("ts"),
        (F.col("user_id") + F.col("rep") * 1_000_000).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    scaled_ev.repartition(32).write.mode("overwrite").parquet(f"{DST}/events.parquet")

    # lineitem scales with disjoint orderkey ranges per replica (same
    # part space, so co-occurrence counts grow linearly with data) —
    # q93's probe needs a scaled fact table, not a pass-through copy
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    scaled_li = li.crossJoin(F.broadcast(reps)).select(
        *[
            (F.col(c) + F.col("rep") * 1_000_000_000).alias(c)
            if c == "l_orderkey"
            else F.col(c)
            for c in li.columns
        ]
    )
    scaled_li.repartition(32).write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")

    # orders scales with the SAME per-replica orderkey offset as
    # lineitem, so orders ⋈ lineitem matches across every replica —
    # a pass-through copy would silently un-scale any probe that joins
    # the two (q187/q196 measured a 1/16th-matching join until r07).
    # Customer keys stay unchanged: same customers, FACTOR× orders
    # each, so distinct-count shapes (q186) keep a constant key space.
    od = spark.read.parquet(f"{SRC}/orders.parquet")
    scaled_od = od.crossJoin(F.broadcast(reps)).select(
        *[
            (F.col(c) + F.col("rep") * 1_000_000_000).alias(c)
            if c == "o_orderkey"
            else F.col(c)
            for c in od.columns
        ]
    )
    scaled_od.repartition(32).write.mode("overwrite").parquet(f"{DST}/orders.parquet")

    # remaining relational tables pass through untouched so load_table works
    for t in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
    print(f"wrote {FACTOR}x tables to {DST}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
