"""Round-13 pins: q317's cross-cell upsert move + emptied-cell drop,
q318's carry-forward / touched re-contraction / merge-to-global-min
semantics, q319's metadata-only schema evolution."""

from __future__ import annotations

import numpy as np

from ai_data_pipeline_spark.plans import frontier5_queries as F5
from ai_data_pipeline_spark.plans.constants import Q28_CENTROIDS


def test_q317_cross_cell_move_and_emptied_cell(spark, tmp_path):
    """An update whose re-embedded vector assigns to a DIFFERENT
    cell must move across partitions, and a cell emptied by the
    merge (its only rows updated-away/deleted) must have its
    directory dropped. Fixture (u40 % 19): id 2 → update, id 7 →
    delete, id 3 → insert-source; ids 0,1,4,5 survivors. ids 2,7
    sit alone in cell 0 (near centroid 0; the negation of a
    cell-0 vector assigns to cell 2), the rest near centroid 1."""
    c0 = np.array(Q28_CENTROIDS[0], dtype=np.float64)
    c1 = np.array(Q28_CENTROIDS[1], dtype=np.float64)
    rows = []
    for vid in (2, 7):  # update / delete — alone in cell 0
        rows.append((vid, [float(x) for x in (c0 + 0.001 * (vid + 1))]))
    for vid in (0, 1, 3, 4, 5):  # survivors + the insert source, cell 1
        rows.append((vid, [float(x) for x in (c1 + 0.001 * (vid + 1))]))
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "embeddings.parquet"))

    out = F5.q317_store_upsert_merge(spark, str(tmp_path)).collect()
    r0 = out[0]
    # final store: 0,1,3,4,5 (cell 1) + updated 2 (moved to cell 2)
    # + inserted 1000003 (cell of -v(3)); id 7 gone.
    assert r0["n_rows"] == 7
    assert (r0["n_upserts"], r0["n_deletes"], r0["n_inserts"]) == (1, 1, 1)
    # affected = old cell {0} of ids 2/7 ∪ new cells of the two
    # incoming vectors (≠ 0 and ≠ each other's source cells is not
    # guaranteed, but 0 is emptied so ≥ 2 distinct non-zero cells
    # would make 3; pin the exact value computed from geometry).
    neg2_cell = int(
        np.argmin([((-(c0 + 0.001 * 3)) - np.array(c)) @ ((-(c0 + 0.001 * 3)) - np.array(c)) for c in Q28_CENTROIDS])
    )
    neg3_cell = int(
        np.argmin([((-(c1 + 0.001 * 4)) - np.array(c)) @ ((-(c1 + 0.001 * 4)) - np.array(c)) for c in Q28_CENTROIDS])
    )
    assert r0["n_cells_rewritten"] == len({0, neg2_cell, neg3_cell})
    returned = {r["vec_id"] for r in out}
    assert 7 not in returned  # deleted id never served
    assert returned <= {0, 1, 2, 3, 4, 5, 1_000_003}


def test_q318_carry_forward_and_touched(spark, tmp_path):
    """Untouched components carry their labels forward; components
    contacted by a batch doc are re-contracted (labels stay the
    min member id); singleton docs never enter the store."""
    t1 = "alpha beta gamma delta epsilon zeta"
    t2 = "one two three four five six"
    t4 = "red green blue cyan magenta yellow"
    rows = [
        (10, t1, "en", "src1", len(t1)),
        (30, t1, "en", "src2", len(t1)),
        (11, t2, "en", "src1", len(t2)),
        (31, t2, "en", "src2", len(t2)),
        (13, t4, "en", "src3", len(t4)),
        (33, t4, "en", "src4", len(t4)),
        (12, "lonely words with no duplicate partner here", "en", "src5", 44),
        (20, t1, "en", "src0", len(t1)),  # batch — touches comp 10
        (40, t2, "en", "src0", len(t2)),  # batch — touches comp 11
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {r["source"]: r for r in
           F5.q318_incremental_cluster_labels(spark, str(tmp_path)).collect()}
    # store v1: comps {10,30}, {11,31}, {13,33}; batch touches 2 of 3
    any_row = next(iter(out.values()))
    assert any_row["n_components_before"] == 3
    assert any_row["n_touched_components"] == 2
    assert "src5" not in out  # singleton never enters the store
    assert (out["src0"]["n_docs"], out["src0"]["n_clusters"]) == (2, 2)
    assert (out["src1"]["n_docs"], out["src1"]["n_clusters"]) == (2, 2)
    assert (out["src3"]["n_docs"], out["src3"]["n_clusters"]) == (1, 1)
    assert (out["src4"]["n_docs"], out["src4"]["n_clusters"]) == (1, 1)


def test_q318_batch_merge_gets_global_min(spark, tmp_path, monkeypatch):
    """A batch doc bridging TWO history components merges them, and
    the merged label is the GLOBAL min member — exactly what the
    from-scratch contraction would produce (the equivalence
    theorem's crux). tau lowered so a concat-doc bridges."""
    monkeypatch.setattr(F5, "_Q318_TAU_F", 0.4)
    t5 = "a b c d e f g h i j k l"
    t6 = "m n o p q r s t u v w x"
    bridge = t5 + " " + t6
    rows = [
        (14, t5, "en", "src1", len(t5)),
        (34, t5, "en", "src2", len(t5)),
        (15, t6, "en", "src1", len(t6)),
        (35, t6, "en", "src2", len(t6)),
        (60, bridge, "en", "src0", len(bridge)),  # batch bridge
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {r["source"]: r for r in
           F5.q318_incremental_cluster_labels(spark, str(tmp_path)).collect()}
    any_row = next(iter(out.values()))
    assert any_row["n_components_before"] == 2
    assert any_row["n_touched_components"] == 2
    # all five docs collapse into ONE component labeled min=14
    assert out["src0"]["n_clusters"] == 1
    assert out["src1"]["n_clusters"] == 1
    assert out["src2"]["n_clusters"] == 1


def test_q319_v1_files_untouched_and_schemas(spark, tmp_path):
    """Schema evolution must be metadata-only: after the evolved
    append, every v1 physical file survives at the same path with
    the same size; a v1-pinned reader sees the OLD schema (no
    quality column), a mergeSchema reader sees null-padded
    history."""
    import os

    from pyspark.sql import functions as F

    path = str(tmp_path / "store")
    v1 = spark.range(40).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 2).alias("n_tokens"),
        F.pmod("id", F.lit(4)).cast("int").alias("shard"),
    )
    v1.repartition("shard").write.mode("overwrite").partitionBy("shard").parquet(path)

    def file_stats():
        out = {}
        for root, _, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = os.path.getsize(p)
        return out

    before = file_stats()
    delta = spark.range(40, 60).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 2).alias("n_tokens"),
        (F.col("id") * 7).alias("quality"),
        F.pmod("id", F.lit(4)).cast("int").alias("shard"),
    )
    delta.repartition("shard").write.mode("append").partitionBy("shard").parquet(path)
    after = file_stats()
    for p, sz in before.items():
        assert after.get(p) == sz  # same path, same bytes
    assert len(after) > len(before)

    v1_files = sorted(before)
    v1r = spark.read.option("basePath", path).parquet(*v1_files)
    assert "quality" not in v1r.columns
    v2r = spark.read.option("mergeSchema", "true").option("basePath", path).parquet(path)
    assert "quality" in v2r.columns
    nulls = v2r.agg(
        F.sum(F.col("quality").isNull().cast("int")).alias("n_null"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert (int(nulls["n_null"]), int(nulls["n"])) == (40, 60)


def test_q320_encode_matches_python_twin(spark, tmp_path):
    """The padded-replace merge chain must reproduce exact BPE
    apply semantics (in-order, left-to-right non-overlapping, each
    merge over the current symbol stream) — pinned against a
    pure-Python applier on words exercising chained merges
    ('customer' needs 6 dependent merges, 'batch' 4) and the
    codepoint fallback ('xyz')."""
    import hashlib

    def py_encode(word):
        syms = list(word)
        for k, (a, b) in enumerate(F5._Q320_MERGES):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        ids = {a + b: 256 + k for k, (a, b) in enumerate(F5._Q320_MERGES)}
        return [ids[s] if s in ids else ord(s) for s in syms]

    text = "customer batch xyz scanning"
    rows = [(1, text, "en", "srcA", len(text))]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = F5.q320_bpe_encode_fixed_vocab(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    expect_ids = [i for w in text.split() for i in py_encode(w)]
    assert py_encode("customer") == [256 + 29]
    assert py_encode("batch") == [256 + 18]
    assert py_encode("xyz") == [120, 121, 122]
    assert r["n_words"] == 4
    assert r["n_tokens"] == len(expect_ids)
    seq = ",".join(str(i) for i in expect_ids)
    expect_xor = int(hashlib.md5(f"1:{seq}".encode()).hexdigest()[:15], 16)
    assert r["seq_xor"] == expect_xor


def test_q323_stream_matches_batch_merge(spark, tmp_path):
    """The 3-micro-batch CDC replay must land exactly on q317's
    one-shot merge — including the cross-cell move and the
    emptied-cell drop (q317's fixture replayed through the
    stream)."""
    c0 = np.array(Q28_CENTROIDS[0], dtype=np.float64)
    c1 = np.array(Q28_CENTROIDS[1], dtype=np.float64)
    rows = []
    for vid in (2, 7):
        rows.append((vid, [float(x) for x in (c0 + 0.001 * (vid + 1))]))
    for vid in (0, 1, 3, 4, 5):
        rows.append((vid, [float(x) for x in (c1 + 0.001 * (vid + 1))]))
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "embeddings.parquet"))

    batch = [r.asDict() for r in
             F5.q317_store_upsert_merge(spark, str(tmp_path)).collect()]
    stream = [r.asDict() for r in
              F5.q323_streaming_cdc_upserts(spark, str(tmp_path)).collect()]
    assert batch == stream


def test_q324_mor_deletes_match_python_truth(spark, tmp_path):
    """Deletion-vector semantics pinned against a pure-Python twin:
    per-cell regimes (clean / kept-DV / materialized at the
    5·n_del ≥ n_rows threshold), live count, the MOR digest, its
    equality with the post-materialization digest (deferred ≡
    eager), and no deleted id ever served. The in-path MOR check
    (DV write touches no data file) and the unflagged-cells-
    untouched check raise inside the query itself."""
    import hashlib

    rows = []
    for c in (0, 1, 2):
        cv = np.array(Q28_CENTROIDS[c], dtype=np.float64)
        for i in range(10):
            vid = c * 100 + i
            rows.append((vid, [float(x) for x in (cv + 0.001 * (i + 1))]))
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "embeddings.parquet"))

    def u40(vid):
        return int(hashlib.md5(str(vid).encode()).hexdigest()[:10], 16)

    truth = {}  # vid -> (cell, deleted)
    for c in (0, 1, 2):
        for i in range(10):
            vid = c * 100 + i
            truth[vid] = (c, u40(vid) % 7 < c % 3)
    per_cell = {c: [v for v, (cc, _) in truth.items() if cc == c] for c in (0, 1, 2)}
    dels = {c: sum(1 for v in per_cell[c] if truth[v][1]) for c in per_cell}
    flagged = {c for c in per_cell if dels[c] > 0 and 5 * dels[c] >= len(per_cell[c])}
    kept = {c for c in per_cell if dels[c] > 0 and c not in flagged}
    clean = {c for c in per_cell if dels[c] == 0}
    live = [v for v, (_, d) in truth.items() if not d]
    xor = 0
    for v in live:
        xor ^= int(hashlib.md5(f"{v}:{truth[v][0]}".encode()).hexdigest()[:15], 16)

    out = F5.q324_deletion_vectors(spark, str(tmp_path)).collect()
    r0 = out[0]
    assert r0["n_live"] == len(live) == r0["n_live_compacted"]
    assert r0["n_deleted"] == sum(dels.values())
    assert r0["n_cells_materialized"] == len(flagged)
    assert r0["n_cells_kept_dv"] == len(kept)
    assert r0["n_cells_clean"] == len(clean)
    assert r0["content_xor_mor"] == xor == r0["content_xor_compacted"]
    served = {r["vec_id"] for r in out}
    assert served <= set(live)


def test_q325_zonemap_prunes_and_loses_nothing(spark, tmp_path):
    """Zone-map pruning pinned against a pure-Python twin: with
    dense ids 0..159 and 16-way range bucketing, bucket = id//10;
    the middle-decile band [71, 87] overlaps exactly files 7 and 8,
    and the pruned aggregate must equal the full-scan aggregate."""
    import hashlib

    rows = [(i, f"s{i % 4}", 10 + i, "t") for i in range(160)]
    spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = F5.q325_zonemap_skipping(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    lo, hi = 0 + (45 * 159) // 100, 0 + (55 * 159) // 100
    assert (lo, hi) == (71, 87)
    band = list(range(71, 88))
    xor = 0
    for i in band:
        xor ^= int(
            hashlib.md5(f"{i}:s{i % 4}:{10 + i}".encode()).hexdigest()[:15], 16
        )
    assert r["n_files_total"] == 16
    assert r["n_files_read"] == 2  # buckets 7 (70..79) and 8 (80..89)
    assert r["n_files_pruned"] == 14
    assert r["n_rows_matched"] == len(band) == r["n_rows_full"]
    assert r["sum_chars"] == sum(10 + i for i in band)
    assert r["content_xor"] == xor == r["content_xor_full"]
