"""Fixture pins for plans/frontier3_queries.py (q282+).

The r09-advice rule: any branch the graded corpora cannot exercise
gets a fixture test against a pure-Python twin. The graded documents
are single-line pure-ASCII with near-dup structure but no homoglyphs
and (possibly) no Hamming-1..3 image pairs — these tests pin:

- q282's admission POLICY (a batch doc whose within-batch cluster
  keeper was itself dropped against history stays dropped);
- q283's overlap accounting (realized merges != occurrence count on
  "aaa" chains — the classic naive-BPE off-by-one);
- q284's Hamming-1..3 near-dup branch (a token substitution perturbs
  only the grid cells that token feeds);
- q286's non-Latin script classes and mixed-token homoglyph flag.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _dhash60_py(text: str) -> int:
    """Pure-Python twin of frontier3_queries.dhash60 (6×11 grid,
    md5-byte luminance of token[(k mod n)] salted with k, 60 bits of
    row-wise adjacent comparisons)."""
    toks = text.split()
    n = len(toks)
    lums = []
    for k in range(66):
        tok = toks[k % n] if n else ""
        lums.append(int(hashlib.md5(f"{tok}:{k}".encode()).hexdigest()[:2], 16))
    fp = 0
    for i in range(60):
        r, c = divmod(i, 10)
        if lums[r * 11 + c + 1] > lums[r * 11 + c]:
            fp |= 1 << i
    return fp


def test_q284_dhash_matches_python_twin(spark, tmp_path):
    from ai_data_pipeline_spark.plans.frontier3_queries import dhash60

    texts = [
        " ".join(f"w{j}" for j in range(70)),
        "single",
        "two words",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    got = {
        r["id"]: r["fp"]
        for r in df.select("id", dhash60(F.col("text")).alias("fp")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _dhash60_py(t), f"text {i!r}"


def test_q284_neardup_branch_fixture(spark, tmp_path):
    """A one-token substitution in a 70-token doc perturbs only the
    cells that token feeds — Hamming lands in 1..3 and the pair is
    found by the segment blocking (recall-exact for ≤ 3), clustering
    the two docs; an unrelated doc stays unclustered."""
    from ai_data_pipeline_spark.plans import frontier3_queries as F3

    base = [f"w{j}" for j in range(70)]
    sub = list(base)
    sub[30] = "SUBSTITUTED"
    other = [f"z{j}" for j in range(70)]
    texts = {0: " ".join(base), 1: " ".join(sub), 2: " ".join(other)}
    ham01 = bin(_dhash60_py(texts[0]) ^ _dhash60_py(texts[1])).count("1")
    ham02 = bin(_dhash60_py(texts[0]) ^ _dhash60_py(texts[2])).count("1")
    assert 1 <= ham01 <= 3, ham01  # the fixture's premise, via the twin
    assert ham02 > 3, ham02
    rows = [(i, t, "en", "srcA", len(t)) for i, t in texts.items()]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["source"]: r
        for r in F3.q284_phash_image_dedup(spark, str(tmp_path)).collect()
    }
    assert got["srcA"]["n_images"] == 3
    assert got["srcA"]["n_kept"] == 2  # {0,1} cluster keeps 0; 2 alone
    assert got["srcA"]["n_removed"] == 1


def test_q283_overlap_accounting_fixture(spark, tmp_path):
    """'aaa' merges ONCE under BPE's left-to-right scan (occurrence
    count says twice) — realized-merge accounting is the graded
    claim. Hand-computed twin: words = 5×'aaa' + 3×'ab';
    round 1 merges 'aa' (10 occurrences, 5 realized) → 'aa a' / 'a b';
    round 2 merges ('aa','a') (5 realized) → 'aaa' / 'a b';
    round 3 top candidate is ('a','b') ×3."""
    from ai_data_pipeline_spark.plans import frontier3_queries as F3

    text = " ".join(["aaa"] * 5 + ["ab"] * 3)
    spark.createDataFrame(
        [(0, text, "en", "srcA", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    rows = F3.q283_bpe_two_rounds(spark, str(tmp_path)).collect()
    assert rows[0]["applied_r1"] == "aa"
    assert rows[0]["applied_r2"] == "aa a"
    assert rows[0]["n_merges_r1"] == 5  # NOT 10
    assert rows[0]["n_merges_r2"] == 5
    assert (rows[0]["pair"], rows[0]["n"]) == ("a b", 3)
    assert len(rows) == 1  # 'aaa' words are single symbols now


def test_q286_homoglyph_fixture(spark, tmp_path):
    """Non-Latin classes + the mixed-script token flag never fire on
    the ASCII graded corpora; pin them against hand-counted Unicode
    text (Cyrillic homoglyphs, CJK, digits)."""
    from ai_data_pipeline_spark.plans import frontier3_queries as F3

    # 'payра1' = latin p,a,y + CYRILLIC р,а + digit 1 (mixed)
    # 'сash'   = CYRILLIC с + latin a,s,h (mixed)
    # 'привет' pure cyrillic; '世界' cjk; 'abc' pure latin
    text = "payра1 сash привет 世界 abc"
    spark.createDataFrame(
        [(0, text, "xx", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    r = F3.q286_script_mixture(spark, str(tmp_path)).collect()[0]
    assert r["latin"] == 9  # p,a,y + a,s,h + a,b,c
    assert r["cyrillic"] == 9  # р,а + с + привет(6)
    assert r["cjk"] == 2
    assert r["digit"] == 1
    assert r["other"] == 4  # the four spaces
    assert r["n_tokens"] == 5
    assert r["n_mixed_tokens"] == 2
    assert r["mixed_rate"] == 2.0 / 5.0


def test_q282_admission_policy_fixture(spark, tmp_path):
    """Pins the admission policy end-to-end on a corpus where every
    branch fires: exact-dup vs history → dropped_history; within-
    batch near-dup pair → min admitted, other dropped_batch; a doc
    near its HISTORY-DROPPED batch keeper but NOT near history
    itself → dropped_batch (no resurrection); a unique doc →
    admitted."""
    from ai_data_pipeline_spark.plans import frontier3_queries as F3

    hist_text = " ".join(f"h{j}" for j in range(20))
    # batch 100: history text + 4 extra tokens → J vs hist ≈ 18/22 ≥ 0.6
    b100 = hist_text + " x1 x2 x3 x4"
    # batch 104: b100 + 10 more → J vs hist = 18/32 < 0.6, J vs b100 = 22/32 ≥ 0.6
    b104 = b100 + " " + " ".join(f"y{j}" for j in range(10))
    pair_text = " ".join(f"p{j}" for j in range(15))
    uniq = " ".join(f"u{j}" for j in range(15))
    rows = [
        (10, hist_text, "en", "src1", len(hist_text)),
        (11, " ".join(f"g{j}" for j in range(15)), "en", "src2", 1),
        (100, b100, "en", "src0", len(b100)),
        (101, pair_text, "en", "src0", len(pair_text)),
        (102, pair_text, "en", "src0", len(pair_text)),
        (103, uniq, "en", "src0", len(uniq)),
        (104, b104, "en", "src0", len(b104)),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    r = F3.q282_incremental_neardup_store(spark, str(tmp_path)).collect()
    assert len(r) == 1 and r[0]["lang"] == "en"
    assert r[0]["n_batch"] == 5
    # 100 → dropped_history; 101 admitted, 102 dropped_batch (exact
    # pair, min wins); 103 admitted; 104 survives the history check
    # but its cluster keeper 100 was dropped → dropped_batch
    assert r[0]["n_dropped_history"] == 1
    assert r[0]["n_admitted"] == 2
    assert r[0]["n_dropped_batch"] == 2


def test_q290_phrase_overlap_counting(spark, tmp_path):
    """Overlapping phrase starts all count ('batch batch batch'
    contains TWO 'batch batch' starts), and a doc missing one AND
    term does not match."""
    from ai_data_pipeline_spark.plans import frontier3_queries as F3

    rows = [
        (0, "batch batch batch order sort", "en", "s", 1),
        (1, "spark only here", "en", "s", 1),
        (2, "spark window spark window", "en", "s", 1),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["query_id"]: r
        for r in F3.q290_inverted_index_search(spark, str(tmp_path)).collect()
    }
    assert got["p2"]["n_docs"] == 1 and got["p2"]["n_occurrences"] == 2
    assert got["p1"]["n_docs"] == 1 and got["p1"]["n_occurrences"] == 1
    # AND 'spark window': doc 2 only (doc 1 lacks 'window'); occ = 4
    assert got["a1"]["n_docs"] == 1 and got["a1"]["n_occurrences"] == 4
    assert got["p3"]["n_docs"] == 0 and got["p3"]["n_occurrences"] == 0


def test_q291_edit_locality_fixture(spark, tmp_path):
    """A single-token edit perturbs ≤ 2 of the 8 overlapping frames
    (stride 8 < window 16) → the edited copy still shares ≥ 4 frame
    hashes and clusters with the original; an unrelated doc does
    not."""
    from ai_data_pipeline_spark.plans import frontier3_queries as F3

    base = [f"w{j}" for j in range(80)]
    edited = list(base)
    edited[40] = "EDITED"
    other = [f"z{j}" for j in range(80)]
    rows = [
        (0, " ".join(base), "en", "sA", 1),
        (1, " ".join(edited), "en", "sA", 1),
        (2, " ".join(other), "en", "sA", 1),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = F3.q291_video_frame_dedup(spark, str(tmp_path)).collect()[0]
    assert got["n_videos"] == 3
    assert got["n_kept"] == 2  # {0,1} cluster + 2 alone
    assert got["n_removed"] == 1


def test_q288_short_doc_admitted(spark, tmp_path):
    """A streamed doc with < 3 tokens has no shingles → its band-key
    array is EMPTY (the guard branch) → never flagged, even though
    its all-null signature would otherwise hash to a fixed key."""
    from ai_data_pipeline_spark.plans import frontier3_queries as F3

    hist = " ".join(f"h{j}" for j in range(20))
    rows = [
        (10, hist, "en", "src1", 1),
        (11, hist, "en", "src2", 1),  # 2nd hist copy (store content)
        (100, "hi there", "en", "src0", 1),   # < 3 tokens
        (101, hist, "en", "src0", 1),         # exact copy of history
        (102, " ".join(f"u{j}" for j in range(20)), "en", "src0", 1),
    ]
    # the stream's pathGlobFilter matches LEAF file names (the
    # driver testdata is a single FILE named documents.parquet, not
    # a directory) — write the fixture the same way
    import glob
    import shutil

    outdir = str(tmp_path / "_w")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(outdir)
    shutil.move(
        glob.glob(outdir + "/part-*.parquet")[0], str(tmp_path / "documents.parquet")
    )
    shutil.rmtree(outdir, ignore_errors=True)
    got = {
        r["source"]: r
        for r in F3.q288_streaming_store_gate(spark, str(tmp_path)).collect()
    }
    assert got["src0"]["n_seen"] == 3
    assert got["src0"]["n_flagged"] == 1  # only the exact copy
    assert got["src0"]["n_admitted"] == 2  # short doc + unique doc
    assert got["src1"]["n_flagged"] == 1  # store self-hit sanity


def test_q292_leak_policy_fixture(spark, tmp_path):
    """A val doc (md5-split) near-duplicating a train doc moves to
    train (n_leaky; excluded from n_val_final); a clean val doc
    stays."""
    from ai_data_pipeline_spark.plans import frontier3_queries as F3

    # doc_id 2 and 11 hash into the val split (u40 % 10 == 7);
    # 0,1,3 land in train (verified by the same md5 arithmetic)
    shared = " ".join(f"s{j}" for j in range(20))
    rows = [
        (0, shared, "en", "sA", 1),                                   # train
        (2, shared + " extra1 extra2", "en", "sA", 1),                # val, leaky
        (11, " ".join(f"c{j}" for j in range(20)), "en", "sA", 1),    # val, clean
        (3, " ".join(f"t{j}" for j in range(20)), "en", "sA", 1),     # train
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    r = F3.q292_decontaminated_split(spark, str(tmp_path)).collect()[0]
    assert (r["n_docs"], r["n_train0"], r["n_val0"]) == (4, 2, 2)
    assert r["n_leaky"] == 1
    assert r["n_val_final"] == 1
    assert r["val_share_final"] == 0.25


def test_q289_merge_counts_fixture(spark, tmp_path):
    """The gen-2 store holds exactly (history docs with signatures)
    + (admitted batch docs): dropped batch docs never enter the
    store, and every band digests the same doc set."""
    from ai_data_pipeline_spark.plans import frontier3_queries as F3

    hist = " ".join(f"h{j}" for j in range(20))
    rows = [
        (10, hist, "en", "src1", 1),
        (100, hist, "en", "src0", 1),   # exact copy → dropped vs history
        (101, " ".join(f"u{j}" for j in range(20)), "en", "src0", 1),  # admitted
        (102, "one two", "en", "src0", 1),  # < 3 tokens: no signature at all
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    out = F3.q289_store_lifecycle_merge(spark, str(tmp_path)).collect()
    assert len(out) == 8
    for r in out:
        # store = hist doc 10 + admitted 101 (102 admitted but has no
        # signature; 100 dropped) — 2 docs × 4 rows per band
        assert r["n_docs"] == 2
        assert r["n_rows"] == 8


def test_q293_emptied_cell_dropped(spark, tmp_path):
    """A cell whose vectors are ALL deleted must have its partition
    directory dropped (dynamic overwrite cannot rewrite a partition
    absent from the written frame) — post-delete search must never
    return a deleted vector."""
    import numpy as np

    from ai_data_pipeline_spark.plans import frontier3_queries as F3
    from ai_data_pipeline_spark.plans.constants import Q28_CENTROIDS

    # vec_ids 5 and 18 hash into the delete pick (u40 % 17 == 3);
    # 0,1,2,3 do not. Put the two deleted ids alone in centroid 0's
    # cell; the four survivors near centroid 1.
    c0 = np.array(Q28_CENTROIDS[0], dtype=np.float64)
    c1 = np.array(Q28_CENTROIDS[1], dtype=np.float64)
    rows = []
    for vid in (5, 18):
        rows.append((vid, [float(x) for x in (c0 + 0.001 * vid)], 0))
    for vid in (0, 1, 2, 3):
        rows.append((vid, [float(x) for x in (c1 + 0.001 * (vid + 1))], 1))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet"))
    out = F3.q293_vector_store_delete(spark, str(tmp_path)).collect()
    assert out[0]["n_deleted"] == 2
    assert out[0]["n_cells_rewritten"] == 1
    returned = {r["vec_id"] for r in out}
    assert returned <= {0, 1, 2, 3}  # never a deleted id
    # with only 4 survivors, every query's top-3 comes from them
    assert all(r["vec_id"] in (0, 1, 2, 3) for r in out)


def test_q297_stream_deletes_match_batch_delete(spark, tmp_path):
    """The three tombstone micro-batches must land on exactly q293's
    one-shot final state — including the emptied-cell directory drop
    when a batch wipes out a whole cell (the q293 fixture replayed
    through the stream)."""
    import numpy as np

    from ai_data_pipeline_spark.plans import frontier3_queries as F3
    from ai_data_pipeline_spark.plans.constants import Q28_CENTROIDS

    c0 = np.array(Q28_CENTROIDS[0], dtype=np.float64)
    c1 = np.array(Q28_CENTROIDS[1], dtype=np.float64)
    rows = []
    for vid in (5, 18):  # u40 % 17 == 3 → deleted; alone in cell 0
        rows.append((vid, [float(x) for x in (c0 + 0.001 * vid)], 0))
    for vid in (0, 1, 2, 3):
        rows.append((vid, [float(x) for x in (c1 + 0.001 * (vid + 1))], 1))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet"))
    batch = F3.q293_vector_store_delete(spark, str(tmp_path)).collect()
    stream = F3.q297_streaming_tombstone_deletes(spark, str(tmp_path)).collect()
    assert [tuple(r) for r in batch] == [tuple(r) for r in stream]
    assert stream[0]["n_deleted"] == 2 and stream[0]["n_cells_rewritten"] == 1


def test_q299_appended_batch_is_searchable(spark, tmp_path):
    """Appended vectors must be first-class citizens of the store:
    a batch vector that is the best match for a query must surface
    in the post-ingest search (vec_id 6 hashes into the ~20% batch
    split; it sits alone nearest centroid 0)."""
    import numpy as np

    from ai_data_pipeline_spark.plans import frontier3_queries as F3
    from ai_data_pipeline_spark.plans.constants import Q28_CENTROIDS

    # u40 % 5 == 0 picks: vec_id 6 is in the new batch; 2,4,5,7 base
    import hashlib

    assert int(hashlib.md5(b"6").hexdigest()[:10], 16) % 5 == 0
    c0 = np.array(Q28_CENTROIDS[0], dtype=np.float64)
    c1 = np.array(Q28_CENTROIDS[1], dtype=np.float64)
    rows = [(6, [float(x) for x in (c0 + 0.001)], 0)]
    for vid in (2, 4, 5, 7):
        assert int(hashlib.md5(str(vid).encode()).hexdigest()[:10], 16) % 5 != 0
        rows.append((vid, [float(x) for x in (c1 + 0.001 * (vid + 1))], 1))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet"))
    out = F3.q299_vector_store_admission(spark, str(tmp_path)).collect()
    assert out[0]["n_added"] == 1 and out[0]["n_base"] == 4
    assert 6 in {r["vec_id"] for r in out}  # the appended vector surfaces
