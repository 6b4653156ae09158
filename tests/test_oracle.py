"""Every declared queries()/oracle_sql() pair must match the DuckDB
oracle at sf0.001 — the local twin of the driver's t2 gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from ai_data_pipeline_spark.oracle import compare, duckdb_connection
from tests.conftest import SF_SMOKE

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    return duckdb_connection(SF_SMOKE)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    df = _QUERIES[name](spark, SF_SMOKE)
    if name not in _ORACLES:
        # non-SQL-expressible op: weaker check — runs, stable schema, rows >= 0
        rows = df.collect()
        assert df.columns, f"{name} returned no columns"
        assert rows is not None
        return
    rep = compare(df, duck, _ORACLES[name])
    assert rep["match"], f"{name}: {rep}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"n_name", "revenue"}


def test_every_oracle_has_query():
    assert set(_ORACLES) <= set(_QUERIES)


def test_rows_only_set_is_intentional():
    """Every query lacking an oracle twin must be on the known
    rows-only list (custom hash families / approximate paths) — a
    new query accidentally shipped without its oracle fails here."""
    rows_only = set(_QUERIES) - set(_ORACLES)
    # r03 retired the last three rows-only entries: q24/q25 via the
    # md5_hash60 re-key (family recomputable in SQL), q21 via the
    # golden-VALUES twin. Every declared query now has a full oracle.
    assert rows_only == set()


def test_driver_window_covers_unevidenced_queries():
    """The driver grades only the FIRST 50 entries of queries().  Every
    query without a green r01 driver row (the 32 never-checked, the q69
    FAIL, and anything new) must sit inside that window, or it can never
    earn a CORRECTNESS row.  Guards against reorderings silently
    starving queries of driver evidence (VERDICT r01, next-round #9)."""
    order = list(_QUERIES)
    window = set(order[:50])
    needs_evidence = set(order) - entrymod.DRIVER_EVIDENCE
    missing = needs_evidence - window
    assert not missing, (
        f"queries needing a driver row fall outside the first-50 window: "
        f"{sorted(missing)}"
    )


def test_declared_surface_does_not_shrink():
    """queries() merges three plan modules with independent imports;
    a breakage in any one must fail THIS test loudly, never silently
    shrink the graded surface (review finding r03). Bump the floor
    when queries are added — never lower it."""
    assert len(_QUERIES) >= 317
    assert len(entrymod.oracle_sql()) >= 317


def test_query_modules_do_not_collide():
    """The three plan modules merge into one dict in __spark_entry__
    — a shared name would silently shadow a query."""
    from ai_data_pipeline_spark.plans import (
        analysis_queries,
        extended_queries,
        frontier2_queries,
        frontier_queries,
        pipeline_queries,
        relational,
    )

    mods = [
        relational,
        pipeline_queries,
        analysis_queries,
        extended_queries,
        frontier_queries,
        frontier2_queries,
    ]
    for i, m1 in enumerate(mods):
        for m2 in mods[i + 1 :]:
            assert set(m1.QUERIES) & set(m2.QUERIES) == set()
            assert set(m1.ORACLE) & set(m2.ORACLE) == set()


def test_registered_shingle_pair_queries_engage_the_cap():
    """CLAUDE.md rule, enforced mechanically: every registered query
    calling the all-pairs shingle joins must pass max_shingle_freq —
    q105 shipped uncapped once and the 16x scale probe measured 9.7x
    wall growth from hot-shingle f^2 join rows. (prefix_jaccard_pairs
    is exempt: the prefix filter bounds candidates by construction.)"""
    import inspect
    import re as _re

    from ai_data_pipeline_spark.plans import analysis_queries as A
    from ai_data_pipeline_spark.plans import extended_queries as X
    from ai_data_pipeline_spark.plans import frontier2_queries as F2
    from ai_data_pipeline_spark.plans import frontier_queries as FQ
    from ai_data_pipeline_spark.plans import pipeline_queries as P

    for mod in (P, A, X, FQ, F2):
        src = inspect.getsource(mod)
        for m in _re.finditer(
            r"(ngram_jaccard_pairs|shingle_containment_pairs)\((.*?)\)",
            src,
            _re.DOTALL,
        ):
            assert "max_shingle_freq" in m.group(2), m.group(0)[:120]
        # same f² law for the sparse-term self-join (q210 family)
        for m in _re.finditer(r"tf_cosine_pairs\((.*?)\)", src, _re.DOTALL):
            assert "max_term_df" in m.group(1), m.group(0)[:120]


def test_dtype_classes_map_correctly():
    """The coarse dtype-class gate (r05): HUGEINT must be its OWN
    class (Python fetch renders it int → local green, arrow/decimal
    renderings hash differently → driver red), ints collapse across
    widths (int32 outputs are historically driver-green), and the
    Spark/DuckDB maps agree on the shared classes."""
    from ai_data_pipeline_spark.oracle import _duck_dtype_class, _spark_dtype_class

    assert _duck_dtype_class("HUGEINT") == "hugeint"
    assert _duck_dtype_class("BIGINT") == _duck_dtype_class("INTEGER") == "int"
    assert _spark_dtype_class("int") == _spark_dtype_class("bigint") == "int"
    assert _duck_dtype_class("DOUBLE") == _spark_dtype_class("double") == "float"
    assert _duck_dtype_class("VARCHAR") == _spark_dtype_class("string") == "str"
    assert _duck_dtype_class("TIMESTAMP WITH TIME ZONE") == "ts"
    assert _spark_dtype_class("timestamp_ntz") == "ts"
    assert _duck_dtype_class("BIGINT[]") == _spark_dtype_class("array<float>") == "list"
    assert _duck_dtype_class("DECIMAL(18,3)") == _spark_dtype_class("decimal(18,3)") == "decimal"


def test_compare_rejects_uncast_hugeint(spark, duck):
    """An oracle emitting a bare SUM (HUGEINT) against a Spark BIGINT
    must FAIL the gate even though the values canonicalize equal —
    the q131 r03/r04 signature."""
    from ai_data_pipeline_spark.oracle import compare

    df = spark.range(3).selectExpr("CAST(3 AS BIGINT) AS s").limit(1)
    bad = compare(df, duck, "SELECT SUM(x) AS s FROM (VALUES (1), (1), (1)) t(x)")
    assert bad["values_match"] and not bad["match"]
    assert bad["dtype_mismatch"] == {"s": ("int", "hugeint")}
    good = compare(
        df, duck,
        "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (1), (1), (1)) t(x)",
    )
    assert good["match"]


def test_bench_and_probe_name_lists_resolve():
    """Every name in bench.HEADLINE and scripts/scaling_probe.PROBE
    must be a registered query — a typo would crash the driver's
    per-round bench (recorded as rc!=0) instead of failing locally."""
    import importlib

    import __spark_entry__ as entrymod

    qs = set(entrymod.queries())
    bench = importlib.import_module("bench")
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, missing
    probe = importlib.import_module("scripts.scaling_probe")
    missing = [n for n in probe.PROBE if n not in qs]
    assert not missing, missing
