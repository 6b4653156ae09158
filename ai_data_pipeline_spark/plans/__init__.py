"""Declared query plans — the oracle-checked contract (SURVEY.md §2B).

Each module exposes query functions ``(spark, sf_dir) -> DataFrame``
and an ``ORACLE`` dict mapping query name → equivalent DuckDB SQL.
Canonicalization contract: every query ends in a total ORDER BY,
doubles are rounded in-query (both engines), every computed column is
aliased identically on both sides.
"""
