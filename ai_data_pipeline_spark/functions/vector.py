"""Vector math over ``array<float|double>`` columns — pure Catalyst
higher-order functions (zip_with / aggregate), no Python in the loop.

Reference parity: the FAISS IndexFlatL2 retrieval core
(`rag_chatbot/main.py:26-36`) reduces to a squared-L2 expression +
top-k; see operators/similarity.py.

Determinism note (oracle parity): ``aggregate`` folds left-to-right
in array order, which matches DuckDB's ``list_sum`` over the same
positional ``list_transform`` — identical operand order → identical
IEEE doubles → results are emitted raw, never rounded.

Scale: these expressions run inside whole-stage codegen over packed
Arrow/Tungsten arrays; a 64-d distance is ~64 fused multiply-adds
per row with zero boxing. At 100 TB prefer these over any pandas UDF
for distance math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def squared_l2(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Σ (a_i - b_i)² — squared euclidean distance.

    Matches IndexFlatL2 semantics (`rag_chatbot/main.py:26-28`): FAISS
    returns *squared* distances, and the reference's 1.0 rejection
    threshold compares against the square — preserved as-is.

    Pass ``dim`` when the dimension is statically known: the
    expression unrolls to a whole-stage-codegen'd add chain instead
    of an interpreted higher-order fold (zip_with/aggregate lambdas
    cost ~µs per ELEMENT in the interpreter — 2-3 orders of
    magnitude slower than codegen; measured the difference on the
    sf0.1 all-pairs queries). The summation order (left-to-right) is
    identical either way, so results are bit-equal.

    Operands are cast to double per element: float32×float32 stays
    float32 in Spark but the oracle computes in double.
    """
    a, b = _c(a), _c(b)
    if dim is not None:
        terms = []
        for i in range(dim):
            d = a.getItem(i).cast("double") - b.getItem(i).cast("double")
            terms.append(d * d)
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        # fold starts at 0.0: preserve (0.0 + t0) + t1 ... exactly
        return F.lit(0.0) + out if dim > 0 else F.lit(0.0)
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def dot(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    a, b = _c(a), _c(b)
    if dim is not None:
        terms = [a.getItem(i).cast("double") * b.getItem(i).cast("double") for i in range(dim)]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return F.lit(0.0) + out if dim > 0 else F.lit(0.0)
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """dot(a,b) / (|a|·|b|); null-safe-ish: zero vectors yield NULL
    (division by zero) rather than NaN-poisoning downstream sorts."""
    d = norm(a, dim) * norm(b, dim)
    return F.when(d != 0, dot(a, b, dim) / d)


def array_lit(values, dtype: str = "double") -> Column:
    """A literal array column from Python floats (query vectors)."""
    return F.array(*[F.lit(float(v)).cast(dtype) for v in values])


# --- exact fixed-point (q6 = micro-unit) vector arithmetic ------------------
#
# Whenever a distance feeds a DECISION (argmin / threshold / bucket)
# that two engines must agree on, the distance must be EXACT: quantize
# each component to floor(double(x) * 1e6) BIGINT first, then every
# subsequent op is integer arithmetic that cannot diverge.  The
# float→double cast is exact, the ×1e6 is a single IEEE op (bit-equal
# everywhere), and floor is exact — so v6 itself is engine-independent.
# This is the q120/q125 cross-multiply discipline applied to vectors;
# adopted for the k-means assignment argmin after the r03 q131 driver
# flake (an IEEE-double fold feeding an integer-output argmin).


def quantize_q6(a: Column | str) -> Column:
    """Per-element floor(double(a_i) * 1e6) as array<bigint>."""
    return F.transform(
        _c(a), lambda v: F.floor(v.cast("double") * 1_000_000).cast("long")
    )


def quantize_q6_py(values) -> list[int]:
    """Python twin of :func:`quantize_q6` for literal vectors.

    Computed ONCE driver-side and inlined as integer literals into
    both engines, so even the (deterministic) IEEE step here is
    definitionally shared.
    """
    import math

    return [math.floor(float(v) * 1_000_000.0) for v in values]


def squared_l2_q6(v6: Column | str, c6_values) -> Column:
    """Exact Σ (v6_i - c6_i)² over a quantized array<bigint> column and
    a Python list of quantized ints — pure BIGINT, engine-independent.
    HOF path (per-document scoring rule: unrolled dim=N costs ~2.5 s
    codegen per invocation; see CLAUDE.md)."""
    lit = F.array(*[F.lit(int(v)).cast("long") for v in c6_values])
    diffs = F.zip_with(_c(v6), lit, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0).cast("long"), lambda acc, v: acc + v)


# --- DuckDB twins (oracle SQL fragments) -----------------------------------

def sql_squared_l2(vec_expr: str, lit_list: str, dim: int) -> str:
    """DuckDB fragment computing squared L2 between a list column and
    a literal list, with the same left-to-right summation order as
    ``squared_l2`` (positional transform + list_sum)."""
    d = f"(CAST(({vec_expr})[i] AS DOUBLE) - CAST(({lit_list})[i] AS DOUBLE))"
    return f"list_sum(list_transform(range(1, {dim + 1}), i -> {d} * {d}))"


def sql_dot(a_expr: str, b_expr: str, dim: int) -> str:
    return (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        f"i -> CAST(({a_expr})[i] AS DOUBLE) * CAST(({b_expr})[i] AS DOUBLE)))"
    )


def sql_norm(a_expr: str, dim: int) -> str:
    return f"sqrt({sql_dot(a_expr, a_expr, dim)})"


def sql_lit_list(values) -> str:
    """DuckDB list literal of TRUE DOUBLEs.

    A bare numeric literal like ``0.12156862745098039`` parses as
    DECIMAL, and DuckDB's internal DECIMAL→DOUBLE cast is not always
    correctly rounded (≈1 ulp off vs the Python/Spark double for
    high-scale values) — invisible behind thresholds, but it broke
    bit-parity on q62's raw cosines under cancellation. Routing each
    element through a VARCHAR parse (``'…'::DOUBLE``) is correctly
    rounded, so the list matches the Python floats bit-for-bit.
    """
    return "[" + ", ".join(f"'{float(v)!r}'::DOUBLE" for v in values) + "]"


def sql_quantize_q6(vec_expr: str, dim: int) -> str:
    """DuckDB twin of :func:`quantize_q6`: list of BIGINT micro-units."""
    return (
        f"list_transform(range(1, {dim + 1}), "
        f"i -> CAST(floor(CAST(({vec_expr})[i] AS DOUBLE) * 1000000) AS BIGINT))"
    )


def sql_int_list(values) -> str:
    return "[" + ", ".join(f"CAST({int(v)} AS BIGINT)" for v in values) + "]"


def sql_squared_l2_q6(v6_expr: str, c6_list: str, dim: int) -> str:
    """DuckDB twin of :func:`squared_l2_q6` over a pre-quantized list
    expression and a literal BIGINT list — exact integer distance."""
    d = f"(({v6_expr})[i] - ({c6_list})[i])"
    return f"list_sum(list_transform(range(1, {dim + 1}), i -> {d} * {d}))"
