"""Native Python UDTFs (Spark 4): table functions usable from SQL
via LATERAL — the modern form of the explode-an-array UDTF pattern
(the chunker pipeline uses the array+posexplode form; this module
pins the first-class API).

Arrow-optimized UDTFs stream batches through the same worker channel
as pandas UDFs; each eval yields rows, so memory stays bounded per
input row regardless of fan-out.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_index int, chunk_start int, chunk_text string")
class FixedWindowChunks:
    """Fixed-size sliding character windows over a text: size-chars
    chunks every (size - overlap) chars, final partial chunk kept.
    The UDTF twin of the R4 splitter's simplest configuration —
    useful when LangChain-parity recursion is not needed and a
    constant-stride layout is (e.g. embedding-window pretraining).
    """

    def eval(self, text: str, size: int, overlap: int):  # noqa: D102
        if text is None or size <= 0 or not (0 <= overlap < size):
            return
        step = size - overlap
        n = len(text)
        idx = 0
        for start in range(0, max(n, 1), step):
            chunk = text[start : start + size]
            if not chunk:
                break
            yield idx, start, chunk
            if start + size >= n:
                break
            idx += 1


def register_udtfs(spark) -> None:
    """Make the table functions callable from SQL
    (``LATERAL fixed_window_chunks(text, 300, 60)``)."""
    spark.udtf.register("fixed_window_chunks", FixedWindowChunks)


@udtf
class SplitFixed:
    """POLYMORPHIC UDTF (Spark 4 ``analyze``): output schema computed
    at plan time from the constant ``parts`` argument — the
    fixed-format field splitter (``SplitFixed(line, '|', 3)`` yields
    columns part0..part2). The schema-from-arguments contract is the
    API's headline feature: Catalyst sees real typed columns, so
    downstream pruning/filter pushdown work as if the table were
    static. Rows shorter than ``parts`` null-pad; longer rows fold
    the tail into the last column (never silently dropped).
    """

    @staticmethod
    def analyze(text, delim, parts):
        from pyspark.sql.types import StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        if parts.value is None or not isinstance(parts.value, int) or parts.value < 1:
            raise ValueError("parts must be a constant positive int")
        schema = StructType()
        for i in range(parts.value):
            schema = schema.add(f"part{i}", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, text: str, delim: str, parts: int):  # noqa: D102
        if text is None:
            return
        fields = text.split(delim, parts - 1)
        fields += [None] * (parts - len(fields))
        yield tuple(fields)
