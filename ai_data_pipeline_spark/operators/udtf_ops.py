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
