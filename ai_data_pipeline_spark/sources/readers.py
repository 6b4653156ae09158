"""Readers: the engine's source surface (SURVEY.md §2B).

- R1 (`app/main.py:139`): directory-of-PDFs scan → binaryFile source
  with a glob filter (suffix pruning happens at file listing, the
  Spark analog of the reference's os.listdir filter).
- R13 (`rag_chatbot/main.py:8-13`): JSONL scan. The reference
  crashes on a malformed line (no try/except) ⇒ FAILFAST is the
  parity default; PERMISSIVE is opt-in.
- PDF page extraction (R2) needs a PDF parser; pypdf is not in this
  container, so the parser is injectable with a plain-text fallback
  (form-feed separated pages) — the Spark plumbing (binary → pages →
  explode) is identical either way.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructType

from ai_data_pipeline_spark.operators.json_fallback import QA_SCHEMA

QA_RECORD_SCHEMA = "question string, answer string, source_file string, window_index int, subchunk_index int"


BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def read_document_dir(
    spark: SparkSession, path: str, glob: str = "*.pdf", stream: bool = False
) -> DataFrame:
    """R1: binary documents from a landing directory.
    Columns: path, modificationTime, length, content.
    Streaming sources require an explicit schema; binaryFile's is
    fixed, so the incremental (landing-dir-watch) form needs no
    inference pass."""
    reader = spark.readStream if stream else spark.read
    reader = reader.format("binaryFile").option("pathGlobFilter", glob)
    if stream:
        reader = reader.schema(BINARY_FILE_SCHEMA)
    return reader.load(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | StructType = QA_RECORD_SCHEMA,
    mode: str = "FAILFAST",
    stream: bool = False,
) -> DataFrame:
    """R13: schema'd JSONL scan; FAILFAST mirrors the reference's
    crash-on-malformed behavior."""
    reader = spark.readStream if stream else spark.read
    return reader.schema(schema).option("mode", mode).json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | StructType | None = None,
    header: bool = True,
    mode: str = "FAILFAST",
    stream: bool = False,
) -> DataFrame:
    """CSV source. Explicit schema recommended (inference scans the
    data twice and is forbidden for streams); FAILFAST default for
    the same crash-on-malformed parity as read_jsonl."""
    reader = spark.readStream if stream else spark.read
    reader = reader.option("header", str(header).lower()).option("mode", mode)
    if schema is not None:
        reader = reader.schema(schema)
    elif not stream:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: str | StructType | None = None,
    stream: bool = False,
) -> DataFrame:
    """ORC source — completes the built-in columnar set next to
    parquet (same pushdown/pruning behavior: predicate + column
    pushdown reach the stripe reader; see the round-trip test)."""
    reader = spark.readStream if stream else spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_jsonl_quarantine(
    spark: SparkSession,
    path: str,
    schema: str | StructType,
    stream: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter ingest: PERMISSIVE JSONL parse that splits into
    (good, quarantine) frames instead of FAILFAST's crash (read_jsonl)
    or silent DROPMALFORMED loss.

    good: rows matching ``schema`` (corrupt column dropped).
    quarantine: the RAW malformed line preserved in ``raw`` plus the
    source path — everything needed to replay after a parser fix.

    At 100 TB this is the only deployable posture: one bad line in a
    billion must neither kill the job (FAILFAST) nor vanish
    (DROPMALFORMED).

    Implementation note: reading ``.json(path)`` with a schema'd
    corrupt column forbids queries that touch only that column
    (SPARK-21610 — Spark demands a cache() barrier first, a non-
    starter at corpus scale). The deployable shape is a TEXT scan +
    ``from_json`` with an in-struct corrupt column: one narrow scan,
    no barrier, and — unlike the raw-json reader — it also flags
    TYPE-mismatched rows (valid JSON, wrong field type) into the
    quarantine, not just unparseable lines. Both returned frames are
    cheap projections of the same scan.
    """
    struct = (
        schema if isinstance(schema, StructType) else StructType.fromDDL(schema)
    )
    full = struct.add("_corrupt_record", StringType())
    reader = spark.readStream if stream else spark.read
    # Blank / whitespace-only lines (trailing newlines, jsonl-writer
    # padding) are NOISE, not corruption: drop them before parsing so
    # they land in NEITHER frame. (from_json returns a NULL struct for
    # them — same as a literal `null` line — so without this filter
    # they would quarantine.) A literal `null` line still quarantines:
    # something wrote a record there and it carries no schema fields.
    raw = (
        reader.text(path)
        # NB: F.trim strips only ASCII spaces — rlike catches tabs too
        # (explicit class = Java \s; see functions/text.py WS policy)
        .filter(~F.col("value").rlike(r"^[ \t\n\x0b\f\r]*$"))
        .select(F.col("value"), F.input_file_name().alias("_src"))
    )
    parsed = raw.select(
        F.from_json(
            "value",
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("r"),
        "value",
        "_src",
    )
    # A line of literal `null` JSON parses to a NULL struct (whose
    # _corrupt_record is null too) — require r itself non-null or the
    # row would be classified good with all-null fields.
    good = (
        parsed.filter(
            F.col("r").isNotNull() & F.col("r._corrupt_record").isNull()
        )
        .select("r.*")
        .drop("_corrupt_record")
    )
    quarantine = parsed.filter(
        F.col("r").isNull() | F.col("r._corrupt_record").isNotNull()
    ).select(F.col("value").alias("raw"), F.col("_src").alias("source_path"))
    return good, quarantine


def read_text(
    spark: SparkSession,
    path: str,
    whole: bool = False,
    line_sep: str | None = None,
    stream: bool = False,
) -> DataFrame:
    """Plain-text source: one row per line (default) or per file
    (``whole=True`` — the raw-corpus ingest shape; pair with
    ``input_file_name()`` for lineage). ``line_sep`` overrides the
    record delimiter for formats like form-feed-paged dumps."""
    reader = spark.readStream if stream else spark.read
    # NB: wholetext/lineSep must go through the .text() kwargs —
    # .option("wholetext", ...) is silently ignored here.
    return reader.text(path, wholetext=whole, lineSep=line_sep)


def rate_stream(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """Synthetic load source for streaming tests/demos:
    [timestamp, value] at a fixed rate."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def default_text_pdf_parser(content: bytes) -> list[str]:
    """Fallback 'PDF' parser for environments without pypdf: decode
    utf-8 (replacing errors) and split pages on form-feed."""
    return (content or b"").decode("utf-8", errors="replace").split("\f")


def pypdf_parser(content: bytes) -> list[str]:  # pragma: no cover - pypdf absent here
    """Real parser (R2, `app/main.py:19-27`) when pypdf is present."""
    import io

    from pypdf import PdfReader

    return [(page.extract_text() or "") for page in PdfReader(io.BytesIO(content)).pages]


def minipdf_parser(content: bytes) -> list[str]:
    """Dependency-free real-PDF parser (sources/minipdf.py): classic
    xref-less object scan + page-tree walk + FlateDecode + Tj/TJ text
    operators. The R2 tier between pypdf and the plain-text fallback."""
    from ai_data_pipeline_spark.sources.minipdf import extract_pages

    return extract_pages(content)


def auto_pdf_parser(content: bytes) -> list[str]:
    """Sniffing default: real ``%PDF-`` bytes go through minipdf,
    anything else through the form-feed text fallback (keeps the
    plain-text parity fixtures and synthetic corpora working)."""
    body = content or b""
    if body.lstrip()[:5] == b"%PDF-":
        try:
            return minipdf_parser(body)
        except Exception:
            return default_text_pdf_parser(body)
    return default_text_pdf_parser(body)


def get_pdf_parser() -> Callable[[bytes], list[str]]:
    try:  # pragma: no cover - container has no pypdf
        import pypdf  # noqa: F401

        return pypdf_parser
    except ImportError:
        return auto_pdf_parser


def parse_pages(
    docs: DataFrame,
    parser: Callable[[bytes], list[str]] | None = None,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """R2: binary docs → one row per non-empty page.
    Output: [source_file, page_no (1-based), page_text]."""
    parser = parser or get_pdf_parser()

    @F.pandas_udf(ArrayType(StringType()))
    def parse_udf(content: pd.Series) -> pd.Series:
        return content.map(lambda b: parser(bytes(b) if b is not None else b""))

    return (
        docs.select(
            F.element_at(F.split(F.col(path_col), "/"), -1).alias("source_file"),
            parse_udf(F.col(content_col)).alias("pages"),
        )
        .select("source_file", F.posexplode("pages").alias("page_no0", "page_text"))
        .filter(F.length(F.trim("page_text")) > 0)
        .select("source_file", (F.col("page_no0") + 1).alias("page_no"), "page_text")
    )
