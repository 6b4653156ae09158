"""Landing-directory catalog ops (R11/R12).

Reference parity (`app/main.py:149-182`): the reference manages its
knowledge base as a flat directory of PDFs with three Gradio-exposed
ops — `upload_pdf_fixed` (R11: write bytes under the file's basename,
silently overwriting = upsert), `delete_pdf_fixed` (R12: remove if
present, report "does not exist" otherwise — never raise), and
`list_pdfs_fixed` (R12: `os.listdir` filtered case-insensitively on
the `.pdf` suffix).

Spark-first split of responsibilities: mutation is driver-side
filesystem I/O (a landing dir IS a filesystem contract — at scale the
same three calls target object storage via fsspec-style clients, one
RPC per op, no Spark job); *reading* the catalog is the R1 binaryFile
scan (`readers.read_document_dir`), batch or streaming. A streaming
pipeline over the landing dir picks up `add_document` writes on the
next micro-batch with no extra wiring — Spark's file source does the
new-file discovery (that is the landing-dir-watch pattern the
reference's manual re-process button approximates).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ai_data_pipeline_spark.sources.readers import read_document_dir


class LandingCatalog:
    """Flat-directory document catalog with reference R11/R12 ops."""

    def __init__(self, landing_dir: str, suffix: str = ".pdf") -> None:
        self.landing_dir = landing_dir
        self.suffix = suffix.lower()

    # -- R11: upsert -------------------------------------------------------

    def add_document(self, source: str | bytes, name: str | None = None) -> str:
        """Upsert a document into the landing dir and return its
        catalog name. ``source`` is a local path (copied) or raw
        bytes (``name`` required). Overwrites silently — the
        reference's upload is an upsert (`app/main.py:154-171`)."""
        os.makedirs(self.landing_dir, exist_ok=True)
        if isinstance(source, bytes):
            if name is None:
                raise ValueError("name is required when adding raw bytes")
            dest = os.path.join(self.landing_dir, os.path.basename(name))
            with open(dest, "wb") as f:
                f.write(source)
        else:
            dest = os.path.join(
                self.landing_dir, os.path.basename(name or source)
            )
            shutil.copyfile(source, dest)
        return os.path.basename(dest)

    # -- R12: delete + list ------------------------------------------------

    def delete_document(self, name: str) -> bool:
        """Remove a document; False (not an error) when absent —
        the reference reports "does not exist" rather than raising
        (`app/main.py:173-182`)."""
        path = os.path.join(self.landing_dir, os.path.basename(name))
        if os.path.exists(path):
            os.remove(path)
            return True
        return False

    def list_documents(self) -> list[str]:
        """Sorted catalog names, case-insensitive suffix filter —
        `list_pdfs_fixed` (`app/main.py:150-152`)."""
        if not os.path.isdir(self.landing_dir):
            return []
        return sorted(
            f
            for f in os.listdir(self.landing_dir)
            if f.lower().endswith(self.suffix)
        )

    # -- Spark-side catalog view ------------------------------------------

    def documents_df(self, spark: SparkSession, stream: bool = False) -> DataFrame:
        """The catalog as a DataFrame (R1 binaryFile scan): [path,
        modificationTime, length, content]. ``stream=True`` returns
        the incremental file source — new `add_document` writes
        appear on the next micro-batch."""
        glob = "*" + self.suffix
        return read_document_dir(spark, self.landing_dir, glob=glob, stream=stream)
