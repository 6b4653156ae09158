"""Multimodal columns: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs.

Design (the part that matters at 100 TB):
- blobs live in a ``binary`` column next to typed metadata
  (modality, byte length, digest, decode status) — schema-first, so
  Catalyst prunes blobs out of any query that doesn't touch them;
- decode / feature-extract run in ``mapInPandas`` so one task holds
  one Arrow batch of blobs, never the whole partition as Python
  objects; batch size is bounded by bytes not rows when blobs are
  large (set spark.sql.execution.arrow.maxRecordsPerBatch down for
  fat blobs);
- real codec work (PIL/ffmpeg) is NOT available in this container —
  the decode hook is injectable; ``fake_image_meta`` is the
  deterministic stand-in keeping the plumbing (schema, partitioning,
  UDF signature, batch shape) real and tested, and ``decode_image``
  raises NotImplementedError unless a decoder is supplied.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BLOB_META_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("status", StringType()),
    ]
)


def to_blob_table(df: DataFrame, id_col: str, payload_col: str, modality: str) -> DataFrame:
    """Wrap a column as an opaque blob table: [id, modality, blob]."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.lit(modality).alias("modality"),
        F.col(payload_col).cast("binary").alias("blob"),
    )


def fake_image_meta(blob: bytes) -> tuple[int, int]:
    """Deterministic stand-in for image decode: derive (width,
    height) from the content digest. Replace with a real decoder in
    production (PIL.Image.open(io.BytesIO(blob)).size)."""
    h = hashlib.md5(blob).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def extract_blob_meta(
    blobs: DataFrame,
    decoder: Callable[[bytes], tuple[int, int]] | None = fake_image_meta,
) -> DataFrame:
    """mapInPandas metadata extraction over [id, modality, blob] —
    the decode seam of the multimodal pipeline. Deterministic with
    the default fake decoder; plug a real one in production."""

    if decoder is None:
        raise NotImplementedError(
            "no image decoder available in this environment; "
            "pass decoder= (e.g. PIL-based) or use fake_image_meta"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs_col = [bytes(b) if b is not None else b"" for b in pdf["blob"]]
            dims = [decoder(b) for b in blobs_col]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].values,
                    "modality": pdf["modality"].values,
                    "n_bytes": [len(b) for b in blobs_col],
                    "digest": [hashlib.md5(b).hexdigest() for b in blobs_col],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "status": ["decoded" if b else "empty" for b in blobs_col],
                },
                columns=[f.name for f in BLOB_META_SCHEMA.fields],
            )

    return blobs.mapInPandas(run, BLOB_META_SCHEMA)


def frame_sample_plan(
    blobs: DataFrame,
    every_n: int = 30,
    max_frames: int = 8,
) -> DataFrame:
    """Video frame-sampling *plan*: emits (id, frame_no) rows for the
    frames a decoder would extract — the Spark-side fan-out (explode)
    is real; the pixel decode is the injectable seam above."""
    frames = F.sequence(F.lit(0), F.lit((max_frames - 1) * every_n), F.lit(every_n))
    return blobs.select("id", F.explode(frames).alias("frame_no"))
