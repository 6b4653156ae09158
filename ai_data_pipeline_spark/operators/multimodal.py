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
    DoubleType,
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


def fake_resize(blob: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize: a digest-seeded
    byte stream of the exact resized payload size (width·height·3).
    Production swaps in PIL: Image.open(...).resize((w,h)).tobytes().
    Keeps the binary-in/binary-out plumbing and output sizing real."""
    n = width * height * 3
    seed = hashlib.md5(blob + f"{width}x{height}".encode()).digest()
    reps = -(-n // len(seed))
    return (seed * reps)[:n]


def resize_blobs(
    blobs: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = fake_resize,
) -> DataFrame:
    """Binary→binary transform stage: [id, modality, blob] →
    [id, modality, blob(resized), width, height].

    The batch contract is the scale-relevant part: one Arrow batch of
    blobs per task iteration (bound batch bytes via
    spark.sql.execution.arrow.maxRecordsPerBatch for fat images), no
    per-row Python round-trips, and the blob column prunes away in
    any downstream query that only reads the metadata."""
    if resizer is None:
        raise NotImplementedError(
            "no image resizer available in this environment; "
            "pass resizer= (e.g. PIL-based) or use fake_resize"
        )

    out_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("modality", StringType()),
            StructField("blob", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                resizer(bytes(b) if b is not None else b"", width, height)
                for b in pdf["blob"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].values,
                    "modality": pdf["modality"].values,
                    "blob": resized,
                    "width": width,
                    "height": height,
                },
                columns=[f.name for f in out_schema.fields],
            )

    return blobs.mapInPandas(run, out_schema)


def fake_audio_features(blob: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for audio decode → (duration_ms,
    sample_rate, n_channels). Integer-valued on purpose: the oracle
    twin reproduces this arithmetic exactly in SQL (q40), which a
    float `duration_s` with decimal rounding could not guarantee.
    Production: soundfile/librosa."""
    h = hashlib.md5(blob).digest()
    duration_ms = 500 + int.from_bytes(h[:4], "big") % 60000
    sample_rate = (8000, 16000, 22050, 44100)[h[4] % 4]
    channels = 1 + h[5] % 2
    return duration_ms, sample_rate, channels


def extract_audio_features(
    blobs: DataFrame,
    extractor: Callable[[bytes], tuple[int, int, int]] | None = fake_audio_features,
) -> DataFrame:
    """Audio feature-extraction stage over [id, modality, blob] →
    [id, duration_ms, sample_rate, n_channels, n_bytes]."""
    if extractor is None:
        raise NotImplementedError(
            "no audio decoder available in this environment; "
            "pass extractor= or use fake_audio_features"
        )

    out_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("duration_ms", LongType()),
            StructField("sample_rate", IntegerType()),
            StructField("n_channels", IntegerType()),
            StructField("n_bytes", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bl = [bytes(b) if b is not None else b"" for b in pdf["blob"]]
            feats = [extractor(b) for b in bl]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].values,
                    "duration_ms": [f[0] for f in feats],
                    "sample_rate": [f[1] for f in feats],
                    "n_channels": [f[2] for f in feats],
                    "n_bytes": [len(b) for b in bl],
                },
                columns=[f.name for f in out_schema.fields],
            )

    return blobs.mapInPandas(run, out_schema)
