"""Custom Python DataSource (Spark 4 DataSource API): a
deterministic synthetic-document generator, registered as a real
``spark.read.format("synthdocs")`` source with partition-parallel
reads.

Why it exists: the engine's source surface should include the
extension seam itself, not only built-in formats — a production twin
of this class wraps any REST/queue/object-store listing: emit one
InputPartition per shard in ``partitions()``, fetch shard rows in
``read()`` on the executor. The driver never touches row data, and
Spark schedules one task per partition — the same contract that lets
a 1000-executor cluster ingest shards concurrently.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def _doc_row(seed: int, doc_id: int, source: str) -> tuple:
    h = hashlib.md5(f"{seed}:doc{doc_id}".encode()).hexdigest()
    words = [h[j : j + 4] for j in range(0, 28, 4)]
    return doc_id, " ".join(words), source


class SynthDocsDataSource(DataSource):
    """``format("synthdocs")`` options: numdocs (default 100),
    numpartitions (default 4), seed (default 0); streaming adds
    batchsize (default 10) — rows per micro-batch until numdocs."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "doc_id bigint, text string, source string"

    def reader(self, schema) -> "SynthDocsReader":
        return SynthDocsReader(self.options)

    def simpleStreamReader(self, schema) -> "SynthDocsStreamReader":
        return SynthDocsStreamReader(self.options)


class SynthDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("numdocs", 100))
        self.parts = int(options.get("numpartitions", 4))
        self.seed = int(options.get("seed", 0))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition) -> Iterator[tuple]:
        pid = partition.value
        for doc_id in range(pid, self.n, self.parts):
            h = hashlib.md5(f"{self.seed}:doc{doc_id}".encode()).hexdigest()
            words = [h[j : j + 4] for j in range(0, 28, 4)]
            yield doc_id, " ".join(words), f"shard{pid}"


class SynthDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the seam (Spark 4 Python streaming
    DataSource): offsets are ``{"pos": n}`` — the count of docs
    already emitted — so the source is an incremental, exactly-
    replayable cursor over the same deterministic corpus the batch
    reader yields. ``read`` advances the cursor one micro-batch;
    ``readBetweenOffsets`` replays any committed range bit-for-bit
    (checkpoint recovery). A production twin pages a REST/queue
    cursor the same way: offset = opaque resume token.

    The simple-reader variant executes reads on the DRIVER and ships
    rows to executors — right for low-volume control streams (file
    listings, API pages); high-volume streams belong on the
    partition-parallel ``DataSourceStreamReader`` instead.
    """

    def __init__(self, options):
        self.n = int(options.get("numdocs", 100))
        self.batch = int(options.get("batchsize", 10))
        self.seed = int(options.get("seed", 0))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        pos = int(start["pos"])
        end = min(pos + self.batch, self.n)
        # a list ITERATOR (picklable), never a generator: the runtime
        # copies the prefetched rows alongside the offset for replay
        return iter(self._rows(pos, end)), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(self._rows(int(start["pos"]), int(end["pos"])))

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        return [
            _doc_row(self.seed, doc_id, f"shard{doc_id % 4}")
            for doc_id in range(lo, hi)
        ]


def register_synthdocs(spark) -> None:
    spark.dataSource.register(SynthDocsDataSource)
