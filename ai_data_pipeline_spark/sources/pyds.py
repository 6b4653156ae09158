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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SynthDocsDataSource(DataSource):
    """``format("synthdocs")`` options: numdocs (default 100),
    numpartitions (default 4), seed (default 0)."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "doc_id bigint, text string, source string"

    def reader(self, schema) -> "SynthDocsReader":
        return SynthDocsReader(self.options)


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


def register_synthdocs(spark) -> None:
    spark.dataSource.register(SynthDocsDataSource)
