"""Custom batch connector via the Python DataSource API (Spark 4).

The reference's only source is a parquet file it wrote itself
(etl_benchmark.py:14-20,27). A real engine also INGESTS from systems
Spark has no built-in reader for; Spark 4's ``pyspark.sql.datasource``
is the idiomatic way to add one from Python — the planner calls
``partitions()`` and fans ``read(partition)`` out to executors, so a
custom feed parallelizes like any file scan instead of funneling
through the driver (the classic anti-pattern this API replaces).

This source synthesizes a deterministic document corpus (seeded per
partition — same rows on every run and any cluster size), standing in
for the crawl-shard / warehouse-export feeds a 100 TB training pipeline
reads. The Spark-side mechanics (registration, schema declaration,
partition planning, per-partition iteration, option handling) are the
real, tested surface; swap ``read()``'s body for an API/SDK call to
ingest a real system.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon",
          "zeta", "eta", "theta", "iota", "kappa"]


def _gen_row(seed: int, doc_id: int):
    """Deterministic per (seed, doc_id): re-running a failed task — or
    replaying a streaming offset range after restart — regenerates
    identical rows (idempotent retries / exactly-once replay)."""
    import random

    rng = random.Random(seed * 1_000_003 + doc_id)
    text = " ".join(rng.choices(_WORDS, k=rng.randint(5, 30)))
    return (doc_id, text, rng.choice(["en", "de", "fr"]), len(text))


class _DocShard(InputPartition):
    def __init__(self, shard: int, start: int, end: int, seed: int):
        self.shard = shard
        self.start = start
        self.end = end
        self.seed = seed


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.n_shards = int(options.get("shards", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        per = -(-self.n_rows // self.n_shards)  # ceil-div
        return [
            _DocShard(i, i * per, min((i + 1) * per, self.n_rows), self.seed)
            for i in range(self.n_shards)
            if i * per < self.n_rows
        ]

    def read(self, partition: _DocShard):
        for doc_id in range(partition.start, partition.end):
            yield _gen_row(partition.seed, doc_id)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the connector (Spark 4 Python DataSource
    streaming API): offsets are row positions; each micro-batch emits
    the next ``batch_rows`` rows until ``max_rows``. readBetweenOffsets
    replays any committed range bit-identically (the generator is keyed
    on (seed, doc_id)), which is exactly the contract a restartable
    exactly-once source must honor. Stands in for a cursor/changefeed
    ingest; swap the generator for an API poll."""

    def __init__(self, schema: StructType, options: dict):
        self.max_rows = int(options.get("max_rows", 100))
        self.batch_rows = int(options.get("batch_rows", 37))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self):
        return {"offset": 0}

    def read(self, start: dict):
        s = int(start["offset"])
        e = min(s + self.batch_rows, self.max_rows)
        return (
            iter([_gen_row(self.seed, i) for i in range(s, e)]),
            {"offset": e},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [_gen_row(self.seed, i)
             for i in range(int(start["offset"]), int(end["offset"]))]
        )


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string, n_chars int"

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticDocsReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> SyntheticDocsStreamReader:
        return SyntheticDocsStreamReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)
