"""Spark 4 Python DataSource: a partition-parallel "CDS view" source.

The reference's source abstraction is a MySQL "CDS view" read over JDBC
(raw_layer_job.py:103-139) — one connection, one task, whole table.  This
is the modern Spark-native version of the same concept: a custom
``DataSource`` implemented in pure Python (Spark 4 Python Data Source API)
that

- fans the read out across N ``InputPartition``s (each executor task pulls
  only its shard — the fix for the reference's single-connection scan),
- pushes ``shard = k`` equality filters into the source (whole partitions
  are skipped before any row is produced — source-level partition pruning,
  the Python-API analog of PushedFilters),
- yields Arrow-friendly tuples with a deterministic content function, so
  tests can assert exact values without a live database.

A real deployment would put an HTTP/DB client inside ``read``; everything
around it (registration, schema, partition planning, filter pushdown) is
the production shape.  Register once per session:

    spark.dataSource.register(CdsViewDataSource)
    spark.read.format("cds_view").option("view", "tableA").load()
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
)

# Same multiplicative-hash constants as operators/sampling.py — deterministic
# row content reproducible from (view, row index) alone.
_A = 2654435761
_M = 4294967296


class _Shard(InputPartition):
    def __init__(self, shard: int, n_shards: int, rows: int, view: str):
        self.shard = shard
        self.n_shards = n_shards
        self.rows = rows
        self.view = view


class CdsViewReader(DataSourceReader):
    def __init__(self, options: dict):
        self.view = options.get("view", "default_view")
        self.rows = int(options.get("rows", 1000))
        self.n_shards = int(options.get("partitions", 4))
        self.only_shard: int | None = None

    def pushFilters(self, filters: list[Filter]):
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("shard",)
                and self.only_shard is None
            ):
                self.only_shard = int(f.value)
            else:
                yield f  # not handled here — Spark evaluates it post-scan

    def partitions(self):
        shards = range(self.n_shards)
        if self.only_shard is not None:
            shards = [s for s in shards if s == self.only_shard]
        return [_Shard(s, self.n_shards, self.rows, self.view) for s in shards]

    def read(self, partition: _Shard):
        # Deterministic synthetic "view rows" for this shard only.
        for i in range(partition.shard, partition.rows, partition.n_shards):
            h = (i * _A) % _M
            yield (
                i,
                partition.shard,
                f"{partition.view}:{i}",
                float(h % 10000) / 100.0,
            )


class CdsViewDataSource(DataSource):
    """format("cds_view"): options view, rows, partitions."""

    @classmethod
    def name(cls) -> str:
        return "cds_view"

    def schema(self) -> str:
        return "row_id bigint, shard int, view_key string, amount double"

    def reader(self, schema) -> CdsViewReader:
        return CdsViewReader(self.options)

    def simpleStreamReader(self, schema) -> "CdsViewStreamReader":
        return CdsViewStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(CdsViewDataSource)


# ------------------------------------------------------------- streaming side
from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class CdsViewStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming variant: each micro-batch emits the next
    ``rows_per_batch`` rows of the deterministic view, up to ``max_rows``.
    The offset dict {"next": i} lives in the checkpoint log, so restarts
    resume exactly where they left off (readBetweenOffsets replays a
    committed range for recovery).  This is the reference's
    DynamoDB-Stream→Lambda chain collapsed into a checkpointed source.
    """

    def __init__(self, options: dict):
        self.view = options.get("view", "default_view")
        self.rows_per_batch = int(options.get("rows_per_batch", 10))
        self.max_rows = int(options.get("max_rows", 1000))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def _rows(self, start: int, end: int) -> list[tuple]:
        # list, not generator: the prefetched batch is pickled into the
        # stream's offset cache by the runner
        return [
            (i, i % 4, f"{self.view}:{i}", float(((i * _A) % _M) % 10000) / 100.0)
            for i in range(start, end)
        ]

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.rows_per_batch, self.max_rows)
        return iter(self._rows(lo, hi)), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["next"], end["next"]))
