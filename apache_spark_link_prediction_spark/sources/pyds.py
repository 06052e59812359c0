"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic event generator.

This is the extension surface a PySpark-native engine exposes when a
feed has no built-in connector (internal REST endpoints, bespoke binary
logs, queue snapshots): implement ``DataSource`` + ``DataSourceReader``
in pure Python, register once per session, and the source becomes a
normal ``spark.read.format(...)`` — partition-parallel (one
``InputPartition`` per task, so a 1000-executor cluster fans out
reads), schema'd, and composable with every downstream operator.

The generator is closed-form deterministic (Knuth multiplicative hash
of the row id), which is what makes it gate-checkable: DuckDB can
reproduce every row from ``range(n)``, so the registry query over this
source is hash-verified end-to-end — reader plumbing included.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# Knuth multiplicative hash constant; modulus 2^32 keeps the closed
# form expressible in any engine's integer arithmetic.
_KNUTH = 2654435761
_MOD = 2**32


def synthetic_row(event_id: int) -> tuple[int, int, float]:
    """The single source of truth for generated rows (shared by the
    reader, tests, and the closed-form SQL twin in queries.py)."""
    h = (event_id * _KNUTH) % _MOD
    return (event_id, h % 10, (h % 100000) / 1000.0)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` after registration.

    Options: ``n`` total rows (default 10_000), ``partitions`` read
    parallelism (default 8).
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, bucket int, value double"

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 10_000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self):
        # Contiguous id ranges: planner-visible parallelism, no state
        # shared between tasks, deterministic under any scheduling.
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition: InputPartition):
        lo = partition.value * self.n // self.num_partitions
        hi = (partition.value + 1) * self.n // self.num_partitions
        for event_id in range(lo, hi):
            yield synthetic_row(event_id)


def register_synthetic_source(spark) -> None:
    """Idempotent registration (latest registration wins in Spark)."""
    spark.dataSource.register(SyntheticEventsDataSource)
