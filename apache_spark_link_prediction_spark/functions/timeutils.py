"""Timestamp → epoch helpers that tolerate both TIMESTAMP and
TIMESTAMP_NTZ inputs.

The driver's ``events.ts`` has shipped as parquet TIMESTAMP(NANOS) and
as timestamp[us] NTZ across regenerations. ``load_table`` normalizes to
session-zone TimestampType, but any code path that might see an NTZ
column (e.g. streams fed by arbitrary callers) must not do a raw
``cast("double")`` — Spark 4 forbids ``CAST(TIMESTAMP_NTZ AS DOUBLE)``.
Routing through an explicit TIMESTAMP cast first is legal for both
types and, under the pinned-UTC session, value-preserving.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(c: Column | str) -> Column:
    """Fractional epoch seconds of a timestamp-like column.

    Legal on TIMESTAMP and TIMESTAMP_NTZ alike (NTZ→TIMESTAMP is an
    allowed cast; TIMESTAMP→DOUBLE yields seconds with µs fraction).
    Prefer this over ``col.cast("double")`` everywhere gap/range
    arithmetic needs numeric event time.
    """
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("timestamp").cast("double")
