"""Physical-plan shape assertions — the scale properties README claims:
pushdown reaches the scan, column pruning shrinks ReadSchema, dim joins
broadcast, partitioned writes prune partitions at read.

These pin the *plan*, not the output: a regression that keeps results
correct but silently reads all columns or shuffles a broadcastable dim
fails here.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

import pytest

from apache_spark_link_prediction_spark.queries import QUERIES
from apache_spark_link_prediction_spark.sources.readers import load_table, write_parquet


@pytest.fixture()
def sf_dir() -> str:
    # NOT the conftest sf_dir: the session-scoped ``docs`` fixture caches
    # the sf0.001 documents table, and Spark's cache manager substitutes
    # InMemoryTableScan for any matching logical plan — which would hide
    # exactly the parquet-scan properties these tests assert. A different
    # path means a different plan, so the scan stays a real file scan.
    return "/root/testdata/sf0.01"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_scan_pushdown_and_column_pruning(spark, sf_dir):
    plan = plan_of(QUERIES["s1_scan_project_filter"](spark, sf_dir))
    assert "PushedFilters:" in plan
    # the lang equality and both BETWEEN bounds reach the parquet reader
    assert "EqualTo(lang,en)" in plan.replace(" ", "")
    assert "GreaterThanOrEqual(n_chars,200)" in plan.replace(" ", "")
    # pruned read: only the 4 referenced columns, never text
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "text" not in read_schema
    for col in ("doc_id", "lang", "source", "n_chars"):
        assert col in read_schema


def test_flagship_broadcasts_info_side(spark, sf_dir):
    plan = plan_of(QUERIES["pair_features_flagship"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_part"))
    ev = load_table(spark, sf_dir, "events")
    write_parquet(ev, path, partition_by=["event_type"])
    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = plan_of(back)
    # partition filter handled by pruning, not a data filter
    flat = plan.replace(" ", "")
    assert "PartitionFilters:[isnotnull(event_type" in flat
    assert back.count() == ev.filter(F.col("event_type") == "click").count() > 0


def test_tpch_q1_partial_aggregation(spark, sf_dir):
    """Agg runs map-side first: HashAggregate appears below AND above the
    exchange (partial + final) — the shuffle moves pre-combined rows."""
    plan = plan_of(QUERIES["tpch_q1_agg"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan
