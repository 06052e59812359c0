"""Reader tests: the reference's four scan formats (S1-S4) parsed with
exact positional/separator semantics (Predictor.scala:83-203), plus the
deterministic sample (S6)."""

from __future__ import annotations

from apache_spark_link_prediction_spark.sources import (
    read_edges,
    read_ground_truth,
    read_labeled_edges,
    read_node_info,
    sample_deterministic,
)


def test_read_node_info_quoted_csv(spark, tmp_path):
    p = tmp_path / "node_information.csv"
    p.write_text(
        '1001,1999,"A title","Smith, J., Doe, A.",Nature,"An abstract, with comma"\n'
        "1002,,No year,,,\n"
    )
    df = read_node_info(spark, str(p))
    rows = {r["srcId"]: r for r in df.collect()}
    assert rows["1001"]["authors"] == "Smith, J., Doe, A."  # quoted commas kept
    assert rows["1001"]["abstract"] == "An abstract, with comma"
    assert rows["1002"]["year"] is None  # empty → null (pre-fill)
    assert df.columns == ["srcId", "year", "title", "authors", "journal", "abstract"]


def test_read_labeled_edges_space_separated(spark, tmp_path):
    p = tmp_path / "training_set.txt"
    p.write_text("9510123 9502114 1\n9707075 9604178 0\n")
    rows = read_labeled_edges(spark, str(p)).collect()
    assert [(r["srcId"], r["dstId"], r["label"]) for r in rows] == [
        ("9510123", "9502114", 1),
        ("9707075", "9604178", 0),
    ]


def test_read_edges_and_ground_truth_separators(spark, tmp_path):
    e = tmp_path / "testing_set.txt"
    e.write_text("1182 9807076\n")
    g = tmp_path / "truth.txt"
    g.write_text("1182\t9807076\n")
    assert read_edges(spark, str(e)).first()["dstId"] == "9807076"
    assert read_ground_truth(spark, str(g)).first()["dstId"] == "9807076"
    # variable-width string ids, no zero-pad normalization (§2.7-4)
    assert read_edges(spark, str(e)).first()["srcId"] == "1182"


def test_sample_deterministic_seed(spark, docs):
    a = sample_deterministic(docs, 0.2).select("doc_id").collect()
    b = sample_deterministic(docs, 0.2).select("doc_id").collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert sample_deterministic(docs, 1.0) is docs  # fraction 1 short-circuits


def test_bucketed_join_elides_shuffle(spark, sf_dir):
    """Co-bucketed tables joined on the bucket key must plan without a
    shuffle (no Exchange below the join) — bucketing's whole point."""
    from apache_spark_link_prediction_spark.sources.readers import load_table, write_bucketed

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "orders_b", bucket_by="o_orderkey", num_buckets=8, sort_by="o_orderkey")
    write_bucketed(li, "lineitem_b", bucket_by="l_orderkey", num_buckets=8, sort_by="l_orderkey")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a, b = spark.table("orders_b"), spark.table("lineitem_b")
        j = a.join(b, a.o_orderkey == b.l_orderkey)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and it actually runs
        assert j.count() == a.join(b, a.o_orderkey == b.l_orderkey).count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    """64-way fragmented write → compaction sized from source bytes →
    few files, identical rows."""
    from apache_spark_link_prediction_spark.sources.readers import compact_parquet

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    df = spark.range(100_000).selectExpr("id", "id % 7 AS k", "CAST(id AS STRING) AS s")
    df.repartition(64).write.mode("overwrite").parquet(src)
    import os

    n_src = sum(f.endswith(".parquet") for f in os.listdir(src))
    assert n_src == 64
    total = sum(
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src)
        if f.endswith(".parquet")
    )
    planned = compact_parquet(spark, src, dst, target_file_bytes=total // 4 + 1)
    n_dst = sum(f.endswith(".parquet") for f in os.listdir(dst))
    assert n_dst == planned <= 4
    assert spark.read.parquet(dst).count() == 100_000
    got = spark.read.parquet(dst).selectExpr("sum(id)", "sum(k)").first()
    want = df.selectExpr("sum(id)", "sum(k)").first()
    assert got == want
