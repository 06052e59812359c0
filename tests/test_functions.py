"""Unit tests for the scalar/pairwise expression layer (reference F1-F5
semantics, SURVEY.md §2.5) on literal fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_spark_link_prediction_spark.functions.pairwise import (
    common_token_count,
    common_token_count_multiset,
    equality_flag,
    exact_div,
    jaccard_tokens,
    signed_exact_div,
    tokenize,
    year_difference,
)
from apache_spark_link_prediction_spark.functions.textstats import (
    bpe_ish_token_count,
    detect_language,
    doc_fingerprint,
    whitespace_token_count,
)
from apache_spark_link_prediction_spark.functions.vectors import cosine_similarity


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_tokenize_trims_lowercases_drops_empty(spark):
    row = spark.createDataFrame([("  Hello   WORLD  ",), ("",), (None,)], ["t"])
    out = [r["toks"] for r in row.select(tokenize("t").alias("toks")).collect()]
    assert out[0] == ["hello", "world"]
    assert out[1] == []
    assert out[2] is None


def test_common_token_count_set_vs_multiset(spark):
    df = spark.createDataFrame([(["a", "a", "b"], ["a", "a", "c"])], ["x", "y"])
    got = df.select(
        common_token_count("x", "y").alias("s"),
        common_token_count_multiset("x", "y").alias("m"),
    ).first()
    # set semantics dedupes ({a}); multiset counts min multiplicity (a,a)
    # — Scala Seq.intersect parity (Predictor.scala:68-75).
    assert got["s"] == 1
    assert got["m"] == 2


def test_common_token_count_null_is_zero(spark):
    df = spark.createDataFrame([(None, ["a"])], "x array<string>, y array<string>")
    got = df.select(
        common_token_count("x", "y").alias("s"),
        common_token_count_multiset("x", "y").alias("m"),
    ).first()
    assert got["s"] == 0 and got["m"] == 0


def test_equality_flag_null_safe(spark):
    # Reference compares post-fill("") values: missing==missing → 1
    # (Predictor.scala:52-59 with 132-134); eqNullSafe reproduces that
    # even without the fill.
    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), (None, None), (None, "a")], "x string, y string"
    )
    got = [r["f"] for r in df.select(equality_flag("x", "y").alias("f")).collect()]
    assert got == [1, 0, 1, 0]


def test_year_difference_cast_null_semantics(spark):
    # String years implicitly cast; unparseable → null propagates
    # (Predictor.scala:41-43, 256; SURVEY.md §1.2).
    df = spark.createDataFrame(
        [("1999", "2003"), ("2003", "1999"), ("n/a", "1999")], "x string, y string"
    )
    got = [r["d"] for r in df.select(year_difference("x", "y").alias("d")).collect()]
    assert got == [4, 4, None]


def test_jaccard_tokens(spark):
    df = spark.createDataFrame(
        [(["a", "b"], ["b", "c"]), ([], [])],
        "x array<string>, y array<string>",
    )
    got = [r["j"] for r in df.select(jaccard_tokens("x", "y").alias("j")).collect()]
    assert got[0] == pytest.approx(1 / 3)
    assert got[1] == 0.0


def test_exact_div_is_exact_past_2_to_53(spark):
    """Pins the ADVICE r15 #1 fix: exact_div uses IntegralDivide, so
    quotients beyond the double-precision cliff (2^53) come back exact
    — the former (n − n%d)/d double path returned q−1 for e.g.
    (2^60+7) div 3. Also pins signed_exact_div's magnitude semantics
    (sign·(|n| div d)): identical under truncate AND floor conventions,
    so a DuckDB upgrade can't flip it."""
    df = spark.createDataFrame(
        [
            (2**60 + 7, 3),  # past 2^53: the regression case
            (2**62 + 12345, 7),
            (10, 3),
            (0, 5),
        ],
        "n long, d long",
    )
    got = [
        r["q"]
        for r in df.select(exact_div(F.col("n"), F.col("d")).alias("q"))
        .orderBy(F.col("n"))
        .collect()
    ]
    assert got == [0, 10 // 3, (2**60 + 7) // 3, (2**62 + 12345) // 7]

    sdf = spark.createDataFrame(
        [(-7, 2), (7, 2), (-(2**60) - 7, 3), (0, 9)], "n long, d long"
    )
    sgot = {
        r["n"]: r["q"]
        for r in sdf.select(
            "n", signed_exact_div(F.col("n"), F.col("d")).alias("q")
        ).collect()
    }
    # magnitude semantics: -7/2 -> -3 (NOT floor's -4)
    assert sgot == {-7: -3, 7: 3, -(2**60) - 7: -((2**60 + 7) // 3), 0: 0}


def test_detect_language_markers(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of the house",),
            ("der hund und die katze ist nicht da",),
            ("le chat est dans la maison pour toujours",),
            ("zzz qqq xxx",),
        ],
        ["t"],
    )
    got = [r["l"] for r in df.select(detect_language("t").alias("l")).collect()]
    assert got == ["en", "de", "fr", "und"]


def test_token_counts(spark):
    df = spark.createDataFrame([("Hello, world! 42 times",)], ["t"])
    got = df.select(
        whitespace_token_count("t").alias("w"), bpe_ish_token_count("t").alias("b")
    ).first()
    assert got["w"] == 4
    # Hello , world ! 42 times → 6 BPE-ish pre-tokens
    assert got["b"] == 6


def test_doc_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",), ("different text",)], ["t"]
    )
    got = [r["f"] for r in df.select(doc_fingerprint("t").alias("f")).collect()]
    assert got[0] == got[1]
    assert got[2] != got[0]


def test_cosine_similarity_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 2.0], [2.0, 4.0]), ([0.0, 0.0], [1.0, 1.0])],
        "x array<double>, y array<double>",
    )
    got = [r["c"] for r in df.select(cosine_similarity("x", "y").alias("c")).collect()]
    assert got[0] == pytest.approx(0.0)
    assert got[1] == pytest.approx(1.0)
    assert got[2] == 0.0  # degenerate → 0, not NaN


def test_sketch_aggregates_error_bounds(spark, sf_dir):
    """HLL++ distinct estimate within 5·rsd of exact; GK approx
    percentile's value lies within the ±ε-rank neighborhood of the
    exact per-group value distribution."""
    from pyspark.sql import functions as F

    from apache_spark_link_prediction_spark.queries import QUERIES
    from apache_spark_link_prediction_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    # The registry queries fold the sketch into a boolean bound flag
    # (oracle-portable); assert the flag AND the raw ≤5·rsd bound here.
    distinct_rows = QUERIES["approx_distinct_agg"](spark, sf_dir).collect()
    assert {r.event_type for r in distinct_rows} == set(exact)
    assert all(r.approx_within_10pct for r in distinct_rows)
    approx = {
        r.event_type: r.est
        for r in events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("est"))
        .collect()
    }
    for k, est in approx.items():
        assert abs(est - exact[k]) <= max(1, 5 * 0.02 * exact[k]), (k, est, exact[k])

    quantile_rows = QUERIES["approx_quantile_agg"](spark, sf_dir).collect()
    assert all(r.approx_within_rank_bound for r in quantile_rows)
    got = {
        r.event_type: (r.p50, r.p95, r.p99)
        for r in events.groupBy("event_type")
        .agg(
            F.expr("approx_percentile(value, 0.5, 1000)").alias("p50"),
            F.expr("approx_percentile(value, 0.95, 1000)").alias("p95"),
            F.expr("approx_percentile(value, 0.99, 1000)").alias("p99"),
        )
        .collect()
    }
    vals = {
        k: sorted(v.value for v in events.filter(F.col("event_type") == k).select("value").collect())
        for k in got
    }
    eps = 1.0 / 1000
    for k, (p50, p95, p99) in got.items():
        xs = vals[k]
        n = len(xs)
        for q, est in ((0.5, p50), (0.95, p95), (0.99, p99)):
            lo = xs[max(0, int((q - 2 * eps) * n) - 1)]
            hi = xs[min(n - 1, int((q + 2 * eps) * n) + 1)]
            assert lo <= est <= hi, (k, q, est, lo, hi)


def test_winnowing_guarantee_and_density(spark):
    """The Schleimer et al. winnowing contract: (1) two documents
    sharing a token run of >= k+w-1 tokens share at least one
    fingerprint even when everything around the run differs; (2) two
    documents with NO shared k-gram share no fingerprint (fingerprints
    are gram hashes — no false sharing without a shared gram); (3) the
    selection density sits near the expected 2/(w+1) on long
    unstructured text."""
    from apache_spark_link_prediction_spark.functions.textstats import (
        with_winnowing_fingerprints,
    )

    k, w = 3, 4
    run = "alpha bravo charlie delta echo foxtrot"  # k+w-1 = 6 tokens
    doc_a = "one two three four " + run + " five six seven"
    doc_b = "red green blue " + run + " yellow purple"
    doc_c = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    import random

    rng = random.Random(42)
    long_doc = " ".join(f"t{rng.randrange(10**6)}" for _ in range(400))
    df = spark.createDataFrame(
        [(1, doc_a), (2, doc_b), (3, doc_c), (4, long_doc)],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: set(r["fps"])
        for r in with_winnowing_fingerprints(df, "text", k=k, w=w)
        .select("doc_id", "fps")
        .collect()
    }
    assert rows[1] & rows[2], "shared k+w-1 run must share a fingerprint"
    assert not (rows[1] & rows[3]) and not (rows[2] & rows[3])
    n_grams = 400 - k + 1
    density = len(rows[4]) / n_grams
    assert 0.25 <= density <= 0.55, f"density {density:.3f} far from 2/(w+1)=0.4"
    # empty and sub-window docs
    tiny = spark.createDataFrame(
        [(1, ""), (2, "a b"), (3, "a b c")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["fps"]
        for r in with_winnowing_fingerprints(tiny, "text", k=k, w=w)
        .select("doc_id", "fps")
        .collect()
    }
    assert got[1] == [] and got[2] == [] and len(got[3]) == 1
