"""Benchmark runner (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line.

Each query is forced end-to-end with the noop sink (computes every
column, writes nothing — unlike ``count()``, which lets Catalyst prune
the projection and would under-measure).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pair_features_flagship",
    "tpch_q1_agg",
    "tpch_q3_topk",
    "window_running_sum",
    "sessionize_events",
    "graph_common_neighbors",
    "dedup_exact",
    "dedup_token_jaccard",
    "dedup_minhash",
    "dedup_simhash",
    "embedding_topk_bruteforce",
    "embedding_ann_lsh",
    "lang_id",
    "text_quality",
    "token_counts",
    "p2_lsh_similarity",
    "embedding_ann_ivf",
    "json_props_extract_agg",
    "semi_anti_existence",
    "salted_skew_join",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    # Load guard: a busy box inflates wall-clock and has previously been
    # misread as a plan regression (r04 embedding_ann_lsh, adjudicated as
    # contention in BASELINE.md Round 5).  Record the pre-run 1-min load
    # and flag the run when it exceeds half the worker threads so a
    # reviewer can discount the numbers without re-measuring.
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    load_elevated = load1 is not None and load1 > cpus / 2

    from apache_spark_link_prediction_spark.queries import QUERIES
    from apache_spark_link_prediction_spark.session import get_spark

    spark = get_spark(app_name="bench")
    # Warm the JVM/codegen paths and the parquet footers so query
    # timings measure the plans, not first-touch initialization.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from apache_spark_link_prediction_spark.sources.readers import TESTDATA_TABLES, load_table

    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).limit(1).collect()

    # Steady-state methodology (JMH-style): run the full headline list
    # once UNTIMED at the target SF, then time the second pass.  First
    # executions pay whole-stage-codegen compilation, C2 JIT tiering,
    # and spark.ml class-loading, which have repeatedly been misread as
    # plan regressions (dedup_minhash "creep" 7.3-8.4s first-run vs
    # 1.8-2.1s steady-state ×3 at sf0.1; embedding_ann_ivf's one-time
    # ML class-load — BASELINE.md Rounds 5-6).  The timed numbers below
    # are the warm per-plan cost a long-running cluster sees; the
    # warm-up pass's own wall-clock is reported as ``first_pass_sec``
    # so cold-start cost stays visible rather than hidden.
    t_warm = time.perf_counter()
    for name in HEADLINE:
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # warm-up must never fail the bench
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)
    first_pass = round(time.perf_counter() - t_warm, 3)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "first_pass_sec": first_pass,
                "load1_pre_run": load1,
                "load_elevated": load_elevated,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
