"""Solo-warm timing harness for bracketed A/Bs (the r17 adjudication
protocol as a reusable tool): time ONE query against the 10× bench
replica (or the 1× base with --1x) in a fresh JVM — clean
cache/checkpoint state, one untimed warm pass, N timed passes
(noop sink, same methodology as bench.py) — and print each timing
plus the min (mins are the signal on a box with host-stall windows;
see MEMORY bench-methodology).

Usage: python tools/solo_time.py <query> [n_timed] [--1x]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--1x"]
    use_1x = "--1x" in sys.argv[1:]
    name = args[0]
    n = int(args[1]) if len(args) > 1 else 3

    import bench
    from apache_spark_link_prediction_spark.queries import QUERIES
    from apache_spark_link_prediction_spark.session import get_spark

    spark = get_spark(app_name=f"solo_time_{name}")
    bench._SPARK = spark
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if use_1x:
        run_dir = sf_dir
    else:
        run_dir, _ = bench.ensure_replica(spark, sf_dir)
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None
    print(f"# solo_time {name} n={n} tier={'1x' if use_1x else '10x'} "
          f"load1_pre={load1}", file=sys.stderr)
    bench.run_pass(QUERIES, run_dir, [name], timed=False)
    ts = [
        bench.run_pass(QUERIES, run_dir, [name], timed=True)[name]
        for _ in range(n)
    ]
    print(f"# {name}: runs={ts} min={min(ts):.3f}s", file=sys.stderr)
    print(min(ts))
    spark.stop()


if __name__ == "__main__":
    main()
