"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
the same scale factor; compare row count, column names, and an
order-insensitive value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
import traceback

import duckdb

sys.path.insert(0, ".")


def normalize(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(normalize(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from __spark_entry__ import oracle_sql, queries
    from apache_spark_link_prediction_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = queries(), oracle_sql()
    failures = []
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            failures.append(name)
            report[name] = {"err": "spark error"}
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"ok    {name}: rows-only n={len(srows)} cols={scols} ({el:.1f}s)")
            report[name] = {"rows_only": True, "spark_rows": len(srows), "err": None}
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            hs, hd = table_hash(scols, srows), table_hash(dcols, drows)
            if hs != hd:
                problems.append(f"hash spark={hs} duckdb={hd}")
                # show a sample diff
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                set_s = {"|".join(normalize(r[i]) for i in order_s) for r in srows}
                set_d = {"|".join(normalize(r[i]) for i in order_d) for r in drows}
                for x in list(set_s - set_d)[:3]:
                    print(f"      spark-only: {x}")
                for x in list(set_d - set_s)[:3]:
                    print(f"      duck-only : {x}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} ({el:.1f}s)")
            failures.append(name)
            report[name] = {
                "rows_match": len(srows) == len(drows),
                "schema_match": sorted(scols) == sorted(dcols),
                "hash_match": False,
                "spark_rows": len(srows),
                "oracle_rows": len(drows),
                "err": "; ".join(problems),
            }
        else:
            print(f"PASS  {name}: n={len(srows)} ({el:.1f}s)")
            report[name] = {
                "rows_match": True,
                "schema_match": True,
                "hash_match": True,
                "spark_rows": len(srows),
                "oracle_rows": len(drows),
                "err": None,
            }
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {json_path} ({len(report)} entries)")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
