"""Type-parity audit between Spark query outputs and their DuckDB
oracles. The value-hash comparator stringifies values, so it can hide
engine type divergences that a stricter (Arrow-typed) comparator would
flag — the round-1 driver failures were exactly this (DuckDB HUGEINT
from an uncast SUM vs Spark LONG). This tool compares schemas directly
and flags any column whose normalized type differs.

Round 12 (VERDICT r11 item 2) adds two checks for the class of bug
that made `dpp_partitioned_join` the round-11 driver red even though
every VALUE was exactly equal:

1. **Decimal-scale parity**: a Decimal's *textual rendering* (what the
   hash comparator sees) depends on its scale — Decimal('1.1300') at
   scale 4 vs scale 6 renders '1.1300' vs '1.130000'. Precision may
   differ between engines (Spark decimal(38,6) vs DuckDB DECIMAL(18,6)
   render identically) but SCALE must match, so decimal columns are
   compared scale-exactly, not just as "decimal".
2. **Engine-version-dependent scale lint**: `round(DECIMAL, k)`'s
   return SCALE is an engine convention (DuckDB 1.0 keeps the input
   scale; other versions return scale k) — a bare round() feeding a
   DECIMAL output column is green on one engine pair and a silent hash
   red on another. Any oracle with a DECIMAL output column whose SQL
   contains a round() NOT immediately wrapped in CAST(... AS ...) is
   flagged; the fix is the dpp pattern: pin both sides with an explicit
   CAST / .cast("decimal(p,s)").

Usage: python tools/check_types.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

import duckdb

sys.path.insert(0, ".")

# DuckDB type -> normalized; Spark simpleString -> normalized.
_DUCK = {
    "BIGINT": "i64", "INTEGER": "i32", "SMALLINT": "i16", "TINYINT": "i8",
    "HUGEINT": "i128", "UBIGINT": "u64", "UINTEGER": "u32",
    "DOUBLE": "f64", "FLOAT": "f32", "DECIMAL": "decimal",
    "VARCHAR": "str", "BOOLEAN": "bool",
    "TIMESTAMP": "ts_us", "TIMESTAMP_NS": "ts_ns", "DATE": "date",
}
_SPARK = {
    "bigint": "i64", "int": "i32", "smallint": "i16", "tinyint": "i8",
    "double": "f64", "float": "f32", "string": "str", "boolean": "bool",
    "timestamp": "ts_us", "timestamp_ntz": "ts_us", "date": "date",
}


def norm_duck(t: str) -> str:
    t = t.strip().upper()
    if t.endswith("[]"):
        return f"array<{norm_duck(t[:-2])}>"
    base = t.split("(")[0].strip()
    return _DUCK.get(base, t.lower())


def norm_spark(t: str) -> str:
    t = t.strip()
    if t.startswith("array<") and t.endswith(">"):
        return f"array<{norm_spark(t[6:-1])}>"
    base = t.split("(")[0].strip()
    if base.startswith("decimal"):
        return "decimal"
    return _SPARK.get(base, base)


def decimal_scale(t: str) -> int | None:
    """Scale of a decimal type string ('decimal(18,4)' / 'DECIMAL(18,4)')
    from either engine; None if not a decimal."""
    m = re.match(r"\s*decimal\s*\(\s*\d+\s*,\s*(\d+)\s*\)", t, re.IGNORECASE)
    return int(m.group(1)) if m else None


def bare_rounds(sql: str) -> int:
    """Count round( occurrences NOT immediately wrapped in CAST( — the
    engine-version-dependent-scale hazard when the query emits DECIMAL.
    `CAST(round(x, k) AS DECIMAL(p,s))` pins the scale; a bare
    `round(decimal_expr, k)` inherits the engine's round-return-scale
    convention."""
    n = 0
    for m in re.finditer(r"round\s*\(", sql, re.IGNORECASE):
        head = sql[: m.start()].rstrip()
        if re.search(r"cast\s*\($", head, re.IGNORECASE):
            continue
        n += 1
    return n


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from __spark_entry__ import oracle_sql, queries
    from apache_spark_link_prediction_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = queries(), oracle_sql()
    n_flagged = 0
    for name, fn in qs.items():
        if name not in oracles:
            continue
        try:
            sdtypes = dict(fn(spark, sf_dir).dtypes)
            rows = con.execute(f"DESCRIBE SELECT * FROM ({oracles[name]})").fetchall()
            ddtypes = {r[0]: r[1] for r in rows}
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"ERROR {name}: {e}")
            n_flagged += 1
            continue
        has_decimal_out = False
        for col in sorted(set(sdtypes) & set(ddtypes)):
            s, d = norm_spark(sdtypes[col]), norm_duck(ddtypes[col])
            if s != d:
                print(f"FLAG  {name}.{col}: spark={sdtypes[col]} ({s}) duckdb={ddtypes[col]} ({d})")
                n_flagged += 1
            if s == d == "decimal":
                has_decimal_out = True
                ss, ds = decimal_scale(sdtypes[col]), decimal_scale(ddtypes[col])
                if ss != ds:
                    print(
                        f"FLAG  {name}.{col}: decimal SCALE mismatch "
                        f"spark={sdtypes[col]} duckdb={ddtypes[col]} — "
                        "renders differently under the hash comparator"
                    )
                    n_flagged += 1
        if has_decimal_out and (nb := bare_rounds(oracles[name])):
            # WARN, not FLAG (ADVICE r12): the count is query-wide, so a
            # round() feeding an unrelated DOUBLE column alongside a
            # decimal sum would false-positive and block end_of_round on
            # a correctly pinned query. Scale mismatches on the decimal
            # columns themselves (the real hash hazard) are still FLAGs
            # above; this heuristic only nudges a human to look.
            print(
                f"WARN  {name}: {nb} bare round() with DECIMAL output — "
                "if the round() produces the decimal column, pin with "
                "CAST(round(...) AS DECIMAL(p,s)) on both sides"
            )
    print(f"\n{n_flagged} type divergences" if n_flagged else "\nall types parity")
    return 1 if n_flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
