"""Compute the next driver-window plan from the committed CORRECTNESS
artifacts.

The driver grades the FIRST 50 ``queries()`` entries each round
(rows + schema + value hash vs DuckDB). ``_WINDOW_THIS_ROUND`` in
queries.py pins that head; this tool prints the list the NEXT round
should pin, applying the documented rotation policy
(queries.py "Registry ordering" note, tests/test_registry.py):

1. never-graded oracle-backed first — no fully-green driver row in any
   committed CORRECTNESS_r*.json, in registry order (hash evidence
   beats everything);
2. then never-graded rows-only — entries without a SQL oracle whose
   driver check is rows+schema only; once every oracle-backed query
   has a row, these take window slots ahead of any RE-grade (VERDICT
   r07 item 3: first-time evidence, even weak, beats re-validation);
3. then oldest-graded — remaining oracle-backed queries ascending by
   the latest round whose row was fully green (rows+schema+hash), ties
   in registry order (rows-only entries are not re-graded: a repeat
   rows-only row adds nothing);
4. truncate to 50.

Usage:  python tools/gen_window.py [repo_root]

Prints the plan as a Python list literal (paste into
``_WINDOW_THIS_ROUND``) plus an accounting summary on stderr. Renamed
queries are handled the only safe way — a name absent from the current
registry is ignored, so the renamed query counts as never-graded and
re-enters the window under its new name.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


from gatelib import green  # shared with gen_queries_md.py (ADVICE r07)


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    from apache_spark_link_prediction_spark.queries import ORACLE, QUERIES

    latest_green: dict[str, int] = {}
    has_any_row: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r[0-9]*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            if name not in QUERIES:
                continue
            has_any_row.add(name)
            if green(row):
                latest_green[name] = max(latest_green.get(name, 0), rnd)

    oracle_backed = [n for n in QUERIES if n in ORACLE]
    never = [n for n in oracle_backed if n not in latest_green]
    # A rows-only entry's driver row is the weak (err='no_oracle',
    # spark_rows=N) record — that IS its best possible driver evidence,
    # so ANY row counts as graded for these.
    never_rows_only = [
        n for n in QUERIES if n not in ORACLE and n not in has_any_row
    ]
    graded = sorted(
        (n for n in oracle_backed if n in latest_green),
        key=lambda n: (latest_green[n], oracle_backed.index(n)),
    )
    window = (never + never_rows_only + graded)[:50]

    print(
        f"# {len(oracle_backed)} oracle-backed, {len(never)} never-graded, "
        f"{len(never_rows_only)} never-graded rows-only, "
        f"{len(graded)} graded (oldest green: "
        f"r{min((latest_green[n] for n in graded), default=0):02d})",
        file=sys.stderr,
    )
    print("_WINDOW_THIS_ROUND = [")
    for n in window:
        if n in never:
            tag = "never graded"
        elif n in never_rows_only:
            tag = "never graded (rows-only)"
        else:
            tag = f"last green r{latest_green[n]:02d}"
        print(f'    "{n}",  # {tag}')
    print("]")


if __name__ == "__main__":
    main()
