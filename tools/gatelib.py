"""Shared helpers for reading the committed CORRECTNESS artifacts.

``green(row)`` is THE definition of a fully-green driver/local gate row
(rows + schema + hash-not-failed + no error), shared by
tools/gen_queries_md.py (the QUERIES.md index) and tools/gen_window.py
(the rotation planner) so the two can never disagree about whether a
round graded a query (ADVICE r07: the index used to skip the err check
and could advertise an errored round as green while the planner
re-queued it).
"""

from __future__ import annotations


def green(row: dict) -> bool:
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match") is not False
        and not row.get("err")
    )
