"""Registry-shape invariants.

The driver's CORRECTNESS gate grades the first 50 ``queries()`` entries in
registration order; these tests pin the ordering policy (oracle-backed
first, demoted twins next, rows-only last) so a refactor can't silently
push verifiable queries out of the grading window.
"""

import glob
import json
import pathlib

from apache_spark_link_prediction_spark.queries import _WINDOW_THIS_ROUND, ORACLE, QUERIES

DRIVER_WINDOW = 50
REPO = pathlib.Path(__file__).resolve().parent.parent


def test_every_oracle_key_is_a_query():
    assert set(ORACLE) <= set(QUERIES)


def test_driver_window_is_fully_oracle_backed():
    first = list(QUERIES)[:DRIVER_WINDOW]
    missing = [n for n in first if n not in ORACLE]
    assert not missing, f"rows-only queries inside the driver window: {missing}"


def test_rows_only_entries_trail_the_registry():
    names = list(QUERIES)
    first_rows_only = next(i for i, n in enumerate(names) if n not in ORACLE)
    assert all(n not in ORACLE for n in names[first_rows_only:]), (
        "oracle-backed query registered after a rows-only one"
    )


def test_window_list_matches_registry_head():
    # The explicit rotation list must be exactly the graded head — a name
    # missing from QUERIES (typo / removed query) would silently shrink
    # the window and waste grading slots.
    assert len(_WINDOW_THIS_ROUND) == DRIVER_WINDOW
    assert list(QUERIES)[:DRIVER_WINDOW] == _WINDOW_THIS_ROUND


def test_never_graded_before_regraded():
    # Pinned rotation policy (VERDICT r05 item 1): while any oracle-backed
    # query has no row in ANY committed driver CORRECTNESS artifact, every
    # window slot must go to such a never-graded query — first-time
    # evidence beats re-validating a query the driver already hash-matched.
    # funnel_conversion's r04 row graded the since-renamed
    # funnel_view_click_purchase variant (duplicate-registration shadow),
    # so that row is re-attributed to the new name here.
    graded: set[str] = set()
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_r0[1-9].json"))):
        graded |= set(json.load(open(f)).keys())
    if "funnel_conversion" in graded:
        graded.discard("funnel_conversion")
        graded.add("funnel_view_click_purchase")
    never = {n for n in ORACLE if n not in graded}
    if len(never) >= DRIVER_WINDOW:
        offenders = [n for n in _WINDOW_THIS_ROUND if n in graded]
        assert not offenders, (
            f"window re-grades {offenders} while {len(never)} oracle-backed "
            "queries have no driver row at all"
        )


def test_window_not_underfilled():
    # If the registry has >= 50 oracle-backed queries, the window must be
    # exactly full — an underfilled window wastes grading slots.
    n_oracle = len(ORACLE)
    first = list(QUERIES)[:DRIVER_WINDOW]
    expected = min(n_oracle, DRIVER_WINDOW)
    assert sum(n in ORACLE for n in first) == expected


def test_queries_md_fresh():
    # QUERIES.md is generated (VERDICT r06 item 4); a registry change
    # without a regeneration would silently de-index new queries.
    import importlib.util

    import re

    spec = importlib.util.spec_from_file_location(
        "gen_queries_md", REPO / "tools" / "gen_queries_md.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    got = (REPO / "QUERIES.md").read_text()
    # Regenerate against the artifact set the committed file declares —
    # the driver writes a NEW CORRECTNESS_r{N}.json at round end before
    # the judge's fresh pytest run, and that must not read as staleness;
    # only a registry change without a regeneration should.
    m = re.search(r"artifacts included: through r(\d+)", got)
    want = mod.generate(through=int(m.group(1))) if m else mod.generate()
    assert got == want, "QUERIES.md stale — run: python tools/gen_queries_md.py"
