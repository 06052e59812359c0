"""Registry-shape invariants.

The driver's CORRECTNESS gate grades the first 50 ``queries()`` entries
in registration order (hash vs DuckDB for oracle-backed entries, a
weaker rows-only check otherwise); these tests pin the rotation policy
(never-graded first — oracle-backed before rows-only — then
oldest-green; outside the window, oracle-backed before rows-only) so a
refactor can't silently push verifiable queries out of the grading
window or re-grade while first-time evidence is still owed.
"""

import glob
import json
import pathlib

from apache_spark_link_prediction_spark.queries import (
    _WINDOW_ROUND,
    _WINDOW_THIS_ROUND,
    ORACLE,
    QUERIES,
)

DRIVER_WINDOW = 50
REPO = pathlib.Path(__file__).resolve().parent.parent


def _driver_graded() -> set:
    """Names with any committed driver CORRECTNESS row. For rows-only
    entries the weak (err='no_oracle', spark_rows=N) record IS their
    best possible driver evidence, so key presence counts. The r04
    funnel_conversion row also graded the since-renamed
    funnel_view_click_purchase (VERDICT r05 defect #1) — re-attributed
    additively (funnel_conversion has its own genuine r06 row)."""
    graded: set = set()
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_r[0-9][0-9].json"))):
        graded |= set(json.load(open(f)).keys())
    if "funnel_conversion" in graded:
        graded.add("funnel_view_click_purchase")
    return graded


def test_every_oracle_key_is_a_query():
    assert set(ORACLE) <= set(QUERIES)


def _graded_before_window() -> set:
    """Names with a driver row in any artifact from a round BEFORE the
    one the current window was pinned for (``_WINDOW_ROUND`` in
    queries.py). Rows in artifacts >= _WINDOW_ROUND are the window's
    own grading (first-ever evidence taking its slot, which the policy
    allows); a row in any earlier round means the entry already had
    evidence when the window was pinned — holding a slot now is a
    re-grade. ADVICE r11: keying on the ROUND NUMBER parsed from the
    filename (not "all but the positionally newest file") keeps the
    attribution right at the pre-driver commit, when the rotated
    window's own artifact does not exist yet."""
    graded: set = set()
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_r[0-9][0-9].json"))):
        rnd = int(pathlib.Path(f).name[len("CORRECTNESS_r"):-len(".json")])
        if rnd >= _WINDOW_ROUND:
            continue
        graded |= set(json.load(open(f)).keys())
    if "funnel_conversion" in graded:
        graded.add("funnel_view_click_purchase")
    return graded


def test_rows_only_window_entries_are_never_graded():
    # A rows-only query may take a grading slot ONLY for its first-ever
    # driver row (the weak rows-only check adds nothing on repeat);
    # hash-oracle entries own every re-grade slot. Implemented as
    # stated (VERDICT r10 wrong-item 1): an entry whose only driver
    # rows are from round >= _WINDOW_ROUND is taking its first-ever
    # evidence slot and is exempt — the suite must stay green the
    # moment the driver drops a fresh artifact on disk, not only at
    # the pre-driver commit.
    graded = _graded_before_window()
    offenders = [
        n for n in list(QUERIES)[:DRIVER_WINDOW]
        if n not in ORACLE and n in graded
    ]
    assert not offenders, f"rows-only re-grades inside the window: {offenders}"


def test_rows_only_entries_trail_outside_the_window():
    names = list(QUERIES)[DRIVER_WINDOW:]
    first_rows_only = next(
        (i for i, n in enumerate(names) if n not in ORACLE), len(names)
    )
    assert all(n not in ORACLE for n in names[first_rows_only:]), (
        "oracle-backed query registered after a rows-only one outside the window"
    )


def test_window_round_tracks_artifacts():
    # _WINDOW_ROUND must be bumped when the window is rotated: at the
    # pre-driver commit the window is pinned for newest_artifact + 1;
    # once the driver grades it, newest_artifact == _WINDOW_ROUND. Any
    # other relation means the pin and the rotation went out of sync.
    rounds = [
        int(pathlib.Path(f).name[len("CORRECTNESS_r"):-len(".json")])
        for f in glob.glob(str(REPO / "CORRECTNESS_r[0-9][0-9].json"))
    ]
    newest = max(rounds, default=0)
    assert _WINDOW_ROUND in (newest, newest + 1), (
        f"_WINDOW_ROUND={_WINDOW_ROUND} but newest driver artifact is "
        f"r{newest} — bump _WINDOW_ROUND when rotating the window"
    )


def test_window_list_matches_registry_head():
    # The explicit rotation list must be exactly the graded head — a name
    # missing from QUERIES (typo / removed query) would silently shrink
    # the window and waste grading slots.
    assert len(_WINDOW_THIS_ROUND) == DRIVER_WINDOW
    assert list(QUERIES)[:DRIVER_WINDOW] == _WINDOW_THIS_ROUND


def test_never_graded_before_regraded():
    # Pinned rotation policy (VERDICT r05 item 1, generalized r08):
    # while ANY registry entry has no row in ANY committed driver
    # CORRECTNESS artifact, every window slot must go to a never-graded
    # entry before any re-grade — first-time evidence beats
    # re-validation.
    graded = _driver_graded()
    never = {n for n in QUERIES if n not in graded}
    if len(never) >= DRIVER_WINDOW:
        offenders = [n for n in _WINDOW_THIS_ROUND if n in graded]
        assert not offenders, (
            f"window re-grades {offenders} while {len(never)} queries "
            "have no driver row at all"
        )
    else:
        # partial backlog: every never-graded entry must be IN the window
        left_out = [n for n in never if n not in _WINDOW_THIS_ROUND]
        assert not left_out, (
            f"never-graded entries left out of the window: {left_out}"
        )


def test_window_not_underfilled():
    # The window must be exactly full whenever the registry can fill it —
    # an underfilled window wastes grading slots.
    assert len(_WINDOW_THIS_ROUND) == min(len(QUERIES), DRIVER_WINDOW)


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


def test_local_gate_fresher_than_registry_source():
    # VERDICT r09 item 1 hardening: the committed local-gate pair must
    # have been regenerated AFTER the last change to queries.py — a
    # registry edit after gate regeneration is exactly the debt rounds
    # 7-9 shipped. CONTENT causality, not clocks (round 11): the gate
    # files carry a ``__registry_sha256__`` stamp written by
    # tools/end_of_round.py — the sha256 of the queries.py the pair
    # was generated from — and it must equal the CURRENT queries.py
    # byte-for-byte. Timestamps cannot express this: a byte-identical
    # regen (an oracle fix below the comparator's 9dp rounding) leaves
    # git clean, and committing the unchanged source afterwards bumps
    # its commit clock past the regeneration even though the content
    # the gates were built from is exactly the current one.
    import hashlib
    import re

    gates = sorted(REPO.glob("CORRECTNESS_local_r[0-9][0-9]*.json"))
    assert gates, "no local gate files committed"
    by_round: dict[int, list[pathlib.Path]] = {}
    for f in gates:
        rnd = int(re.match(r"CORRECTNESS_local_r(\d+)", f.name).group(1))
        by_round.setdefault(rnd, []).append(f)
    newest_pair = by_round[max(by_round)]
    src_sha = hashlib.sha256(
        (REPO / "apache_spark_link_prediction_spark" / "queries.py").read_bytes()
    ).hexdigest()
    for f in newest_pair:
        stamp = json.load(open(f)).get("__registry_sha256__")
        assert stamp is not None, (
            f"{f.name} has no __registry_sha256__ stamp — regenerate via "
            "python tools/end_of_round.py (the stamp is written there)"
        )
        assert stamp == src_sha, (
            f"{f.name} was generated from a different queries.py "
            f"({stamp[:12]}… vs current {src_sha[:12]}…) — run "
            "python tools/end_of_round.py and commit the regenerated "
            "pair as the round's LAST commit"
        )


def test_local_gate_covers_every_registry_entry():
    # Gate/registry invariant (VERDICT r07 item 2: the round-7 gate was
    # regenerated BEFORE the round's last query registration, so the
    # newest operator shipped with zero committed gate evidence): the
    # NEWEST committed CORRECTNESS_local_r*.json pair must contain a row
    # for every registry entry, and every row must be green. Registering
    # a query without regenerating both local gates turns this red —
    # the regeneration must be the round's last commit.
    import re
    import sys

    sys.path.insert(0, str(REPO / "tools"))
    from gatelib import green

    latest: dict[str, pathlib.Path] = {}
    for f in REPO.glob("CORRECTNESS_local_r[0-9][0-9]*.json"):
        m = re.match(r"CORRECTNESS_local_r(\d+)(_sf0001|_sf01)?\.json", f.name)
        if not m:
            continue
        key = m.group(2) or "_sf001"
        rnd = int(m.group(1))
        if key not in latest or rnd > int(
            re.match(r"CORRECTNESS_local_r(\d+)", latest[key].name).group(1)
        ):
            latest[key] = f
    # The sf0.1 sweep is a standing third gate since round 12 (VERDICT
    # r11 item 5 — it caught an oracle bug both smaller SFs hid).
    assert len(latest) == 3, (
        f"expected sf0.01 + sf0.001 + sf0.1 local gates, got {sorted(latest)}"
    )
    newest_rnd = max(
        int(re.match(r"CORRECTNESS_local_r(\d+)", f.name).group(1))
        for f in latest.values()
    )
    stale_keys = [
        k
        for k, f in latest.items()
        if int(re.match(r"CORRECTNESS_local_r(\d+)", f.name).group(1)) != newest_rnd
    ]
    assert not stale_keys, (
        f"gate SFs out of sync: {stale_keys} lag round {newest_rnd} — "
        "run python tools/end_of_round.py (it writes all three)"
    )
    for key, f in latest.items():
        rows = json.load(open(f))
        rows.pop("__registry_sha256__", None)  # freshness stamp, not an entry
        missing = [n for n in QUERIES if n not in rows]
        assert not missing, f"{f.name} missing registry entries: {missing}"
        stale = [n for n in rows if n not in QUERIES]
        assert not stale, f"{f.name} has rows for unregistered queries: {stale}"
        red = [
            n
            for n, r in rows.items()
            if not green(r)
            and not (
                r.get("rows_only")
                and r.get("err") is None
                and r.get("spark_rows") is not None
            )
        ]
        assert not red, f"{f.name} non-green rows: {red}"


def test_rows_only_entries_name_their_blocker():
    """Every rows-only registry entry (no DuckDB oracle) must carry,
    in its decorator comment or docstring, (a) the explicit
    ``rows-only`` marker, (b) WHY no SQL oracle can exist (a named
    blocker — seeded/private hash state, non-SQL-expressible numerics,
    engine-float adjudication, ...), and (c) where its correctness IS
    pinned instead (a pytest pin and/or a hash-gated twin). VERDICT
    r13 item 7: the blocker sweep is complete — this pins it so a new
    rows-only registration without a named blocker fails here, not in
    a judge pass two rounds later."""
    import inspect

    from apache_spark_link_prediction_spark.queries import ORACLE, QUERIES

    blocker_phrases = (
        "blocker",
        "not SQL-expressible",
        "hash-opaque",
        "no DuckDB",
        "not exposed",
        "unreproducible",
        "not reproducible",
        "not oracle-portable",
        "XXH64",
        "seeded",
        "does NOT transfer",
        "argmin",
    )
    pin_phrases = (
        "pinned",
        "pins",
        "asserted in tests",
        "pytest",
        "tests/",
        "hash-gated",
        "oracle-gated",
    )
    failures = []
    import re

    for name in [q for q in QUERIES if q not in ORACLE]:
        # collapse the '#'-continued comment wrapping so multi-line
        # phrases ('does\n# NOT transfer') still match
        src = re.sub(r"\s*\n\s*#?\s*", " ", inspect.getsource(QUERIES[name]))
        if "rows-only" not in src:
            failures.append(f"{name}: missing 'rows-only' marker")
        if not any(p in src for p in blocker_phrases):
            failures.append(f"{name}: no named blocker phrase")
        if not any(p in src for p in pin_phrases):
            failures.append(f"{name}: no pin/twin reference")
    assert not failures, "\n".join(failures)


def test_round_lint_flags_uncategorized_and_stale():
    """Pins tools/check_types.py's round()-in-hash-path lint (round 15):
    an oracle containing round( without a ROUND_ALLOWLIST category is
    flagged, a stale allowlist entry (no round( left) is flagged, and a
    categorized entry passes — so the dpp class can't silently re-enter
    and the allowlist can't rot."""
    import importlib.util
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "check_types", root / "tools" / "check_types.py"
    )
    ct = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ct)

    assert "approx_quantile_agg" in ct.ROUND_ALLOWLIST  # categorized
    fake = {
        "new_bad_query": "SELECT round(a / b, 6) AS r FROM t",
        "approx_quantile_agg": "SELECT round(quantile_cont(v,0.5),6) FROM t",
    }
    assert ct.lint_rounds(fake) == 1  # only the uncategorized one flags
    # stale: allowlisted name whose oracle has no round( left
    stale = {"approx_quantile_agg": "SELECT 1 AS x"}
    assert ct.lint_rounds(stale) == 1
    # clean: categorized + round-free uncategorized
    ok = {
        "approx_quantile_agg": "SELECT round(quantile_cont(v,0.5),6) FROM t",
        "integer_exact_query": "SELECT (1000000 * a) // b AS r FROM t",
    }
    assert ct.lint_rounds(ok) == 0


def test_signed_div_lint_flags_negative_numerators():
    """Pins tools/check_types.py's signed-integer-division lint (round
    16, VERDICT r15 item 3): a `//` whose numerator has a top-level
    binary minus (possibly negative → engine truncate-vs-floor
    convention risk) is flagged unless abs()-wrapped, sign-magnitude,
    or allowlisted; stale and deleted allowlist keys are flagged so
    neither allowlist can rot (ADVICE r15 #5)."""
    import importlib.util
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "check_types", root / "tools" / "check_types.py"
    )
    ct = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ct)

    # signed-risk numerator flags; abs-wrapped and count numerators pass
    assert ct.lint_signed_divs(
        {"bad": "SELECT (1000000 * (a - b)) // d AS r FROM t"}
    ) == 1
    assert ct.lint_signed_divs(
        {
            "house_form": (
                "SELECT CASE WHEN a >= b THEN (1000000*(a-b)) // d ELSE 0 "
                "END AS r0, sign(a - b) * (abs(1000000 * (a - b)) // d) "
                "AS r FROM t"
            )
        }
    ) == 1  # the guarded-CASE branch still flags; abs leg passes
    assert ct.lint_signed_divs(
        {"counts": "SELECT (1000000 * cnt) // total AS r FROM t"}
    ) == 0
    # unary minus in a literal is not a binary minus
    assert ct.lint_signed_divs({"lit": "SELECT (a + -1) // d FROM t"}) == 0
    # the deliberate sign-pin canary is allowlisted and present
    assert "numeric_intdiv_mod_suite" in ct.SIGNED_DIV_ALLOWLIST
    assert ct.lint_signed_divs(
        {"numeric_intdiv_mod_suite": "SELECT (user_id - 100) // 7 FROM t"}
    ) == 0
    # stale allowlist entry (query present, no signed-risk // left)
    assert ct.lint_signed_divs(
        {"numeric_intdiv_mod_suite": "SELECT 1 AS x"}
    ) == 1
    # deleted-from-registry allowlist keys flag via lint_removed_keys
    assert ct.lint_removed_keys({}) == len(ct.ROUND_ALLOWLIST) + len(
        ct.SIGNED_DIV_ALLOWLIST
    )
    full = dict.fromkeys(
        list(ct.ROUND_ALLOWLIST) + list(ct.SIGNED_DIV_ALLOWLIST), "SELECT 1"
    )
    assert ct.lint_removed_keys(full) == 0
