"""End-of-round checklist as ONE command (VERDICT r08 item 2) — the
gate-regeneration discipline that rounds 7 and 8 both shipped as debt,
made structurally un-skippable:

    python tools/end_of_round.py [--round N]

runs, in order, failing fast with a non-zero exit on the first red step:

1. ``tools/audit_plans.py --all``       — 0 flagged plans
2. ``tools/check_types.py``             — schema drift check
3. ``tools/gen_queries_md.py``          — regenerate QUERIES.md
4. ``tools/check_oracle.py`` at sf0.01  → ``CORRECTNESS_local_r{N}.json``
5. ``tools/check_oracle.py`` at sf0.001 → ``CORRECTNESS_local_r{N}_sf0001.json``
6. ``tools/check_oracle.py`` at sf0.1   → ``CORRECTNESS_local_r{N}_sf01.json``
   (standing since round 12 — VERDICT r11 item 5: the first sf0.1
   sweep caught a DuckDB LEAST/GREATEST DECIMAL→DOUBLE promotion bug
   both smaller SFs hid under the comparator's 9dp rounding)
7. ``pytest tests/ -q``                 — full suite, 0 failed

The local gate trio (steps 4-6) is what
tests/test_registry.py::test_local_gate_covers_every_registry_entry
pins: the NEWEST committed pair must cover every registry entry, so
these files must be part of the round's LAST commit — register no new
query after running this. ``--round`` defaults to newest driver
artifact round + 1 (the round currently being built). The bench is a
separate, quiet-box step (see MEMORY: bench-methodology) and is not run
here unless the caller opts in later; this script is the correctness
half of the checklist.
"""

from __future__ import annotations

import glob
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def current_round() -> int:
    rounds = [
        int(re.match(r"CORRECTNESS_r(\d+)\.json", os.path.basename(f)).group(1))
        for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r[0-9][0-9].json"))
    ]
    return max(rounds, default=0) + 1


def stamp_registry_sha(*gates: str) -> None:
    """Embed the sha256 of queries.py into each freshly-written gate
    file (key ``__registry_sha256__``). Content causality, not clocks
    (round 11): an oracle fix below the comparator's 9dp rounding
    regenerates a byte-identical gate pair, which git sees as clean —
    and once the source edit is committed, its commit timestamp
    post-dates the regeneration even though the CONTENT the gates were
    built from is exactly the current one. The stamp lets
    tests/test_registry.py::test_local_gate_fresher_than_registry_source
    assert the gates match the registry source byte-for-byte, immune
    to commit ordering, fresh checkouts, and identical regens."""
    import hashlib
    import json

    sha = hashlib.sha256(
        open(
            os.path.join(
                REPO, "apache_spark_link_prediction_spark", "queries.py"
            ),
            "rb",
        ).read()
    ).hexdigest()
    for path in gates:
        data = json.load(open(path))
        data["__registry_sha256__"] = sha
        with open(path, "w") as fh:
            json.dump(data, fh, indent=1)
    print(f"ok registry-sha stamp ({sha[:12]}…)", flush=True)


def verify_gate_files(*gates: str) -> None:
    """Fail loudly if either freshly-written gate file's entry set
    differs from the registry at HEAD (VERDICT r09 item 1) — a cheap,
    Spark-free check that catches the exact failure mode rounds 7-9 all
    shipped: a query registered AFTER the gate regeneration, leaving
    the committed pair missing entries. Runs after steps 4-5 write the
    files, before pytest, so the failure names the offending entries
    instead of surfacing as a generic test_registry red."""
    import json

    sys.path.insert(0, REPO)
    from apache_spark_link_prediction_spark.queries import QUERIES

    for path in gates:
        rows = set(json.load(open(path))) - {"__registry_sha256__"}
        missing = sorted(set(QUERIES) - rows)
        stale = sorted(rows - set(QUERIES))
        if missing or stale:
            print(
                f"FAILED gate-vs-registry: {os.path.basename(path)} "
                f"missing={missing} stale={stale}\n"
                "A query was (un)registered after the gate regeneration "
                "— re-run tools/end_of_round.py so the pair covers the "
                "registry at HEAD.",
                flush=True,
            )
            raise SystemExit(1)
    print("ok gate-vs-registry (entry sets match the registry)", flush=True)


def run(label: str, cmd: list[str]) -> None:
    t0 = time.time()
    print(f"== {label}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, cwd=REPO)
    el = time.time() - t0
    if proc.returncode != 0:
        print(f"FAILED {label} (exit {proc.returncode}, {el:.0f}s)", flush=True)
        raise SystemExit(proc.returncode)
    print(f"ok {label} ({el:.0f}s)", flush=True)


def main() -> int:
    args = sys.argv[1:]
    rnd = current_round()
    if "--round" in args:
        i = args.index("--round")
        rnd = int(args[i + 1])
    py = sys.executable
    gate = os.path.join(REPO, f"CORRECTNESS_local_r{rnd:02d}.json")
    gate_small = os.path.join(REPO, f"CORRECTNESS_local_r{rnd:02d}_sf0001.json")
    gate_sf01 = os.path.join(REPO, f"CORRECTNESS_local_r{rnd:02d}_sf01.json")
    run("audit_plans", [py, "tools/audit_plans.py", "--all"])
    run("check_types", [py, "tools/check_types.py"])
    run("gen_queries_md", [py, "tools/gen_queries_md.py"])
    run(
        "gate sf0.01",
        [py, "tools/check_oracle.py", "/root/testdata/sf0.01", "--json", gate],
    )
    run(
        "gate sf0.001",
        [py, "tools/check_oracle.py", "/root/testdata/sf0.001", "--json", gate_small],
    )
    run(
        "gate sf0.1",
        [py, "tools/check_oracle.py", "/root/testdata/sf0.1", "--json", gate_sf01],
    )
    stamp_registry_sha(gate, gate_small, gate_sf01)
    verify_gate_files(gate, gate_small, gate_sf01)
    run("pytest", [py, "-m", "pytest", "tests/", "-q"])
    print(
        f"\nALL GREEN for round {rnd}. Now commit (as the round's LAST "
        f"commits — no new query registrations after this):\n"
        f"  git add {os.path.basename(gate)} {os.path.basename(gate_small)} "
        f"{os.path.basename(gate_sf01)} QUERIES.md\n  git commit"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
