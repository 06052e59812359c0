"""Pairwise feature expressions — the reference's scalar UDF layer (F1-F5)
rebuilt as Catalyst expressions so nothing crosses the JVM↔Python
boundary (SURVEY.md §2.5 policy: zero row-UDFs).

Reference UDFs:

- F1 ``split(authors, ",")``                      Predictor.scala:135
- F2 ``countCommonWords(a, b)``                   Predictor.scala:68-75
- F3 ``isPublishedOnSameJournal(a, b)``           Predictor.scala:52-59
- F4 ``getPublicationYearDifference(a, b)``       Predictor.scala:41-43
- F5 ``toDouble`` label cast                      Predictor.scala:257, 265
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokenize(col: Column | str) -> Column:
    """Lowercase + whitespace-split → array<string>; the Tokenizer (M1)
    contract (Predictor.scala:107-109) as a plain expression.

    ``trim`` first so leading whitespace doesn't yield a spurious empty
    leading token; a fully-empty string yields [""], filtered out.

    Whitespace is Java regex ``\\s`` — the ASCII class [ \\t\\n\\x0B\\f\\r]
    (property-pinned in tests/test_properties.py). Python's ``\\s`` adds
    Unicode whitespace; RE2 (the DuckDB oracles) drops ``\\x0B`` — both
    diverge only on characters absent from the testbed.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(F.lower(c)), r"\s+")
    # array_remove, not a filter() lambda: identical semantics (split
    # after trim can only emit "" for empty input; split never emits
    # nulls), but array_remove is a codegen'd builtin while a HOF
    # lambda drops the whole surrounding expression to interpreted
    # eval — and optimizer-duplicated copies (pushed filters, CASE
    # branches) then each pay the interpreted cost.
    return F.array_remove(toks, "")


def common_token_count(a: Column | str, b: Column | str) -> Column:
    """F2, set semantics: ``|set(a) ∩ set(b)|``.

    The reference's Scala ``Seq.intersect`` is *multiset* intersection
    (Predictor.scala:68-75); the idiomatic Catalyst target
    ``array_intersect`` dedupes. Set semantics is our default (and the
    oracle-checkable one — DuckDB ``list_intersect`` also dedupes);
    exact multiset parity lives in :func:`common_token_count_multiset`.
    Nulls → 0, matching the reference's explicit null guard.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.coalesce(F.size(F.array_intersect(a, b)), F.lit(0)).cast("int")


def common_token_count_multiset(a: Column | str, b: Column | str) -> Column:
    """F2, exact multiset parity with Scala ``Seq.intersect``: each
    element counts up to its min multiplicity in either side.

    Implemented with higher-order functions (stays in codegen):
    sum over distinct elements of min(count_a, count_b).
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b

    def count_in(arr: Column, x: Column) -> Column:
        return F.size(F.filter(arr, lambda e: e == x))

    per_elem = F.transform(
        F.array_distinct(a), lambda x: F.least(count_in(a, x), count_in(b, x))
    )
    total = F.aggregate(per_elem, F.lit(0), lambda acc, n: acc + n)
    return F.coalesce(total, F.lit(0)).cast("int")


def equality_flag(a: Column | str, b: Column | str) -> Column:
    """F3: 1 if equal else 0. The reference compares *after* na.fill(""),
    so two missing journals compare equal (Predictor.scala:52-59 with
    132-134); we reproduce that with a null-safe equality."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.when(a.eqNullSafe(b), F.lit(1)).otherwise(F.lit(0)).cast("int")


def year_difference(a: Column | str, b: Column | str) -> Column:
    """F4: ``abs(int(a) - int(b))`` with the reference's cast-then-null
    semantics — string years are implicitly cast, unparseable → null,
    null propagates (rows dropped later by na.drop; Predictor.scala:41-43,
    256, 263, 283-286). ``try_cast`` because Spark 4's default ANSI mode
    would throw on malformed input where Spark 2.4 returned null."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.abs(a.try_cast("int") - b.try_cast("int"))


def to_double_label(c: Column | str) -> Column:
    """F5: int label → double for the ML layer (Predictor.scala:257)."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("double")


def jaccard_tokens(a: Column | str, b: Column | str) -> Column:
    """Set Jaccard similarity of two token arrays:
    ``|a∩b| / |a∪b|`` (0.0 when the union is empty).

    Extension beyond the reference's UDF set — the exact-similarity
    primitive behind n-gram near-dup detection and LSH verification.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def micro_threshold(t: float) -> int:
    """Micro-unit filter bound equivalent to the exact ``score ≥ t``:
    for t whose t·10^6 is integral (0.8 → 800000 — every registered
    query), ``floor(10^6·s) ≥ t·10^6 ⟺ s ≥ t`` exactly. For
    non-decimal t (e.g. 2/3), floor the bound so a score EXACTLY at t
    still passes (666666 ≥ 666666) — the residual is a ≤1e-6 inclusion
    slack below t, the same order as the old ``round(s, 6) ≥ t``
    convention this replaces. The 1e-9 nudge absorbs binary-float
    droop (0.7·10^6 computes as 699999.99999999995)."""
    import math

    m = t * 1_000_000
    nearest = round(m)
    return nearest if abs(m - nearest) < 1e-6 else math.floor(m + 1e-9)


def exact_div(num: Column, den: Column) -> Column:
    """Exact BIGINT integral division ``num div den`` for NON-NEGATIVE
    long columns, via Spark's ``IntegralDivide`` (the SQL ``div``
    operator, callable as ``div(n, d)``) — exact over the FULL 64-bit
    range. The former ``(n − n mod d) / d`` double path was only exact
    below 2^53: the exactly-divisible numerator still had to round to
    a double before dividing, so quotients ≥ 2^53 could come back
    q−1/q+1 (ADVICE r15 #1). Caller guarantees ``den > 0`` and
    ``num ≥ 0`` (Spark's div truncates toward zero while DuckDB's
    ``//`` floors, so negative numerators would diverge — keep
    numerators non-negative, e.g. via ``F.abs``, or use
    :func:`signed_exact_div`)."""
    n = num.cast("long")
    d = den.cast("long")
    return F.call_function("div", n, d)


def signed_exact_div(num: Column, den: Column) -> Column:
    """Exact BIGINT integral division for a possibly-NEGATIVE
    numerator, with MAGNITUDE semantics: ``sign(num) · (|num| div
    den)``. Integer-division-on-negatives is an ENGINE CONVENTION
    (truncate toward zero vs floor: −7/2 → −3 vs −4; Spark ``div``
    and DuckDB 1.0 ``//`` both truncate, Python ``//`` floors, and
    the convention is version-fragile) — dividing the magnitude and
    re-applying the sign is identical under BOTH conventions because
    the magnitude is non-negative (DuckDB oracle twin:
    ``sign(num) * (abs(num) // den)``). Caller guarantees
    ``den > 0``. This is the kappa convention from r15
    (queries.py ``rater_agreement_kappa``), promoted to a shared
    helper so every signed score (deltas, drifts, correlations) uses
    one audited code path."""
    n = num.cast("long")
    return F.signum(n).cast("long") * exact_div(F.abs(n), den)


def micro_div(num: Column, den: Column) -> Column:
    """Exact BIGINT integral division ``(10^6 · num) div den`` for
    non-negative count columns — the float-free hash-path primitive
    (see :func:`jaccard_micro_tokens` for why). Caller guarantees
    ``den > 0``."""
    return exact_div(num.cast("long") * F.lit(1_000_000).cast("long"), den)


def jaccard_micro_tokens(a: Column | str, b: Column | str) -> Column:
    """Set Jaccard of two token arrays as EXACT BIGINT micro-units:
    ``(10^6 · |a∩b|) div |a∪b|`` (0 when the union is empty).

    Round 15's float-free hash-path convention (the r11/r12 dpp
    lesson, generalized): ratio-of-counts scores are the ONE class of
    rounded doubles that can land EXACTLY on a rounding half
    (p/q with q | 2·10^6 — e.g. an odd intersection over a 128-token
    union is an exact .xxxxxx5), which makes the rounded value an
    engine-convention coin flip (Spark BigDecimal HALF_UP on the
    binary expansion vs DuckDB's scaled std::round). Micro-units are
    pure integer arithmetic on both engines.

    The division is kept exact without an integral-div builtin:
    ``(n − n mod u) / u`` divides exactly, so the double quotient is
    an integer ≤ 10^6 — exactly representable, cast-safe. Filters use
    ``micro ≥ t·10^6``, equivalent to the exact ``jaccard ≥ t`` for
    integral t·10^6 (floor is monotone; the bound is an integer).
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, micro_div(inter, union)).otherwise(
        F.lit(0).cast("long")
    )
