"""Vector math over ``array<float|double>`` embedding columns as
higher-order Catalyst expressions — the JVM-side primitives behind
similarity search and embedding-cosine dedup. ``F.zip_with`` +
``F.aggregate`` keep the arithmetic inside whole-stage codegen
(sequential left-to-right fold → deterministic, oracle-matchable)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot_product(a: Column | str, b: Column | str) -> Column:
    a, b = _as_double(_col(a)), _as_double(_col(b))
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column | str) -> Column:
    a = _as_double(_col(a))
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either norm is 0 (degenerate vector)."""
    a, b = _col(a), _col(b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom).otherwise(F.lit(0.0))
