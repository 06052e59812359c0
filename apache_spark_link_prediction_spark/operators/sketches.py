"""Frequent-item (heavy-hitter) detection at corpus scale.

The naive plan — groupBy(token).count().filter(count >= support) —
shuffles the ENTIRE vocabulary: at 100 TB of text that is billions of
distinct tokens, most of which occur once and can never be heavy. The
Misra-Gries summary bounds that: each partition keeps at most
``capacity`` counters (decrement-all on overflow), and the union of
per-partition survivors is a guaranteed SUPERSET of every item with
global count > n/capacity (if an item were evicted everywhere, its
total count would be ≤ Σ n_p/capacity = n/capacity). An exact recount
restricted to that candidate set then removes the false positives, so
the final answer is EXACT — expressible as plain SQL — while the wide
shuffle only ever carries ≤ capacity × num_partitions candidate rows
plus the map-side-combined recount of a tiny token set.

No counterpart in the reference (Predictor.scala has no frequency
analysis); this is the training-data-pipeline vocabulary/stopword
primitive next to ``vocab_topk`` (which is the exact full-shuffle twin).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    items: DataFrame,
    col: str,
    *,
    min_rel_freq: float = 0.001,
    rel_denominator: int = 1000,
    capacity: int = 8192,
) -> DataFrame:
    """Exact items whose count is ≥ ``ceil(n / rel_denominator)`` of
    the n total items (relative support, default 0.1%), via Misra-Gries
    candidate pruning + exact recount of the candidate set.

    EXACTNESS PRECONDITION: ``min_rel_freq > 1/capacity`` — then the
    absolute support rel·n always exceeds n/capacity, which is what
    makes the MG survivor union a candidate superset AT ANY n. Relative
    support is the scale-invariant form: the same operator config is
    exact at sf0.001 and at 100 TB. The threshold is computed with
    integer arithmetic — ``(n + denom - 1) div denom`` — so the Spark
    plan and the SQL oracle agree bit-for-bit (no float-ceil edge).

    Output: (``col``, ``n``) for every item at or above the threshold —
    identical to the full-vocabulary groupBy, which is exactly what the
    DuckDB oracle runs.
    """
    assert min_rel_freq * capacity > 1, "MG superset guarantee needs rel > 1/capacity"
    assert rel_denominator == round(1 / min_rel_freq)
    import pandas as pd

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for t in pdf[col]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < capacity:
                    counters[t] = 1
                else:
                    dead = []
                    for k in counters:
                        counters[k] -= 1
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
        yield pd.DataFrame({col: list(counters.keys())})

    src = items.select(col).where(F.col(col).isNotNull())
    schema = src.schema
    candidates = src.mapInPandas(mg_partition, schema=schema).distinct()
    total = src.agg(F.count(F.lit(1)).alias("__total"))
    threshold = F.expr(f"(__total + {rel_denominator - 1}) div {rel_denominator}")
    return (
        src.join(F.broadcast(candidates), on=col, how="left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n") >= threshold)
        .drop("__total")
    )
