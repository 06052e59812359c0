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

import heapq
from collections import Counter
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_prune(counters: Counter, capacity: int) -> Counter:
    """One Misra-Gries prune via the mergeable-summaries rule (Agarwal
    et al., PODS'12): subtract the (capacity+1)-th largest counter value
    ``cut`` from every counter, keep positives (≤ capacity survive).
    Destroys ≥ (capacity+1)·cut units of stream mass while
    underestimating any single item by ≤ cut, so summed over a stream
    of n items the underestimate stays ≤ n/(capacity+1): every item
    with count > n/capacity keeps a positive counter."""
    cut = heapq.nlargest(capacity + 1, counters.values())[-1]
    return Counter({k: v - cut for k, v in counters.items() if v > cut})


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

    # Counting happens in ``Counter.update`` (CPython's C-level
    # ``_count_elements`` loop — no Python bytecode per token), and the
    # O(capacity) ``mg_prune`` runs only when the dict exceeds ``slack``×
    # capacity, preserving the superset guarantee the exact recount
    # below relies on (see mg_prune). State is bounded by slack·capacity
    # + one Arrow batch's vocabulary, not the corpus.
    #
    # Chosen by measurement over the per-token decrement-all fold it
    # replaces and two pandas value_counts variants (5M-token streams):
    # 1.6× on zipf text, 1.3× on an adversarial ~1M-distinct stream;
    # the value_counts variants LOST on wide vocabularies (pandas
    # string-hash overhead ≥ the dict work it saved).
    slack = 4

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: Counter = Counter()
        for pdf in batches:
            counters.update(pdf[col].to_numpy())
            if len(counters) > slack * capacity:
                counters = mg_prune(counters, capacity)
        if len(counters) > capacity:
            counters = mg_prune(counters, capacity)
        # Keys are yielded as the original objects straight out of
        # ``to_numpy()`` — the declared output schema is ``src.schema``,
        # so a str() here would break Arrow conversion for any
        # non-string key column (numeric heavy-hitter keys).
        yield pd.DataFrame({col: list(counters)})

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


def count_min_table(
    df: DataFrame, key_col: str, *, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan '05) as a DataFrame:
    one row per non-empty cell ``(j, bucket, c)`` where ``c`` = number
    of input rows whose key hashes to ``bucket`` under hash row ``j``.

    The sketch is a fixed ``depth × width`` grid — O(1) state
    regardless of key cardinality — and cells are plain counts, so two
    sketches merge by summing cells (the property that makes it a
    100 TB pre-aggregation: each partition folds its rows into ≤
    depth×width cells map-side, and the shuffle carries cells, not
    keys). Point estimate = min over the key's ``depth`` cells;
    overcounts only (collisions add, never subtract), error ≤ n/width
    with prob ≥ 1 - 2^-depth.

    Hashing is the engine-portable rolling hash
    (functions.textstats.doc_rolling_hash) over ``'cm:<j>:<key>'`` so a
    SQL oracle can rebuild the identical grid — no xxhash64 opacity.
    """
    from ..functions.textstats import doc_rolling_hash

    keyed = df.select(F.col(key_col).cast("string").alias("__k")).select(
        "__k",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
    )
    bucket = (
        doc_rolling_hash(
            F.concat_ws(":", F.lit("cm"), F.col("j").cast("string"), F.col("__k"))
        )
        % width
    )
    return (
        keyed.select("j", bucket.alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def count_min_estimate(
    sketch: DataFrame, probes: DataFrame, key_col: str, *, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-estimate each probe key against a ``count_min_table``
    sketch: min over the key's ``depth`` cells, 0 when any cell is
    empty (absent from the sparse sketch). Probes × depth is a LEFT
    join onto the ≤ depth×width-row sketch — broadcastable by
    construction."""
    from ..functions.textstats import doc_rolling_hash

    pk = probes.select(F.col(key_col), F.col(key_col).cast("string").alias("__k")).select(
        key_col,
        "__k",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
    )
    bucket = (
        doc_rolling_hash(
            F.concat_ws(":", F.lit("cm"), F.col("j").cast("string"), F.col("__k"))
        )
        % width
    )
    return (
        pk.select(key_col, "j", bucket.alias("bucket"))
        .join(F.broadcast(sketch), on=["j", "bucket"], how="left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )
