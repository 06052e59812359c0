"""Byte-Pair Encoding tokenizer TRAINING as a distributed DataFrame
loop — the tokenizer-construction step of an LLM data pipeline (Sennrich
et al. 2016 word-internal BPE), not just token counting.

Algorithm (faithful to the classic formulation):

1. Corpus → (word, count) — one aggregation; everything after runs on
   the VOCABULARY (unique words), whose size is sublinear in corpus
   size, so per-merge cost does not scale with corpus rows.
2. Each word is an array of symbols, initially characters + ``</w>``.
3. Per merge iteration: count weighted adjacent symbol pairs (in-array
   ``transform(sequence(...))`` — no window, no self-join), take the
   max-count pair (lexicographic tie-break for determinism), rewrite
   every word's symbol array by fusing adjacent occurrences.

Scale notes: the pair count is one map-side-combined aggregation over
the vocab; the argmax is a 1-row ``orderBy().limit(1).collect()`` —
bounded driver state, the same scalar-per-iteration shape as an
iterative solver's convergence check. The rewrite is a pure Catalyst
fold (aggregate over the symbol array), so the whole loop stays
JVM-side; the vocab frame is locally checkpointed each iteration to
keep the unrolled plan flat (same rationale as pagerank's
``truncate_lineage_every``).

Not SQL-oracle-expressible (iterative argmax); pinned instead by a
pytest parity test against a pure-Python reference implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"
# Unit separator — cannot appear in whitespace-tokenized text; used to
# join/split symbol pairs losslessly.
SEP = "\x1f"


def words_to_symbols(words: DataFrame, word_col: str = "word") -> DataFrame:
    """(word, count) → (symbols array<string>, count): characters plus
    the end-of-word marker."""
    syms = F.expr(
        f"concat(transform(split({word_col}, ''), c -> c), array('{END}'))"
    )
    return words.select(syms.alias("symbols"), "count")


def _pair_counts(vocab: DataFrame) -> DataFrame:
    pairs = F.expr(
        "transform(sequence(0, size(symbols) - 2),"
        f" i -> concat(symbols[i], '{SEP}', symbols[i + 1]))"
    )
    return (
        vocab.filter(F.size("symbols") >= 2)
        .select(F.explode(pairs).alias("pair"), "count")
        .groupBy("pair")
        .agg(F.sum("count").alias("n"))
    )


def _apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Fuse every adjacent (a, b) into ``a+b`` across the vocab via the
    shared left-to-right Catalyst fold."""
    return vocab.select(_merge_expr(a, b).alias("symbols"), "count")


def _merge_expr(a: str, b: str):
    """Left-to-right fold fusing every adjacent (a, b) into ``a+b``.
    Non-overlap is structural: the fused element ``a+b`` can never equal
    ``a`` (b is non-empty), so a fresh fuse cannot chain off the one
    just made — no lookahead or lock state needed."""
    return F.expr(
        f"""
        aggregate(
          symbols,
          cast(array() as array<string>),
          (acc, x) -> IF(
            size(acc) > 0 AND element_at(acc, -1) = {_lit(a)} AND x = {_lit(b)},
            concat(slice(acc, 1, size(acc) - 1), array({_lit(a + b)})),
            concat(acc, array(x))))
        """
    )


def _lit(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def train_bpe(
    docs: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 8,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a corpus. Returns the merge
    list in learned order. Deterministic: ties broken lexicographically
    on the pair string."""
    from ..functions.pairwise import tokenize

    words = (
        docs.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    vocab = words_to_symbols(words).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("n").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["pair"].split(SEP)
        merges.append((a, b))
        vocab = _apply_merge(vocab, a, b).localCheckpoint(eager=True)
    return merges


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
) -> DataFrame:
    """Segment a corpus with a learned merge list: per doc, the BPE
    token multiset sizes (n_tokens after segmentation vs n_chars) — the
    fertility statistic used to compare tokenizers. Merges apply in
    learned order, greedy left-to-right, exactly as trained."""
    from ..functions.pairwise import tokenize

    words = docs.select(
        "doc_id", F.explode(tokenize(text_col)).alias("word")
    )
    vocab = words.select(
        "doc_id",
        F.expr(f"concat(transform(split(word, ''), c -> c), array('{END}'))").alias(
            "symbols"
        ),
    )
    for a, b in merges:
        vocab = vocab.select("doc_id", _merge_expr(a, b).alias("symbols"))
    return vocab.groupBy("doc_id").agg(
        F.sum(F.size("symbols")).alias("n_bpe_tokens"),
        F.count(F.lit(1)).alias("n_words"),
    )
