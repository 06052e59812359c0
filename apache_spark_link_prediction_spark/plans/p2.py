"""p2 — unsupervised link discovery by MinHash-LSH similarity self-join
(Predictor.scala:388-422): preprocess → MinHashLSH(numHashTables=3) →
approxSimilarityJoin(X, X) → threshold → cross-validate against the
ground-truth edge list.

Two modes (SURVEY.md §2.7-1 — the reference's distance/similarity
inversion):

- ``mode="intent"`` (default): the *documented* behavior — keep pairs
  with Jaccard **similarity** ≥ threshold. The threshold is pushed into
  ``approxSimilarityJoin`` (distance ≤ 1 − threshold) so pruning
  happens inside the join, and pairs are canonicalized (src < dst,
  self-pairs dropped).
- ``mode="reference"``: the literal code behavior — join at distance
  threshold 1.0, then keep pairs with ``distCol >= threshold`` (i.e.
  the most *dissimilar* bucket-colliding pairs), self-pairs and both
  directions retained, column named ``jaccardSimilarity`` even though
  it holds a distance. Predictor.scala:404-409 reproduced bug-for-bug.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.feature import MinHashLSH
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import cross_validate_count
from .text_pipeline import preprocess_documents

NUM_HASH_TABLES = 3  # Predictor.scala:395
SIMILARITY_THRESHOLD = 0.97  # Predictor.scala:31


@dataclass
class P2Result:
    predicted_edges: DataFrame
    predicted_count: int
    correct_count: int


def lsh_similarity_join(
    features: DataFrame,
    *,
    id_col: str = "srcId",
    vec_col: str = "tf_idf",
    threshold: float = SIMILARITY_THRESHOLD,
    mode: str = "intent",
    num_hash_tables: int = NUM_HASH_TABLES,
    seed: int = 12345,
) -> DataFrame:
    """M8+J5: fit MinHashLSH on the tf·idf vectors, approximate
    similarity self-join, emit (srcId, dstId, jaccardSimilarity)."""
    lsh = MinHashLSH(
        inputCol=vec_col, outputCol="minhash_lsh", numHashTables=num_hash_tables, seed=seed
    )
    model = lsh.fit(features)
    if mode == "intent":
        joined = model.approxSimilarityJoin(
            features, features, 1.0 - threshold, distCol="distCol"
        )
        return (
            joined.select(
                F.col(f"datasetA.{id_col}").alias("srcId"),
                F.col(f"datasetB.{id_col}").alias("dstId"),
                (1.0 - F.col("distCol")).alias("jaccardSimilarity"),
            )
            .filter(F.col("srcId") < F.col("dstId"))
            .dropDuplicates(["srcId", "dstId"])
        )
    elif mode == "reference":
        joined = model.approxSimilarityJoin(features, features, 1.0, distCol="distCol")
        return (
            joined.select(
                F.col(f"datasetA.{id_col}").alias("srcId"),
                F.col(f"datasetB.{id_col}").alias("dstId"),
                F.col("distCol"),
            )
            .filter(F.col("distCol") >= threshold)
            .select("srcId", "dstId", F.col("distCol").alias("jaccardSimilarity"))
        )
    raise ValueError(f"unknown mode: {mode!r}")


def run_p2(
    spark: SparkSession,
    info: DataFrame,
    truth_edges: DataFrame,
    *,
    fraction: float = 0.2,  # Predictor.scala:26-28: ≤0.2 advised
    seed: int = 12345,
    threshold: float = SIMILARITY_THRESHOLD,
    mode: str = "intent",
    text_cols: tuple[str, ...] = ("abstract",),
    id_col: str = "srcId",
) -> P2Result:
    if fraction < 1.0:
        # right-size partitioning after the sample (AQE picks the
        # count: 1 at test scale, many at 100 TB) — see the measured
        # rationale at queries.py::p2_lsh_similarity
        info = info.sample(fraction=fraction, seed=seed).repartition(F.col(id_col))
    processed, _ = preprocess_documents(info, text_cols=list(text_cols))
    processed = processed.select(id_col, "tf_idf").cache()
    predicted = lsh_similarity_join(processed, id_col=id_col, threshold=threshold, mode=mode)
    n_pred, n_correct = cross_validate_count(predicted, truth_edges)
    return P2Result(predicted_edges=predicted, predicted_count=n_pred, correct_count=n_correct)
