"""p1 — supervised link prediction (the reference's flagship pipeline,
Predictor.scala:350-380):

scan → sample → preprocess → label test pairs by ground-truth existence
→ double self-join each edge list against the node table → 6 pairwise
features → VectorAssembler → LogisticRegression(maxIter=100) →
threshold-swept P/R/F1.

Feature parity notes (SURVEY.md §2.7):
- the tf·idf vector feature comes from the *destination* node only
  (reference asymmetry, §2.7-2) — reproduced here;
- year difference uses cast-then-null semantics, rows with any null
  feature are dropped (na.drop, Predictor.scala:283-286);
- same-journal compares post-fill("") values, so missing==missing → 1.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.classification import LogisticRegression, LogisticRegressionModel
from pyspark.ml.feature import VectorAssembler
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.pairwise import (
    common_token_count,
    equality_flag,
    to_double_label,
    year_difference,
)
from ..operators.joins import enrich_edges_both_sides, label_by_existence
from .metrics import best_f1, threshold_metrics
from .text_pipeline import preprocess_documents

MAX_ITERATIONS = 100  # Predictor.scala:30


def pair_features(
    edges: DataFrame,
    info: DataFrame,
    *,
    info_id: str = "srcId",
    token_cols: tuple[str, ...] = ("title_tokens", "authors_tokens", "abstract_tokens"),
    journal_col: str = "journal",
    year_col: str = "year",
    tfidf_col: str = "tf_idf",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """getFinalDataFrame (Predictor.scala:251-287): enrich both edge
    endpoints, emit the 5 scalar features + destination tf·idf.

    Only the needed attr columns are carried through the joins (the
    reference ships every intermediate ML column through both shuffles).
    """
    attrs = [*token_cols, journal_col, year_col]
    if tfidf_col:
        attrs.append(tfidf_col)
    enriched = enrich_edges_both_sides(edges, info, info_id=info_id, attrs=attrs)

    feature_cols = [
        common_token_count(f"{c}_from", f"{c}_to").alias(f"common_{c.removesuffix('_tokens')}")
        for c in token_cols
    ]
    feature_cols.append(
        equality_flag(f"{journal_col}_from", f"{journal_col}_to").alias("same_journal")
    )
    feature_cols.append(
        year_difference(f"{year_col}_from", f"{year_col}_to").alias("year_diff")
    )
    out_cols = [F.col(c) for c in (*edges.columns, *keep_cols)]
    if tfidf_col:
        # §2.7-2: the vector feature is the *to*-side tf_idf only.
        out_cols.append(F.col(f"{tfidf_col}_to").alias(tfidf_col))
    return enriched.select(*out_cols, *feature_cols)


SCALAR_FEATURES = ("common_title", "common_authors", "common_abstract", "same_journal", "year_diff")


def assemble_features(
    df: DataFrame,
    *,
    scalar_features: tuple[str, ...] = SCALAR_FEATURES,
    tfidf_col: str | None = "tf_idf",
    label_col: str | None = "label",
) -> DataFrame:
    """VectorAssembler (M6, Predictor.scala:274-286): scalar features +
    tf·idf → ``features`` vector; labels recast to double; na.drop."""
    df = df.na.drop(subset=list(scalar_features))
    inputs = list(scalar_features) + ([tfidf_col] if tfidf_col else [])
    assembler = VectorAssembler(inputCols=inputs, outputCol="features")
    out = assembler.transform(df)
    if label_col and label_col in df.columns:
        out = out.withColumn(label_col, to_double_label(label_col))
    return out


@dataclass
class P1Result:
    model: LogisticRegressionModel
    predictions: DataFrame
    metrics: DataFrame
    best_f1: float


def train_predict(
    train: DataFrame, test: DataFrame, *, max_iter: int = MAX_ITERATIONS
) -> tuple[LogisticRegressionModel, DataFrame]:
    """M7 (Predictor.scala:367-376): fit LR on train, score test."""
    lr = LogisticRegression(
        maxIter=max_iter, featuresCol="features", labelCol="label", predictionCol="prediction"
    )
    model = lr.fit(train)
    return model, model.transform(test)


def run_p1(
    spark: SparkSession,
    info: DataFrame,
    train_edges: DataFrame,
    test_pairs: DataFrame,
    truth_edges: DataFrame,
    *,
    fraction: float = 1.0,
    seed: int = 12345,
    text_cols: tuple[str, ...] = ("abstract", "title"),
    authors_col: str | None = "authors",
    journal_col: str = "journal",
    year_col: str = "year",
) -> P1Result:
    """Full p1 (Predictor.scala:350-380) over reference-shaped tables."""
    if fraction < 1.0:
        info = info.sample(fraction=fraction, seed=seed)  # §2.7-5: sample pre-IDF
    processed, _ = preprocess_documents(
        info,
        text_cols=list(text_cols),
        authors_col=authors_col,
        fill_cols=[*text_cols, *( [authors_col] if authors_col else [] ), journal_col],
    )
    # Cache: both the train-side and test-side double joins consume this
    # (the reference recomputes the whole preProcess lineage twice —
    # Predictor.scala:360-361; SURVEY.md §4).
    processed = processed.cache()

    token_cols = tuple(
        [f"{c}_tokens" for c in ("title",) if f"{c}_tokens" in processed.columns]
        + ([f"{authors_col}_tokens"] if authors_col else [])
        + [f"{c}_tokens" for c in ("abstract",) if f"{c}_tokens" in processed.columns]
    )
    labeled_test = label_by_existence(test_pairs, truth_edges)
    feats = dict(
        info_id="srcId",
        token_cols=token_cols,
        journal_col=journal_col,
        year_col=year_col,
    )
    train_f = pair_features(train_edges, processed, **feats)
    test_f = pair_features(labeled_test, processed, **feats)
    # Rename positional feature names to the canonical scalar set.
    rename = dict(zip([f"common_{c.removesuffix('_tokens')}" for c in token_cols],
                      ("common_title", "common_authors", "common_abstract")))
    for old, new in rename.items():
        train_f = train_f.withColumnRenamed(old, new)
        test_f = test_f.withColumnRenamed(old, new)

    train_a = assemble_features(train_f)
    test_a = assemble_features(test_f)
    model, predictions = train_predict(train_a, test_a)
    m = threshold_metrics(predictions)
    return P1Result(model=model, predictions=predictions, metrics=m,
                    best_f1=best_f1(predictions))
