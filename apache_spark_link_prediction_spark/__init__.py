"""PySpark-native analytics engine with the query and data-processing
capabilities of vbarzokas/apache-spark-link-prediction, re-expressed
Spark-first (DataFrame/SQL + pyspark.ml), plus the LLM-data-pipeline
operator set (dedup, similarity search, multimodal columns, text
analysis) designed for 100 TB scale.

Layout
------
- ``session``    : SparkSession builder tuned for local testing / cluster scale
- ``sources``    : schema'd readers matching the reference's scans (S1-S4, S6)
- ``functions``  : scalar/pairwise/text/vector column expressions (F1-F5 + ext)
- ``operators``  : composed DataFrame operators — joins (J1-J4), dedup,
                   similarity search, top-k, multimodal plumbing
- ``plans``      : end-to-end pipelines — p1 (supervised link prediction),
                   p2 (LSH similarity discovery), text pipeline (M1-M4),
                   threshold metrics (M9, DataFrame-native)
- ``streaming``  : Structured Streaming variants over the events table

All reference citations (``Predictor.scala:NN``) point into
``/root/reference/src/main/scala/Predictor.scala``.
"""

__version__ = "0.1.0"
