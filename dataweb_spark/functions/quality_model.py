"""Model-based quality filtering — the classifier stage of modern corpus
pipelines (FineWeb-Edu / DCLM style): train a lightweight classifier on a
labeled (or weakly rule-labeled) subset, score the whole corpus, filter on
the predicted quality probability.

Spark-first shape:

* Features are the repo's existing text metrics — all codegen'd JVM
  expressions (`functions/text.py`), no Python in the pipeline.
* Training runs on a DETERMINISTIC hash-sampled subset
  (`text.hash_bucket`, not `rand()`), so the trained model — and therefore
  every downstream keep/drop decision — is reproducible across runs,
  partitionings, and cluster sizes. `pyspark.ml` LogisticRegression
  optimizes via distributed treeAggregate (LBFGS), which converges to the
  same optimum regardless of data layout (property-tested).
* Scoring is `model.transform` — JVM-vectorized, map-only, linear at
  100 TB; the model itself is O(features) and broadcast implicitly.

The reference engine has no counterpart (SURVEY.md §2.4 delegates all
compute); this follows the public pipeline literature.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dataweb_spark.functions import text as T

__all__ = ["quality_features", "weak_labels", "train_quality_model",
           "score_quality", "quality_model_report", "save_quality_model",
           "load_quality_model"]

FEATURE_COLS = ["f_tokens", "f_mean_wlen", "f_stopword", "f_punct",
                "f_chars"]


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the numeric feature columns (one codegen'd projection)."""
    return df.select(
        "*",
        T.token_count(text_col).cast("double").alias("f_tokens"),
        T.mean_word_length(text_col).alias("f_mean_wlen"),
        T.stopword_ratio(text_col).alias("f_stopword"),
        T.punct_ratio(text_col).alias("f_punct"),
        T.char_count(text_col).cast("double").alias("f_chars"))


def weak_labels(text_col: str = "text",
                threshold: float = 0.9) -> Column:
    """Rule-derived training label: the heuristic quality score thresholded
    — the "weak supervision" bootstrap when no human labels exist."""
    return (T.quality_score(text_col) >= threshold).cast("double")


def train_quality_model(df: DataFrame, text_col: str = "text",
                        label_col: Column | None = None,
                        train_fraction: float = 0.5,
                        sample_key: str = "doc_id",
                        max_iter: int = 30):
    """Fit a logistic-regression quality model on a deterministic
    hash-sampled subset. Returns (model, assembler)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    label = label_col if label_col is not None else weak_labels(text_col)
    feats = quality_features(df, text_col).withColumn("label", label)
    train = T.deterministic_sample(feats, sample_key,
                                   fraction=train_fraction)
    # r16 (guide §2.2): LBFGS runs ~max_iter treeAggregate JOBS over this
    # frame (ml persists the blockified instances internally), so every
    # iteration pays one task per partition — and the partition count
    # came from the session's scan-parallelism floor, not from the train
    # bytes (at bench scale: 30 jobs × 32 near-empty tasks for an ~6 MB
    # sample). Coalesce to the partition count the ESTIMATED train bytes
    # justify at the standard 128 MB target — a no-op whenever the data
    # actually fills its partitions (coalesce never raises the count),
    # so nothing is tuned to local mode. Result robustness: the report
    # contract exposes only exact counts and a ≥0.9 agreement boolean
    # (measured 0.99), and LBFGS on this convex problem converges to the
    # same optimum within 1e-6 across partitionings (property-tested),
    # so the low-bit aggregation-order drift cannot flip the output.
    try:
        nbytes = int(str(train._jdf.queryExecution().optimizedPlan()
                         .stats().sizeInBytes()))
    except Exception:  # noqa: BLE001 — stats unavailable: keep layout
        nbytes = None
    if nbytes is not None:
        train = train.coalesce(max(1, -(-nbytes // (128 << 20))))
    assembler = VectorAssembler(inputCols=FEATURE_COLS,
                                outputCol="features")
    model = LogisticRegression(maxIter=max_iter).fit(
        assembler.transform(train))
    return model, assembler


def score_quality(df: DataFrame, model, assembler,
                  text_col: str = "text",
                  out_col: str = "quality_prob") -> DataFrame:
    """Score every row with P(high quality) — JVM-side transform, map-only.

    Output = input columns + ``out_col``; the ml vector/intermediate
    columns are dropped."""
    from pyspark.ml.functions import vector_to_array

    feats = quality_features(df, text_col)
    scored = model.transform(assembler.transform(feats))
    p1 = F.element_at(vector_to_array(F.col("probability")), 2)
    keep = [c for c in df.columns]
    return scored.select(*keep, p1.alias(out_col))


def save_quality_model(model, assembler, path: str) -> None:
    """Persist the trained model + feature assembler under ``path`` —
    train once on the cluster, score any number of later corpora/batches
    without retraining (the model artifact is a few KB of parquet)."""
    model.write().overwrite().save(path + "/model")
    assembler.write().overwrite().save(path + "/assembler")


def load_quality_model(spark: SparkSession, path: str):
    """Inverse of :func:`save_quality_model` → (model, assembler)."""
    from pyspark.ml.classification import LogisticRegressionModel
    from pyspark.ml.feature import VectorAssembler

    return (LogisticRegressionModel.load(path + "/model"),
            VectorAssembler.load(path + "/assembler"))


def quality_model_report(df: DataFrame, text_col: str = "text",
                         sample_key: str = "doc_id",
                         train_fraction: float = 0.5,
                         agree_floor: float = 0.9) -> DataFrame:
    """One-row training/scoring contract: corpus size, deterministic train
    size, and whether model-vs-rule agreement clears ``agree_floor`` —
    the invariant a DuckDB oracle can check without re-running LBFGS."""
    model, assembler = train_quality_model(
        df, text_col, train_fraction=train_fraction,
        sample_key=sample_key)
    scored = score_quality(df, model, assembler, text_col)
    labeled = scored.withColumn("label", weak_labels(text_col)) \
                    .withColumn("pred",
                                (F.col("quality_prob") >= 0.5)
                                .cast("double"))
    in_train = (T.hash_bucket(sample_key, 256)
                < int(round(train_fraction * 256))).cast("long")
    return (labeled.agg(
        F.count("*").alias("n_docs"),
        F.sum(in_train).alias("n_train"),
        F.sum((F.col("pred") == F.col("label")).cast("long"))
         .alias("_n_agree"))
        .select("n_docs", "n_train",
                ((F.col("_n_agree") / F.col("n_docs")) >= agree_floor)
                .alias("agree_ok")))
