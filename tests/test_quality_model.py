"""Model-based quality filtering (functions/quality_model.py): FineWeb-Edu
style classifier stage — deterministic training, JVM-only scoring."""

import os

import pytest
from pyspark.sql import functions as F

from dataweb_spark.functions import quality_model as Q


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def test_report_contract(spark, docs):
    rows = Q.quality_model_report(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_docs == docs.count()
    assert 0 < r.n_train < r.n_docs
    assert r.agree_ok is True


def test_scoring_is_jvm_only_and_bounded(docs):
    model, assembler = Q.train_quality_model(docs)
    scored = Q.score_quality(docs, model, assembler)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert not any(x in plan for x in
                   ("ArrowEvalPython", "BatchEvalPython", "MapInPandas")), \
        "scoring must not cross into Python"
    agg = scored.agg(F.min("quality_prob"), F.max("quality_prob"),
                     F.count(F.when(F.col("quality_prob").isNull(), 1))
                     ).first()
    assert 0.0 <= agg[0] <= agg[1] <= 1.0 and agg[2] == 0
    assert scored.columns == docs.columns + ["quality_prob"]


def test_training_deterministic_across_partitioning(docs):
    m1, _ = Q.train_quality_model(docs)
    m2, _ = Q.train_quality_model(docs.repartition(7))
    import numpy as np
    assert np.allclose(m1.coefficients.toArray(),
                       m2.coefficients.toArray(), atol=1e-6)
    assert abs(m1.intercept - m2.intercept) < 1e-6


def test_model_separates_rule_classes(docs):
    """The learned probability actually orders docs by the rule label —
    mean P(high) for rule-positive docs well above rule-negative."""
    model, assembler = Q.train_quality_model(docs)
    scored = (Q.score_quality(docs, model, assembler)
              .withColumn("label", Q.weak_labels()))
    means = {r.label: r.m for r in
             scored.groupBy("label")
                   .agg(F.avg("quality_prob").alias("m")).collect()}
    if len(means) == 2:  # both classes present at this SF
        assert means[1.0] - means[0.0] > 0.5


def test_model_save_load_roundtrip(spark, docs, tmp_path):
    model, assembler = Q.train_quality_model(docs)
    Q.save_quality_model(model, assembler, str(tmp_path / "qm"))
    m2, a2 = Q.load_quality_model(spark, str(tmp_path / "qm"))
    s1 = {r.doc_id: r.quality_prob
          for r in Q.score_quality(docs, model, assembler).collect()}
    s2 = {r.doc_id: r.quality_prob
          for r in Q.score_quality(docs, m2, a2).collect()}
    assert s1 == s2


def test_model_scores_a_stream(spark, sf_dir, tmp_path, docs):
    """A pre-trained model scores a documents STREAM with the same code
    path (stateless transform) — train-batch, score-streaming."""
    from dataweb_spark.streaming.events import run_available_now

    model, assembler = Q.train_quality_model(docs)
    schema = docs.schema
    stream = (spark.readStream.schema(schema).format("parquet")
              .option("pathGlobFilter", "documents.parquet")
              .load(sf_dir))
    scored = Q.score_quality(stream, model, assembler) \
              .select("doc_id", "quality_prob")
    out = run_available_now(scored, str(tmp_path / "cp_qm"))
    got = {r.doc_id: r.quality_prob for r in out.collect()}
    exp = {r.doc_id: r.quality_prob
           for r in Q.score_quality(docs, model, assembler)
                     .select("doc_id", "quality_prob").collect()}
    assert got == exp
