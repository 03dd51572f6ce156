"""Persisted dedup index — the steady-state shape for ingest dedup.

:func:`dedup.dedup_against_corpus` recomputes the corpus fingerprints and
MinHash band hashes on EVERY ingest batch: two full corpus-text scans per
batch.  Fine for a one-off backfill; wrong for steady state, where at
100 TB each batch would re-read the whole corpus.  This module
materializes the derived state once as two narrow parquet tables

    ``{path}/fp``     (id, fp)          — normalized-text md5, ~48 B/doc
    ``{path}/bands``  (id, band, bh)    — LSH band hashes, ~24 B/band/doc
    ``{path}/meta.json``                — signature params, checked on read

and classifies each new batch against THOSE.  The corpus *text* is read
only to verify near-candidates — filtered by a broadcast candidate-id
list, so the scan ships no rows for candidate-free batches and only the
handful of bucket-mates otherwise.  Admitted documents append their index
rows (:func:`append_batch`); nothing is ever rebuilt.

Mirrors the reference's ingest-time duplicate gate (``SURVEY.md §2``
incremental ingest) with the index-persistence step a web-scale pipeline
adds on top; verdict semantics are identical to ``dedup_against_corpus``
(property-tested in ``tests/test_dedup_index.py``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataweb_spark.functions.dedup import (_norm_fingerprint, jaccard_pd,
                                           minhash_band_hashes)

_META = "meta.json"


def _index_rows(df: DataFrame, id_col: str, text_col: str,
                params: dict) -> tuple[DataFrame, DataFrame]:
    """(fp_rows, band_rows) for one frame — one text scan serves both."""
    fp = df.select(F.col(id_col).alias("id"),
                   _norm_fingerprint(text_col).alias("fp"))
    bands = (minhash_band_hashes(df, id_col, text_col,
                                 params["num_perm"], params["bands"],
                                 params["shingle_n"], params["seed"])
             .withColumnRenamed("_id", "id"))
    return fp, bands


def build_dedup_index(corpus: DataFrame, path: str,
                      id_col: str = "doc_id", text_col: str = "text",
                      num_perm: int = 32, bands: int = 8,
                      shingle_n: int = 3, seed: int = 11) -> dict:
    """One corpus-text pass → persisted fp + band tables + params.

    Both tables are written from the same logical scan; Spark runs two
    jobs but each is map-only (signature computation is the Arrow-batched
    kernel from :func:`dedup.minhash_signature` — no shuffle, no
    all-pairs).  Returns the persisted params dict.
    """
    params = {"num_perm": num_perm, "bands": bands,
              "shingle_n": shingle_n, "seed": seed,
              "id_col": id_col, "text_col": text_col}
    fp, band_rows = _index_rows(corpus, id_col, text_col, params)
    fp.write.mode("overwrite").parquet(os.path.join(path, "fp"))
    band_rows.write.mode("overwrite").parquet(os.path.join(path, "bands"))
    with open(os.path.join(path, _META), "w") as fh:
        json.dump(params, fh)
    return params


def load_index_params(path: str) -> dict:
    meta = os.path.join(path, _META)
    if not os.path.exists(meta):
        raise ValueError(f"not a dedup index (missing {_META}): {path}")
    return json.load(open(meta))


def classify_against_index(spark: SparkSession, new_batch: DataFrame,
                           path: str, corpus_text: DataFrame,
                           threshold: float = 0.7) -> DataFrame:
    """``(id, verdict, match_id)`` for every new doc — exact / near /
    unique, identical semantics to ``dedup_against_corpus``.

    Scale shape: the batch side is broadcast into every join; the index
    tables stream (narrow columns, no text).  Corpus text is scanned once
    at most, filtered by a broadcast list of near-candidate ids — a batch
    with no bucket-mates ships zero corpus rows.
    """
    params = load_index_params(path)
    id_col, text_col = params["id_col"], params["text_col"]
    fp_idx = spark.read.parquet(os.path.join(path, "fp"))
    band_idx = spark.read.parquet(os.path.join(path, "bands"))

    new_fp, _ = _index_rows(new_batch, id_col, text_col, params)
    exact = (fp_idx.join(F.broadcast(new_fp.withColumnRenamed("id", "_nid")),
                         "fp")
             .groupBy("_nid").agg(F.min("id").alias("match_id"))
             .withColumn("verdict", F.lit("exact")))

    remaining = new_batch.join(
        F.broadcast(exact.select(F.col("_nid").alias(id_col))),
        id_col, "left_anti")
    new_bands = (minhash_band_hashes(remaining, id_col, text_col,
                                     params["num_perm"], params["bands"],
                                     params["shingle_n"], params["seed"])
                 .withColumnRenamed("_id", "_nid"))
    cands = (band_idx.join(F.broadcast(new_bands), ["band", "bh"])
             .select(F.col("_nid").alias("id_a"),
                     F.col("id").alias("id_b"))
             .distinct())
    # Fetch text ONLY for candidate corpus ids: broadcast the id list so
    # the corpus scan's join needs no shuffle and prunes at the scan.
    cand_ids = cands.select(F.col("id_b").alias(id_col)).distinct()
    cand_txt = (corpus_text.join(F.broadcast(cand_ids), id_col)
                .select(F.col(id_col).alias("id_b"),
                        F.col(text_col).alias("txt_b")))
    new_txt = remaining.select(F.col(id_col).alias("id_a"),
                               F.col(text_col).alias("txt_a"))
    verified = (cands
                .join(F.broadcast(new_txt), "id_a")
                .join(cand_txt, "id_b")
                .withColumn("_j", jaccard_pd(F.col("txt_a"), F.col("txt_b"),
                                             params["shingle_n"]))
                .where(F.col("_j") >= threshold))
    near = (verified.groupBy(F.col("id_a").alias("_nid"))
            .agg(F.min("id_b").alias("match_id"))
            .withColumn("verdict", F.lit("near")))

    classified = exact.unionByName(near)
    return (new_batch.select(F.col(id_col).alias("_nid"))
            .join(classified, "_nid", "left")
            .select(F.col("_nid").alias(id_col),
                    F.coalesce(F.col("verdict"), F.lit("unique"))
                     .alias("verdict"),
                    F.col("match_id")))


def streaming_ingest_gate(stream_df: DataFrame, index_path: str,
                          corpus_path: str, checkpoint: str,
                          threshold: float = 0.7):
    """The production ingest loop: ``readStream → foreachBatch(classify →
    admit)`` — EXACTLY the batch classify/append code, one implementation
    for both modes (the repo-wide batch/stream rule).

    Per micro-batch: collapse within-batch exact dups (the index can't
    see them yet — first occurrence wins), classify survivors against the
    persisted index, append admitted docs' text to ``corpus_path`` and
    their derived rows to the index.  State lives entirely in the two
    on-disk tables, so the stream restarts from the checkpoint with no
    in-memory state to rebuild.  Returns the started StreamingQuery.
    """
    from pyspark.sql import Window

    params = load_index_params(index_path)
    id_col, text_col = params["id_col"], params["text_col"]

    def _gate(batch: DataFrame, _epoch: int) -> None:
        w = (Window.partitionBy(_norm_fingerprint(text_col))
             .orderBy(id_col))
        firsts = (batch.withColumn("_rn", F.row_number().over(w))
                  .where(F.col("_rn") == 1).drop("_rn"))
        spark_b = firsts.sparkSession
        corpus = spark_b.read.parquet(corpus_path)
        verdicts = classify_against_index(spark_b, firsts, index_path,
                                          corpus, threshold)
        admitted = firsts.join(
            verdicts.where(F.col("verdict") == "unique").select(id_col),
            id_col)
        admitted.persist()
        try:
            admitted.write.mode("append").parquet(corpus_path)
            append_batch(admitted, index_path)
        finally:
            admitted.unpersist()

    return (stream_df.writeStream
            .foreachBatch(_gate)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def append_batch(admitted: DataFrame, path: str) -> None:
    """Append index rows for admitted (kept) docs — no rebuild, no
    corpus rescan.  One text pass over the batch only."""
    params = load_index_params(path)
    fp, band_rows = _index_rows(admitted, params["id_col"],
                                params["text_col"], params)
    fp.write.mode("append").parquet(os.path.join(path, "fp"))
    band_rows.write.mode("append").parquet(os.path.join(path, "bands"))


def compact_index(spark: SparkSession, path: str,
                  target_file_mb: int = 256) -> tuple[int, int]:
    """Periodic maintenance: every :func:`append_batch` adds one file set
    per table, so a long-lived ingest loop accumulates small files and
    the classify scans pay listing/task-scheduling overhead instead of
    IO.  Rewrites both tables to ~``target_file_mb`` files via the
    atomic-swap compactor (:func:`scale.compact_parquet` — a failure
    mid-rewrite leaves the live index intact).  Returns the new
    (fp_files, band_files) counts.  Run between drains, not during one.
    """
    from dataweb_spark.functions.scale import compact_parquet

    load_index_params(path)  # refuse to "compact" a non-index directory
    return (compact_parquet(spark, os.path.join(path, "fp"),
                            target_file_mb),
            compact_parquet(spark, os.path.join(path, "bands"),
                            target_file_mb))
