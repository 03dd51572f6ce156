"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023).

The data-selection step a pretraining pipeline runs between cleaning
and assembly: score every raw document by how target-like it is under
hashed n-gram bag-of-words language models,

    log w(x) = sum_over_grams( ln p_target(bucket) - ln q_raw(bucket) )

then keep the top-weighted slice. Engine shape (all Spark built-ins):

* grams: whitespace bigrams, hashed into ``16^hex_chars`` buckets by an
  md5-prefix — md5 is ENGINE-PORTABLE, so a DuckDB oracle replays the
  exact bucket assignment (xxhash64 is not);
* the two bucket models are map-side-combined groupBys bounded by the
  bucket count (4096 rows at the default), broadcast into the scoring
  join — never collected;
* per-doc score: one explode → broadcast join → re-aggregate, the same
  proven shape as ``unigram_lm_scores``;
* scoring is INTEGER-EXACT end to end: the per-bucket log ratio
  ``ln p − ln q`` is rounded ONCE, inside the bounded model table, to a
  fixed-point bigint (``lw_e12``); per-doc weights are then pure bigint
  sums + integer ``div`` — order-independent, so engines, reruns and
  partitionings agree bit-for-bit. (The r7 ``corpus_source_report``
  lesson, finished: ``round(sum(<double>)·10^k)`` puts the knife-edge
  rounding AFTER an order-sensitive float sum; rounding per-bucket
  before an exact integer sum removes the knife edge entirely.)
* selection is deterministic top-k by ``(weight_e4 DESC, id)`` — an
  integer sort key, so reruns, engines and resumed jobs pick the same
  slice (the paper's Gumbel resampling adds sampling noise; at corpus
  scale the top-k slice is the production variant).

At 100 TB: models are 4096-row broadcasts; the only wide shuffle is the
gram explode's re-aggregate on doc_id, linear in corpus tokens. The
top-k is a TakeOrderedAndProject when k is small, a filter on the
weight threshold when it is not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataweb_spark.functions.text import tokens


def hashed_gram_buckets(col: str | Column = "text",
                        hex_chars: int = 3) -> Column:
    """Array of hashed-bigram bucket keys for a document: consecutive
    token pairs joined with one space, bucketed by the first
    ``hex_chars`` hex digits of their md5 (16^hex_chars buckets).
    Empty / one-token docs → empty array.

    Pairing is ``zip_with`` over two shifted slices — NOT
    ``transform(sequence, i -> element_at(t, i))``: ``element_at``
    embeds the whole tokenize subexpression per index, which codegen
    re-evaluates per element (O(tokens²) per doc — measured 2.8×
    slower at sf0.1). ``zip_with``'s lambda binds element VALUES, so
    the split happens a constant number of times per row."""
    t = tokens(col)
    n = F.size(t)
    return F.when(n < 2, F.array().cast("array<string>")) \
            .otherwise(F.zip_with(
                F.slice(t, 1, n - 1), F.slice(t, 2, n - 1),
                lambda a, b: F.substring(
                    F.md5(F.concat(a, F.lit(" "), b)), 1, hex_chars)))


def bucket_model(df: DataFrame, id_col: str, text_col: str,
                 hex_chars: int = 3) -> DataFrame:
    """Hashed-bigram counts: (bucket, cnt), bounded by 16^hex_chars
    rows — map-side-combined, broadcastable."""
    return (df.select(F.explode(hashed_gram_buckets(text_col, hex_chars))
                      .alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("cnt")))


def log_ratio_model(raw: DataFrame, target: DataFrame,
                    id_col: str = "doc_id", text_col: str = "text",
                    hex_chars: int = 3) -> DataFrame:
    """Fixed-point DSIR model table: (bucket, lw_e12) with

        lw_e12 = round( (ln p_target(b) − ln q_raw(b)) · 1e12 )  bigint

    over add-1-smoothed models,  p(b) = (cnt(b)+1) / (tot + B).  The
    double→bigint rounding happens HERE, once per bucket (≤ 16^hex_chars
    rows), so downstream per-doc scoring is a pure bigint sum — a
    single bucket's last-ulp ln() divergence between engines can shift
    one table entry by 1e-12, which integer ``div`` at e4 output
    granularity cannot surface. Covers every bucket present in either
    corpus; raw-gram buckets are all present by construction (the raw
    model is built from the same rows), so an inner scoring join loses
    nothing."""
    from pyspark.sql import Window

    n_buckets = 16 ** hex_chars
    tmod = bucket_model(target, id_col, text_col, hex_chars)
    rmod = bucket_model(raw, id_col, text_col, hex_chars)
    # align the two bounded count tables by union + re-agg, not a
    # full-outer join (full outer can't broadcast, so Spark would
    # sort-merge two 4096-row tables — harmless but a pointless SMJ in
    # the plan); absent buckets contribute 0 exactly like coalesce
    both = (rmod.select("bucket", F.col("cnt").alias("r"),
                        F.lit(0).cast("bigint").alias("t"))
            .unionByName(tmod.select("bucket",
                                     F.lit(0).cast("bigint").alias("r"),
                                     F.col("cnt").alias("t")))
            .groupBy("bucket").agg(F.sum("r").alias("r_cnt"),
                                   F.sum("t").alias("t_cnt")))
    # model totals: every gram lands in a bucket, so t_tot/r_tot are
    # plain sums OVER the bounded bucket table — computed as whole-table
    # window sums on its ≤ 16^hex_chars rows (one tiny single-partition
    # exchange) instead of two separate `.agg()` subtrees, which each
    # RE-TOKENIZED the whole corpus (Spark does not share subtrees) and
    # cost two extra broadcast jobs. r15 optimization, guide §1.2/§2.4:
    # corpus tokenize passes 5 → 3 (raw: model + scoring, target: model).
    w = Window.partitionBy()
    return (both
            .withColumn("t_tot", F.sum("t_cnt").over(w))
            .withColumn("r_tot", F.sum("r_cnt").over(w))
            .select(
                "bucket",
                F.round((F.log((F.col("t_cnt") + F.lit(1.0))
                               / (F.col("t_tot") + F.lit(float(n_buckets))))
                         - F.log((F.col("r_cnt") + F.lit(1.0))
                                 / (F.col("r_tot")
                                    + F.lit(float(n_buckets)))))
                        * F.lit(1e12)).cast("bigint").alias("lw_e12")))


def dsir_weights(raw: DataFrame, target: DataFrame,
                 id_col: str = "doc_id", text_col: str = "text",
                 hex_chars: int = 3) -> DataFrame:
    """Per-raw-document DSIR importance weight.

    Returns (id, n_grams, weight_e4) for every raw doc with >= 1
    bigram; ``weight_e4 = sum(lw_e12) div 1e8`` — an exact sum over the
    :func:`log_ratio_model` table followed by integer division
    (truncating toward zero in BOTH Spark ``div`` and DuckDB ``//``),
    so the output is bit-identical across engines, reruns and
    partitionings. The sum accumulates as decimal(38,0) (128-bit):
    lw_e12 terms run ~3e13, so a ~3e5-gram document would silently wrap
    a bigint accumulator in non-ANSI Spark — and DuckDB sums bigint
    into hugeint anyway, so this matches the oracle arithmetic."""
    model = log_ratio_model(raw, target, id_col, text_col, hex_chars)
    grams = (raw.select(F.col(id_col),
                        F.explode(hashed_gram_buckets(text_col, hex_chars))
                        .alias("bucket")))
    return (grams.join(F.broadcast(model), "bucket")
            .groupBy(id_col)
            .agg(F.count("*").cast("bigint").alias("n_grams"),
                 F.expr("sum(cast(lw_e12 as decimal(38,0)))"
                        " div 100000000").cast("bigint")
                  .alias("weight_e4")))


def dsir_select(raw: DataFrame, target: DataFrame, k: int,
                id_col: str = "doc_id", text_col: str = "text",
                hex_chars: int = 3) -> DataFrame:
    """Deterministic DSIR top-k: the k raw docs most target-like by
    (weight_e4 DESC, id) — an integer sort key, engine-reproducible."""
    w = dsir_weights(raw, target, id_col, text_col, hex_chars)
    return (w.orderBy(F.col("weight_e4").desc(), F.col(id_col))
             .limit(k))
