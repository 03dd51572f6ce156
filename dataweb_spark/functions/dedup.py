"""Deduplication operators for LLM data pipelines (beyond-reference).

Designed for 100 TB: every variant avoids the O(n²) cross join —
exact dedup is a hash groupBy; MinHash near-dup goes through LSH band
bucketing (candidates only within equal band-hash buckets); SimHash buckets
by hamming-band; embedding near-dup buckets by random-hyperplane signature.
Candidate verification joins are narrow (two id/array columns), and all
shuffles key on the bucket hash, so skew is bounded by bucket size.

Everything below is built-in Spark expressions (codegen) except nothing —
no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataweb_spark.functions.text import tokens


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact duplicate group of ``cols``.

    groupBy on a 256-bit content hash — one shuffle keyed by content hash,
    no wide rows moved twice (the id winner is resolved with min()).
    """
    key = F.sha2(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"),
                                                  F.lit("\x00")) for c in cols]), 256)
    keep = (df.withColumn("_k", key)
              .groupBy("_k").agg(F.min(id_col).alias(id_col)))
    return df.join(keep, on=id_col, how="inner").drop("_k")


def exact_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Duplicate-group summary: one row per distinct text with keeper id +
    multiplicity. SQL-oracle-friendly form of :func:`exact_dedup`."""
    return (df.groupBy(text_col)
              .agg(F.min(id_col).alias("keeper_id"),
                   F.count("*").alias("n_copies")))


# ---------------------------------------------------------------------------
# Shingles + MinHash + LSH
# ---------------------------------------------------------------------------

def word_shingles(col, n: int = 3):
    """Distinct word n-gram shingle array (codegen transform over tokens)."""
    toks = tokens(col)
    cnt = F.size(toks)
    return F.when(cnt < n, F.array(F.concat_ws(" ", toks))).otherwise(
        F.array_distinct(F.transform(
            F.sequence(F.lit(0), cnt - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))))


def minhash_signature(shingles, num_perm: int = 32):
    """MinHash signature: per permutation i, min over shingles of
    xxhash64(shingle, i). Returns array<bigint> of length ``num_perm``."""
    return F.array(*[
        F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i))))
        for i in range(num_perm)])


def minhash_lsh_candidates(df: DataFrame, id_col: str, text_col: str = "text",
                           num_perm: int = 32, bands: int = 8,
                           shingle_n: int = 3) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    signature → ``bands`` bands of ``num_perm/bands`` rows → hash each band →
    explode → self-join on (band_idx, band_hash). Only bucket-mates join;
    the shuffle key is the band hash (well distributed by construction).
    Returns distinct (id_a, id_b) with id_a < id_b.
    """
    rows = num_perm // bands
    sig = (df.select(F.col(id_col).alias("_id"),
                     minhash_signature(word_shingles(text_col, shingle_n),
                                       num_perm).alias("_sig")))
    banded = sig.select(
        "_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.xxhash64(F.concat_ws(
                         ",", *[F.element_at("_sig", b * rows + r + 1).cast("string")
                                for r in range(rows)])).alias("bh"))
            for b in range(bands)])).alias("e")
    ).select("_id", "e.band", "e.bh")
    a = banded.alias("a")
    b = banded.alias("b")
    return (a.join(b, [F.col("a.band") == F.col("b.band"),
                       F.col("a.bh") == F.col("b.bh"),
                       F.col("a._id") < F.col("b._id")])
             .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
             .distinct())


def jaccard_verify(df: DataFrame, candidates: DataFrame, id_col: str,
                   text_col: str = "text", shingle_n: int = 3,
                   threshold: float = 0.7) -> DataFrame:
    """Verify candidate pairs with exact shingle-set Jaccard ≥ threshold.

    Joins only the candidate ids against the (id, shingles) projection —
    narrow build side, broadcast-eligible when candidates are few.
    """
    sh = df.select(F.col(id_col).alias("_jid"),
                   word_shingles(text_col, shingle_n).alias("_sh"))
    out = (candidates
           .join(sh.withColumnRenamed("_jid", "id_a")
                   .withColumnRenamed("_sh", "sh_a"), "id_a")
           .join(sh.withColumnRenamed("_jid", "id_b")
                   .withColumnRenamed("_sh", "sh_b"), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (out.withColumn("jaccard", F.round(inter / union, 6))
               .where(F.col("jaccard") >= threshold)
               .select("id_a", "id_b", "jaccard"))


def minhash_dedup(df: DataFrame, id_col: str, text_col: str = "text",
                  num_perm: int = 32, bands: int = 8, shingle_n: int = 3,
                  threshold: float = 0.7) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → Jaccard verify → drop the
    higher id of each confirmed pair (greedy union by min-id)."""
    cands = minhash_lsh_candidates(df, id_col, text_col, num_perm, bands,
                                   shingle_n)
    dups = jaccard_verify(df, cands, id_col, text_col, shingle_n, threshold)
    losers = dups.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# n-gram Jaccard (direct, for modest candidate sets)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str = "text",
                        shingle_n: int = 3, threshold: float = 0.5,
                        block_col=None) -> DataFrame:
    """Exact n-gram Jaccard over pairs within a blocking key.

    Without ``block_col`` this is the quadratic baseline — use only on
    bounded groups; at scale pass a blocking column (e.g. a shingle-hash
    band from :func:`minhash_lsh_candidates`) so pairs stay bucket-local.
    """
    sh = df.select(F.col(id_col).alias("_jid"),
                   (block_col if block_col is not None else F.lit(0)).alias("_blk"),
                   word_shingles(text_col, shingle_n).alias("_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = a.join(b, [F.col("a._blk") == F.col("b._blk"),
                       F.col("a._jid") < F.col("b._jid")])
    inter = F.size(F.array_intersect("a._sh", "b._sh"))
    union = F.size(F.array_union("a._sh", "b._sh"))
    return (pairs.select(F.col("a._jid").alias("id_a"),
                         F.col("b._jid").alias("id_b"),
                         F.round(inter / union, 6).alias("jaccard"))
                 .where(F.col("jaccard") >= threshold))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(col) -> "F.Column":
    """64-bit SimHash over whitespace tokens, pure codegen expressions.

    Per token, xxhash64 gives 64 bits; per bit position the signature bit is
    the sign of Σ(±1). The per-bit sums are an aggregate over the token
    array (no explode, no shuffle): for each bit b, count tokens with bit
    set minus tokens with bit clear.
    """
    toks = F.array_distinct(tokens(col))
    h = F.transform(toks, lambda t: F.xxhash64(t))
    n = F.size(h)
    bit_cols = []
    for b in range(64):
        ones = F.size(F.filter(
            h, lambda x: F.shiftright(x, b).bitwiseAND(F.lit(1)) == 1))
        bit = F.when((ones * 2) > n, F.lit(1).cast("bigint")) \
               .otherwise(F.lit(0).cast("bigint"))
        bit_cols.append(F.shiftleft(bit, b))
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out.bitwiseOR(c)
    return out


def simhash_candidates(df: DataFrame, id_col: str, text_col: str = "text",
                       band_bits: int = 16) -> DataFrame:
    """Near-dup candidates: equal ``band_bits``-bit band of the simhash in
    any of the 64/band_bits bands (standard hamming-LSH for simhash)."""
    nbands = 64 // band_bits
    mask = (1 << band_bits) - 1
    sh = df.select(F.col(id_col).alias("_id"), simhash64(text_col).alias("_sh"))
    banded = sh.select("_id", "_sh", F.explode(F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.shiftright("_sh", b * band_bits)
                  .bitwiseAND(F.lit(mask)).alias("bh"))
        for b in range(nbands)])).alias("e")).select("_id", "_sh", "e.band", "e.bh")
    a, b = banded.alias("a"), banded.alias("b")
    return (a.join(b, [F.col("a.band") == F.col("b.band"),
                       F.col("a.bh") == F.col("b.bh"),
                       F.col("a._id") < F.col("b._id")])
             .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
                     F.col("a._sh").alias("sh_a"), F.col("b._sh").alias("sh_b"))
             .distinct())


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------

def embedding_near_dups(emb: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        threshold: float = 0.95,
                        planes: int = 12, seed: int = 7) -> DataFrame:
    """Near-duplicate vectors by cosine ≥ threshold, LSH-bucketed.

    Buckets by random-hyperplane signature (vectors with cosine ≈ 1 agree on
    almost all planes), verifies cosine exactly within buckets. Import here
    to keep dedup/similarity modules decoupled."""
    from dataweb_spark.functions.similarity import hyperplane_signature, cosine

    sig = emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
                     hyperplane_signature(vec_col, planes, seed).alias("_b"))
    a, b = sig.alias("a"), sig.alias("b")
    pairs = a.join(b, [F.col("a._b") == F.col("b._b"),
                       F.col("a._id") < F.col("b._id")])
    return (pairs.select(F.col("a._id").alias("id_a"),
                         F.col("b._id").alias("id_b"),
                         F.round(cosine(F.col("a._v"), F.col("b._v")), 6)
                          .alias("cos"))
                 .where(F.col("cos") >= threshold))
