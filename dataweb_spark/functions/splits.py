"""Dataset-assembly operators: leakage-safe splits, deterministic shard
export, and attribute-filter cascades.

These are the last-mile stages of a pre-training data pipeline — after
dedup/quality/decontamination have run, the corpus still has to be (a) split
into train/val/test without near-duplicate leakage across the boundary,
(b) written out as a fixed number of deterministically-ordered shards for
the trainer, and (c) filtered through an ordered rule cascade whose
per-rule rejection counts are themselves a reporting artifact (the
"attributes" stage of Dolma/RefinedWeb-style pipelines). The reference
engine (a federated SQL relay) has no counterpart; these follow the public
pipeline literature re-expressed Spark-first.

Scale notes (100 TB):

* ``split_by_content`` is MAP-ONLY: the split is a pure function of the
  content fingerprint, so exact duplicates land in the same split with no
  join, no shuffle, and no global state. This is the trick that makes
  leakage-safe splitting free — hash the *content*, not the row id.
* ``split_by_cluster`` handles NEAR-dup clusters (minhash/simhash
  components): one broadcast-or-shuffle join against the cluster map,
  which is orders of magnitude smaller than the corpus.
* ``assign_shards``/``write_shards`` produce at most one file per shard by
  repartitioning ON the shard id; the within-shard order is an md5 of the
  key, so a re-run on re-ordered input bytes produces byte-identical
  shards (trainer-resume safe).
* ``filter_cascade`` evaluates every rule in ONE codegen'd projection —
  first-failing-rule attribution costs a single chained CASE, not one pass
  per rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataweb_spark.functions.text import hash_bucket

__all__ = [
    "split_by_content", "split_by_cluster", "assign_shards",
    "write_shards", "shard_manifest", "filter_cascade", "cascade_stats",
    "upsample_epochs", "select_token_budget", "temperature_mixture",
    "pack_sequences", "pack_sequence_spans", "pack_documents_best_fit",
    "corpus_drift_report",
]


def _split_expr(bucket: Column, weights: dict[str, float]) -> Column:
    """0..255 bucket → split name by cumulative /256-quantized weights.

    Quantization: each split's threshold is ``round(cum_weight * 256)``, so
    the assignment is exactly reproducible in any engine with md5 (the
    DuckDB oracles re-derive it) and sums to the whole corpus — the final
    split absorbs rounding remainders.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        thr = int(round(cum * 256))
        cond = bucket < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def split_by_content(df: DataFrame, text_col: str = "text",
                     weights: dict[str, float] | None = None,
                     out_col: str = "split") -> DataFrame:
    """Leakage-safe train/val/test assignment keyed on CONTENT, not id.

    Every row whose ``text_col`` is byte-identical gets the same split —
    exact duplicates can never straddle the train/test boundary, even when
    dedup upstream kept them (e.g. deliberate upsampling). Map-only: the
    split is ``md5(text) → bucket → cumulative-weight threshold``; no
    shuffle, no cluster map, scales linearly.
    """
    if weights is None:
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    bucket = hash_bucket(F.col(text_col), 256)
    return df.withColumn(out_col, _split_expr(bucket, weights))


def split_by_cluster(df: DataFrame, clusters: DataFrame,
                     id_col: str = "doc_id", rep_col: str = "cluster_rep",
                     weights: dict[str, float] | None = None,
                     out_col: str = "split") -> DataFrame:
    """Leakage-safe split for NEAR-duplicate clusters.

    ``clusters`` maps ``id_col`` → ``rep_col`` (a cluster representative —
    e.g. the min member id from :func:`dedup.connected_components` over
    minhash candidate pairs). All members of a cluster hash to one split via
    the representative; rows absent from the cluster map are singleton
    clusters keyed by their own id. One left join (cluster maps are tiny
    relative to the corpus — broadcast when under the threshold), then the
    same map-only bucket assignment as :func:`split_by_content`.
    """
    if weights is None:
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    joined = df.join(clusters.select(id_col, rep_col), on=id_col, how="left")
    key = F.coalesce(F.col(rep_col), F.col(id_col))
    bucket = hash_bucket(key, 256)
    return (joined.withColumn(out_col, _split_expr(bucket, weights))
                  .drop(rep_col))


def assign_shards(df: DataFrame, key_col: str, n_shards: int,
                  shard_col: str = "shard",
                  order_col: str = "shard_order") -> DataFrame:
    """Deterministic global shuffle: shard id + within-shard sort key.

    ``shard = md5-bucket(key) mod n_shards`` and ``order = md5(key)`` give a
    pseudo-random but fully reproducible training order — unlike
    ``rand()``/``repartition()`` the layout survives re-runs and engine
    changes, so a resumed training job sees the same byte stream. Map-only.

    Up to 256 shards the shard id comes from the md5 bucket (exactly
    reproducible in the DuckDB oracles); beyond that it switches to
    ``pmod(xxhash64(key), n)`` — still deterministic across runs and
    cluster layouts, losing only cross-engine oracle parity. 100 TB at
    ~1 GB/shard is ~10⁵ shards, so the large path is the production one.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if n_shards <= 256:
        shard = hash_bucket(F.col(key_col), n_shards)
    else:
        shard = F.pmod(F.xxhash64(F.col(key_col).cast("string")),
                       F.lit(n_shards)).cast("int")
    return (df.withColumn(shard_col, shard)
              .withColumn(order_col, F.md5(F.col(key_col).cast("string"))))


def write_shards(df: DataFrame, path: str, key_col: str,
                 n_shards: int) -> None:
    """Materialize the corpus as ``n_shards`` deterministically-ordered
    parquet shards under ``path`` (hive layout ``shard=K/``).

    Repartitions ON the shard id so each output directory receives exactly
    one file, sorted by the order hash — the layout a data loader streams
    sequentially. At 100 TB, raise ``n_shards`` so each shard stays within
    one task's comfortable write size (beyond 256 shards the shard id
    switches to ``pmod(xxhash64)`` — see :func:`assign_shards`).
    """
    with_shard = assign_shards(df, key_col, n_shards)
    (with_shard
     .repartition(n_shards, F.col("shard"))
     .sortWithinPartitions("shard", "shard_order")
     .write.mode("overwrite").partitionBy("shard").parquet(path))


def shard_manifest(df: DataFrame, key_col: str, n_shards: int,
                   token_col: Column | None = None) -> DataFrame:
    """Per-shard manifest: row count, token total, and the order-hash span.

    The manifest is the trainer-facing contract for :func:`write_shards`:
    byte-identical across re-runs, so it doubles as a cheap content
    checksum for the exported shards.
    """
    from dataweb_spark.functions.text import token_count
    with_shard = assign_shards(df, key_col, n_shards)
    tok = token_col if token_col is not None else token_count("text")
    return (with_shard
            .groupBy("shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(tok).alias("n_tokens"),
                 F.min("shard_order").alias("first_key"),
                 F.max("shard_order").alias("last_key"))
            .orderBy("shard"))


def upsample_epochs(df: DataFrame, key_col: str, stratify_col: str,
                    epochs: dict[str, float],
                    epoch_col: str = "epoch") -> DataFrame:
    """Materialize a per-stratum epoch recipe (e.g. ``{"en": 1.0,
    "fr": 2.3}``): every row of stratum s appears ``floor(e_s)`` times,
    plus one extra copy for a deterministic ``frac(e_s)`` hash-slice of the
    stratum — the "N.M epochs of source X" data recipe of published
    pre-training mixes, where high-quality sources repeat and the
    fractional tail is a stable subset (not a random one, so re-runs and
    engines agree row-for-row).

    ``epoch_col`` numbers the copies 1..ceil(e_s) — downstream shuffling
    (``assign_shards`` on ``(key, epoch)``) spreads repeats across shards.
    Strata absent from ``epochs`` get 0 epochs (dropped). Map-only:
    replication is an ``explode(sequence(...))`` over a per-row literal
    count, no join, no shuffle, linear at 100 TB.
    """
    full: Column = F.lit(0)
    frac_thr: Column = F.lit(0)
    for value, e in sorted(epochs.items()):
        if e < 0:
            raise ValueError(f"epochs[{value!r}] must be >= 0")
        full = F.when(F.col(stratify_col) == value,
                      F.lit(int(e))).otherwise(full)
        frac_thr = F.when(F.col(stratify_col) == value,
                          F.lit(int(round((e - int(e)) * 256)))) \
                    .otherwise(frac_thr)
    bucket = hash_bucket(F.col(key_col), 256)
    n_copies = full + F.when(bucket < frac_thr, 1).otherwise(0)
    return (df.withColumn("_n_copies", n_copies)
              .where(F.col("_n_copies") > 0)
              .withColumn(epoch_col,
                          F.explode(F.sequence(F.lit(1),
                                               F.col("_n_copies"))))
              .drop("_n_copies"))


def select_token_budget(df: DataFrame, budget_tokens: int,
                        quality_col: str = "quality",
                        key_col: str = "doc_id",
                        token_col: Column | None = None) -> DataFrame:
    """Greedy best-first corpus selection under a token budget: take docs
    in (quality-bucket desc, key asc) order while the running token total
    stays ≤ ``budget_tokens`` — the "data selection" stage when compute
    affords only a slice of the corpus.

    100 TB shape: a naive global-order running sum needs a total sort +
    an unpartitioned window (single-task bottleneck). Instead: quality is
    discretized to 256 buckets (the selection order is defined ON the
    discretization, so the result is exact, not approximate); one
    map-side-combined histogram pass gives per-bucket token sums; the
    256-row cumulative runs driver-side to find the cutoff bucket; whole
    buckets above the cutoff are kept with a broadcast filter, and only
    the single boundary bucket pays a key-ordered running sum. Work on
    the corpus: two map passes + one window over ~1/256 of the data.
    """
    from dataweb_spark.functions.text import token_count
    from pyspark.sql import Window

    tok = token_col if token_col is not None else token_count("text")
    q256 = F.least(F.lit(255),
                   F.floor(F.col(quality_col) * 256).cast("int"))
    base = df.withColumn("_tok", tok).withColumn("_q", q256)
    hist = (base.groupBy("_q").agg(F.sum("_tok").alias("_bucket_toks"))
            .orderBy(F.desc("_q")).collect())
    cum = 0
    cutoff, boundary_budget = -1, 0
    for r in hist:  # ≤256 rows on the driver
        if cum + r._bucket_toks <= budget_tokens:
            cum += r._bucket_toks
            cutoff = r._q
        else:
            cutoff = r._q
            boundary_budget = budget_tokens - cum
            break
    else:
        return base.drop("_tok", "_q")  # whole corpus fits
    above = base.where(F.col("_q") > cutoff)
    w = Window.partitionBy("_q").orderBy(key_col)
    boundary = (base.where(F.col("_q") == cutoff)
                .withColumn("_cum", F.sum("_tok").over(w))
                .where(F.col("_cum") <= boundary_budget)
                .drop("_cum"))
    return above.unionByName(boundary).drop("_tok", "_q")


def filter_cascade(df: DataFrame,
                   rules: list[tuple[str, Column]],
                   reason_col: str = "rejected_by") -> DataFrame:
    """Ordered attribute-filter cascade with first-failure attribution.

    ``rules`` is an ordered list of ``(name, keep_condition)``. A row's
    ``reason_col`` is the FIRST rule whose keep-condition it fails (NULL ⇒
    the row survives the whole cascade) — the attribution convention of
    published pipeline reports, where each rejection is counted once
    against the earliest rule. All rules evaluate in one chained CASE
    inside a single codegen'd projection: one pass over the corpus
    regardless of rule count, no shuffle. NULL rule results count as
    failures (a quality score that couldn't be computed rejects the row).
    """
    expr: Column = F.lit(None).cast("string")
    for name, cond in reversed(rules):
        expr = F.when(~F.coalesce(cond, F.lit(False)), F.lit(name)) \
                .otherwise(expr)
    return df.withColumn(reason_col, expr)


def cascade_stats(df: DataFrame, rules: list[tuple[str, Column]],
                  reason_col: str = "rejected_by") -> DataFrame:
    """Per-rule rejection counts + survivor count for a cascade.

    One aggregation over :func:`filter_cascade`'s output (map-side
    combined); the ``kept`` row carries the survivors so the frame sums to
    the corpus size.
    """
    tagged = filter_cascade(df, rules, reason_col)
    return (tagged
            .groupBy(F.coalesce(F.col(reason_col), F.lit("kept"))
                      .alias("stage"))
            .agg(F.count("*").alias("n_docs"))
            .orderBy("stage"))

def temperature_mixture(df: DataFrame, stratify_col: str, total: int,
                        alpha: float = 0.5,
                        id_col: str = "doc_id") -> DataFrame:
    """Temperature-based mixture sampling — the multilingual-corpus
    rebalancing step (mT5/XLM-R style): sample strata (languages,
    sources) with probability ∝ n_s^alpha so low-resource strata are
    upweighted relative to their raw share (alpha=1 keeps natural
    proportions, alpha→0 approaches uniform), then draw a deterministic
    sample of ``total`` docs honoring those proportions EXACTLY.

    Integer-exact allocation (the DSIR lesson applied to sampling):
    the only float→int rounding is ``w_e6 = round(n^alpha · 1e6)``,
    once per stratum in a bounded table (alpha=0.5 routes through
    IEEE-exact sqrt, identical across engines); quotas then come from
    pure bigint largest-remainder apportionment — ``base_s =
    (total·w_s) div W`` plus one for the ``total − Σ base`` strata with
    the largest remainders (stratum name breaks ties) — so quotas sum
    to ``total`` exactly and every engine picks the same counts. A
    stratum's quota is capped at its size; the shortfall (if any) is
    reported, not silently reassigned. Per-stratum doc choice is
    hash-ordered (md5 of the id — engine-portable), never "first N
    seen".

    Shape at 100 TB: one map-side-combined groupBy bounded by the
    stratum count, driver-free broadcast apportionment (windows over
    the ≤O(100)-row quota table), one row_number window partitioned by
    stratum over the corpus (narrow key), broadcast quota join. Project
    to (id, stratum) first and semi-join bodies back for wide rows.
    """
    from pyspark.sql import Window

    sizes = df.groupBy(stratify_col).agg(
        F.count("*").cast("bigint").alias("_n"))
    w_raw = (F.sqrt(F.col("_n").cast("double")) if alpha == 0.5
             else F.pow(F.col("_n").cast("double"), F.lit(float(alpha))))
    weights = sizes.withColumn(
        "_w_e6", F.round(w_raw * F.lit(1e6)).cast("bigint"))
    tot = weights.agg(F.sum("_w_e6").alias("_W"))
    al = (weights.crossJoin(F.broadcast(tot))
          .withColumn("_base", F.expr(f"({total} * _w_e6) div _W"))
          .withColumn("_rem", F.expr(f"({total} * _w_e6) % _W")))
    wrk = Window.orderBy(F.col("_rem").desc(), stratify_col)
    lo = al.agg((F.lit(total) - F.sum("_base")).alias("_lo"))
    quota = (al.withColumn("_rk", F.row_number().over(wrk))
             .crossJoin(F.broadcast(lo))
             .withColumn("_quota",
                         F.least(F.col("_n"),
                                 F.col("_base")
                                 + F.when(F.col("_rk") <= F.col("_lo"),
                                          F.lit(1)).otherwise(F.lit(0))))
             .select(stratify_col, "_quota"))
    wdoc = Window.partitionBy(stratify_col).orderBy(
        F.md5(F.col(id_col).cast("string")), id_col)
    return (df.withColumn("_rn", F.row_number().over(wdoc))
            .join(F.broadcast(quota), stratify_col)
            .where(F.col("_rn") <= F.col("_quota"))
            .drop("_rn", "_quota"))


def pack_sequences(df: DataFrame, key_col: str = "doc_id",
                   text_col: str = "text", seq_len: int = 128,
                   n_shards: int = 1, eos: str = "<eos>",
                   keep_partial: bool = True) -> DataFrame:
    """Concat-and-split sequence packing — the trainer-facing layout step
    that turns a document corpus into fixed-length training rows (the
    GPT-style packing every pre-training loader performs): tokenize each
    document, append one ``eos`` separator, concatenate the token stream
    in deterministic training order, and cut it into consecutive
    ``seq_len``-token sequences.

    Order is the :func:`assign_shards` contract — shard =
    md5-bucket(key) mod ``n_shards``, within-shard order = md5(key)
    (``key_col`` breaks md5 ties) — so the packed stream is byte-identical
    across re-runs and engines: a resumed training job sees the same
    sequences, and a DuckDB oracle can replay the whole layout.

    Output grain is one row per (shard, seq_id): ``seq_text`` (the
    space-joined ``seq_len`` tokens), ``n_tokens`` (== ``seq_len`` except
    the final partial row per shard), ``n_docs`` (documents contributing
    at least one token — the packing-fragmentation diagnostic), and
    ``is_full``. ``keep_partial=False`` drops each shard's trailing
    partial row (what a fixed-shape trainer does).

    Sentinel caveat: ``eos`` is validated as whitespace-free but corpus
    text CAN contain the literal ``eos`` string as an ordinary token, so
    a consumer that recovers document boundaries by splitting
    ``seq_text`` on ``eos`` will mis-detect them. Boundary recovery
    should use :func:`pack_sequence_spans` instead — it emits the exact
    positional (seq_id, offset, length) span of every document,
    collision-safe by construction.

    Shape at 100 TB: ONE exchange total. The per-shard running token
    offset needs a window partitioned by shard; ``posexplode`` to
    (position, token) rows is narrow on top of it, and the final
    ``groupBy(shard, seq_id)`` reuses the window's hash partitioning
    (HashPartitioning(shard) satisfies the (shard, seq_id) clustering),
    so token rows never cross the wire a second time — plan-asserted in
    ``test_splits.py``. A shard is one task's sequential work exactly as
    in :func:`write_shards`: at 100 TB raise ``n_shards`` (~1 GB/shard)
    for parallelism; md5 bucketing keeps shard sizes even, so no skew.
    Beyond 256 shards the shard id switches to ``pmod(xxhash64)`` via
    :func:`assign_shards` — deterministic across runs, losing only
    cross-engine oracle parity.
    """
    from pyspark.sql import Window

    from dataweb_spark.functions.text import tokens

    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    if not eos or any(c.isspace() for c in eos):
        raise ValueError("eos must be a non-empty whitespace-free token")
    with_shard = assign_shards(df, key_col, n_shards)
    # NULL text behaves like empty text (doc contributes its eos marker);
    # without the coalesce the whole document would silently vanish from
    # the packed stream (concat/size/posexplode all propagate NULL).
    base = (with_shard
            .select(F.col("shard"), F.col("shard_order"),
                    F.col(key_col).alias("_key"),
                    F.concat(tokens(F.coalesce(F.col(text_col), F.lit(""))),
                             F.array(F.lit(eos))).alias("_toks"))
            .withColumn("_n", F.size("_toks")))
    # rows-frame running sum, NOT the default range frame: md5 collisions
    # would otherwise make tied rows peers and double-count their lengths.
    w = (Window.partitionBy("shard").orderBy("shard_order", "_key")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    base = base.withColumn("_end", F.sum("_n").over(w))
    ex = base.select(
        "shard", "_key", (F.col("_end") - F.col("_n")).alias("_off"),
        F.posexplode("_toks").alias("_p", "_tok"))
    pos = F.col("_off") + F.col("_p")
    packed = (ex.select(
                  "shard", "_key",
                  F.floor(pos / F.lit(seq_len)).cast("bigint")
                   .alias("seq_id"),
                  F.pmod(pos, F.lit(seq_len)).cast("int").alias("_pis"),
                  "_tok")
              .groupBy("shard", "seq_id")
              .agg(F.concat_ws(" ", F.transform(
                       F.array_sort(
                           F.collect_list(F.struct("_pis", "_tok"))),
                       lambda s: s["_tok"])).alias("seq_text"),
                   F.count("*").cast("bigint").alias("n_tokens"),
                   F.countDistinct("_key").cast("bigint").alias("n_docs"))
              .withColumn("is_full", F.col("n_tokens") == seq_len))
    if not keep_partial:
        packed = packed.where(F.col("is_full"))
    return packed


def pack_documents_best_fit(df: DataFrame, key_col: str = "doc_id",
                            text_col: str = "text", seq_len: int = 2048,
                            n_shards: int = 1) -> DataFrame:
    """Best-fit-decreasing document packing — the truncation-avoiding
    alternative to :func:`pack_sequences` (public recipe: "Fewer
    Truncations Improve Language Modeling", Ding et al. 2024): documents
    are never cut at arbitrary sequence boundaries. A document longer
    than ``seq_len`` is first split into its own ceil(n/seq_len) pieces
    (each ≤ ``seq_len``); pieces are then bin-packed per shard with
    best-fit-decreasing — size-descending order, each piece placed into
    the open bin with the SMALLEST residual that still fits, else a new
    bin — so cross-document attention bleed and mid-document truncation
    both disappear while fill stays near-optimal (any two bins overflow
    the capacity together, so at most one bin per shard is ≤ half full
    — pytest-locked).

    Deterministic: piece order is (size desc, md5(key), piece_idx) and
    ties in residual break toward the lowest bin id, so the assignment
    is a pure function of the corpus — independent of partitioning,
    pandas group arrival order, or cluster layout.

    Returns the piece-grain assignment (narrow — join text back by
    ``key_col``): shard, key, piece_idx, piece_tokens, bin_id (dense
    per shard in bin-open order), bin_offset (token start within the
    bin). Empty/whitespace docs pack nothing and emit nothing.

    Shape at 100 TB: ONE exchange. Piece rows are built map-only
    (token count → posexplode of a ceil(n/seq_len)-long sequence), and
    only (shard, order-hash, key, piece_idx, size) enters the per-shard
    ``applyInPandas`` group — ~40 B/piece, so a 1 GB-of-text shard's
    group is a few hundred KB of Arrow payload, never the text itself.
    The in-group cost is O(P·(log B + B_open)) — bisect plus a Python
    list shift per placement, where B_open counts bins still accepting
    pieces: FULL bins are pruned from the residual list immediately
    (piece sizes are ≥ 1, so residual 0 can never fit again), which
    keeps B_open small in the tightly-packed steady state. Shards
    parallelize exactly as in :func:`write_shards`; raise ``n_shards``
    with the corpus. Packing quality is per-shard (bins
    never span shards) — the fill bound above holds per shard, which is
    the trainer's unit of work anyway.
    """
    import bisect

    import pandas as pd

    from dataweb_spark.functions.text import token_count

    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    sizes = (assign_shards(df, key_col, n_shards)
             .select(F.col("shard"), F.col("shard_order").alias("_ord"),
                     F.col(key_col).alias("_key"),
                     token_count(text_col).alias("_n"))
             .where(F.col("_n") > 0))
    n_pieces = F.ceil(F.col("_n") / F.lit(seq_len)).cast("int")
    pieces = (sizes
              .select("shard", "_ord", "_key", "_n",
                      F.posexplode(F.sequence(F.lit(1), n_pieces))
                       .alias("piece_idx", "_one"))
              .select("shard", "_ord", "_key", "piece_idx",
                      F.least(F.lit(seq_len),
                              F.col("_n") - F.col("piece_idx")
                              * F.lit(seq_len)).cast("bigint")
                       .alias("piece_tokens")))

    key_type = df.schema[key_col].dataType.simpleString()
    out_schema = (f"shard int, {key_col} {key_type}, piece_idx int, "
                  f"piece_tokens long, bin_id long, bin_offset long")

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["piece_tokens", "_ord", "_key", "piece_idx"],
            ascending=[False, True, True, True]).reset_index(drop=True)
        res: list[tuple[int, int]] = []   # sorted (residual, bin_id)
        next_bin = 0
        bin_ids, offsets = [], []
        for s in pdf["piece_tokens"].to_numpy():
            s = int(s)
            i = bisect.bisect_left(res, (s, -1))
            if i < len(res):
                r, b = res.pop(i)
            else:
                r, b = seq_len, next_bin
                next_bin += 1
            bin_ids.append(b)
            offsets.append(seq_len - r)
            if r - s > 0:        # full bins can never fit a >=1 piece
                bisect.insort(res, (r - s, b))
        return pd.DataFrame({
            "shard": pdf["shard"], key_col: pdf["_key"],
            "piece_idx": pdf["piece_idx"],
            "piece_tokens": pdf["piece_tokens"],
            "bin_id": pd.Series(bin_ids, dtype="int64"),
            "bin_offset": pd.Series(offsets, dtype="int64")})

    return pieces.groupBy("shard").applyInPandas(pack_shard, out_schema)


def pack_sequence_spans(df: DataFrame, key_col: str = "doc_id",
                        text_col: str = "text", seq_len: int = 128,
                        n_shards: int = 1, eos: str = "<eos>",
                        keep_partial: bool = True) -> DataFrame:
    """Document-boundary metadata for :func:`pack_sequences` — one row per
    (shard, seq_id, document) span: where each document's tokens (eos
    included) sit inside the packed sequence. Trainers consume exactly
    this to reset attention across document boundaries inside a packed
    row (block-diagonal attention masks / position-id resets) — without
    it, packing silently lets documents attend to their neighbors.

    Emits: shard, seq_id, key, span_start (first position inside the
    sequence), span_len. A document straddling a sequence cut appears
    once per sequence it touches; per (shard, seq_id) the spans tile the
    row's tokens exactly (Σ span_len = that row's n_tokens, starts
    contiguous) — pytest-locked against :func:`pack_sequences` output.

    ``keep_partial`` must MATCH the :func:`pack_sequences` call being
    annotated: with ``keep_partial=False`` the spans of each shard's
    dropped trailing partial sequence are dropped here too (otherwise a
    join on (shard, seq_id) would meet orphan span rows).

    Same single-exchange shape as :func:`pack_sequences` (identical
    window + explode prefix; the groupBy adds the key, which still
    clusters under HashPartitioning(shard)).
    """
    from pyspark.sql import Window

    from dataweb_spark.functions.text import tokens

    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    if not eos or any(c.isspace() for c in eos):
        raise ValueError("eos must be a non-empty whitespace-free token")
    with_shard = assign_shards(df, key_col, n_shards)
    base = (with_shard
            .select(F.col("shard"), F.col("shard_order"),
                    F.col(key_col).alias("_key"),
                    (F.size(tokens(F.coalesce(F.col(text_col), F.lit(""))))
                     + F.lit(1)).cast("bigint").alias("_n")))
    w = (Window.partitionBy("shard").orderBy("shard_order", "_key")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    base = base.withColumn("_end", F.sum("_n").over(w))
    # a doc spanning stream positions [off, end) touches sequences
    # floor(off/L) .. floor((end-1)/L); explode those, clip to the window
    off = F.col("_end") - F.col("_n")
    first_seq = F.floor(off / F.lit(seq_len)).cast("bigint")
    last_seq = F.floor((F.col("_end") - 1) / F.lit(seq_len)).cast("bigint")
    shard_total = F.max("_end").over(Window.partitionBy("shard"))
    ex = (base.withColumn("_tot", shard_total)
              .select("shard", "_key", off.alias("_off"), "_end", "_tot",
                      F.explode(F.sequence(first_seq, last_seq))
                       .alias("seq_id")))
    if not keep_partial:
        # the shard's trailing sequence is partial iff the stream length
        # is not a multiple of seq_len — same rows pack_sequences drops
        partial_seq = F.floor((F.col("_tot") - 1) / F.lit(seq_len)) \
                       .cast("bigint")
        ex = ex.where((F.col("_tot") % seq_len == 0)
                      | (F.col("seq_id") != partial_seq))
    seq_lo = F.col("seq_id") * F.lit(seq_len)
    start = F.greatest(F.col("_off"), seq_lo)
    stop = F.least(F.col("_end"), seq_lo + F.lit(seq_len))
    return ex.select(
        "shard", "seq_id", F.col("_key").alias(key_col),
        (start - seq_lo).cast("int").alias("span_start"),
        (stop - start).cast("bigint").alias("span_len"))


def corpus_drift_report(old: DataFrame, new: DataFrame,
                        stratify_col: str = "lang",
                        text_col: str = "text") -> DataFrame:
    """Snapshot-over-snapshot composition drift — the report an operator
    reads before promoting a recrawled/reingested corpus: per stratum
    (language, source domain, quality bucket, …) the document and token
    counts in both snapshots, each side's share in parts-per-million,
    the share delta, and a status word (``new`` / ``gone`` / ``grew`` /
    ``shrank`` / ``stable``). A silent language collapse or a domain
    takeover shows up here as one row, not after a training run.

    Integer-exact: shares are ``(n·10^6) div total`` (bigint, no float),
    so the report hash-matches any engine; ``stable`` means the share
    moved ≤ ``1000`` ppm (0.1 pp). NULL strata are coalesced to the
    literal ``(null)`` BEFORE aggregating — an equi-join would never
    match NULL keys and would split one stratum into a phantom
    gone+new pair. NULL/empty/whitespace docs count 0 tokens but 1
    doc.

    Shape at 100 TB: one map-side-combined groupBy per snapshot
    (O(strata) rows out), a full outer join of two tiny aggregates, and
    two 1-row broadcast totals — the corpora are each scanned once,
    nothing else shuffles.
    """
    from dataweb_spark.functions.text import token_count

    def agg(df: DataFrame, side: str) -> DataFrame:
        stratum = F.coalesce(F.col(stratify_col).cast("string"),
                             F.lit("(null)"))
        toks = token_count(F.coalesce(F.col(text_col), F.lit("")))
        return (df.groupBy(stratum.alias("stratum"))
                  .agg(F.count("*").cast("bigint").alias(f"docs_{side}"),
                       F.sum(toks).cast("bigint").alias(f"toks_{side}")))

    o, n = agg(old, "old"), agg(new, "new")
    tot_o = o.agg(F.sum("docs_old").alias("_to"))
    tot_n = n.agg(F.sum("docs_new").alias("_tn"))
    joined = (o.join(n, "stratum", "full_outer")
               .crossJoin(F.broadcast(tot_o))
               .crossJoin(F.broadcast(tot_n))
               .na.fill(0, ["docs_old", "toks_old", "docs_new", "toks_new"]))
    share_old = F.expr("cast(docs_old * 1000000L div greatest(_to, 1) "
                       "as bigint)")
    share_new = F.expr("cast(docs_new * 1000000L div greatest(_tn, 1) "
                       "as bigint)")
    out = (joined
           .withColumn("share_old_e6", share_old)
           .withColumn("share_new_e6", share_new)
           .withColumn("delta_e6",
                       F.col("share_new_e6") - F.col("share_old_e6"))
           .withColumn("status",
                       F.when(F.col("docs_old") == 0, "new")
                        .when(F.col("docs_new") == 0, "gone")
                        .when(F.col("delta_e6") > 1000, "grew")
                        .when(F.col("delta_e6") < -1000, "shrank")
                        .otherwise("stable")))
    return out.select("stratum", "docs_old", "docs_new", "toks_old",
                      "toks_new", "share_old_e6", "share_new_e6",
                      "delta_e6", "status")
