"""Deterministic cardinality sketches (KMV — k minimum values).

Spark's ``approx_count_distinct`` (HLL++) is engine-internal: its value
depends on the implementation's hash and register layout, so a DuckDB
oracle can only bound it (see the ``approx_sketches`` query). The KMV
sketch here is the opposite trade: the k SMALLEST 48-bit md5 hashes of
the distinct values are a pure function of the data — identical on any
engine, any partitioning, any run — so federated cardinality work can
ship O(k) rows per source and still be exactly reproducible end to end.

Estimator (Bar-Yossef et al., "Counting distinct elements in a data
stream", RANDOM 2002 — the classic k-th minimum value bound): with the
hash space scaled to [0, 1), ``E[distinct] ≈ (k-1) / h_(k)``. Kept in
pure integer arithmetic: ``est = (k-1)·2^48 div kth_min`` (exact in
bigint, no float divergence between engines); below k distinct values
the sketch IS the distinct set and the count is exact.

Scale shape (100 TB): an Arrow-batched per-partition pre-combine keeps
only each partition's k smallest hashes per group (global k-mins are
always contained in the union of per-partition k-mins — the same
containment ``kmv_merge`` relies on), so the exchange carries at most
``partitions·groups·k`` rows instead of every distinct hash, and the
final single-task rank per group sorts a bounded set. The federation
path never re-shuffles raw data at all: each source ships its own
k-array (``kmv_sketch``), and ``kmv_merge`` unions + re-ranks
O(sources·k) rows — exactly the partial-aggregate property engine-mode
pushdown needs for COUNT DISTINCT (reference analog: the partial-agg
forwarding of ``plans/aggpush.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["kmv_hash", "kmv_sketch", "kmv_merge", "kmv_estimate_col",
           "kmv_set_estimates", "quantile_sketch", "quantile_sketch_merge",
           "sampled_token_postings", "vocab_sample_stats"]

HASH_BITS = 48
_SPACE = 1 << HASH_BITS


def kmv_hash(col: str | Column) -> Column:
    """48-bit value hash: the first 12 hex chars of md5, as bigint.

    Cross-engine exact (DuckDB replays it as
    ``('0x' || substr(md5(v), 1, 12))::bigint``); 48 bits keeps the
    birthday-collision probability negligible for sketch purposes while
    staying comfortably inside bigint for the integer estimator.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 12),
                  16, 10).cast("long")


def kmv_estimate_col(kmv_col: str, k: int) -> Column:
    """Integer KMV estimate from a sorted k-min array column (by name).

    Exact count while the sketch holds fewer than ``k`` hashes (it IS
    the distinct set); otherwise the k-th-minimum estimator in pure
    bigint: ``(k-1)·2^48 div kth`` (SQL integer ``div`` — no float
    anywhere, so every engine lands on the same bigint).
    """
    n = F.size(F.col(kmv_col))
    # decimal(38,0) keeps (k-1)·2^48 exact for ANY k (a bigint literal
    # overflows past k ≈ 32769, even though that branch is then dead).
    return (F.when(n < k, n.cast("bigint"))
             .otherwise(F.expr(
                 f"cast((cast({k - 1} as decimal(38,0)) * {_SPACE}) div "
                 f"element_at({kmv_col}, {k}) as bigint)"))
            ).alias("distinct_est")


def _local_kmin_precombine(pairs: DataFrame, gcols: list[str], k: int,
                           vcols: tuple[str, ...] = ("_h",)) -> DataFrame:
    """Per-partition k smallest ``vcols`` tuples per group (Arrow-batched,
    lexicographic — callers put the hash first, so extra carried columns
    only break hash-collision ties).

    The global k-mins of a group are always contained in the union of
    its per-partition k-mins, so dropping everything else before the
    exchange is lossless — the map-side-combine step Spark has no
    declarative TopK for. State is O(groups·k) tuples per task: fine for
    the sketch's natural use (sources, languages, shards); disable via
    ``local_combine=False`` for very high group cardinality, where the
    state outweighs the shuffle saving.
    """
    import pandas as pd

    schema = pairs.schema
    cols = list(vcols)

    def combine(batches):
        best: dict[tuple, list[tuple]] = {}
        for pdf in batches:
            for key, grp in pdf.groupby(gcols, sort=False, dropna=False):
                key = key if isinstance(key, tuple) else (key,)
                # pandas surfaces NULL group keys as NaN — restore None
                # so the emitted Arrow batch matches the column type
                key = tuple(None if (isinstance(x, float) and pd.isna(x))
                            else x for x in key)
                merged = best.get(key, [])
                cand = sorted(set(merged).union(
                    zip(*(grp[c].tolist() for c in cols))))
                best[key] = cand[:k]
            del pdf
        rows = [list(key) + list(tup)
                for key, tups in best.items() for tup in tups]
        if rows:
            yield pd.DataFrame(rows, columns=[*gcols, *cols])

    return pairs.mapInPandas(combine, schema)


def _finish_sketch(pairs: DataFrame, gcols: list[str], added: list[str],
                   k: int) -> DataFrame:
    """(group, _h) pairs → sketch rows: kmv array, n_mins, estimate, k."""
    from pyspark.sql import Window

    w = Window.partitionBy(*gcols).orderBy("_h")
    out = (pairs.withColumn("_rk", F.row_number().over(w))
                .where(F.col("_rk") <= k)
                .groupBy(*gcols)
                .agg(F.sort_array(F.collect_list("_h")).alias("kmv")))
    out = (out.withColumn("n_mins", F.size("kmv").cast("bigint"))
              .withColumn("distinct_est", kmv_estimate_col("kmv", k))
              .withColumn("k", F.lit(k).cast("bigint")))
    return out.drop(*added)


def kmv_sketch(df: DataFrame, value_col: str,
               group_cols: list[str] | None = None,
               k: int = 64, local_combine: bool = True) -> DataFrame:
    """Per-group KMV sketch + integer distinct estimate.

    Returns one row per group: ``kmv`` (sorted array of the ≤k smallest
    distinct value hashes — the mergeable sketch), ``n_mins``,
    ``distinct_est`` (exact below k), and ``k`` (the build parameter —
    ``kmv_merge`` refuses to merge at a larger k, the lossy direction).
    ``group_cols=None`` sketches the whole frame as one group.

    ``local_combine`` (default on) runs the per-partition k-min
    pre-combine so the exchange carries ≤ partitions·groups·k rows and
    the final per-group rank sorts a bounded set — without it, one task
    ranks ALL distinct hashes of its group (fine at test scale, not at
    10⁹ distinct). The result is identical either way (pytest-locked).
    NULL values hash via a sentinel (md5 of NULL is NULL and would
    otherwise rank first), so they count as ONE distinct value; filter
    them out first for strict ``count(distinct ...)`` semantics.
    Sentinel collision caveat: the sentinel is the string ``'\\x00null'``,
    so a non-NULL value whose STRING CAST equals that exact byte sequence
    collapses with NULL into one distinct value — impossible for numeric/
    date/decimal columns (their casts never contain NUL) and effectively
    so for real text, but a binary/string column adversarially containing
    ``b"\\x00null"`` should be pre-filtered or pre-encoded.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    gcols = list(group_cols or [])
    added = []
    if not gcols:
        df = df.withColumn("_g", F.lit(1))
        gcols, added = ["_g"], ["_g"]
    pairs = df.select(*gcols,
                      kmv_hash(F.coalesce(
                          F.col(value_col).cast("string"),
                          F.lit('\x00null'))).alias("_h"))
    if local_combine:
        # collapse BEFORE the exchange — the distinct afterwards dedups
        # the same hash surviving from several partitions (a duplicate
        # entering the rank would corrupt the k-th minimum) and now runs
        # over ≤ partitions·groups·k rows instead of the raw stream.
        pairs = _local_kmin_precombine(pairs, gcols, k)
    return _finish_sketch(pairs.distinct(), gcols, added, k)


def _kmv_guarded(df: DataFrame, k: int) -> "Column":
    """The ``kmv`` column gated by an EXECUTION-TIME merge-direction
    check: every row's build ``k`` must be ≥ the requested ``k``, else
    the task errors instead of silently undercounting (ranks beyond a
    smaller build k were never kept, and a short array would even be
    reported as an "exact" count). Lives inside the consuming
    expression so column pruning can never drop it, and costs one
    integer comparison per row — no separate validation job."""
    return (F.when(F.col("k") >= F.lit(k), F.col("kmv"))
             .otherwise(F.raise_error(F.concat(
                 F.lit("kmv sketch built with k="),
                 F.col("k").cast("string"),
                 F.lit(f" cannot serve k={k}: ranks beyond the build k "
                       "were never kept (silent undercount)")))
                 .cast("array<bigint>")))


def kmv_merge(sketches: DataFrame, group_cols: list[str] | None = None,
              k: int = 64, built_k: int | None = None) -> DataFrame:
    """Merge per-source sketches into the whole-data sketch.

    Input is any union of ``kmv_sketch`` outputs (columns ``kmv`` and
    ``k``, one row per (source, group)); output is identical to running
    ``kmv_sketch`` over the union of the raw data (pytest-locked): the
    k smallest hashes of a union are always contained in the union of
    the per-source k smallest. This is the federated COUNT DISTINCT
    shape — O(sources·k) sketch rows cross the wire, never raw values.

    ``k`` must be ≤ every input sketch's build k: hashes ranked beyond
    a source's k were never shipped, so merging UP would silently
    undercount (and can even report a too-small count as "exact").
    ``built_k`` (the known build parameter) validates that with zero
    compute; without it an eager ``min(k)`` probe runs — free on a
    MATERIALIZED sketch table, but on an inline lazy ``kmv_sketch``
    plan it forces the full sketch lineage once before the returned
    plan recomputes it (r12 honesty fix: the old docstring claimed the
    probe "costs nothing", conflating materialized size with lineage
    compute).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    if "k" not in sketches.columns:
        raise ValueError("input is not a kmv_sketch output (no 'k' column)")
    if built_k is not None:
        if built_k < k:
            raise ValueError(
                f"cannot merge at k={k}: an input sketch was built with "
                f"k={built_k}; ranks beyond it were never kept, so "
                "merging up would undercount")
    else:
        min_k = sketches.agg(F.min("k")).first()[0]
        if min_k is not None and min_k < k:
            raise ValueError(
                f"cannot merge at k={k}: an input sketch was built with "
                f"k={min_k}; ranks beyond it were never kept, so merging "
                "up would undercount")
    gcols = list(group_cols or [])
    added = []
    if not gcols:
        sketches = sketches.withColumn("_g", F.lit(1))
        gcols, added = ["_g"], ["_g"]
    pairs = (sketches.select(*gcols,
                             F.explode(_kmv_guarded(sketches, k))
                              .alias("_h"))
                     .distinct())
    return _finish_sketch(pairs, gcols, added, k)


def kmv_set_estimates(a: DataFrame, b: DataFrame,
                      group_cols: list[str] | None = None,
                      k: int = 64,
                      built_k: int | None = None) -> DataFrame:
    """Set-operation cardinality estimates from two KMV sketch frames —
    union, intersection, both differences, and an integer Jaccard —
    without touching raw data (Beyer et al., "On Synopses for Distinct
    Value Estimation Under Multiset Operations", SIGMOD 2007: the k
    smallest hashes of A∪B are a uniform sample of the union, so the
    fraction of them lying in both sketches estimates the overlap).

    Inputs are ``kmv_sketch``/``kmv_merge`` outputs (``group_cols`` +
    ``kmv`` + ``k``), one row per group per side; groups are matched
    null-safely and a group present on one side only meets an empty
    sketch. Output per group: ``n_union_mins`` (size of the union's
    k-min set M), ``union_est`` (k-th-minimum estimator over M, exact
    below k), ``inter_est`` / ``a_only_est`` / ``b_only_est``
    (``c · union_est div |M|`` with c the count of M-hashes seen in
    both / only A / only B — when the union is below k these are EXACT
    since M is then the entire distinct set and union_est = |M|), and
    ``jaccard_e6`` (``c_both·10⁶ div |M|`` — the sampled Jaccard in
    ppm). All pure integer arithmetic on the shared 48-bit hash space:
    any engine replays every output cell bit-for-bit.

    The membership tests are sound: for h ∈ M with h actually present
    in set A, suppose h ∉ kmv_a — then A holds ≥ k hashes smaller than
    h, all of which are in kmv_a and hence in the union array, so h
    cannot rank within the union's k smallest, contradicting h ∈ M.
    Therefore ``M ∩ kmv_a`` is exactly the M-hashes belonging to A (and
    symmetrically for B) — no false "only" classifications. Same
    merge-direction guard as ``kmv_merge``: ``k`` must be ≤ both
    builds' k. Pass ``built_k`` (the known build parameter) to validate
    that WITHOUT executing the inputs — the default probe runs
    ``min(k)`` on each side, which forces each sketch's full lazy
    lineage once before the returned plan recomputes it (fine for
    materialized sketch tables, a 2× cost on inline lazy plans). Either
    way an in-plan per-row guard backstops the contract at execution
    time (a LYING ``built_k`` errors the job instead of silently
    undercounting).

    Scale shape: sketch frames are O(groups) rows of ≤k-long arrays —
    this is one small full-outer join plus array kernels, no raw-data
    shuffle; the federated cross-snapshot overlap shape (e.g. "how many
    URLs/texts do two crawls share per language") ships 2·k bigints per
    group across the wire, never the corpora.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    for side, df in (("a", a), ("b", b)):
        if "k" not in df.columns:
            raise ValueError(
                f"input {side} is not a kmv_sketch output (no 'k' column)")
        if built_k is not None:
            if built_k < k:
                raise ValueError(
                    f"cannot estimate at k={k}: inputs were built with "
                    f"k={built_k}; ranks beyond it were never kept")
            continue
        min_k = df.agg(F.min("k")).first()[0]
        if min_k is not None and min_k < k:
            raise ValueError(
                f"cannot estimate at k={k}: input {side} was built with "
                f"k={min_k}; ranks beyond it were never kept")
    gcols = list(group_cols or [])
    added = []
    if not gcols:
        a = a.withColumn("_g", F.lit(1))
        b = b.withColumn("_g", F.lit(1))
        gcols, added = ["_g"], ["_g"]
    empty = F.array().cast("array<bigint>")
    # NULL-safe group matching: a plain equi-join would leave a NULL
    # group unmatched on BOTH sides (two rows, each against an empty
    # sketch — zero overlap reported for a possibly-identical set).
    left = a.select(*[F.col(c).alias(f"_la_{c}") for c in gcols],
                    _kmv_guarded(a, k).alias("_ka"))
    right = b.select(*[F.col(c).alias(f"_rb_{c}") for c in gcols],
                     _kmv_guarded(b, k).alias("_kb"))
    cond = None
    for c in gcols:
        eq = F.col(f"_la_{c}").eqNullSafe(F.col(f"_rb_{c}"))
        cond = eq if cond is None else cond & eq
    j = left.join(right, cond, "full_outer")
    for c in gcols:
        j = j.withColumn(c, F.coalesce(f"_la_{c}", f"_rb_{c}"))
    j = (j.drop(*[f"_la_{c}" for c in gcols],
                *[f"_rb_{c}" for c in gcols])
         .withColumn("_ka", F.coalesce("_ka", empty))
         .withColumn("_kb", F.coalesce("_kb", empty)))
    m = F.slice(F.array_sort(F.array_union("_ka", "_kb")), 1, k)
    j = j.withColumn("_m", m).withColumn(
        "n_union_mins", F.size("_m").cast("bigint"))
    j = j.withColumn("union_est", kmv_estimate_col("_m", k))
    in_a = F.array_intersect("_m", "_ka")
    c_both = F.size(F.array_intersect(in_a, F.col("_kb")))
    c_a = F.size(F.array_except(in_a, F.col("_kb")))
    c_b = F.size(F.array_except(F.array_intersect("_m", "_kb"),
                                F.col("_ka")))
    # c · union_est div |M| — bigint-safe (c ≤ k ≤ 2^15, est < 2^48)
    j = (j.withColumn("_cb", c_both.cast("bigint"))
          .withColumn("_ca", c_a.cast("bigint"))
          .withColumn("_cbo", c_b.cast("bigint")))
    j = (j.withColumn("inter_est", F.expr(
              "cast(case when n_union_mins = 0 then 0 "
              "else (_cb * union_est) div n_union_mins end as bigint)"))
          .withColumn("a_only_est", F.expr(
              "cast(case when n_union_mins = 0 then 0 "
              "else (_ca * union_est) div n_union_mins end as bigint)"))
          .withColumn("b_only_est", F.expr(
              "cast(case when n_union_mins = 0 then 0 "
              "else (_cbo * union_est) div n_union_mins end as bigint)"))
          .withColumn("jaccard_e6", F.expr(
              "cast(case when n_union_mins = 0 then 0 "
              "else (_cb * 1000000) div n_union_mins end as bigint)")))
    return (j.select(*gcols, "n_union_mins", "union_est", "inter_est",
                     "a_only_est", "b_only_est", "jaccard_e6")
             .drop(*added))


# ---------------------------------------------------------------------------
# Quantile sketch: deterministic hash-rank row sample (KMV over row keys)
# ---------------------------------------------------------------------------

def _pair_hash(key_col: str | Column, value_col: str | Column) -> Column:
    """48-bit md5 hash of the (key, value) pair, unit-separated.

    The sample unit of ``quantile_sketch``: with a per-row-unique key
    the pair hash IS a uniform row hash; duplicate identical pairs
    collapse harmlessly (the sketch dedups them anyway). The \\x1f unit
    separator keeps (key="a", value="bc") distinct from (key="ab",
    value="c"). Cross-engine exact — DuckDB replays it as
    ``('0x' || substr(md5(k || chr(31) || v), 1, 12))::bigint``.
    """
    kc = F.col(key_col) if isinstance(key_col, str) else key_col
    vc = F.col(value_col) if isinstance(value_col, str) else value_col
    return kmv_hash(F.concat(kc.cast("string"), F.lit("\x1f"),
                             vc.cast("string")))


def _bp(p: float) -> int:
    """Probability → basis points (1/10000), validated. Keeping ranks in
    integer arithmetic (``(bp·n + 9999) div 10000``) makes the quantile
    index a pure function of (p, n) — no float product whose last bit
    could differ between engines."""
    bp = round(p * 10000)
    if not (0 < bp <= 10000) or abs(bp / 10000 - p) > 1e-12:
        raise ValueError(
            f"prob {p} must lie in (0, 1] at 1/10000 resolution")
    return bp


def _q_name(bp: int) -> str:
    return "q" + f"{bp / 100:g}".replace(".", "_")


def _quantile_cols(vals_col: str, probs: list[int]) -> list[Column]:
    """percentile_disc over a SORTED sample array, integer-exact:
    element at rank ``ceil(p·n)`` = ``(bp·n + 9999) div 10000``."""
    return [F.expr(
        f"element_at({vals_col}, cast(greatest(1, "
        f"({bp} * size({vals_col}) + 9999) div 10000) as int))"
    ).alias(_q_name(bp)) for bp in probs]


def _finish_quantile_sketch(pairs: DataFrame, gcols: list[str],
                            added: list[str], k: int,
                            probs: list[int]) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy(*gcols).orderBy("_h", "_v")
    kept = (pairs.withColumn("_rk", F.row_number().over(w))
                 .where(F.col("_rk") <= k))
    out = (kept.groupBy(*gcols)
               .agg(F.sort_array(F.collect_list(F.struct("_h", "_v")))
                     .alias("_p"),
                    F.sort_array(F.collect_list("_v")).alias("_sv")))
    out = (out.withColumn("qs_h", F.col("_p._h"))
              .withColumn("qs_v", F.col("_p._v"))
              .withColumn("n_sample", F.size("_sv").cast("bigint"))
              .withColumn("k", F.lit(k).cast("bigint")))
    out = out.select(*gcols, "qs_h", "qs_v", "n_sample", "k",
                     *_quantile_cols("_sv", probs))
    return out.drop(*added)


def quantile_sketch(df: DataFrame, value_col: str, key_col: str,
                    group_cols: list[str] | None = None, k: int = 256,
                    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
                    local_combine: bool = True) -> DataFrame:
    """Per-group deterministic quantile sketch: the value distribution
    summarized from the k rows whose (key, value) pair hash ranks
    smallest — a KMV sample over ROW IDENTITY instead of value space,
    so the retained values are a uniform deterministic
    without-replacement row sample and sample quantiles estimate the
    true ones (exact whenever the group holds ≤ k distinct pairs; the
    sample is then the whole group). ``key_col`` must identify rows
    (e.g. ``doc_id``): duplicate identical (key, value) pairs collapse
    to one sample point, and a key reused with different values
    contributes each value once — document keys upstream if rows repeat.
    Rows with a NULL key, a NULL value, or a NaN value are EXCLUDED from
    the sample (a NULL pair hash would rank first on Spark and last on
    DuckDB, and NaN never equals itself in the dedup — either would
    silently corrupt the "uniform sample" and the cross-engine replay);
    quantiles here are over the non-NULL, non-NaN values, the same
    population ``percentile_disc`` sees.

    Returns one row per group: ``qs_h``/``qs_v`` (pair hashes + their
    values, aligned, hash-sorted — the mergeable sketch),
    ``n_sample``, ``k``, and one column per prob (``q25``, ``q50``, …)
    = percentile_disc over the sample in PURE INTEGER rank arithmetic
    (``element_at(sorted_vals, (bp·n + 9999) div 10000)``) — every
    output cell replays bit-for-bit on any engine, unlike
    ``approx_percentile`` (engine-internal GK/t-digest state).

    Scale shape (100 TB): with ``local_combine`` each partition ships
    only its k smallest pairs per group (global k-mins ⊆ union of
    per-partition k-mins), so the exchange carries ≤ partitions·groups·k
    rows and the final rank sorts a bounded set; federated quantiles
    ship O(k) (hash, value) pairs per source and ``quantile_sketch_merge``
    reproduces the whole-data sketch exactly (the reference's
    partial-aggregate forwarding shape, `plans/aggpush.py` analog).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    bps = [_bp(p) for p in probs]
    if len(set(bps)) != len(bps):
        raise ValueError(f"duplicate probs at 1/10000 resolution: {probs}")
    gcols = list(group_cols or [])
    added = []
    if not gcols:
        df = df.withColumn("_g", F.lit(1))
        gcols, added = ["_g"], ["_g"]
    keep = F.col(value_col).isNotNull() & F.col(key_col).isNotNull()
    vtype = dict(df.dtypes).get(value_col)
    if vtype in ("float", "double"):
        keep = keep & ~F.isnan(value_col)
    pairs = df.where(keep).select(
        *gcols, _pair_hash(key_col, value_col).alias("_h"),
        F.col(value_col).alias("_v"))
    if local_combine:
        pairs = _local_kmin_precombine(pairs, gcols, k, ("_h", "_v"))
    return _finish_quantile_sketch(pairs.distinct(), gcols, added, k, bps)


def quantile_sketch_merge(sketches: DataFrame,
                          group_cols: list[str] | None = None,
                          k: int = 256,
                          probs: tuple[float, ...] = (0.25, 0.5,
                                                      0.75, 0.95),
                          built_k: int | None = None) -> DataFrame:
    """Merge per-source quantile sketches into the whole-data sketch —
    identical to ``quantile_sketch`` over the union of the raw rows
    (pytest-locked): the k smallest pair hashes of a union are contained
    in the union of per-source k smallest, and each hash carries its
    value along. Same merge-direction law as ``kmv_merge``: ``k`` must
    be ≤ every input's build k (ranks beyond a smaller build k were
    never kept — merging up would silently bias the sample toward the
    sources that did keep them); ``built_k`` validates that with zero
    compute, else a ``min(k)`` probe runs (which forces lazy inputs
    once), and an in-plan per-row guard backstops either path."""
    if k < 2:
        raise ValueError("k must be >= 2")
    bps = [_bp(p) for p in probs]
    if len(set(bps)) != len(bps):
        raise ValueError(f"duplicate probs at 1/10000 resolution: {probs}")
    if "k" not in sketches.columns:
        raise ValueError(
            "input is not a quantile_sketch output (no 'k' column)")
    if built_k is not None:
        if built_k < k:
            raise ValueError(
                f"cannot merge at k={k}: an input sketch was built with "
                f"k={built_k}; ranks beyond it were never kept")
    else:
        min_k = sketches.agg(F.min("k")).first()[0]
        if min_k is not None and min_k < k:
            raise ValueError(
                f"cannot merge at k={k}: an input sketch was built with "
                f"k={min_k}; ranks beyond it were never kept")
    gcols = list(group_cols or [])
    added = []
    if not gcols:
        sketches = sketches.withColumn("_g", F.lit(1))
        gcols, added = ["_g"], ["_g"]
    guarded = (F.when(F.col("k") >= F.lit(k), F.col("qs_h"))
                .otherwise(F.raise_error(F.concat(
                    F.lit("quantile sketch built with k="),
                    F.col("k").cast("string"),
                    F.lit(f" cannot serve k={k}: ranks beyond the build "
                          "k were never kept (biased sample)")))
                    .cast("array<bigint>")))
    pairs = (sketches.select(
                *gcols,
                F.explode(F.arrays_zip(guarded.alias("_h"),
                                       F.col("qs_v").alias("_v")))
                 .alias("_z"))
             .select(*gcols, F.col("_z._h").alias("_h"),
                     F.col("_z._v").alias("_v"))
             .distinct())
    return _finish_quantile_sketch(pairs, gcols, added, k, bps)


# ---------------------------------------------------------------------------
# Hash-sampled vocabulary statistics: a deterministic 1/m TYPE-space sample
# ---------------------------------------------------------------------------

def sampled_token_postings(df: DataFrame, text_col: str,
                           group_cols: list[str] | None = None,
                           m: int = 16, pattern: str = r"\s+",
                           lowercase: bool = False) -> DataFrame:
    """EXACT counts for a deterministic 1/m sample of token TYPES.

    Tokens whose 48-bit md5 hash falls below ``2^48 div m`` are kept —
    a pseudo-random but fully deterministic 1/m slice of type space —
    and every occurrence of a kept type is counted exactly
    (``group_cols + [token] → count``). Because membership is a pure
    function of the token, disjoint sub-corpora sample the SAME type
    set, so postings merge across sources/snapshots by plain summation
    (groupBy token, sum n) — no rank re-negotiation, the additive
    partial-aggregate shape federation forwards as-is.

    Scale shape (100 TB): the hash filter runs map-side on the exploded
    token stream, cutting shuffle volume to ~1/m of total occurrences
    before the groupBy's partial aggregation; no driver state, no
    full-vocabulary shuffle. With m=16 a 10¹¹-token corpus ships ~6% of
    its occurrences pre-combined.

    Returns ``group_cols + [token, n]``. NULL texts contribute nothing;
    empty tokens (split artifacts) are dropped; ``lowercase`` folds case
    BEFORE hashing (changes the sampled set — keep it consistent across
    corpora you intend to merge).
    """
    if m < 1:
        raise ValueError("m must be >= 1")
    gcols = list(group_cols or [])
    thr = _SPACE // m
    tok = F.explode(F.split(F.col(text_col), pattern)).alias("token")
    toks = (df.where(F.col(text_col).isNotNull())
              .select(*gcols, tok)
              .where(F.col("token") != ""))
    if lowercase:
        toks = toks.withColumn("token", F.lower("token"))
    return (toks.where(kmv_hash("token") < F.lit(thr))
                .groupBy(*gcols, "token")
                .agg(F.count(F.lit(1)).alias("n")))


def vocab_sample_stats(df: DataFrame, text_col: str,
                       group_cols: list[str] | None = None,
                       m: int = 16, pattern: str = r"\s+",
                       lowercase: bool = False) -> DataFrame:
    """Per-group vocabulary statistics from the 1/m type sample —
    unbiased Horvitz-Thompson scale-ups, all pure integers:

    - ``types_sampled`` / ``types_est = ·m``: vocabulary size,
    - ``tokens_sampled`` / ``tokens_est = ·m``: total occurrences
      (unbiased because sampling is over types: each type's exact count
      enters with probability 1/m),
    - ``hapax_sampled`` / ``hapax_est = ·m``: types occurring once —
      the frequency-spectrum head, the classic vocabulary-growth
      statistic (Heaps'-law calibration without a full vocab shuffle).

    A group with NO sampled types (tiny group, unlucky slice) is absent
    from the output — join against the group universe and coalesce to 0
    if you need dense rows. Estimates are exact multiples of m; their
    sampling error shrinks with type count (σ/μ ≈ sqrt(m/types)), so
    m=16 on a 10⁶-type corpus is ~0.4%. Cross-engine exact: DuckDB
    replays the hash slice, the counts, and the scale-ups cell-for-cell.
    """
    postings = sampled_token_postings(df, text_col, group_cols, m,
                                      pattern, lowercase)
    gcols = list(group_cols or [])
    ml = F.lit(int(m)).cast("bigint")
    agg = (postings.groupBy(*gcols) if gcols
           else postings.groupBy())
    # coalesce: with group_cols=None an EMPTY sample still emits the one
    # global row (count=0), whose sums would otherwise be NULL — the
    # docstring promises pure integers everywhere
    out = agg.agg(
        F.count(F.lit(1)).cast("bigint").alias("types_sampled"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint")
         .alias("tokens_sampled"),
        F.coalesce(F.sum(F.when(F.col("n") == 1, 1).otherwise(0)),
                   F.lit(0)).cast("bigint").alias("hapax_sampled"))
    return out.select(
        *gcols, "types_sampled",
        (F.col("types_sampled") * ml).alias("types_est"),
        "tokens_sampled",
        (F.col("tokens_sampled") * ml).alias("tokens_est"),
        "hapax_sampled",
        (F.col("hapax_sampled") * ml).alias("hapax_est"))
