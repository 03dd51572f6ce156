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

Scale shape (100 TB): ``distinct`` partial-aggregates map-side, so the
first exchange carries distinct (group, hash) pairs, not rows. The
k-min extraction is a rank window over that; the final per-group
collapse reuses the window's partitioning (no third exchange —
plan-asserted). The federation path never re-shuffles raw data at all:
each source ships its own k-array (``kmv_sketch``), and ``kmv_merge``
unions + re-ranks O(sources·k) rows — the k smallest of a union are
findable from the per-source k smallest (pytest-locked invariant), which
is exactly the partial-aggregate property engine-mode pushdown needs
for COUNT DISTINCT (reference analog: the partial-agg forwarding of
``plans/aggpush.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["kmv_hash", "kmv_sketch", "kmv_merge", "kmv_estimate_col"]

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


def _k_min_collapse(pairs: DataFrame, group_cols: list[str],
                    k: int) -> DataFrame:
    """(group, _h) pairs → one row per group with the sorted k-min array."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("_h")
    return (pairs.withColumn("_rk", F.row_number().over(w))
                 .where(F.col("_rk") <= k)
                 .groupBy(*group_cols)
                 .agg(F.sort_array(F.collect_list("_h")).alias("kmv")))


def kmv_sketch(df: DataFrame, value_col: str,
               group_cols: list[str] | None = None,
               k: int = 64) -> DataFrame:
    """Per-group KMV sketch + integer distinct estimate.

    Returns one row per group: ``kmv`` (sorted array of the ≤k smallest
    distinct value hashes — the mergeable sketch), ``n_mins``, and
    ``distinct_est`` (exact below k). ``group_cols=None`` sketches the
    whole frame as one group.

    Two exchanges: map-side-combined ``distinct`` on (group, hash),
    then the rank window's repartition on the group; the final groupBy
    reuses the window's partitioning. NULL values hash via a sentinel
    (md5 of NULL is NULL and would otherwise rank first), so they count
    as ONE distinct value; filter them out first for strict
    ``count(distinct ...)`` semantics.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    gcols = list(group_cols or [])
    added = []
    if not gcols:
        df = df.withColumn("_g", F.lit(1))
        gcols, added = ["_g"], ["_g"]
    pairs = (df.select(*gcols,
                       kmv_hash(F.coalesce(
                           F.col(value_col).cast("string"),
                           F.lit('\x00null'))).alias("_h"))
               .distinct())
    out = _k_min_collapse(pairs, gcols, k)
    out = (out.withColumn("n_mins", F.size("kmv").cast("bigint"))
              .withColumn("distinct_est", kmv_estimate_col("kmv", k)))
    return out.drop(*added)


def kmv_merge(sketches: DataFrame, group_cols: list[str] | None = None,
              k: int = 64) -> DataFrame:
    """Merge per-source sketches into the whole-data sketch.

    Input is any union of ``kmv_sketch`` outputs (column ``kmv``, one
    row per (source, group)); output is identical to running
    ``kmv_sketch`` over the union of the raw data (pytest-locked):
    the k smallest hashes of a union are always contained in the union
    of the per-source k smallest. This is the federated COUNT DISTINCT
    shape — O(sources·k) sketch rows cross the wire, never raw values.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    gcols = list(group_cols or [])
    added = []
    if not gcols:
        sketches = sketches.withColumn("_g", F.lit(1))
        gcols, added = ["_g"], ["_g"]
    pairs = (sketches.select(*gcols, F.explode("kmv").alias("_h"))
                     .distinct())
    out = _k_min_collapse(pairs, gcols, k)
    out = (out.withColumn("n_mins", F.size("kmv").cast("bigint"))
              .withColumn("distinct_est", kmv_estimate_col("kmv", k)))
    return out.drop(*added)
