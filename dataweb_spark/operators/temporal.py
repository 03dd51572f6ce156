"""Temporal join operators Spark lacks natively, composed for scale.

The reference has no counterpart (its joins are delegated wholesale,
SURVEY.md §2.4); these are the time-series operators a training-data
pipeline needs over event streams.

* :func:`as_of_join` — for each left row, the most recent right row with
  ``right_ts <= left_ts`` per key. Implemented with the union-and-fill
  pattern: tag both sides, sort once per key, carry the last right payload
  forward with ``last(..., ignorenulls)``. ONE shuffle per input, no range
  explosion, no per-row subquery — the merge-join shape kdb/pandas
  ``merge_asof`` uses, expressed in Spark windows. State per key is one
  row; skew maps to key skew (salt upstream if one key dominates).
* :func:`range_join` — interval containment (``lo <= x <= hi``) without the
  cross product: intervals are exploded onto fixed-width buckets, the join
  keys on (key?, bucket), then the exact predicate filters. Bucket width
  trades replication factor against bucket fan-in; both sides shuffle on
  the well-distributed bucket id. Equivalent to the binning strategy
  behind dedicated range-join optimizers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(left: DataFrame, right: DataFrame, key: str,
               left_ts: str = "ts", right_ts: str = "ts",
               right_cols: list[str] | None = None,
               suffix: str = "_right",
               tolerance_seconds: float | None = None) -> DataFrame:
    """Backward as-of join (latest right row at-or-before each left row).

    Returns all left columns plus each requested right column as
    ``<col><suffix>`` and ``<right_ts><suffix>``; rows with no match are
    dropped (inner semantics, mirroring DuckDB's ``ASOF JOIN``). Pass
    ``tolerance_seconds`` to also drop matches older than the window.
    """
    rcols = right_cols if right_cols is not None else [
        c for c in right.columns if c not in (key, right_ts)]

    lt = left.withColumn("_ts", F.col(left_ts).cast("timestamp")) \
             .withColumn("_side", F.lit(1))
    rt = right.select(
        F.col(key).alias(key),
        F.col(right_ts).cast("timestamp").alias("_ts"),
        *[F.col(c) for c in rcols]).withColumn("_side", F.lit(0))

    # align schemas: left carries NULL right-payload, right carries NULL
    # left-payload; union sorts right rows first at equal ts (side 0 < 1)
    # so ties match (ASOF's <= semantics).
    lcols = [c for c in left.columns]
    lt2 = lt.select(
        F.col(key), F.col("_ts"), F.col("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols if c != key],
        *[F.lit(None).cast(dict(rt.dtypes)[c]).alias(f"_r_{c}")
          for c in rcols],
        F.lit(None).cast("timestamp").alias("_r_ts"))
    rt2 = rt.select(
        F.col(key), F.col("_ts"), F.col("_side"),
        *[F.lit(None).cast(dict(lt.dtypes)[c]).alias(f"_l_{c}")
          for c in lcols if c != key],
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
        F.col("_ts").alias("_r_ts"))

    w = (Window.partitionBy(key).orderBy("_ts", "_side")
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = lt2.unionByName(rt2).select(
        "*",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
          for c in rcols],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_f_ts"))

    out = (filled.where(F.col("_side") == 1)
           .where(F.col("_f_ts").isNotNull()))
    if tolerance_seconds is not None:
        out = out.where(
            F.col("_ts").cast("double") - F.col("_f_ts").cast("double")
            <= tolerance_seconds)
    return out.select(
        F.col(key),
        *[F.col(f"_l_{c}").alias(c) for c in lcols if c != key],
        *[F.col(f"_f_{c}").alias(f"{c}{suffix}") for c in rcols],
        F.col("_f_ts").alias(f"{right_ts}{suffix}"))


def range_join(points: DataFrame, intervals: DataFrame,
               point_col: str, lo_col: str, hi_col: str,
               bucket_width: float, key: str | None = None,
               how: str = "inner",
               broadcast_intervals: bool = False) -> DataFrame:
    """Join points to containing intervals (``lo <= point <= hi``) via
    bucketed pre-filtering instead of a broadcast-nested-loop.

    Each interval is replicated onto ``ceil((hi-lo)/width)+1`` buckets; the
    equi-join keys on (key?, bucket) and the exact containment predicate
    runs after. Choose ``bucket_width`` near the typical interval length so
    replication stays O(1).

    With ``broadcast_intervals=True`` (the right call whenever the interval
    set fits in an executor — band tables, calendars, SLA windows) the
    exploded intervals are broadcast and the join needs NO shuffle of the
    point side at all; the bucket ids only serve to keep the hash-join
    probe O(1) per point instead of scanning every interval. Without it,
    both sides shuffle on the bucket id — only sensible when intervals are
    themselves huge; note a small bucket count then caps parallelism at
    #buckets, so pick a width that yields >= cluster-cores buckets."""
    b = F.lit(float(bucket_width))
    p = points.withColumn("_bkt",
                          F.floor(F.col(point_col).cast("double") / b))
    iv = intervals.withColumn(
        "_bkt",
        F.explode(F.sequence(
            F.floor(F.col(lo_col).cast("double") / b),
            F.floor(F.col(hi_col).cast("double") / b))))
    if broadcast_intervals:
        iv = F.broadcast(iv)
    on = ["_bkt"] + ([key] if key else [])
    out = (p.join(iv, on=on, how=how)
            .where(F.col(point_col).between(F.col(lo_col), F.col(hi_col))))
    return out.drop("_bkt")
