"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``dataweb_spark.queries`` (the declared query
inventory); this module is the thin driver-facing shim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped aggregate over the federated ``lineitem``
    entity (two differently-shaped mapped sources, transformations,
    permissions, NULL-padding) at sf0.001."""
    from dataweb_spark.demo import build_demo_web
    from dataweb_spark.plans.gateway import QueryGateway
    web = build_demo_web("/root/testdata/sf0.001")
    gw = QueryGateway(spark, web, "na_us")
    return gw.query("""
        select returnflag, linestatus,
               round(sum(quantity), 2) as sum_qty,
               round(sum(extendedprice * (1 - discount_percent / 100)), 2)
                   as sum_disc_price,
               count(*) as count_order
        from lineitem
        group by returnflag, linestatus
        order by returnflag, linestatus
    """)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dataweb_spark.queries import queries as q
    return q()


def oracle_sql() -> dict[str, str]:
    from dataweb_spark.queries import oracle_sql as o
    return o()
