#!/usr/bin/env python
"""Run a job-queue worker process against a shared file store.

Usage: python tools/run_job_worker.py <store_dir> <sf_dir>

Builds the demo web (plus a deliberately flaky second entity for
partial-failure demos), prints ``READY``, then claims and executes jobs
from ``<store_dir>`` until ``<store_dir>/STOP`` appears — the
``query_runner`` worker analog (``query_runner/src/lib.rs:117-221``)
as a separate OS process with its own SparkSession."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    store_dir, sf_dir = sys.argv[1], sys.argv[2]

    from dataweb_spark.catalog.model import (
        DataSource, Entity, Information, Mapping,
    )
    from dataweb_spark.demo import build_demo_web
    from dataweb_spark.jobs.store import FileJobQueue, run_worker
    from dataweb_spark.session import get_spark

    spark = get_spark("job-worker", master="local[4]", extra_conf={
        "spark.sql.shuffle.partitions": "8",
    })
    web = build_demo_web(sf_dir)
    relay = web.relay("na_us")
    # A second entity with one good + one broken source, for exercising the
    # reference's partial-failure polling (flight.rs:273-306).
    relay.add_entity(Entity("lineitem_flaky", [
        Information("returnflag", "string"),
        Information("quantity", "double")]))
    for name, table in [("flaky_good", "lineitem.parquet"),
                        ("flaky_broken", "no_such_file.parquet")]:
        relay.add_source(DataSource(
            name=name, connection="files", entity="lineitem_flaky",
            source_sql="select l_returnflag, l_quantity from {table}",
            mappings=[Mapping("returnflag", "l_returnflag"),
                      Mapping("quantity", "l_quantity")],
            options={"table": table}))

    queue = FileJobQueue(store_dir)
    print("READY", flush=True)
    run_worker(spark, web, "na_us", queue,
               stop_file=os.path.join(store_dir, "STOP"))


if __name__ == "__main__":
    main()
