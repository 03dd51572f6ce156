"""Source readers — the QueryRunner dispatch analog.

Reference: ``core/src/execute/data_stores/mod.rs:82-114`` dispatches a task's
SQL to one of three runner kinds; here each kind becomes a DataFrame factory
and the task SQL itself is executed by Catalyst against the returned frame:

* ``file``  — FileDirectoryRunner (``file_directory.rs:35-141``): a directory
  of CSV / JSON / Parquet files in local FS or any Hadoop-FS store
  (s3a://, abfs://, gs:// — same code path, different URI).
* ``jdbc``  — TrinoRunner / FlightSQLRunner (``trino.rs:27-200``,
  ``flight_sql.rs:37-163``): external engines over JDBC. Spark's JDBC source
  gives pushdown + partitioned reads; schema inference is the engine's.
* ``view``  — an already-registered Spark table/view (used by tests and for
  in-session derived data; no reference counterpart needed).

Scale notes: file reads are planned by Spark's FileSourceScanExec with
partition pruning + predicate pushdown; we never materialize on the driver.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from dataweb_spark.catalog.model import DataConnection, DataSource


def read_connection_table(spark: SparkSession, conn: DataConnection,
                          source: DataSource) -> DataFrame:
    """Read the raw physical table behind a DataSource (no source_sql yet)."""
    if conn.kind == "file":
        base = conn.options.get("path", ".")
        rel = source.options.get("path", source.options.get("table", source.name))
        path = rel if os.path.isabs(rel) else os.path.join(base, rel)
        fmt = source.options.get("format", conn.options.get("format", "parquet"))
        reader = spark.read
        if fmt == "csv":
            reader = reader.option("header", source.options.get("header", "true")) \
                           .option("inferSchema", source.options.get("inferSchema", "true"))
        if "schema" in source.options:
            reader = reader.schema(source.options["schema"])
        return reader.format(fmt).load(path)
    if conn.kind == "view":
        return spark.table(source.options.get("table", source.name))
    if conn.kind == "flight":
        # Peer-relay federation over real gRPC: the raw table is the remote
        # relay's ANSWER to a query (engine mode by default — the peer's own
        # mapped/permissioned union), pulled as Arrow record batches. This
        # is the relay→relay ``get_flight_info`` fan-out
        # (``flight_server/src/flight.rs:237-309``) with the peer a separate
        # process. Batches land on the driver — protocol/control path; bulk
        # multi-executor transfer stays on the jobs layer (shared store).
        from dataweb_spark.sources.flight_service import (
            flight_query,
            flight_read_distributed,
        )
        sql = source.options.get(
            "sql", f"select * from {source.options.get('entity', source.name)}")
        host = conn.options.get("host", "127.0.0.1")
        port = int(conn.options["port"])
        principal = source.options.get("principal",
                                       conn.options.get("principal"))
        mode = source.options.get("mode", "engine")
        token = conn.options.get("token")
        if source.options.get("distribute", "false") == "true":
            # partition-per-endpoint executor-side streams (WebEntityScan
            # analog) — batches never touch the driver
            return flight_read_distributed(spark, host, port, sql,
                                           principal, mode, token)
        table = flight_query(port, sql, principal=principal, mode=mode,
                             host=host, token=token)
        try:
            return spark.createDataFrame(table)
        except Exception:  # older arrow-table support: go through pandas
            return spark.createDataFrame(table.to_pandas())
    if conn.kind == "jdbc":
        reader = (spark.read.format("jdbc")
                  .option("url", conn.options["url"])
                  .option("dbtable", source.options.get("table", source.name)))
        for k in ("driver", "user", "password", "fetchsize"):
            if k in conn.options:
                reader = reader.option(k, conn.options[k])
        # Partitioned parallel read when the source declares a split column.
        if "partitionColumn" in source.options:
            for k in ("partitionColumn", "lowerBound", "upperBound", "numPartitions"):
                reader = reader.option(k, source.options[k])
        return reader.load()
    raise ValueError(f"unknown connection kind {conn.kind!r}")


def read_source_frame(spark: SparkSession, conn: DataConnection,
                      source: DataSource) -> DataFrame:
    """Raw table + ``source_sql`` applied as a derived table.

    The reference substitutes ``source_sql`` as a table factor
    (``core/src/execute/parse_utils.rs:89-135``); here we register the raw
    frame under a throwaway view name and let Spark SQL evaluate the
    transform — Catalyst folds it into the scan (projection pushdown still
    reaches parquet because the view is logical, not materialized).
    """
    raw = read_connection_table(spark, conn, source)
    sql = source.source_sql
    if not sql or sql.strip().lower() in ("select * from {table}",):
        return raw
    view = f"__dw_src_{uuid.uuid4().hex[:12]}"
    raw.createOrReplaceTempView(view)
    return spark.sql(sql.replace("{table}", view))
