"""FlightSQL-style external engine: SQL in, Arrow record batches out.

The reference's FlightSQLRunner (``core/src/execute/data_stores/
flight_sql.rs:37-163``) speaks to any engine that accepts a SQL string
over Arrow Flight and streams batches back, inferring the schema from a
peeked first batch when none is declared (``flight_sql.rs:146-160``).
Two halves here:

* :class:`DuckDbFlightSqlServer` — an in-process engine speaking that
  protocol, backed by DuckDB over parquet files. This is a REAL second
  engine dialect (DuckDB SQL, not Spark SQL) behind a real gRPC socket,
  standing in for Dremio/ballista/etc. that can't be installed in-sandbox.
* :func:`flightsql_read` — the Spark-side runner: executors stream the
  result batches via ``mapInArrow`` (driver only plans), schema obtained
  from the engine up front (``GetFlightInfo`` carries it, as FlightSQL's
  ``execute`` does).

Tickets carry the SQL itself: the engine is stateless, so a retried Spark
task simply re-executes — no single-use-ticket bookkeeping (unlike the
relay protocol, where tickets index planned per-source tasks).

Scale notes: one endpoint = one partition today (engines like Trino
parallelize internally; the transfer is the bottleneck only when the
pushed-down query is under-selective — which the dialect pushdown
minimizes). Engines that support partitioned exports can return several
endpoints and parallelism follows for free.
"""

from __future__ import annotations

import json
import threading

import pyarrow as pa
import pyarrow.flight as flight


class DuckDbFlightSqlServer(flight.FlightServerBase):
    """DuckDB behind the simplified FlightSQL protocol.

    ``tables`` maps engine table name → parquet path; every connection
    registers them as views. Each ``do_get`` runs on a fresh cursor so
    concurrent Spark tasks don't share DuckDB state.
    """

    def __init__(self, tables: dict[str, str],
                 location: str = "grpc://127.0.0.1:0"):
        super().__init__(location)
        import duckdb

        self._lock = threading.Lock()
        self.executed: list[str] = []  # queries seen (dialect-test probe)
        # ONE connection created on the constructing thread; request
        # handlers take per-thread cursors from it — the documented DuckDB
        # threading pattern. Fresh connections inside gRPC handler threads
        # crash natively under concurrency.
        self._con = duckdb.connect()
        for name, path in tables.items():
            self._con.execute(
                f"create view \"{name}\" as "
                f"select * from read_parquet('{path}')")

    def get_flight_info(self, context, descriptor):
        sql = descriptor.command.decode("utf-8")
        cur = self._con.cursor()
        try:
            # Schema without execution: LIMIT 0 over the query (the peek-
            # first-batch analog of flight_sql.rs:146-160, no data pulled).
            schema = cur.execute(
                f"select * from ({sql}) q limit 0").arrow().schema
        finally:
            cur.close()
        ticket = flight.Ticket(sql.encode("utf-8"))
        return flight.FlightInfo(schema, descriptor,
                                 [flight.FlightEndpoint(ticket, [])], -1, -1)

    def do_get(self, context, ticket):
        sql = ticket.ticket.decode("utf-8")
        with self._lock:
            self.executed.append(sql)
        cur = self._con.cursor()
        try:
            # Materialize before returning: a lazy fetch_record_batch
            # reader must not outlive the cursor (native crash once it is
            # collected mid-stream). DuckDB→Arrow is zero-copy columnar,
            # and the pushed-down query already narrowed the result.
            table = cur.execute(sql).arrow()
        finally:
            cur.close()
        return flight.RecordBatchStream(table)


def serve_duckdb_flightsql(tables: dict[str, str]) -> DuckDbFlightSqlServer:
    server = DuckDbFlightSqlServer(tables)
    t = threading.Thread(target=server.serve, daemon=True)
    t.start()
    return server


def flightsql_read(spark, host: str, port: int, sql: str):
    """Run ``sql`` on the engine; stream result batches on executors.

    The driver makes one ``get_flight_info`` call (schema + endpoints);
    each endpoint becomes a Spark partition whose task opens its own
    Flight connection — the FlightSQLRunner's stream, distributed.
    """
    from pyspark.sql.pandas.types import from_arrow_schema

    client = flight.connect(f"grpc://{host}:{port}")
    info = client.get_flight_info(
        flight.FlightDescriptor.for_command(sql.encode("utf-8")))
    arrow_schema = info.schema
    out_schema = from_arrow_schema(arrow_schema)
    tickets = [(ep.ticket.ticket,) for ep in info.endpoints]

    def fetch(batch_iter):
        import pyarrow.flight as fl
        c = fl.connect(f"grpc://{host}:{port}")
        for batch in batch_iter:
            for tk in batch.column("ticket").to_pylist():
                for chunk in c.do_get(fl.Ticket(tk)):
                    if chunk.data.num_rows:
                        yield pa.Table.from_batches([chunk.data]) \
                                .cast(arrow_schema).to_batches()[0]
        c.close()

    tdf = spark.createDataFrame(tickets, "ticket binary") \
               .repartition(max(len(tickets), 1))
    return tdf.mapInArrow(fetch, out_schema)
