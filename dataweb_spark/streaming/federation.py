"""Streaming entity federation: the catalog's mapping/permission layer
composed with Structured Streaming.

The reference is strictly batch — a query maps each source once and runs
(SURVEY.md §2.5). Because this engine expresses the per-source rewrite
pipeline (source_sql → permission → transform/rename/NULL-pad,
``plans/resolve.py``) as DataFrame operations, the SAME catalog drives a
continuous ingest: point a file source at a landing directory and the
mapped, permissioned, provenance-tagged entity view becomes an unbounded
stream — new files from any mapped source surface as entity rows without
re-running a batch job. This is the lakehouse "auto-ingest through a
governance layer" shape, and it falls out of the architecture rather than
needing a second implementation of the mapping semantics.

Constraints (inherent to Spark file streams, documented not hidden):

* only ``file``-kind connections stream (JDBC/flight sources stay batch);
* the stream needs an explicit schema — taken from the batch read of the
  same source, so declared/inferred batch schemas carry over;
* each micro-batch applies the identical expressions as the batch path —
  the availableNow equivalence test locks that the two agree row-for-row.

At scale this is the standard continuous-ingest plan: file listing is
incremental (no re-scan of old files), per-batch work is the same map-only
projection Catalyst runs in batch mode, and the union of N source streams
schedules independently per source exactly like the batch union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataweb_spark.catalog.model import RelayCatalog, Web
from dataweb_spark.plans.resolve import map_source_frame


def _stream_raw(spark: SparkSession, conn, source) -> DataFrame:
    """Streaming twin of ``readers.read_connection_table`` (file kind)."""
    import os

    if conn.kind != "file":
        raise ValueError(
            f"streaming entity views need file sources; {source.name!r} "
            f"is kind {conn.kind!r}")
    base = conn.options.get("path", ".")
    rel = source.options.get("path", source.options.get("table", source.name))
    path = rel if os.path.isabs(rel) else os.path.join(base, rel)
    fmt = source.options.get("format", conn.options.get("format", "parquet"))
    # File streams require a schema up front: reuse the batch reader's
    # (declared via options['schema'] or engine-inferred), so batch and
    # stream agree by construction.
    from dataweb_spark.sources.readers import read_connection_table
    schema = read_connection_table(spark, conn, source)[0].schema
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", source.options.get("header", "true"))
    if os.path.isfile(path):
        # streaming file sources demand a directory: watch the parent,
        # filtered to exactly this file
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return reader.format(fmt).load(path)


def stream_entity_view(spark: SparkSession, web: Web, relay_name: str,
                       entity_name: str,
                       principal: str | None = None) -> DataFrame:
    """Unbounded entity view: union of mapped streams of every local
    file source of ``entity_name`` — the batch resolver's own
    ``map_source_frame`` applied to a streaming raw frame, so batch and
    stream share one implementation of the mapping semantics."""
    relay: RelayCatalog = web.relay(relay_name)
    parts: list[DataFrame] = []
    for source in relay.sources_for_entity(entity_name):
        conn = relay.connections[source.connection]
        raw = _stream_raw(spark, conn, source)
        # Re-run the batch mapping pipeline against the streaming frame:
        # source_sql via temp view substitution is batch-only, so restrict
        # to sources whose source_sql is expressible over a stream (any
        # SELECT without joins/aggs — true for all demo/catalog sources).
        import uuid as _uuid

        sql = source.source_sql
        if sql and sql.strip().lower() not in ("select * from {table}",):
            view = f"__dw_stream_{_uuid.uuid4().hex[:12]}"
            raw.createOrReplaceTempView(view)
            raw = spark.sql(sql.replace("{table}", view))
        parts.append(map_source_frame(raw, relay, source, principal))
    if not parts:
        raise ValueError(f"entity {entity_name!r} has no file sources")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out
