"""Streaming entity federation: the catalog's mapping/permission layer
over an unbounded file stream. New files landing in a mapped source
directory surface as entity rows — with the same transformations,
permission filters, NULL-padding, and provenance as the batch resolver
(availableNow equivalence locks the two implementations together)."""

import pytest
from pyspark.sql import functions as F

from dataweb_spark.catalog.model import (
    DataConnection, DataSource, Entity, Information, Mapping, RelayCatalog,
    SourcePermission, Transformation, Web,
)
from dataweb_spark.plans.resolve import (
    PROVENANCE_SOURCE, resolve_entity,
)
from dataweb_spark.streaming.federation import stream_entity_view


@pytest.fixture()
def landing_web(spark, tmp_path):
    """Two landing dirs feeding one entity: a 'metric×100 + permission'
    source and a plain one with no shipqty mapping (NULL-padded)."""
    for d in ("src_a", "src_b"):
        (tmp_path / d).mkdir()
    spark.createDataFrame(
        [(i, f"a{i}", float(i * 100), i % 3) for i in range(10)],
        "rid int, label string, centi double, qty int") \
        .write.mode("append").parquet(str(tmp_path / "src_a"))
    spark.createDataFrame(
        [(100 + i, f"b{i}", float(i)) for i in range(10)],
        "rid int, label string, metric double") \
        .write.mode("append").parquet(str(tmp_path / "src_b"))

    relay = RelayCatalog(name="home")
    relay.add_entity(Entity("readings", [
        Information("rid", "int"),
        Information("label", "string"),
        Information("metric", "double"),
        Information("shipqty", "int"),
    ]))
    relay.add_connection(DataConnection(
        "land", "file", {"path": str(tmp_path)}))
    relay.add_source(DataSource(
        name="src_a", connection="land", entity="readings",
        source_sql="select * from {table}",
        mappings=[Mapping("rid", "rid"), Mapping("label", "label"),
                  Mapping("metric", "centi",
                          Transformation("{v} / 100", "{v} * 100")),
                  Mapping("shipqty", "qty")],
        default_permission=SourcePermission(
            frozenset({"rid", "label", "centi"}), "qty < 2"),
        options={"path": "src_a", "format": "parquet"}))
    relay.add_source(DataSource(
        name="src_b", connection="land", entity="readings",
        source_sql="select * from {table}",
        mappings=[Mapping("rid", "rid"), Mapping("label", "label"),
                  Mapping("metric", "metric")],
        options={"path": "src_b", "format": "parquet"}))
    web = Web()
    web.add_relay(relay)
    return web, tmp_path


def _drain(stream_df, tmp_path, name):
    q = (stream_df.writeStream.format("memory").queryName(name)
         .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return name


def test_stream_matches_batch_resolver(spark, landing_web):
    web, tmp_path = landing_web
    sdf = stream_entity_view(spark, web, "home", "readings")
    name = _drain(sdf, tmp_path, "readings_stream")
    got = spark.table(name)
    want = resolve_entity(spark, web, "home", "readings")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    rows = {r["rid"]: r for r in got.collect()}
    # permission rows filter (qty < 2) applied on the stream
    assert all(r["shipqty"] is None or True for r in rows.values())
    assert set(r for r in rows if r < 100) == \
        {i for i in range(10) if i % 3 < 2}
    # transformation applied: centi/100
    assert rows[3]["metric"] == 3.0
    # permission-denied column (qty not granted) → NULL
    assert rows[3]["shipqty"] is None
    # NULL-padding for unmapped shipqty on src_b
    assert rows[103]["shipqty"] is None and rows[103]["metric"] == 3.0


def test_stream_picks_up_new_files(spark, landing_web):
    """Second availableNow drain from the SAME checkpoint ingests only the
    newly-landed file (incremental listing, exactly-once)."""
    web, tmp_path = landing_web
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck_inc")

    def drain():
        q = (stream_entity_view(spark, web, "home", "readings")
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()
    n0 = spark.read.parquet(out).count()
    spark.createDataFrame(
        [(200 + i, f"c{i}", float(i)) for i in range(5)],
        "rid int, label string, metric double") \
        .write.mode("append").parquet(str(tmp_path / "src_b"))
    drain()
    got = spark.read.parquet(out)
    assert got.count() == n0 + 5
    assert got.where("rid >= 200").count() == 5
    srcs = {r[0] for r in got.select(PROVENANCE_SOURCE).distinct().collect()}
    assert srcs == {"src_a", "src_b"}
