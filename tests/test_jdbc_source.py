"""External-engine (JDBC) source path — the TrinoRunner/FlightSQLRunner
analog (SURVEY.md §2.1) — tested end-to-end against the embedded Derby
database bundled with Spark: connection kind ``jdbc``, schema from the
engine, mapping + transformation into an entity, federated union with a
file source."""

import pytest
from pyspark.sql import functions as F

from dataweb_spark.catalog.model import (
    DataConnection, DataField, DataSource, Entity, Information, Mapping,
    RelayCatalog, Transformation, Web,
)
from dataweb_spark.plans.gateway import QueryGateway

URL = "jdbc:derby:memory:dw_jdbc_test"


@pytest.fixture(scope="module")
def derby(spark):
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(URL + ";create=true")
    st = conn.createStatement()
    st.execute("create table measurements (mid int, label varchar(32), "
               "centi_value double)")
    for i in range(10):
        st.execute(f"insert into measurements values "
                    f"({i}, 'm{i}', {i * 100}.0)")
    conn.commit()
    yield URL
    # in-memory DB dies with the JVM; no teardown needed


@pytest.fixture(scope="module")
def jdbc_web(spark, derby, tmp_path_factory):
    d = tmp_path_factory.mktemp("jdbcweb")
    spark.createDataFrame(
        [(100 + i, f"f{i}", float(i)) for i in range(10)],
        "mid int, label string, value double") \
        .write.mode("overwrite").parquet(str(d / "meas_pq"))

    relay = RelayCatalog(name="home")
    relay.add_entity(Entity("measurements", [
        Information("mid", "int"),
        Information("label", "string"),
        Information("value", "double"),   # JDBC side stores ×100
    ]))
    relay.add_connection(DataConnection(
        name="derby", kind="jdbc",
        options={"url": derby, "driver": "org.apache.derby.jdbc.EmbeddedDriver"}))
    relay.add_connection(DataConnection(
        name="files", kind="file", options={"path": str(d)}))
    relay.add_source(DataSource(
        name="meas_jdbc", connection="derby", entity="measurements",
        source_sql="select * from {table}",
        fields=[DataField("MID", "MID"), DataField("LABEL", "LABEL"),
                DataField("CENTI_VALUE", "CENTI_VALUE")],
        mappings=[Mapping("mid", "MID"),
                  Mapping("label", "LABEL"),
                  Mapping("value", "CENTI_VALUE",
                          Transformation("{v} / 100", "{v} * 100"))],
        options={"table": "measurements"}))
    relay.add_source(DataSource(
        name="meas_file", connection="files", entity="measurements",
        source_sql="select * from {table}",
        fields=[DataField(c, c) for c in ("mid", "label", "value")],
        mappings=[Mapping(c, c) for c in ("mid", "label", "value")],
        options={"path": "meas_pq", "format": "parquet"}))
    web = Web()
    web.add_relay(relay)
    return web


def test_jdbc_plus_file_union(spark, jdbc_web):
    gw = QueryGateway(spark, jdbc_web, "home")
    df = gw.query("select mid, label, value from measurements")
    rows = {r["mid"]: r["value"] for r in df.collect()}
    assert len(rows) == 20
    assert rows[3] == 3.0      # jdbc source, centi → unit via transformation
    assert rows[103] == 3.0    # file source, stored directly


def test_jdbc_aggregate_over_union(spark, jdbc_web):
    gw = QueryGateway(spark, jdbc_web, "home")
    out = gw.query(
        "select count(*) as n, round(sum(value), 2) as total "
        "from measurements").collect()[0]
    assert out["n"] == 20
    assert out["total"] == 2 * sum(float(i) for i in range(10))


def test_jdbc_provenance(spark, jdbc_web):
    from dataweb_spark.plans.resolve import resolve_entity
    df = resolve_entity(spark, jdbc_web, "home", "measurements")
    counts = {r["_source_id_"]: r["n"]
              for r in df.groupBy("_source_id_")
                         .agg(F.count("*").alias("n")).collect()}
    assert counts == {"meas_jdbc": 10, "meas_file": 10}


def test_jdbc_drifted_engine_types_cast_to_declared(spark, derby,
                                                    tmp_path_factory):
    """Engine-side types drift from the declaration (DECIMAL(12,3) where
    the entity says double, BIGINT where it says int) — the resolved view
    must still carry the DECLARED entity schema and the same values as an
    undrifted twin source, so federated unions and oracle hashes stay
    stable (trino.rs:89-101 / flight_sql.rs:146-160 cast-to-declared
    analog)."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(URL + ";create=true")
    st = conn.createStatement()
    st.execute("create table drifted (mid bigint, label varchar(32), "
               "val decimal(12,3))")
    for i in range(10):
        st.execute(f"insert into drifted values ({i}, 'd{i}', {i}.125)")
    conn.commit()

    d = tmp_path_factory.mktemp("driftweb")
    spark.createDataFrame(
        [(i, f"d{i}", i + 0.125) for i in range(10)],
        "mid int, label string, val double") \
        .write.mode("overwrite").parquet(str(d / "drift_pq"))

    relay = RelayCatalog(name="home")
    relay.add_entity(Entity("drifted", [
        Information("mid", "int"),        # engine stores BIGINT
        Information("label", "string"),
        Information("val", "double"),     # engine stores DECIMAL(12,3)
    ]))
    relay.add_connection(DataConnection(
        name="derby", kind="jdbc",
        options={"url": URL,
                 "driver": "org.apache.derby.jdbc.EmbeddedDriver"}))
    relay.add_connection(DataConnection(
        name="files", kind="file", options={"path": str(d)}))
    relay.add_source(DataSource(
        name="drift_jdbc", connection="derby", entity="drifted",
        source_sql="select * from {table}",
        fields=[DataField("MID", "MID"), DataField("LABEL", "LABEL"),
                DataField("VAL", "VAL")],
        mappings=[Mapping("mid", "MID"), Mapping("label", "LABEL"),
                  Mapping("val", "VAL")],
        options={"table": "drifted"}))
    relay.add_source(DataSource(
        name="drift_file", connection="files", entity="drifted",
        source_sql="select * from {table}",
        fields=[DataField(c, c) for c in ("mid", "label", "val")],
        mappings=[Mapping(c, c) for c in ("mid", "label", "val")],
        options={"path": "drift_pq", "format": "parquet"}))
    web = Web()
    web.add_relay(relay)

    gw = QueryGateway(spark, web, "home")
    df = gw.query("select mid, label, val from drifted")
    # declared schema, not the engine's drifted one
    assert dict(df.dtypes) == {"mid": "int", "label": "string",
                               "val": "double"}
    # both branches produce bit-identical values after the declared cast
    rows = df.collect()
    assert len(rows) == 20
    by_mid = {}
    for r in rows:
        by_mid.setdefault(r["mid"], []).append((r["label"], r["val"]))
    for i in range(10):
        assert by_mid[i][0] == by_mid[i][1] == (f"d{i}", i + 0.125)
