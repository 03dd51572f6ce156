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
