"""Heterogeneous file formats behind one entity — the FileDirectoryRunner
analog reads CSV / JSON / Parquet directories (SURVEY.md §2.1,
``file_directory.rs:35-141``). One entity mapped to a parquet source, a CSV
source (inferSchema), and a JSON source with a nested field reached by path
(``DataField.path`` JSON-path analog, ``data_stores/mod.rs:57-62``)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from dataweb_spark.catalog.model import (
    DataConnection, DataField, DataSource, Entity, Information, Mapping,
    RelayCatalog, Transformation, Web,
)
from dataweb_spark.plans.gateway import QueryGateway


@pytest.fixture(scope="module")
def fmt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("formats")
    # parquet part: ids 0..9
    rows_pq = [(i, f"name_{i}", float(i) * 1.5) for i in range(10)]
    # csv part: ids 10..19, different column names
    csv_lines = ["ident,label,metric"] + [
        f"{i},name_{i},{i * 1.5}" for i in range(10, 20)]
    (d / "items.csv").write_text("\n".join(csv_lines) + "\n")
    # json part: ids 20..29, value nested one level down
    with open(d / "items.json", "w") as f:
        for i in range(20, 30):
            f.write(json.dumps(
                {"id": i, "name": f"name_{i}",
                 "payload": {"metric": i * 1.5, "unit": "x"}}) + "\n")
    return d, rows_pq


@pytest.fixture(scope="module")
def fmt_web(spark, fmt_dir):
    d, rows_pq = fmt_dir
    spark.createDataFrame(rows_pq, "item_id long, item_name string, score double") \
         .write.mode("overwrite").parquet(os.path.join(str(d), "items_pq"))

    relay = RelayCatalog(name="home")
    relay.add_entity(Entity("items", [
        Information("item_id", "bigint"),
        Information("item_name", "string"),
        Information("score", "double"),
    ]))
    relay.add_connection(DataConnection(
        name="dir", kind="file", options={"path": str(d)}))
    relay.add_source(DataSource(
        name="items_parquet", connection="dir", entity="items",
        source_sql="select * from {table}",
        fields=[DataField(c, c) for c in ("item_id", "item_name", "score")],
        mappings=[Mapping(c, c) for c in ("item_id", "item_name", "score")],
        options={"path": "items_pq", "format": "parquet"}))
    relay.add_source(DataSource(
        name="items_csv", connection="dir", entity="items",
        source_sql="select * from {table}",
        fields=[DataField("ident", "ident"), DataField("label", "label"),
                DataField("metric", "metric")],
        mappings=[Mapping("item_id", "ident"),
                  Mapping("item_name", "label"),
                  Mapping("score", "metric")],
        options={"path": "items.csv", "format": "csv"}))
    relay.add_source(DataSource(
        name="items_json", connection="dir", entity="items",
        source_sql="select * from {table}",
        fields=[DataField("id", "id"), DataField("name", "name"),
                DataField("metric", "payload.metric")],
        mappings=[Mapping("item_id", "id"),
                  Mapping("item_name", "name"),
                  Mapping("score", "metric",
                          Transformation("{v} * 1", "{v} / 1"))],
        options={"path": "items.json", "format": "json"}))
    web = Web()
    web.add_relay(relay)
    return web


def test_three_formats_union(spark, fmt_web):
    gw = QueryGateway(spark, fmt_web, "home")
    df = gw.query("select item_id, item_name, score from items")
    rows = {r["item_id"]: (r["item_name"], r["score"]) for r in df.collect()}
    assert len(rows) == 30
    for i in (0, 10, 20, 29):
        assert rows[i] == (f"name_{i}", i * 1.5)


def test_provenance_per_format(spark, fmt_web):
    from dataweb_spark.plans.resolve import resolve_entity
    df = resolve_entity(spark, fmt_web, "home", "items")
    counts = {r["_source_id_"]: r["n"]
              for r in df.groupBy("_source_id_").agg(F.count("*").alias("n"))
                         .collect()}
    assert counts == {"items_parquet": 10, "items_csv": 10, "items_json": 10}


def test_filter_pushdown_reaches_parquet(spark, fmt_web):
    gw = QueryGateway(spark, fmt_web, "home")
    df = gw.query("select item_id from items where item_id = 5")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert df.count() == 1


def test_jsonpath_field_paths_from_reference_configs(spark, fmt_dir):
    """A config ported VERBATIM from the reference declares nested fields
    in JSONPath syntax ('$.payload.metric', data_stores/mod.rs:57-62) —
    it must resolve identically to the Spark-native struct path."""
    d, _ = fmt_dir
    relay = RelayCatalog(name="jp")
    relay.add_entity(Entity("items", [
        Information("item_id", "bigint"),
        Information("score", "double"),
    ]))
    relay.add_connection(DataConnection(
        name="dir", kind="file", options={"path": str(d)}))
    relay.add_source(DataSource(
        name="items_jsonpath", connection="dir", entity="items",
        source_sql="select * from {table}",
        fields=[DataField("id", "$.id"),
                DataField("metric", "$.payload.metric")],
        mappings=[Mapping("item_id", "id"), Mapping("score", "metric")],
        options={"path": "items.json", "format": "json"}))
    web = Web()
    web.add_relay(relay)
    rows = QueryGateway(spark, web, "jp").query(
        "select item_id, score from items order by item_id").collect()
    assert [(r["item_id"], r["score"]) for r in rows] == \
        [(i, i * 1.5) for i in range(20, 30)]


def test_jsonpath_to_spark_translation():
    import pytest as _pytest

    from dataweb_spark.catalog.model import jsonpath_to_spark as jp

    assert jp("$.a.b") == "a.b"
    assert jp("$.nested.array[1].field") == "nested.array[1].field"
    assert jp("$['a b'].c") == "`a b`.c"
    assert jp('$["a b"].c') == "`a b`.c"
    assert jp("$.x['y z']") == "x.`y z`"
    assert jp("payload.metric") == "payload.metric"     # passthrough
    assert jp("get_json_object(props, '$.k')") == \
        "get_json_object(props, '$.k')"                  # expression form
    # a column literally named $type/$oid is NOT a JSONPath — untouched
    assert jp("$type") == "$type"
    assert jp("$oid") == "$oid"
    for bad in ("$..x", "$.a[*]"):                       # loud, not silent
        with _pytest.raises(ValueError, match="unsupported JSONPath"):
            jp(bad)


def test_jsonpath_translation_property():
    """Property: for any dotted identifier path (with optional array
    indices and bracket-quoted segments), the '$.'-prefixed JSONPath form
    translates to exactly the Spark-native access the plain form uses."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dataweb_spark.catalog.model import jsonpath_to_spark as jp

    ident = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)
    seg = st.one_of(
        ident,
        st.tuples(ident, st.integers(0, 9)).map(lambda t: f"{t[0]}[{t[1]}]"))

    @settings(max_examples=80, deadline=None)
    @given(segs=st.lists(seg, min_size=1, max_size=4))
    def check(segs):
        spark_path = ".".join(segs)
        assert jp("$." + spark_path) == spark_path
        assert jp(spark_path) == spark_path          # passthrough

    check()
