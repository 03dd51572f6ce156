"""Federation EXPLAIN (plans/explain.py): pre-flight per-source report of
scan/prune/standby decisions and network pushdown — metadata-only."""

import json

import pytest
from pyspark.sql import functions as F  # noqa: F401

from dataweb_spark.plans.explain import explain_federation


def _rows(df):
    return {(r.relay, r.source): r.asDict() for r in df.collect()}


def test_explain_lists_every_source_no_scan(spark, demo_web):
    df = explain_federation(
        spark, demo_web, "na_us",
        "select returnflag, count(*) as n from lineitem "
        "where quantity < 5 group by returnflag")
    rows = _rows(df)
    assert set(rows) == {("na_us", "lineitem_csv"),
                         ("na_us", "lineitem_trino")}
    for r in rows.values():
        assert r["action"] == "scan"
        assert json.loads(r["pushed_filters"]) == [["quantity", "<", "5"]]


def test_explain_reports_pruned_sources(spark, sf_dir):
    from dataweb_spark.catalog.model import (
        DataConnection, DataSource, Entity, Information, Mapping,
        RelayCatalog, Web,
    )
    r = RelayCatalog(name="home")
    r.add_entity(Entity("t", [Information("v", "bigint")]))
    r.add_connection(DataConnection("files", "file", {"path": sf_dir}))
    for name, bounds in [("lo", {"v": (0, 10)}), ("hi", {"v": (50, 99)})]:
        r.add_source(DataSource(
            name=name, connection="files", entity="t",
            source_sql="select * from {table}",
            mappings=[Mapping("v", "r_regionkey")],
            options={"table": "region.parquet"}, bounds=bounds))
    web = Web(relays={"home": r})
    df = explain_federation(spark, web, "home",
                            "select * from t where v > 40")
    rows = _rows(df)
    assert rows[("home", "lo")]["action"] == "pruned"
    assert rows[("home", "hi")]["action"] == "scan"


def test_explain_replica_standby(spark, sf_dir):
    from dataweb_spark.catalog.model import (
        DataConnection, DataSource, Entity, Information, Mapping,
        RelayCatalog, Web,
    )
    r = RelayCatalog(name="home")
    r.add_entity(Entity("t", [Information("v", "bigint")]))
    r.add_connection(DataConnection("files", "file", {"path": sf_dir}))
    for name in ("m1", "m2"):
        r.add_source(DataSource(
            name=name, connection="files", entity="t",
            source_sql="select * from {table}",
            mappings=[Mapping("v", "r_regionkey")],
            options={"table": "region.parquet"}, replica_group="g"))
    df = explain_federation(spark, Web(relays={"home": r}), "home",
                            "select count(*) as n from t")
    rows = _rows(df)
    assert rows[("home", "m1")]["action"] == "scan"
    assert rows[("home", "m2")]["action"] == "replica-standby"


def test_explain_flight_pushed_sql_inverts_transform(spark, sf_dir):
    """A flight peer behind a {v}*100 mapping: the report shows the exact
    peer SQL with the inverted boundary — WITHOUT contacting any peer
    (the connection points nowhere)."""
    from dataweb_spark.catalog.model import (
        DataConnection, DataSource, Entity, Information, Mapping,
        RelayCatalog, Transformation, Web,
    )
    r = RelayCatalog(name="home")
    r.add_entity(Entity("t", [Information("tax_percent", "double")]))
    r.add_connection(DataConnection(
        "peer", "flight", {"host": "nowhere.invalid", "port": "1"}))
    r.add_source(DataSource(
        name="remote_t", connection="peer", entity="t",
        source_sql="select * from {table}",
        mappings=[Mapping("tax_percent", "l_tax",
                          Transformation("{v} * 100", "{v} / 100"))],
        options={"table": "lineitem"}))
    df = explain_federation(spark, Web(relays={"home": r}), "home",
                            "select * from t where tax_percent <= 3")
    rows = _rows(df)
    row = rows[("home", "remote_t")]
    assert row["kind"] == "flight" and row["action"] == "scan"
    assert "l_tax" in row["pushed_sql"]
    assert "0.03" in row["pushed_sql"]       # 3 / 100, inverted exactly
    assert json.loads(row["pushed_filters"])[0][0] == "l_tax"


def test_gateway_explain_and_limit_forwarding(spark, demo_web):
    from dataweb_spark.plans.gateway import QueryGateway
    gw = QueryGateway(spark, demo_web, "na_us")
    df = gw.explain("select * from lineitem limit 7")
    assert df.columns[:5] == ["entity", "relay", "source", "kind",
                              "action"]
    assert df.count() == 2


def test_explain_reports_forwarded_order(spark, sf_dir):
    """The explain surface mirrors the r13 top-k execution facts: a
    provable ORDER BY + LIMIT shows per-source forwarded_order +
    forwarded_limit, and a remote hop drops BOTH (a bare top-k-derived
    limit at a deeper engine would fetch k arbitrary rows)."""
    import json as _json

    from dataweb_spark.catalog.model import (DataConnection, DataSource,
                                             Entity, Information, Mapping,
                                             RelayCatalog, RemoteEntityMapping,
                                             Web)
    from dataweb_spark.plans.explain import explain_federation

    home = RelayCatalog(name="home")
    home.add_entity(Entity("t", [Information("v", "bigint"),
                                 Information("w", "bigint")]))
    home.add_connection(DataConnection("files", "file", {"path": sf_dir}))
    home.add_source(DataSource(
        name="local_src", connection="files", entity="t",
        source_sql="select * from {table}",
        mappings=[Mapping("v", "r_regionkey"), Mapping("w", "r_regionkey")],
        options={"table": "region.parquet"}))
    peer = RelayCatalog(name="peer")
    peer.add_entity(Entity("t2", [Information("v", "bigint"),
                                  Information("w", "bigint")]))
    peer.add_connection(DataConnection("files", "file", {"path": sf_dir}))
    peer.add_source(DataSource(
        name="peer_src", connection="files", entity="t2",
        source_sql="select * from {table}",
        mappings=[Mapping("v", "r_regionkey"), Mapping("w", "r_regionkey")],
        options={"table": "region.parquet"}))
    home.remote_mappings.append(RemoteEntityMapping(
        local_entity="t", peer="peer", remote_entity="t2"))
    web = Web()
    web.add_relay(home)
    web.add_relay(peer)
    rows = {(r["relay"], r["source"]): r for r in
            (r.asDict() for r in explain_federation(
                spark, web, "home",
                "select v, w from t where v < 9 "
                "order by v desc, w limit 5").collect())}
    local = rows[("home", "local_src")]
    assert local["forwarded_limit"] == 5
    assert _json.loads(local["forwarded_order"]) == [
        ["r_regionkey", "DESC", "NULLS LAST"],
        ["r_regionkey", "ASC", "NULLS FIRST"]]
    remote = rows[("peer", "peer_src")]
    assert remote["forwarded_order"] is None
    assert remote["forwarded_limit"] is None  # dies with the order fact
