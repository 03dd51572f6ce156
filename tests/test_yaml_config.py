"""YAML-applied configs (the relayctl-apply path) must behave identically to
the programmatic demo web: same counts, same permission behavior, same
remote-hop resolution."""

import pytest

from dataweb_spark.catalog.loader import load_web_dir
from dataweb_spark.plans.gateway import QueryGateway

CONFIG_DIR = "/root/repo/configs/demo_web"


@pytest.fixture(scope="module")
def yaml_web():
    return load_web_dir(CONFIG_DIR)


def test_structure_matches_programmatic(yaml_web, demo_web):
    for relay in ("na_us", "global"):
        y, p = yaml_web.relay(relay), demo_web.relay(relay)
        assert set(y.entities) == set(p.entities)
        assert set(y.sources) == set(p.sources)
        for ename in y.entities:
            assert [i.name for i in y.entities[ename].informations] == \
                [i.name for i in p.entities[ename].informations]


def test_yaml_web_answers_queries(spark, yaml_web, demo_web, sf_dir):
    # The YAML config pins /root/testdata/sf0.001 — only valid there.
    if sf_dir != "/root/testdata/sf0.001":
        pytest.skip("yaml config pins sf0.001")
    q = ("select returnflag, count(*) as n, count(orderkey) as n_ok "
         "from lineitem group by returnflag order by returnflag")
    gy = QueryGateway(spark, yaml_web, "na_us")
    gp = QueryGateway(spark, demo_web, "na_us")
    assert gy.query(q).collect() == gp.query(q).collect()
    assert gy.query(q, principal="all_access").collect() == \
        gp.query(q, principal="all_access").collect()


def test_yaml_remote_hop(spark, yaml_web, demo_web, sf_dir):
    if sf_dir != "/root/testdata/sf0.001":
        pytest.skip("yaml config pins sf0.001")
    q = "select count(*) as n from lineitem"
    gy = QueryGateway(spark, yaml_web, "global")
    gp = QueryGateway(spark, demo_web, "global")
    assert gy.query(q).collect() == gp.query(q).collect()


def test_yaml_bounds_parse_and_prune(spark, tmp_path, sf_dir):
    """A YAML-declared bounds block must parse into DataSource.bounds and
    drive source pruning end-to-end."""
    d = tmp_path / "web" / "relay_a"
    d.mkdir(parents=True)
    (d / "decls.yaml").write_text(f"""
kind: Entity
name: sales
informations:
  - {{name: shipdate, data_type: date}}
  - {{name: qty, data_type: double}}
---
kind: DataConnection
name: files
connection_kind: file
options: {{path: "{sf_dir}"}}
---
kind: DataSource
name: sales_old
connection: files
entity: sales
source_sql: "select l_shipdate, l_quantity from {{table}} where l_shipdate < date '1996-01-01'"
mappings:
  - {{information: shipdate, field: l_shipdate}}
  - {{information: qty, field: l_quantity}}
options: {{table: lineitem.parquet}}
bounds:
  shipdate: [null, "1995-12-31"]
---
kind: DataSource
name: sales_new
connection: files
entity: sales
source_sql: "select l_shipdate, l_quantity from {{table}} where l_shipdate >= date '1996-01-01'"
mappings:
  - {{information: shipdate, field: l_shipdate}}
  - {{information: qty, field: l_quantity}}
options: {{table: lineitem.parquet}}
bounds:
  shipdate: ["1996-01-01", null]
""")
    from dataweb_spark.catalog.loader import load_web_dir
    web = load_web_dir(str(tmp_path / "web"))
    assert web.relay("relay_a").sources["sales_old"].bounds == \
        {"shipdate": (None, "1995-12-31")}
    gw = QueryGateway(spark, web, "relay_a")
    eps = gw.query_template(
        "select count(*) as n from sales where shipdate < date '1995-06-01'")
    assert [s for _, s, _ in eps] == ["sales_old"]


def test_user_kind_loads_and_drives_x509_auth(spark, sf_dir, tmp_path):
    """The sixth config kind (User — the reference's fingerprint-keyed
    users table): declared in YAML, loaded into the catalog, and usable
    directly as a Flight server's x509 registry."""
    import pyarrow.flight as flight
    import pytest as _pytest

    from dataweb_spark.catalog.loader import load_relay_dir
    from dataweb_spark.demo import build_demo_web
    from dataweb_spark.sources import pki
    from dataweb_spark.sources.flight_service import (
        flight_query,
        serve_in_background,
    )

    der, key = pki.generate_identity("yaml-user")
    fp, subject, _ = pki.parse_certificate(der)
    d = tmp_path / "relay"
    d.mkdir()
    (d / "users.yaml").write_text(f"""
kind: User
x509_sha256: {fp}
principal: all_access
x509_subject: "{subject}"
attributes: {{is_admin: true}}
""")
    cat = load_relay_dir("users_only", str(d))
    assert cat.users[fp].principal == "all_access"
    assert cat.users[fp].attributes["is_admin"] is True

    web = build_demo_web(sf_dir)
    server = serve_in_background(spark, web, "na_us",
                                 x509_users=cat.users)
    try:
        n = sum(flight_query(server.port,
                             "select count(*) as n from lineitem",
                             cert=(der, key))["n"].to_pylist())
        assert n > 0
        rogue_der, rogue_key = pki.generate_identity("rogue")
        with _pytest.raises(flight.FlightUnauthenticatedError):
            flight_query(server.port, "select 1",
                         cert=(rogue_der, rogue_key))
    finally:
        server.shutdown()


# ---------------------------------------------------------------------------
# Export round-trip (relayctl get/export analog)
# ---------------------------------------------------------------------------

def test_dump_load_roundtrip_demo_web(spark, sf_dir, tmp_path):
    """dump → load must reproduce an equivalent web: same catalogs, and
    the flagship query answers identically through both."""
    from dataweb_spark.catalog.loader import dump_web_dir, load_web_dir
    from dataweb_spark.demo import build_demo_web
    from dataweb_spark.plans.gateway import QueryGateway

    web = build_demo_web(sf_dir)
    dump_web_dir(web, str(tmp_path / "export"))
    back = load_web_dir(str(tmp_path / "export"))

    assert set(back.relays) == set(web.relays)
    for name, relay in web.relays.items():
        r2 = back.relays[name]
        assert set(r2.entities) == set(relay.entities)
        assert set(r2.sources) == set(relay.sources)
        for sname, s in relay.sources.items():
            s2 = r2.sources[sname]
            assert s2.mappings == s.mappings
            assert s2.default_permission == s.default_permission
            assert s2.user_permissions == s.user_permissions
            assert s2.source_sql == s.source_sql
        assert r2.remote_mappings == relay.remote_mappings

    sql = ("select returnflag, count(*) as n, round(sum(quantity), 2) as q "
           "from lineitem group by returnflag order by returnflag")
    a = QueryGateway(spark, web, "na_us").query(sql).collect()
    b = QueryGateway(spark, back, "na_us").query(sql).collect()
    assert a == b


def test_dump_load_roundtrip_preserves_users_and_bounds(tmp_path, sf_dir):
    from dataweb_spark.catalog.loader import (
        dump_relay_dir, load_relay_dir,
    )
    from dataweb_spark.catalog.model import (
        DataConnection, DataSource, Entity, Information, Mapping,
        RelayCatalog, Transformation,
    )
    from dataweb_spark.sources import pki

    r = RelayCatalog(name="rt")
    r.add_entity(Entity("e", [Information("a", "bigint"),
                              Information("b", "double")]))
    r.add_connection(DataConnection("files", "file", {"path": sf_dir}))
    r.add_source(DataSource(
        name="s1", connection="files", entity="e",
        source_sql="select * from {table}",
        mappings=[Mapping("a", "x"),
                  Mapping("b", "y", Transformation("{v} * 100", "{v} / 100"))],
        options={"table": "lineitem.parquet"},
        bounds={"a": (1, 9)}))
    der, _key = pki.generate_identity("rt-user")
    r.add_user(pki.X509User(pki.fingerprint_der(der), principal="reader",
                            attributes={"is_admin": False}))
    dump_relay_dir(r, str(tmp_path / "rt"))
    back = load_relay_dir("rt", str(tmp_path / "rt"))
    s = back.sources["s1"]
    assert s.mappings[1].transformation == Transformation("{v} * 100",
                                                          "{v} / 100")
    assert s.bounds == {"a": (1, 9)}
    (u,) = back.users.values()
    assert u.principal == "reader" and u.attributes == {"is_admin": False}


# -- referential validation -------------------------------------------------

def test_validate_web_flags_every_dangling_reference(sf_dir):
    from dataweb_spark.catalog.loader import validate_web
    from dataweb_spark.catalog.model import (
        DataConnection, DataSource, Entity, Information, Mapping,
        RelayCatalog, RemoteEntityMapping, RemoteInfoMapping, Web,
    )
    r = RelayCatalog(name="home")
    r.add_entity(Entity("t", [Information("v", "bigint")]))
    r.add_connection(DataConnection("files", "file", {"path": sf_dir}))
    r.add_source(DataSource(
        name="bad", connection="nosuch_conn", entity="nosuch_entity",
        source_sql="select * from {table}", mappings=[],
        options={"table": "region.parquet"}))
    r.add_source(DataSource(
        name="bad2", connection="files", entity="t",
        source_sql="select * from {table}",
        mappings=[Mapping("nosuch_info", "r_regionkey")],
        options={"table": "region.parquet"},
        bounds={"nosuch_col": (0, 1)}))
    r.remote_mappings.append(RemoteEntityMapping(
        local_entity="t", peer="ghost", remote_entity="t",
        info_mappings=[RemoteInfoMapping("v", "v")]))
    problems = validate_web(Web(relays={"home": r}))
    text = "\n".join(problems)
    assert "unknown connection 'nosuch_conn'" in text
    assert "unknown entity 'nosuch_entity'" in text
    assert "undeclared information 'nosuch_info'" in text
    assert "bounds on undeclared information 'nosuch_col'" in text
    assert "unknown peer relay" in text
    assert len(problems) == 5


def test_validate_web_clean_on_all_shipped_webs(sf_dir):
    from dataweb_spark.catalog.loader import load_web_dir, validate_web
    from dataweb_spark.demo import build_demo_web, build_six_relay_web
    assert validate_web(load_web_dir("configs/demo_web")) == []
    assert validate_web(build_demo_web(sf_dir)) == []
    assert validate_web(build_six_relay_web(sf_dir)) == []


def test_validate_web_flags_cross_entity_replica_group(sf_dir):
    from dataweb_spark.catalog.loader import validate_web
    from dataweb_spark.catalog.model import (
        DataConnection, DataSource, Entity, Information, Mapping,
        RelayCatalog, Web,
    )
    r = RelayCatalog(name="home")
    for e in ("a", "b"):
        r.add_entity(Entity(e, [Information("v", "bigint")]))
    r.add_connection(DataConnection("files", "file", {"path": sf_dir}))
    for name, ent in [("s1", "a"), ("s2", "b")]:
        r.add_source(DataSource(
            name=name, connection="files", entity=ent,
            source_sql="select * from {table}",
            mappings=[Mapping("v", "r_regionkey")],
            options={"table": "region.parquet"}, replica_group="g"))
    problems = validate_web(Web(relays={"home": r}))
    assert any("spans entities" in p for p in problems)


# -- dry-run diff -----------------------------------------------------------

def test_diff_config_documents_reports_without_mutating(sf_dir):
    from dataweb_spark.catalog.loader import (
        diff_config_documents, relay_documents,
    )
    from dataweb_spark.demo import build_demo_web
    relay = build_demo_web(sf_dir).relay("na_us")
    before = relay_documents(relay)
    docs = [
        {"kind": "Entity", "name": "brand_new",
         "informations": [{"name": "x", "data_type": "bigint"}]},
        # same-name upsert of an existing source with a changed option
        {"kind": "DataSource", "name": "lineitem_trino",
         "connection": "files", "entity": "lineitem",
         "source_sql": "select * from {table}",
         "options": {"table": "lineitem.parquet", "new_opt": "1"},
         "mappings": [{"information": "quantity", "field": "l_quantity"}]},
    ]
    diff = diff_config_documents(relay, docs)
    assert "Entity/brand_new: added" in diff
    assert "DataSource/lineitem_trino: changed" in diff
    assert len(diff) == 2  # nothing else reported
    # live catalog untouched
    assert relay_documents(relay) == before


def test_diff_identical_reapply_is_empty(sf_dir):
    from dataweb_spark.catalog.loader import (
        diff_config_documents, relay_documents,
    )
    from dataweb_spark.demo import build_demo_web
    relay = build_demo_web(sf_dir).relay("na_us")
    assert diff_config_documents(relay, relay_documents(relay)) == []
