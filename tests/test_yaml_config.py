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
