"""Demo web: the reference's dev deployment re-created over driver testdata.

Mirrors the 6-relay dockerized web the reference's integration tests run
against (``deploy/development/*``; topology global ↔ {na, emea, apac},
na ↔ na_us — ``deploy/compose.yaml``), shrunk to the essential shape:

* relay ``na_us`` — entity ``lineitem`` mapped to TWO differently-shaped
  sources over the same parquet (split by orderkey parity to simulate two
  physical datasets):
    - ``lineitem_trino`` — standard names, fractional discount/tax with
      ``{v} * 100`` transforms (the ``trino_tpch.yaml`` analog).
    - ``lineitem_csv``  — renamed ``*_csv`` columns + derived ``tax_amount`` /
      ``unitprice`` in source_sql, no date mapping (NULL-padding), default
      permission rows ``returnflag='N'`` and no ``orderkey_csv`` column
      (the ``csv_tpch.yaml`` analog incl. its default_permission), with an
      ``all_access`` principal seeing everything
      (``na_data_relay/data_modeling/users/users.yaml`` analog).
* relay ``global`` — entities ``customer`` / ``orders`` with identity
  mappings, plus a RemoteMapping pulling ``lineitem`` from ``na_us``
  (the multi-hop fixture, FIXTURES.md §2C).

Entity logical schemas follow FIXTURES.md §1 (derived columns
``tax_amount``/``unitprice``/``*_percent`` are the point of the fixtures).
"""

from __future__ import annotations

from dataweb_spark.catalog.model import (
    DataConnection,
    DataField,
    DataSource,
    Entity,
    Information,
    Mapping,
    RelayCatalog,
    RemoteEntityMapping,
    RemoteInfoMapping,
    SourcePermission,
    Transformation,
    Web,
)

PCT = Transformation("{v} * 100", "{v} / 100")

LINEITEM_INFOS = [
    Information("tax_amount", "double"),
    Information("unitprice", "double"),
    Information("linenumber", "bigint"),
    Information("partkey", "bigint"),
    Information("suppkey", "bigint"),
    Information("orderkey", "bigint"),
    Information("quantity", "double"),
    Information("extendedprice", "double"),
    Information("discount_percent", "double"),
    Information("tax_percent", "double"),
    Information("returnflag", "string"),
    Information("linestatus", "string"),
    Information("shipdate", "date"),
]

_TRINO_FIELDS = [
    "l_linenumber", "l_partkey", "l_suppkey", "l_orderkey", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
    "l_shipdate", "unitprice", "tax_amount",
]

_CSV_FIELDS = [
    "linenumber_csv", "partkey_csv", "suppkey_csv", "orderkey_csv",
    "quantity_csv", "extendedprice_csv", "discount_csv", "tax_csv",
    "returnflag", "linestatus", "unitprice", "tax_amount",
]


def _add_identity_entity(relay: RelayCatalog, name: str,
                         cols: list[tuple[str, str]], table: str,
                         phys_prefix: str) -> None:
    relay.add_entity(Entity(name, [Information(c, t) for c, t in cols]))
    relay.add_source(DataSource(
        name=f"{name}_local",
        connection="files",
        entity=name,
        source_sql="select * from {table}",
        fields=[DataField(f"{phys_prefix}{c}", f"{phys_prefix}{c}")
                for c, _ in cols],
        mappings=[Mapping(c, f"{phys_prefix}{c}") for c, _ in cols],
        options={"table": table},
    ))


def _add_dimension_entities(relay: RelayCatalog) -> None:
    """customer + orders as identity-mapped local entities — the webengine
    demo keeps dimensions at the engine relay and federates the fact table
    (``webengine/src/main.rs:86-124``)."""
    _add_identity_entity(relay, "customer", [
        ("custkey", "bigint"), ("name", "string"), ("nationkey", "int"),
        ("acctbal", "double"), ("mktsegment", "string")],
        "customer.parquet", "c_")
    _add_identity_entity(relay, "orders", [
        ("orderkey", "bigint"), ("custkey", "bigint"), ("orderstatus", "string"),
        ("totalprice", "double"), ("orderdate", "timestamp"),
        ("orderpriority", "string")],
        "orders.parquet", "o_")


def build_demo_web(sf_dir: str) -> Web:
    """Build the demo Web over ``{sf_dir}/*.parquet``."""
    na_us = RelayCatalog(name="na_us")
    na_us.add_entity(Entity("lineitem", list(LINEITEM_INFOS)))
    na_us.add_connection(DataConnection(
        name="files", kind="file", options={"path": sf_dir, "format": "parquet"}))

    # Source A — trino-like: standard TPC-H names, fractional discount/tax.
    na_us.add_source(DataSource(
        name="lineitem_trino",
        connection="files",
        entity="lineitem",
        source_sql=("select *, l_extendedprice / l_quantity as unitprice, "
                    "l_tax * l_extendedprice as tax_amount "
                    "from {table} where l_orderkey % 2 = 0"),
        fields=[DataField(f, f) for f in _TRINO_FIELDS],
        mappings=[
            Mapping("linenumber", "l_linenumber"),
            Mapping("partkey", "l_partkey"),
            Mapping("suppkey", "l_suppkey"),
            Mapping("orderkey", "l_orderkey"),
            Mapping("quantity", "l_quantity"),
            Mapping("extendedprice", "l_extendedprice"),
            Mapping("discount_percent", "l_discount", PCT),
            Mapping("tax_percent", "l_tax", PCT),
            Mapping("returnflag", "l_returnflag"),
            Mapping("linestatus", "l_linestatus"),
            Mapping("shipdate", "l_shipdate"),
            Mapping("unitprice", "unitprice"),
            Mapping("tax_amount", "tax_amount"),
        ],
        options={"table": "lineitem.parquet"},
    ))

    # Source B — csv-like: renamed columns, derived cols in source_sql,
    # guarded by a default permission (returnflag='N', no orderkey).
    na_us.add_source(DataSource(
        name="lineitem_csv",
        connection="files",
        entity="lineitem",
        source_sql=(
            "select l_linenumber as linenumber_csv, l_partkey as partkey_csv, "
            "l_suppkey as suppkey_csv, l_orderkey as orderkey_csv, "
            "l_quantity as quantity_csv, l_extendedprice as extendedprice_csv, "
            "l_discount as discount_csv, l_tax as tax_csv, "
            "l_returnflag as returnflag, l_linestatus as linestatus, "
            "l_extendedprice / l_quantity as unitprice, "
            "l_tax * l_extendedprice as tax_amount "
            "from {table} where l_orderkey % 2 = 1"),
        fields=[DataField(f, f) for f in _CSV_FIELDS],
        mappings=[
            Mapping("linenumber", "linenumber_csv"),
            Mapping("partkey", "partkey_csv"),
            Mapping("suppkey", "suppkey_csv"),
            Mapping("orderkey", "orderkey_csv"),
            Mapping("quantity", "quantity_csv"),
            Mapping("extendedprice", "extendedprice_csv"),
            Mapping("discount_percent", "discount_csv", PCT),
            Mapping("tax_percent", "tax_csv", PCT),
            Mapping("returnflag", "returnflag"),
            Mapping("linestatus", "linestatus"),
            Mapping("unitprice", "unitprice"),
            Mapping("tax_amount", "tax_amount"),
            # no shipdate mapping → NULL padding (csv_tpch.yaml has no dates)
        ],
        default_permission=SourcePermission(
            frozenset(c for c in _CSV_FIELDS if c != "orderkey_csv"),
            "returnflag = 'N'"),
        user_permissions={
            "all_access": SourcePermission(frozenset(_CSV_FIELDS), "true"),
        },
        options={"table": "lineitem.parquet"},
    ))

    # global relay: dimension entities + remote lineitem via na_us.
    glob = RelayCatalog(name="global")
    glob.add_connection(DataConnection(
        name="files", kind="file", options={"path": sf_dir, "format": "parquet"}))
    _add_dimension_entities(glob)

    glob.add_entity(Entity("lineitem", list(LINEITEM_INFOS)))
    glob.remote_mappings.append(RemoteEntityMapping(
        local_entity="lineitem",
        peer="na_us",
        remote_entity="lineitem",
        # pass-through template; renames exercise RemoteInfoMapping
        sql_template="select * from {entity}",
        info_mappings=[RemoteInfoMapping(i.name, i.name) for i in LINEITEM_INFOS],
    ))

    web = Web()
    web.add_relay(na_us)
    web.add_relay(glob)
    return web


def build_six_relay_web(sf_dir: str) -> Web:
    """The reference's full dev topology (``deploy/compose.yaml``):
    global ↔ {na, emea, apac}, na ↔ na_us — 5 answering relays, 6 sources.

    ``lineitem`` is split across sources by ``l_orderkey % 6``:
    na_us holds slices 0+1 (two sources), na/emea/apac hold 2·i and 2·i+1
    via one source each... more precisely each relay r_i holds slices so the
    union over the web from ``global`` covers every row exactly once (the
    visited-set dedup keeps the doubly-reachable na_us counted once).
    """
    def lineitem_relay(name: str, slices: list[int]) -> RelayCatalog:
        r = RelayCatalog(name=name)
        r.add_entity(Entity("lineitem", list(LINEITEM_INFOS)))
        r.add_connection(DataConnection(
            name="files", kind="file",
            options={"path": sf_dir, "format": "parquet"}))
        for sl in slices:
            r.add_source(DataSource(
                name=f"lineitem_s{sl}",
                connection="files",
                entity="lineitem",
                source_sql=("select *, l_extendedprice / l_quantity as unitprice, "
                            "l_tax * l_extendedprice as tax_amount "
                            f"from {{table}} where l_orderkey % 6 = {sl}"),
                fields=[DataField(f, f) for f in _TRINO_FIELDS],
                mappings=[
                    Mapping("linenumber", "l_linenumber"),
                    Mapping("partkey", "l_partkey"),
                    Mapping("suppkey", "l_suppkey"),
                    Mapping("orderkey", "l_orderkey"),
                    Mapping("quantity", "l_quantity"),
                    Mapping("extendedprice", "l_extendedprice"),
                    Mapping("discount_percent", "l_discount", PCT),
                    Mapping("tax_percent", "l_tax", PCT),
                    Mapping("returnflag", "l_returnflag"),
                    Mapping("linestatus", "l_linestatus"),
                    Mapping("shipdate", "l_shipdate"),
                    Mapping("unitprice", "unitprice"),
                    Mapping("tax_amount", "tax_amount"),
                ],
                options={"table": "lineitem.parquet"},
            ))
        return r

    def peer(r: RelayCatalog, peer_name: str) -> None:
        r.remote_mappings.append(RemoteEntityMapping(
            local_entity="lineitem", peer=peer_name, remote_entity="lineitem",
            sql_template="select * from {entity}",
            info_mappings=[RemoteInfoMapping(i.name, i.name)
                           for i in LINEITEM_INFOS]))

    na_us = lineitem_relay("na_us", [0, 1])    # two sources (csv+trino analog)
    na = lineitem_relay("na", [2])
    emea = lineitem_relay("emea", [3])
    apac = lineitem_relay("apac", [4])
    glob = lineitem_relay("global", [5])
    # the webengine demo's dimensions live at the engine relay; the Q3
    # join crosses them with the 6-source federated fact table
    _add_dimension_entities(glob)
    peer(na, "na_us")
    peer(glob, "na")
    peer(glob, "emea")
    peer(glob, "apac")
    peer(glob, "na_us")  # doubly-reachable: direct + via na (cycle-dedup test)

    web = Web()
    for r in (na_us, na, emea, apac, glob):
        web.add_relay(r)
    return web
