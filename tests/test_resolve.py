"""Integration tests: entity-view resolution over the demo web (sf0.001).

Replicates the reference's integration assertions (``test/validation.py``):
provenance columns, NULL-padding of unmapped columns, permission duality
(default vs all_access principal), transformation correctness, cycle dedup.
"""

import pytest
from pyspark.sql import functions as F

from dataweb_spark.catalog.model import (
    DataConnection, DataField, DataSource, Entity, Information, Mapping,
    RelayCatalog, RemoteEntityMapping, RemoteInfoMapping, Transformation, Web,
)
from dataweb_spark.plans.resolve import (
    PROVENANCE_RELAY, PROVENANCE_SOURCE, resolve_entity,
)


@pytest.fixture(scope="module")
def lineitem_raw(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def test_union_covers_permitted_rows(spark, demo_web, lineitem_raw):
    df = resolve_entity(spark, demo_web, "na_us", "lineitem")
    even = lineitem_raw.where("l_orderkey % 2 = 0").count()
    odd_n = lineitem_raw.where(
        "l_orderkey % 2 = 1 and l_returnflag = 'N'").count()
    assert df.count() == even + odd_n


def test_all_access_sees_everything(spark, demo_web, lineitem_raw):
    df = resolve_entity(spark, demo_web, "na_us", "lineitem",
                        principal="all_access")
    assert df.count() == lineitem_raw.count()


def test_provenance_columns(spark, demo_web):
    df = resolve_entity(spark, demo_web, "na_us", "lineitem")
    sources = {r[0] for r in df.select(PROVENANCE_SOURCE).distinct().collect()}
    assert sources == {"lineitem_trino", "lineitem_csv"}
    relays = {r[0] for r in df.select(PROVENANCE_RELAY).distinct().collect()}
    assert relays == {"na_us"}


def test_null_padding_unmapped_column(spark, demo_web):
    """csv source has no shipdate mapping → NULL there, populated for trino."""
    df = resolve_entity(spark, demo_web, "na_us", "lineitem")
    csv_rows = df.where(F.col(PROVENANCE_SOURCE) == "lineitem_csv")
    assert csv_rows.where(F.col("shipdate").isNotNull()).count() == 0
    trino_rows = df.where(F.col(PROVENANCE_SOURCE) == "lineitem_trino")
    assert trino_rows.where(F.col("shipdate").isNull()).count() == 0


def test_permission_denied_column_is_null(spark, demo_web):
    """orderkey_csv is excluded by the default permission → NULL for csv
    source under default principal, populated under all_access."""
    df = resolve_entity(spark, demo_web, "na_us", "lineitem")
    csv_rows = df.where(F.col(PROVENANCE_SOURCE) == "lineitem_csv")
    assert csv_rows.where(F.col("orderkey").isNotNull()).count() == 0

    df2 = resolve_entity(spark, demo_web, "na_us", "lineitem",
                         principal="all_access")
    csv2 = df2.where(F.col(PROVENANCE_SOURCE) == "lineitem_csv")
    assert csv2.where(F.col("orderkey").isNull()).count() == 0


def test_permission_with_nested_field_path(spark, tmp_path):
    """Grants resolve against DataField.path (reference
    ``apply_info_substitutions``): a field named ``w`` with path
    ``meta.width`` must survive the permission projection when granted,
    and NULL out when denied — name≠path fields previously failed the
    projection even when allowed (r1 ADVICE, model.py/resolve.py)."""
    from dataweb_spark.catalog.model import SourcePermission

    src_df = spark.createDataFrame(
        [(1, (10, 20)), (2, (30, 40))],
        "id int, meta struct<width:int,height:int>")
    src_df.write.mode("overwrite").parquet(str(tmp_path / "m.parquet"))
    relay = RelayCatalog(name="home")
    relay.add_entity(Entity("media", [Information("mid", "int"),
                                      Information("width", "int"),
                                      Information("height", "int")]))
    relay.add_connection(
        DataConnection("files", "file", {"path": str(tmp_path)}))
    relay.add_source(DataSource(
        name="media_src", connection="files", entity="media",
        source_sql="select * from {table}",
        fields=[DataField("id", "id"),
                DataField("w", "meta.width"),
                DataField("h", "meta.height")],
        mappings=[Mapping("mid", "id"), Mapping("width", "w"),
                  Mapping("height", "h")],
        options={"table": "m.parquet"},
        default_permission=SourcePermission(frozenset({"id", "w"}), "true"),
    ))
    web = Web()
    web.add_relay(relay)
    rows = {r["mid"]: r for r in
            resolve_entity(spark, web, "home", "media").collect()}
    assert rows[1]["width"] == 10 and rows[2]["width"] == 30
    assert rows[1]["height"] is None  # h not granted -> NULL-padded


def test_transformation_values(spark, demo_web, lineitem_raw):
    """discount_percent must equal l_discount * 100 ((orderkey, linenumber)
    is not unique in the synthetic data, so compare via aggregates)."""
    df = resolve_entity(spark, demo_web, "na_us", "lineitem",
                        principal="all_access")
    got = df.where(F.col(PROVENANCE_SOURCE) == "lineitem_trino") \
        .agg(F.sum("discount_percent"), F.count("*")).collect()[0]
    exp = lineitem_raw.where("l_orderkey % 2 = 0") \
        .agg(F.sum(F.col("l_discount") * 100), F.count("*")).collect()[0]
    assert got[1] == exp[1]
    assert abs(got[0] - exp[0]) < 1e-6 * max(1.0, abs(exp[0]))


def test_remote_entity_resolves_through_peer(spark, demo_web):
    """global.lineitem federates from na_us via RemoteMapping; provenance
    keeps the originating relay."""
    df = resolve_entity(spark, demo_web, "global", "lineitem")
    relays = {r[0] for r in df.select(PROVENANCE_RELAY).distinct().collect()}
    assert relays == {"na_us"}
    local = resolve_entity(spark, demo_web, "na_us", "lineitem")
    assert df.count() == local.count()


def test_cycle_dedup(spark, sf_dir):
    """Two relays mapping each other's entity must terminate and not
    double-count (the UUID-dedup analog, ``flight.rs:545-555``)."""
    def relay(name, peer):
        r = RelayCatalog(name=name)
        r.add_entity(Entity("t", [Information("v", "bigint")]))
        r.add_connection(DataConnection("files", "file",
                                        {"path": sf_dir, "format": "parquet"}))
        r.add_source(DataSource(
            name=f"{name}_src", connection="files", entity="t",
            source_sql="select * from {table}",
            fields=[DataField("r_regionkey", "r_regionkey")],
            mappings=[Mapping("v", "r_regionkey")],
            options={"table": "region.parquet"}))
        r.remote_mappings.append(RemoteEntityMapping(
            local_entity="t", peer=peer, remote_entity="t",
            info_mappings=[RemoteInfoMapping("v", "v")]))
        return r

    web = Web()
    web.add_relay(relay("a", "b"))
    web.add_relay(relay("b", "a"))
    df = resolve_entity(spark, web, "a", "t")
    # region has 5 rows; a's own source + b's source = 10, no infinite loop
    assert df.count() == 10


def test_remote_transformation_composition(spark, sf_dir):
    """Peer exposes value/100; local remote-mapping re-scales with {v}*100 —
    values must round-trip (transformation composition across hops)."""
    peer = RelayCatalog(name="peer")
    peer.add_entity(Entity("t", [Information("scaled", "double")]))
    peer.add_connection(DataConnection("files", "file",
                                       {"path": sf_dir, "format": "parquet"}))
    peer.add_source(DataSource(
        name="p_src", connection="files", entity="t",
        source_sql="select * from {table}",
        fields=[DataField("r_regionkey", "r_regionkey")],
        mappings=[Mapping("scaled", "r_regionkey",
                          Transformation("{v} / 100", "{v} * 100"))],
        options={"table": "region.parquet"}))

    home = RelayCatalog(name="home")
    home.add_entity(Entity("t", [Information("orig", "double")]))
    home.remote_mappings.append(RemoteEntityMapping(
        local_entity="t", peer="peer", remote_entity="t",
        info_mappings=[RemoteInfoMapping(
            "orig", "scaled", Transformation("{v} * 100", "{v} / 100"))]))

    web = Web()
    web.add_relay(peer)
    web.add_relay(home)
    df = resolve_entity(spark, web, "home", "t")
    vals = sorted(r[0] for r in df.select("orig").collect())
    assert vals == [0.0, 1.0, 2.0, 3.0, 4.0]


def test_remote_sql_template_filters_peer(spark, sf_dir):
    """A non-identity sql_template is substituted as the peer-entity derived
    table (map_remote.rs:17-63): here it filters and projects the peer's
    rows before local renaming."""
    peer = RelayCatalog(name="peer")
    peer.add_entity(Entity("t", [Information("k", "bigint"),
                                 Information("name", "string")]))
    peer.add_connection(DataConnection("files", "file",
                                       {"path": sf_dir, "format": "parquet"}))
    peer.add_source(DataSource(
        name="p_src", connection="files", entity="t",
        source_sql="select * from {table}",
        fields=[DataField("n_nationkey", "n_nationkey"),
                DataField("n_name", "n_name")],
        mappings=[Mapping("k", "n_nationkey"), Mapping("name", "n_name")],
        options={"table": "nation.parquet"}))

    home = RelayCatalog(name="home")
    home.add_entity(Entity("t", [Information("key10", "bigint"),
                                 Information("name", "string")]))
    home.remote_mappings.append(RemoteEntityMapping(
        local_entity="t", peer="peer", remote_entity="t",
        sql_template="select * from {entity} where k < 5",
        info_mappings=[RemoteInfoMapping(
            "key10", "k", Transformation("{v} * 10", "{v} / 10"))]))

    web = Web()
    web.add_relay(peer)
    web.add_relay(home)
    df = resolve_entity(spark, web, "home", "t")
    rows = {r["key10"]: r["name"] for r in df.collect()}
    assert set(rows) == {0, 10, 20, 30, 40}  # k<5, scaled ×10
    assert all(isinstance(v, str) and v for v in rows.values())


# -- replica groups (HA mirrors — beyond-reference) -------------------------

def _replica_web(sf_dir: str, first_table: str = "region.parquet",
                 second_table: str = "region.parquet") -> Web:
    r = RelayCatalog(name="home")
    r.add_entity(Entity("t", [Information("v", "bigint")]))
    r.add_connection(DataConnection("files", "file",
                                    {"path": sf_dir, "format": "parquet"}))
    for name, table in [("mirror_a", first_table), ("mirror_b", second_table)]:
        r.add_source(DataSource(
            name=name, connection="files", entity="t",
            source_sql="select * from {table}",
            fields=[DataField("r_regionkey", "r_regionkey")],
            mappings=[Mapping("v", "r_regionkey")],
            options={"table": table},
            replica_group="regions"))
    return Web(relays={"home": r})


def test_replica_group_scans_exactly_one_member(spark, sf_dir):
    web = _replica_web(sf_dir)
    df = resolve_entity(spark, web, "home", "t")
    # region has 5 rows; two mirrors must NOT double-count
    assert df.count() == 5
    srcs = {r[0] for r in df.select(PROVENANCE_SOURCE).distinct().collect()}
    assert srcs == {"mirror_a"}  # declared order = preference


def test_replica_group_fails_over_to_healthy_mirror(spark, sf_dir):
    web = _replica_web(sf_dir, first_table="no_such_file.parquet")
    failures = []
    df = resolve_entity(spark, web, "home", "t", failures=failures)
    assert df.count() == 5
    srcs = {r[0] for r in df.select(PROVENANCE_SOURCE).distinct().collect()}
    assert srcs == {"mirror_b"}
    assert [(rel, s) for rel, s, _ in failures] == [("home", "mirror_a")]


def test_replica_group_all_members_down_raises(spark, sf_dir):
    web = _replica_web(sf_dir, first_table="no_such_file.parquet",
                       second_table="also_missing.parquet")
    with pytest.raises(Exception):
        resolve_entity(spark, web, "home", "t")
    # allow_partial: the whole group is skipped like a failed source
    assert resolve_entity(spark, web, "home", "t",
                          allow_partial=True) is None


def test_replica_yaml_round_trip(tmp_path, sf_dir):
    from dataweb_spark.catalog.loader import dump_web_dir, load_web_dir
    web = _replica_web(sf_dir)
    dump_web_dir(web, str(tmp_path))
    back = load_web_dir(str(tmp_path))
    srcs = back.relay("home").sources
    assert all(srcs[n].replica_group == "regions"
               for n in ("mirror_a", "mirror_b"))


def test_replica_group_template_path_scans_one_member(spark, sf_dir):
    """r14 review regression: the TEMPLATE path (partial aggregates,
    flat/grouped top-k merges) must honor replica groups like the row
    path — scanning every mirror would DOUBLE rows in every partial
    merge. One member answers; a dead preferred mirror fails over."""
    from dataweb_spark.plans.gateway import QueryGateway

    gw = QueryGateway(spark, _replica_web(sf_dir), "home", )
    parts = gw.query_template("select count(*) as n from t")
    assert [(rel, s) for rel, s, _ in parts] == [("home", "mirror_a")]
    assert parts[0][2].collect()[0]["n"] == 5
    # the merged union counts each row ONCE
    total = gw.query_template_union(
        "select count(*) as n from t").agg({"n": "sum"}).first()[0]
    assert total == 5
    # and the engine-mode aggregate answer is the true count
    assert gw.query("select count(*) as n from t").first()["n"] == 5

    # failover: dead preferred mirror -> the healthy one answers
    gw2 = QueryGateway(spark,
                       _replica_web(sf_dir,
                                    first_table="no_such_file.parquet"),
                       "home")
    parts2 = gw2.query_template("select count(*) as n from t")
    assert [(rel, s) for rel, s, _ in parts2] == [("home", "mirror_b")]
    # all mirrors down: loud failure (template has no allow_partial)
    gw3 = QueryGateway(spark,
                       _replica_web(sf_dir,
                                    first_table="no_such_file.parquet",
                                    second_table="also_missing.parquet"),
                       "home")
    with pytest.raises(Exception):
        gw3.query_template("select count(*) as n from t")


def _memo_web(tmp_path):
    relay = RelayCatalog(name="home")
    relay.add_entity(Entity("t", [Information("v", "bigint")]))
    relay.add_connection(
        DataConnection("files", "file", {"path": str(tmp_path)}))
    relay.add_source(DataSource(
        name="t_src", connection="files", entity="t",
        source_sql="select * from {table}",
        fields=[DataField("id", "id")], mappings=[Mapping("v", "id")],
        options={"table": "t.parquet"}))
    web = Web()
    web.add_relay(relay)
    return web


def test_file_read_memo_hits_and_invalidates(spark, tmp_path):
    """The raw file-read frame is memoized per (session, fmt, path, opts),
    but ONLY while the path content is unchanged: a reused DataFrame pins
    its file listing at load time, so appends/overwrites MUST drop the memo
    entry (a stale frame silently misses appended files and errors after an
    overwrite)."""
    from dataweb_spark.sources.readers import read_connection_table

    spark.range(10).selectExpr("id").write.parquet(str(tmp_path / "t.parquet"))
    web = _memo_web(tmp_path)
    relay = web.relay("home")
    conn, src = relay.connections["files"], relay.sources["t_src"]

    raw1, _ = read_connection_table(spark, conn, src)
    raw2, _ = read_connection_table(spark, conn, src)
    assert raw2 is raw1  # memo hit on unchanged content

    assert resolve_entity(spark, web, "home", "t").count() == 10
    spark.range(100, 105).selectExpr("id") \
        .write.mode("append").parquet(str(tmp_path / "t.parquet"))
    assert resolve_entity(spark, web, "home", "t").count() == 15
    raw3, _ = read_connection_table(spark, conn, src)
    assert raw3 is not raw1  # signature change dropped the entry

    spark.range(3).selectExpr("id") \
        .write.mode("overwrite").parquet(str(tmp_path / "t.parquet"))
    assert resolve_entity(spark, web, "home", "t").count() == 3

    # nested (partitioned) layouts refuse memoization outright: dir mtime
    # cannot see changes below one level, so a stale hit would be silent
    from dataweb_spark.sources.readers import _path_signature
    spark.range(4).selectExpr("id", "id % 2 as p") \
        .write.partitionBy("p").parquet(str(tmp_path / "nested.parquet"))
    assert _path_signature(str(tmp_path / "nested.parquet")) is None
    assert _path_signature("s3a://bucket/t.parquet") is None
