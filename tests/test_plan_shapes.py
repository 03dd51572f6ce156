"""Physical-plan shape assertions — the 100 TB design contracts.

These lock in the properties that make the architecture survive scale-up:
filters/projections reach the parquet scans *through* the federation
mapping layer, aggregation is partial below the entity-view union (one
combine per source before any shuffle), and small dimensions broadcast.
"""

import re

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fed_filter_pushdown_through_transformations(spark, demo_web):
    """A filter on a *logical* column (tax_percent = l_tax*100) must reach
    both source scans rewritten into physical terms."""
    from dataweb_spark.plans.gateway import QueryGateway
    gw = QueryGateway(spark, demo_web, "na_us")
    df = gw.query("select linenumber from lineitem where tax_percent > 3")
    plan = _plan(df)
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert len(scans) == 2, "expected one scan per mapped source"
    # the transformed predicate appears as a data filter on l_tax
    assert plan.count("l_tax") >= 2
    for s in scans:
        assert "DataFilters: [" in s
        # column pruning: the scan must NOT read all 16 lineitem columns
        read = re.search(r"FileScan parquet \[([^\]]*)\]", s).group(1)
        assert len(read.split(",")) <= 6, f"scan reads too much: {read}"


def test_fed_partial_aggregation_below_union(spark, demo_web):
    """groupBy over the entity view: each union branch partially aggregates
    before the exchange (map-side combine per source)."""
    from dataweb_spark.plans.gateway import QueryGateway
    gw = QueryGateway(spark, demo_web, "na_us")
    df = gw.query("select returnflag, sum(quantity) as q from lineitem "
                  "group by returnflag")
    plan = _plan(df)
    lines = plan.splitlines()
    exchange_at = next(i for i, ln in enumerate(lines)
                       if "Exchange hashpartitioning" in ln)
    partial_at = next(i for i, ln in enumerate(lines)
                      if "HashAggregate" in ln and "partial_sum" in ln)
    # the partial (map-side) aggregate must run BEFORE the shuffle, i.e.
    # deeper in the tree (later line) than the exchange, above the union
    assert partial_at > exchange_at, "partial agg must precede the shuffle"
    assert any("Union" in ln for ln in lines[partial_at:]), \
        "partial agg should sit on top of the source union"
    # exactly one shuffle for the final aggregate
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_dim_joins_broadcast(spark, sf_dir):
    from dataweb_spark.queries import register_views
    register_views(spark, sf_dir)
    df = spark.sql("""
        select n_name, count(*) as n
        from lineitem join supplier on l_suppkey = s_suppkey
        join nation on s_nationkey = n_nationkey
        group by n_name""")
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, \
        "small dims should broadcast, not sort-merge"


def test_topk_uses_take_ordered(spark, sf_dir):
    from dataweb_spark.queries import register_views
    register_views(spark, sf_dir)
    df = spark.sql("select * from orders order by o_totalprice desc limit 10")
    assert "TakeOrderedAndProject" in _plan(df), \
        "top-k should not global-sort"


def test_range_join_broadcast_no_point_shuffle(spark, sf_dir):
    """Small interval sets broadcast: the point side must reach the join
    with NO shuffle (the 100 TB contract — only tiny intervals move)."""
    from dataweb_spark.operators import range_join
    from dataweb_spark.queries import register_views
    register_views(spark, sf_dir)
    bands = spark.createDataFrame(
        [("low", 0.0, 150000.0), ("mid", 100000.0, 400000.0)],
        "band string, lo double, hi double")
    pts = spark.table("orders").select("o_orderkey", "o_totalprice")
    df = range_join(pts, bands, "o_totalprice", "lo", "hi",
                    bucket_width=100000.0, broadcast_intervals=True)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan, \
        "broadcast range join must not shuffle the point side"


def test_exists_plans_semi_join(spark, sf_dir):
    from dataweb_spark.queries import register_views
    register_views(spark, sf_dir)
    df = spark.sql("""
        select count(*) as n from orders
        where exists (select 1 from lineitem
                      where l_orderkey = o_orderkey and l_shipdate > o_orderdate)""")
    assert "Semi" in _plan(df), "EXISTS should plan as a semi join"


def test_not_exists_plans_anti_join(spark, sf_dir):
    from dataweb_spark.queries import register_views
    register_views(spark, sf_dir)
    df = spark.sql("""
        select count(*) as n from customer
        where not exists (select 1 from orders where o_custkey = c_custkey)""")
    assert "Anti" in _plan(df), "NOT EXISTS should plan as an anti join"


def test_correlated_agg_subquery_decorrelates(spark, sf_dir):
    """TPC-H Q17 shape: the correlated avg must decorrelate into an
    aggregate + equi-join, never a per-row nested loop."""
    from dataweb_spark.queries import queries
    df = queries()["tpch_q17_small_quantity"](spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pruned_source_absent_from_plan(spark, sf_dir):
    """Source pruning must remove the branch from the PHYSICAL plan — one
    FileScan, no union of two epochs (tests/test_pruning.py proves values;
    this locks the plan shape the 100 TB win depends on)."""
    from dataweb_spark.queries import QUERIES
    df = QUERIES["fed_source_pruning"](spark, sf_dir)
    plan = _plan(df)
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert len(scans) == 1, "pruned epoch still scanned"


def test_tfidf_partial_aggregates_and_broadcast_count(spark, sf_dir):
    """TF-IDF: both groupBys partial-aggregate before their exchanges and
    the global doc count joins as a broadcast (no extra big shuffle)."""
    from dataweb_spark.functions import text as T
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(T.tfidf_top_terms(docs, k=3))
    assert "BroadcastExchange" in plan  # the 1-row n_docs side
    assert re.search(r"HashAggregate.*partial_count", plan)


def test_fed_q3_filters_reach_every_source_branch(spark, sf_dir):
    """The federated Q3 (webengine/src/main.rs:86-124 analog): each of the
    six lineitem source scans must carry the shipdate filter pushed through
    its mapping, and the dimension scans their own filters — no branch may
    scan unfiltered (VERDICT r4 item 3 'done' criterion)."""
    from dataweb_spark.demo import build_six_relay_web
    from dataweb_spark.plans.gateway import QueryGateway
    web = build_six_relay_web(sf_dir)
    gw = QueryGateway(spark, web, "global")
    df = gw.query("""
        select o.orderkey,
               round(sum(l.extendedprice
                         * (1 - l.discount_percent / 100)), 2) as revenue,
               cast(o.orderdate as date) as orderdate
        from customer c
        join orders o on c.custkey = o.custkey
        join lineitem l on l.orderkey = o.orderkey
        where c.mktsegment = 'BUILDING'
          and o.orderdate < timestamp '1995-03-15'
          and l.shipdate > date '1995-03-15'
        group by o.orderkey, cast(o.orderdate as date)
        order by revenue desc, o.orderkey
        limit 10
    """)
    plan = _plan(df)
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    li = [s for s in scans if "l_orderkey" in s or "l_shipdate" in s]
    cust = [s for s in scans if "c_mktsegment" in s]
    orders = [s for s in scans if "o_orderdate" in s]
    assert len(li) == 6, f"expected 6 federated lineitem scans, got {len(li)}"
    for s in li:
        assert "l_shipdate" in s and "DataFilters: [" in s, s
        # projection pruning: Q3 touches 4 lineitem columns + shipdate
        read = re.search(r"FileScan parquet \[([^\]]*)\]", s).group(1)
        assert len(read.split(",")) <= 6, f"scan reads too much: {read}"
    assert cust and all("DataFilters: [" in s for s in cust)
    assert orders and all("DataFilters: [" in s for s in orders)
    # top-10 must not globally sort
    assert "TakeOrderedAndProject" in plan


def test_url_normalize_is_one_codegen_projection(spark, sf_dir):
    """normalize_url + registered_domain compile to ONE JVM projection
    over the scan — no shuffle, no Python (the array-lambda filter is a
    codegen-fallback expression but stays JVM-side). The property that
    makes the URL gate linear at 100 TB."""
    from dataweb_spark.functions import urls as U
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = docs.selectExpr(
        "doc_id", "'http://Ex.COM/p/' || doc_id || '?utm_a=1' as url"
    ).select("doc_id", U.normalize_url("url").alias("n"),
             U.registered_domain("url").alias("d"))
    plan = _plan(df)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.lstrip().startswith("Project")   # one projection, no more


def test_domain_caps_single_shuffle_on_domain_key(spark, sf_dir):
    """domain_caps: exactly one exchange (the domain-key window) — the
    cap must not add a second shuffle on top of its own partitioning."""
    from dataweb_spark.functions import urls as U
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    urls = docs.selectExpr(
        "doc_id", "'http://s' || (doc_id % 9) || '.com/p' || doc_id as url")
    plan = _plan(U.domain_caps(urls, max_per_domain=3))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dsir_models_broadcast_never_shuffle_grams_twice(spark, sf_dir):
    """DSIR scoring: the fixed-point log-ratio model table joins as a
    BROADCAST, gram rows never sort-merge-join, and the corpus is
    tokenized exactly three times (raw model, target model, scoring
    grams) — the model totals derive from the bounded bucket table via
    window sums, NOT from two extra corpus-re-tokenizing .agg() passes."""
    from dataweb_spark.functions import dsir as DS
    from pyspark.sql import functions as F
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(DS.dsir_weights(docs, docs.where(F.col("lang") == "en")))
    assert plan.count("FileScan parquet") == 3
    assert plan.count("BroadcastExchange") >= 1
    assert "SortMergeJoin" not in plan


def test_warc_parse_is_map_only(spark, sf_dir):
    """parse_warc_records: the record explode is one Arrow map pass —
    blob bytes never shuffle (the splittable-crawl contract)."""
    from dataweb_spark.sources import warc as W
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    blobs = W.synthesize_warc_blobs(docs, docs_per_blob=10, compress=True)
    recs = W.parse_warc_records(blobs)
    # everything after the pack (which needs its blob grouping) is
    # map-only: no exchange between MapInPandas and the output
    plan = _plan(recs)
    tail = plan.split("MapInPandas")[0]
    assert "Exchange" not in tail


def test_warc_http_extract_chain_is_map_only(spark, sf_dir):
    """parse_warc_records -> http_response_parts: the full envelope
    chain stays one map-only pipeline — record/body bytes NEVER
    shuffle, the two Arrow passes stack with no Exchange anywhere
    above the pack (the 100-TB contract of the crawl front door)."""
    from dataweb_spark.sources import warc as W
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    blobs = W.synthesize_warc_blobs(docs, docs_per_blob=10, compress=True)
    parts = W.http_response_parts(W.parse_warc_records(blobs))
    plan = _plan(parts)
    tail = plan.split("MapInPandas")[0]
    assert "Exchange" not in tail
    assert plan.count("MapInPandas") == 2  # parse + extract, nothing else


def test_psl_domain_rule_table_broadcasts_one_reagg(spark, sf_dir):
    """registered_domain_psl: the rule table joins as a BROADCAST over
    the exploded suffix candidates; the winner pick is the single
    hash-key re-aggregate — no sort-merge join, no Python."""
    import pandas as pd
    from dataweb_spark.functions import urls as U
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    urls = docs.selectExpr(
        "doc_id", "'http://u' || doc_id || '.github.io/p' as url")
    psl = spark.createDataFrame(
        pd.DataFrame({"rule": ["com", "io", "github.io", "*.ck"]}))
    plan = _plan(U.registered_domain_psl(urls, psl))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_temperature_mixture_quota_broadcast(spark, sf_dir):
    """temperature_mixture: the quota table (bounded by the stratum
    count) joins as a BROADCAST; the corpus pays one stratum-key window
    — selection never sort-merge-joins the corpus."""
    from dataweb_spark.functions import splits as S
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(S.temperature_mixture(docs, "lang", 100))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_robots_filter_broadcast_rules_one_reagg(spark, sf_dir):
    """robots_filter: the bounded rule table joins as a BROADCAST; the
    winner pick is one re-aggregate — URLs never sort-merge-join."""
    import pandas as pd
    from dataweb_spark.functions import urls as U
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    urls = docs.selectExpr(
        "doc_id", "'http://a.com/p/' || doc_id as url")
    rules = spark.createDataFrame(pd.DataFrame({
        "domain": ["a.com"], "rule": ["disallow"], "path": ["/p/*"]}))
    plan = _plan(U.robots_filter(urls, rules))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bm25_query_terms_broadcast_no_cartesian(spark, sf_dir):
    """bm25_topk: the query-term and idf tables BROADCAST into the
    postings (tf) stream — the corpus-wide vocabulary never joins, and
    nothing goes cartesian; the only wide shuffles are the proven
    map-side-combined aggregates and the per-query window."""
    from dataweb_spark.functions import text as T
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    qs = docs.limit(2).selectExpr("doc_id as query_id",
                                  "text as query_text")
    plan = _plan(T.bm25_topk(docs, qs, k=5))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_robots_filter_large_table_mode_shuffles(spark, sf_dir):
    """robots_filter(broadcast=False): a full crawl's rule table (10⁷⁺
    domains) must NOT be force-broadcast (executor OOM) — the join
    plans as a shuffled equi-join on the narrow domain key. Auto-
    broadcast is disabled so the tiny test table can't sneak back in."""
    import pandas as pd
    from dataweb_spark.functions import urls as U
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    urls = docs.selectExpr(
        "doc_id", "'http://a.com/p/' || doc_id as url")
    rules = spark.createDataFrame(pd.DataFrame({
        "domain": ["a.com"], "rule": ["disallow"], "path": ["/p/*"]}))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(U.robots_filter(urls, rules, broadcast=False))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastHashJoin" not in plan
    assert re.search(r"SortMergeJoin|ShuffledHashJoin", plan)


def test_pack_training_rows_join_reuses_shard_partitioning(spark, sf_dir):
    """pipeline_pack_training_rows: the packed-row and span sides both
    derive from the same shard-partitioned window prefix; the join on
    (shard, seq_id) must not cartesian, and the whole query's exchanges
    stay bounded (two window prefixes + one bounded join distribution —
    NOT proportional to data volume)."""
    from dataweb_spark.queries import queries
    df = queries()["pipeline_pack_training_rows"](spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_ex <= 5, f"unexpected exchange count {n_ex}:\n{plan[:2000]}"


def test_politeness_waves_query_single_domain_window(spark, sf_dir):
    """crawl_politeness_waves: wave/slot are arithmetic on the ONE
    domain-window row_number — no second window, no cartesian; the
    prior join broadcasts (small aggregated prior)."""
    from dataweb_spark.queries import queries
    df = queries()["crawl_politeness_waves"](spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert plan.count("RunningWindowFunction") <= 1
    assert len(re.findall(r"Window ", plan)) <= 2  # rank window + none extra


def test_kmv_query_bounded_exchange(spark, sf_dir):
    """sketch_kmv_distinct (r12b: the merged sketch-family report): each
    of the three sketches pays its bounded distinct + window/groupBy
    exchanges (≤2 apiece — every one over pre-combined, O(groups·k)-size
    streams), and the per-lang joins BROADCAST (few-row aggregates) —
    never a shuffle join, never a cartesian."""
    from dataweb_spark.queries import queries
    df = queries()["sketch_kmv_distinct"](spark, sf_dir)
    plan = _plan(df)
    n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_ex <= 6, f"exchange count {n_ex}"
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # lang joins broadcast
    assert plan.count("BroadcastHashJoin") == 2
