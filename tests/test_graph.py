"""Integer-exact PageRank: determinism, damping mass, ranking sanity."""

import pandas as pd

from pyspark.sql import functions as F

from dataweb_spark.functions import graph as G


def _edges(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame({"src": [p[0] for p in pairs],
                      "dst": [p[1] for p in pairs]}))


def test_pagerank_is_partition_invariant(spark):
    pairs = [(i % 13, (i * 7 + 1) % 13) for i in range(200)] \
        + [(i % 13, (i * 5 + 2) % 13) for i in range(200)]
    e = _edges(spark, pairs)
    r1 = {r.node: r.score for r in G.pagerank_integer(e, k=4).collect()}
    r2 = {r.node: r.score for r in
          G.pagerank_integer(e.repartition(11), k=4).collect()}
    assert r1 == r2
    assert all(isinstance(v, int) for v in r1.values())


def test_pagerank_hub_and_target_dominate_leaves(spark):
    # star: everyone links to node 0; node 0 links only to node 1 — the
    # hub and the hub's sole target accumulate the mass (the target
    # ends HIGHER: it receives the hub's entire score each step),
    # symmetric leaves get the bare teleport base and tie exactly
    pairs = [(i, 0) for i in range(1, 10)] + [(0, 1)]
    r = {x.node: x.score for x in
         G.pagerank_integer(_edges(spark, pairs), k=8).collect()}
    leaves = [r[i] for i in range(2, 10)]
    assert r[1] > r[0] > max(leaves)
    assert len(set(leaves)) == 1          # symmetric leaves tie exactly
    assert leaves[0] == 10**9 * 15 // 100


def test_pagerank_base_floor_for_no_inlinks(spark):
    # 0 -> 1 only: node 0 has no in-links, so after any iteration its
    # score is exactly the integer teleport base
    r = {x.node: x.score for x in
         G.pagerank_integer(_edges(spark, [(0, 1)]), k=3,
                            init=10**9).collect()}
    assert r[0] == 10**9 * 15 // 100


def test_pagerank_no_bigint_overflow_on_huge_mass(spark):
    # in_sum near 2^62: a bare 85*in_sum would wrap bigint silently
    # (Spark non-ANSI); the (a div d)*n + ((a%d)*n) div d identity must
    # give the exact mathematical value instead of garbage
    init = 2 ** 62
    r = {x.node: x.score for x in
         G.pagerank_integer(_edges(spark, [(0, 1)]), k=1,
                            init=init).collect()}
    base = init * 15 // 100
    want = base + (init * 85) // 100   # exact in Python's unbounded ints
    assert r[1] == want
    assert r[1] > 0


def test_anchor_profile_counts_and_self_link_rule(spark):
    """External in-links count with multiplicity, distinct linking
    domains count each source domain once, self-links (same registered
    domain both ends) are excluded, and the top-k terms rank by
    frequency with term-asc ties."""
    links = spark.createDataFrame(
        [("http://a.com/1", "http://t.org/p", "best spark docs"),
         ("http://b.com/1", "http://t.org/p", "spark docs"),
         ("http://b.com/2", "http://t.org/p", "spark home"),
         ("http://t.org/self", "http://t.org/p", "me me me"),
         ("http://a.com/9", "http://u.org/q", "click here"),
         ("http://a.com/img", "http://v.org/pic", "  ")],  # token-less
        ["src_url", "dst_url", "anchor"])
    rows = G.anchor_profile(links, k=2).orderBy("domain", "rk").collect()
    t = [r for r in rows if r.domain == "t.org"]
    assert t[0].n_inlinks == 3 and t[0].n_linking_domains == 2
    assert [(r.rk, r.term, r.term_n) for r in t] == \
        [(1, "spark", 3), (2, "docs", 2)]
    u = [r for r in rows if r.domain == "u.org"]
    assert u[0].n_inlinks == 1 and u[0].n_linking_domains == 1
    # a domain linked only with token-less anchors keeps its counts
    # (one row, null term columns) — authority must not vanish with
    # the vocabulary
    v = [r for r in rows if r.domain == "v.org"]
    assert len(v) == 1 and v[0].n_inlinks == 1
    assert v[0].rk is None and v[0].term is None
