"""KMV cardinality sketches (functions/sketches.py): cross-engine-exact
hashes, the mergeable-partials invariant, and the integer estimator."""

import os
import re

import duckdb
import pytest
from pyspark.sql import Row, functions as F

from dataweb_spark.functions import sketches as K


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def test_kmv_hash_matches_duckdb(docs, sf_dir):
    got = {r.doc_id: r.h for r in
           docs.where("doc_id < 50")
               .select("doc_id", K.kmv_hash("text").alias("h")).collect()}
    con = duckdb.connect()
    want = dict(con.execute(
        "select doc_id, ('0x' || substr(md5(cast(text as varchar)), 1, 12))"
        "::bigint from read_parquet(?) where doc_id < 50",
        [os.path.join(sf_dir, "documents.parquet")]).fetchall())
    assert got == want and len(got) == 50


def test_kmv_exact_below_k_and_estimate_above(docs):
    true_by_lang = {r.lang: r.d for r in
                    docs.groupBy("lang")
                        .agg(F.countDistinct("text").alias("d")).collect()}
    # k far above every group's cardinality -> exact counts
    exact = {r.lang: r.distinct_est for r in
             K.kmv_sketch(docs, "text", ["lang"], k=100_000).collect()}
    assert exact == true_by_lang
    # whole-frame estimate with k=256: sigma ~ 1/sqrt(k-2) ~ 6.3%
    true_all = docs.agg(F.countDistinct("text")).first()[0]
    est = K.kmv_sketch(docs, "text", k=256).first().distinct_est
    assert abs(est - true_all) / true_all < 0.4, (est, true_all)


def test_kmv_merge_of_partials_equals_whole(docs):
    parts = [docs.where(f"doc_id % 3 = {i}") for i in range(3)]
    part_sketches = None
    for p in parts:
        s = K.kmv_sketch(p, "text", ["lang"], k=32)
        part_sketches = s if part_sketches is None \
            else part_sketches.unionByName(s)
    merged = {r.lang: (r.kmv, r.n_mins, r.distinct_est) for r in
              K.kmv_merge(part_sketches, ["lang"], k=32).collect()}
    whole = {r.lang: (r.kmv, r.n_mins, r.distinct_est) for r in
             K.kmv_sketch(docs, "text", ["lang"], k=32).collect()}
    assert merged == whole and len(whole) > 1


def test_kmv_partitioning_invariant_and_nulls(spark, docs):
    def norm(rows):
        return sorted((r.lang, tuple(r.kmv), r.n_mins, r.distinct_est)
                      for r in rows)
    a = norm(K.kmv_sketch(docs, "text", ["lang"], k=16).collect())
    b = norm(K.kmv_sketch(docs.repartition(13), "text", ["lang"],
                          k=16).collect())
    assert a == b
    withnull = spark.createDataFrame(
        [Row(x="a"), Row(x=None), Row(x=None), Row(x="b")])
    r = K.kmv_sketch(withnull, "x", k=8).first()
    assert r.n_mins == r.distinct_est == 3  # NULLs collapse to one value
    with pytest.raises(ValueError):
        K.kmv_sketch(withnull, "x", k=1)


def test_kmv_two_exchanges_only(docs):
    out = K.kmv_sketch(docs, "text", ["lang"], k=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # distinct (group, hash) + the rank window's group repartition; the
    # final groupBy reuses the window's partitioning
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2, plan


def test_kmv_grouped_sketch_matches_duckdb_replay(docs, sf_dir):
    """Full grouped replay — the future r12 oracle shape."""
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')")
    want = {r[0]: (list(r[1]), r[2], r[3]) for r in con.execute("""
with pairs as (
  select distinct lang,
         ('0x' || substr(md5(cast(text as varchar)), 1, 12))::bigint as h
  from documents),
rk as (
  select lang, h, row_number() over (partition by lang order by h) as rk
  from pairs)
select lang,
       list(h order by h) as kmv,
       count(*) as n_mins,
       case when count(*) < 64 then count(*)
            else (63 * 281474976710656) //
                 max(case when rk = 64 then h end) end as est
from rk where rk <= 64
group by lang order by lang
""").fetchall()}
    got = {r.lang: (list(r.kmv), r.n_mins, r.distinct_est) for r in
           K.kmv_sketch(docs, "text", ["lang"], k=64).collect()}
    assert got == want


def test_kmv_local_combine_off_is_identical(docs):
    def norm(rows):
        return sorted((r.lang, tuple(r.kmv), r.n_mins, r.distinct_est, r.k)
                      for r in rows)
    fast = norm(K.kmv_sketch(docs, "text", ["lang"], k=48).collect())
    slow = norm(K.kmv_sketch(docs, "text", ["lang"], k=48,
                             local_combine=False).collect())
    assert fast == slow


def test_kmv_merge_refuses_merging_up(docs):
    small = K.kmv_sketch(docs, "text", ["lang"], k=16)
    with pytest.raises(ValueError, match="built with k=16"):
        K.kmv_merge(small, ["lang"], k=32)
    with pytest.raises(ValueError, match="no 'k' column"):
        K.kmv_merge(small.drop("k"), ["lang"], k=16)
    # merging DOWN is the safe direction and stays exact vs a direct
    # k=8 sketch of the same data
    down = {r.lang: tuple(r.kmv) for r in
            K.kmv_merge(small, ["lang"], k=8).collect()}
    direct = {r.lang: tuple(r.kmv) for r in
              K.kmv_sketch(docs, "text", ["lang"], k=8).collect()}
    assert down == direct
