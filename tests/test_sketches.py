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


# -- set-operation estimates (r12) -------------------------------------------

def test_kmv_set_estimates_exact_below_k(spark):
    """Below k the union's k-min set IS the distinct set: every output
    is the exact set-operation cardinality. Planted universe: A = 0..59,
    B = 40..99 → |A∪B| = 100, |A∩B| = 20, |A\\B| = 40, |B\\A| = 40."""
    a = spark.createDataFrame([Row(v=f"x{i}") for i in range(60)])
    b = spark.createDataFrame([Row(v=f"x{i}") for i in range(40, 100)])
    sa = K.kmv_sketch(a, "v", k=256)
    sb = K.kmv_sketch(b, "v", k=256)
    r = K.kmv_set_estimates(sa, sb, k=256).first()
    assert (r.n_union_mins, r.union_est) == (100, 100)
    assert (r.inter_est, r.a_only_est, r.b_only_est) == (20, 40, 40)
    assert r.jaccard_e6 == 20 * 1_000_000 // 100


def test_kmv_set_estimates_saturated_accuracy_and_identity(docs):
    """Above k: estimates track truth within KMV error, and the sampled
    decomposition satisfies inter + a_only + b_only == union_est ±
    integer-div slack per group."""
    old = docs.where("doc_id % 2 = 0")
    new = docs.where("doc_id % 3 = 0")
    sa = K.kmv_sketch(old, "text", ["lang"], k=64)
    sb = K.kmv_sketch(new, "text", ["lang"], k=64)
    out = {r.lang: r for r in
           K.kmv_set_estimates(sa, sb, ["lang"], k=64).collect()}
    true_union = {r.lang: r.d for r in
                  old.select("lang", "text").union(new.select("lang", "text"))
                  .groupBy("lang").agg(F.countDistinct("text").alias("d"))
                  .collect()}
    true_inter = {r.lang: r.d for r in
                  old.select("lang", "text").intersect(
                      new.select("lang", "text"))
                  .groupBy("lang").agg(F.countDistinct("text").alias("d"))
                  .collect()}
    assert set(out) == set(true_union)
    for lang, r in out.items():
        tu, ti = true_union[lang], true_inter.get(lang, 0)
        assert abs(r.union_est - tu) / tu < 0.5, (lang, r.union_est, tu)
        # sampled intersection: |err| <= union err + sampling err; loose
        # bound is enough to catch estimator arithmetic bugs
        assert abs(r.inter_est - ti) <= max(20, 0.6 * tu), (lang, r, ti)
        slack = 3  # three integer divs
        total = r.inter_est + r.a_only_est + r.b_only_est
        assert abs(total - r.union_est) <= slack, (lang, r)


def test_kmv_set_estimates_disjoint_and_one_sided_groups(spark):
    """Disjoint sets → zero intersection; a group on one side only meets
    an empty sketch (b_only == union, rest zero)."""
    a = spark.createDataFrame([Row(g="x", v=f"a{i}") for i in range(30)])
    b = spark.createDataFrame(
        [Row(g="x", v=f"b{i}") for i in range(30)]
        + [Row(g="only_b", v=f"c{i}") for i in range(10)])
    out = {r.g: r for r in K.kmv_set_estimates(
        K.kmv_sketch(a, "v", ["g"], k=128),
        K.kmv_sketch(b, "v", ["g"], k=128), ["g"], k=128).collect()}
    assert out["x"].inter_est == 0 and out["x"].union_est == 60
    assert out["x"].a_only_est == 30 and out["x"].b_only_est == 30
    ob = out["only_b"]
    assert (ob.union_est, ob.inter_est, ob.a_only_est, ob.b_only_est) \
        == (10, 0, 0, 10)
    with pytest.raises(ValueError, match="built with k"):
        K.kmv_set_estimates(K.kmv_sketch(a, "v", ["g"], k=16),
                            K.kmv_sketch(b, "v", ["g"], k=128), ["g"], k=64)


def test_kmv_set_estimates_null_group_matches_nullsafe(spark):
    """A NULL group key present on BOTH sides must meet itself (one
    output row with the true overlap), not split into two rows each
    against an empty sketch — the r12 review-caught equi-join hole."""
    a = spark.createDataFrame(
        [Row(g=None, v=f"x{i}") for i in range(20)]
        + [Row(g="en", v=f"y{i}") for i in range(5)],
        "g string, v string")
    b = spark.createDataFrame(
        [Row(g=None, v=f"x{i}") for i in range(10, 30)],
        "g string, v string")
    out = K.kmv_set_estimates(
        K.kmv_sketch(a, "v", ["g"], k=128),
        K.kmv_sketch(b, "v", ["g"], k=128), ["g"], k=128,
        built_k=128).collect()
    rows = {r.g: r for r in out}
    assert len(out) == 2 and set(rows) == {None, "en"}
    nr = rows[None]
    assert (nr.union_est, nr.inter_est, nr.a_only_est, nr.b_only_est) \
        == (30, 10, 10, 10)
    en = rows["en"]
    assert (en.union_est, en.inter_est, en.b_only_est) == (5, 0, 0)


def test_kmv_set_estimates_matches_duckdb_replay(docs, sf_dir):
    """Full integer replay of the saturated estimator in DuckDB (the
    r12 oracle shape): same hashes, same M, same membership counts,
    same div arithmetic."""
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')")
    want = {r[0]: tuple(r[1:]) for r in con.execute(r"""
with ha as (
  select lang, h, row_number() over (partition by lang order by h) as rk
  from (select distinct lang,
               ('0x' || substr(md5(cast(text as varchar)), 1, 12))::bigint
                 as h
        from documents where doc_id % 2 = 0)),
hb as (
  select lang, h, row_number() over (partition by lang order by h) as rk
  from (select distinct lang,
               ('0x' || substr(md5(cast(text as varchar)), 1, 12))::bigint
                 as h
        from documents where doc_id % 3 = 0)),
ka as (select lang, list(h order by h) as kmv from ha where rk <= 64
       group by lang),
kb as (select lang, list(h order by h) as kmv from hb where rk <= 64
       group by lang),
j as (
  select coalesce(ka.lang, kb.lang) as lang,
         coalesce(ka.kmv, []::bigint[]) as a,
         coalesce(kb.kmv, []::bigint[]) as b
  from ka full outer join kb on ka.lang = kb.lang),
m as (
  select lang, a, b,
         list_sort(list_distinct(list_concat(a, b)))[1:64] as m
  from j),
c as (
  select lang, len(m) as nu,
         case when len(m) < 64 then len(m)
              else (63 * 281474976710656) // m[64] end as uest,
         len(list_filter(m, x -> list_contains(a, x)
                            and list_contains(b, x))) as cb,
         len(list_filter(m, x -> list_contains(a, x)
                            and not list_contains(b, x))) as ca,
         len(list_filter(m, x -> list_contains(b, x)
                            and not list_contains(a, x))) as cbo
  from m)
select lang, cast(nu as bigint) as n_union_mins,
       cast(uest as bigint) as union_est,
       cast(case when nu = 0 then 0 else (cb * uest) // nu end as bigint)
         as inter_est,
       cast(case when nu = 0 then 0 else (ca * uest) // nu end as bigint)
         as a_only_est,
       cast(case when nu = 0 then 0 else (cbo * uest) // nu end as bigint)
         as b_only_est,
       cast(case when nu = 0 then 0 else (cb * 1000000) // nu end as bigint)
         as jaccard_e6
from c order by lang
""").fetchall()}
    sa = K.kmv_sketch(docs.where("doc_id % 2 = 0"), "text", ["lang"], k=64)
    sb = K.kmv_sketch(docs.where("doc_id % 3 = 0"), "text", ["lang"], k=64)
    got = {r.lang: tuple(r)[1:] for r in
           K.kmv_set_estimates(sa, sb, ["lang"], k=64).collect()}
    assert got == want and len(want) >= 3


def test_kmv_lying_built_k_errors_at_execution(spark):
    """built_k skips the eager probe but cannot launder a merge-up: the
    in-plan per-row guard errors the job instead of silently treating a
    short array as an exact count (r12 review fix)."""
    from pyspark.errors import PySparkException
    a = spark.createDataFrame([Row(v=f"x{i}") for i in range(100)])
    sa = K.kmv_sketch(a, "v", k=16)
    sb = K.kmv_sketch(a, "v", k=16)
    with pytest.raises(PySparkException, match="built with k=16"):
        K.kmv_set_estimates(sa, sb, k=64, built_k=64).collect()
    with pytest.raises(PySparkException, match="built with k=16"):
        K.kmv_merge(sa, k=64, built_k=64).collect()


from hypothesis import given as _given, settings as _settings
from hypothesis import strategies as _st


@_settings(max_examples=15, deadline=None)
@_given(na=_st.integers(min_value=0, max_value=60),
        nb=_st.integers(min_value=0, max_value=60),
        overlap=_st.integers(min_value=0, max_value=40))
def test_kmv_set_estimates_exact_regime_property(spark, na, nb, overlap):
    """Property (below-k regime): for ANY planted universe A/B with a
    controlled overlap, every estimate equals the exact set-operation
    cardinality and the decomposition is exact (hypothesis-generated)."""
    ov = min(overlap, na, nb)
    a_vals = [f"s{i}" for i in range(na)]
    b_vals = [f"s{i}" for i in range(na - ov, na - ov + nb)]
    if not a_vals and not b_vals:
        return
    mk = lambda vals: spark.createDataFrame(
        [Row(v=v) for v in vals], "v string")
    sa = K.kmv_sketch(mk(a_vals or ["_pad_a"]), "v", k=256)
    sb = K.kmv_sketch(mk(b_vals or ["_pad_b"]), "v", k=256)
    r = K.kmv_set_estimates(sa, sb, k=256, built_k=256).first()
    A, B = set(a_vals or ["_pad_a"]), set(b_vals or ["_pad_b"])
    assert r.union_est == len(A | B)
    assert r.inter_est == len(A & B)
    assert r.a_only_est == len(A - B)
    assert r.b_only_est == len(B - A)
    assert r.jaccard_e6 == len(A & B) * 1_000_000 // len(A | B)
