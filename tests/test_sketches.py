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


# -- quantile sketch (r12 tail) ----------------------------------------------

def test_quantile_sketch_exact_below_k_matches_percentile_disc(docs):
    """k above every group's row count → the sample IS the group and
    each q-column equals exact percentile_disc."""
    got = {r.lang: (r.n_sample, r.q25, r.q50, r.q75, r.q95) for r in
           K.quantile_sketch(docs, "n_chars", "doc_id", ["lang"],
                             k=100_000).collect()}
    want = {}
    for r in (docs.groupBy("lang")
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.sort_array(F.collect_list("n_chars")).alias("sv"))
                  .collect()):
        sv = list(r.sv)
        def disc(p, sv=sv):
            import math
            return sv[max(1, math.ceil(p * len(sv))) - 1]
        want[r.lang] = (r.n, disc(.25), disc(.5), disc(.75), disc(.95))
    assert got == want and len(got) > 1


def test_quantile_sketch_estimates_above_k(docs):
    """Saturated sketch: sample quantiles track the truth (median of a
    256-sample lies within a loose rank band of the true median)."""
    true_med = docs.agg(F.expr(
        "percentile_approx(n_chars, 0.5, 100000)")).first()[0]
    est = K.quantile_sketch(docs, "n_chars", "doc_id", k=64).first().q50
    lo, hi = (docs.agg(F.expr("percentile_approx(n_chars, 0.2, 100000)"),
                       F.expr("percentile_approx(n_chars, 0.8, 100000)"))
                  .first())
    assert lo <= est <= hi, (est, true_med, lo, hi)


def test_quantile_sketch_merge_of_partials_equals_whole(docs):
    parts = None
    for i in range(3):
        s = K.quantile_sketch(docs.where(f"doc_id % 3 = {i}"),
                              "n_chars", "doc_id", ["lang"], k=32)
        parts = s if parts is None else parts.unionByName(s)
    def norm(rows):
        return sorted((r.lang, tuple(r.qs_h), tuple(r.qs_v), r.n_sample,
                       r.k, r.q25, r.q50, r.q75, r.q95) for r in rows)
    merged = norm(K.quantile_sketch_merge(parts, ["lang"], k=32,
                                          built_k=32).collect())
    whole = norm(K.quantile_sketch(docs, "n_chars", "doc_id", ["lang"],
                                   k=32).collect())
    assert merged == whole and len(whole) > 1


def test_quantile_sketch_partitioning_and_local_combine_invariant(docs):
    def norm(rows):
        return sorted((r.lang, tuple(r.qs_h), tuple(r.qs_v), r.q50)
                      for r in rows)
    a = norm(K.quantile_sketch(docs, "n_chars", "doc_id", ["lang"],
                               k=16).collect())
    b = norm(K.quantile_sketch(docs.repartition(13), "n_chars", "doc_id",
                               ["lang"], k=16).collect())
    c = norm(K.quantile_sketch(docs, "n_chars", "doc_id", ["lang"], k=16,
                               local_combine=False).collect())
    assert a == b == c


def test_quantile_sketch_guards(docs, spark):
    with pytest.raises(ValueError, match="k must be >= 2"):
        K.quantile_sketch(docs, "n_chars", "doc_id", k=1)
    with pytest.raises(ValueError, match="resolution"):
        K.quantile_sketch(docs, "n_chars", "doc_id", probs=(0.00001,))
    with pytest.raises(ValueError, match="duplicate probs"):
        K.quantile_sketch(docs, "n_chars", "doc_id", probs=(0.5, 0.5))
    small = K.quantile_sketch(docs, "n_chars", "doc_id", ["lang"], k=8)
    with pytest.raises(ValueError, match="built with k=8"):
        K.quantile_sketch_merge(small, ["lang"], k=16)
    with pytest.raises(ValueError, match="no 'k' column"):
        K.quantile_sketch_merge(small.drop("k"), ["lang"], k=8)
    # merging DOWN equals a direct smaller-k sketch
    down = {r.lang: (tuple(r.qs_h), tuple(r.qs_v)) for r in
            K.quantile_sketch_merge(small, ["lang"], k=4,
                                    built_k=8).collect()}
    direct = {r.lang: (tuple(r.qs_h), tuple(r.qs_v)) for r in
              K.quantile_sketch(docs, "n_chars", "doc_id", ["lang"],
                                k=4).collect()}
    assert down == direct
    # a LYING built_k still errors at execution time (in-plan guard)
    from pyspark.errors import PySparkException
    with pytest.raises(PySparkException, match="cannot serve k=16"):
        K.quantile_sketch_merge(small, ["lang"], k=16,
                                built_k=16).collect()


def test_quantile_sketch_null_values_dropped(spark):
    df = spark.createDataFrame(
        [Row(id=i, v=None if i % 2 else i) for i in range(10)])
    r = K.quantile_sketch(df, "v", "id", k=64).first()
    assert r.n_sample == 5 and r.q50 == 4  # values 0,2,4,6,8


def test_quantile_sketch_matches_duckdb_replay(docs, sf_dir):
    """Full grouped replay — the r13 oracle shape: pair hash, rank,
    aligned arrays, integer-exact percentile_disc ranks."""
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')")
    want = {r[0]: (list(r[1]), list(r[2]), r[3], r[4], r[5], r[6]) for r
            in con.execute("""
with pairs as (
  select distinct lang,
         ('0x' || substr(md5(cast(doc_id as varchar) || chr(31) ||
                             cast(n_chars as varchar)), 1, 12))::bigint
           as h,
         n_chars as v
  from documents where n_chars is not null),
rk as (
  select lang, h, v,
         row_number() over (partition by lang order by h, v) as rk
  from pairs),
kept as (select * from rk where rk <= 16),
agg as (
  select lang, list(h order by h, v) as qs_h,
         list(v order by h, v) as qs_v,
         list(v order by v) as sv, count(*) as n_sample
  from kept group by lang)
select lang, qs_h, qs_v, n_sample,
       sv[greatest(1, (2500 * n_sample + 9999) // 10000)] as q25,
       sv[greatest(1, (5000 * n_sample + 9999) // 10000)] as q50,
       sv[greatest(1, (9500 * n_sample + 9999) // 10000)] as q95
from agg order by lang
""").fetchall()}
    got = {r.lang: (list(r.qs_h), list(r.qs_v), r.n_sample,
                    r.q25, r.q50, r.q95) for r in
           K.quantile_sketch(docs, "n_chars", "doc_id", ["lang"], k=16,
                             probs=(0.25, 0.5, 0.95)).collect()}
    assert got == want


def test_quantile_sketch_two_exchanges_only(docs):
    out = K.quantile_sketch(docs, "n_chars", "doc_id", ["lang"], k=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # distinct (group, h, v) + the rank window's group repartition; the
    # final groupBy reuses the window's partitioning
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2, plan


# -- sampled vocabulary statistics (r12 tail) ---------------------------------

def test_sampled_postings_counts_are_exact(docs):
    """Every sampled type's count equals the true full count."""
    true_counts = {(r.lang, r.token): r.n for r in
                   (docs.select("lang", F.explode(F.split("text", r"\s+"))
                                .alias("token"))
                        .where("token <> ''")
                        .groupBy("lang", "token")
                        .agg(F.count(F.lit(1)).alias("n"))).collect()}
    sampled = K.sampled_token_postings(docs, "text", ["lang"],
                                       m=4).collect()
    assert len(sampled) > 10
    for r in sampled:
        assert true_counts[(r.lang, r.token)] == r.n
    # the slice is deterministic: same hash space on any engine
    thr = (1 << 48) // 4
    con = duckdb.connect()
    for r in sampled[:20]:
        h = con.execute(
            "select ('0x' || substr(md5(?), 1, 12))::bigint",
            [r.token]).fetchone()[0]
        assert h < thr


def test_sampled_postings_merge_by_summation(docs):
    whole = {(r.lang, r.token): r.n for r in
             K.sampled_token_postings(docs, "text", ["lang"],
                                      m=4).collect()}
    a = K.sampled_token_postings(docs.where("doc_id % 2 = 0"), "text",
                                 ["lang"], m=4)
    b = K.sampled_token_postings(docs.where("doc_id % 2 = 1"), "text",
                                 ["lang"], m=4)
    summed = {(r.lang, r.token): r.n for r in
              (a.unionByName(b).groupBy("lang", "token")
                .agg(F.sum("n").alias("n"))).collect()}
    assert summed == whole


def test_vocab_sample_stats_matches_duckdb_replay(docs, sf_dir):
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')")
    thr = (1 << 48) // 8
    want = {r[0]: tuple(r[1:]) for r in con.execute(f"""
with toks as (
  select lang, u.tok from documents,
       unnest(string_split_regex(text, '\\s+')) as u(tok)
  where text is not null),
f as (select lang, tok from toks
      where tok <> ''
        and ('0x' || substr(md5(tok), 1, 12))::bigint < {thr}),
p as (select lang, tok, count(*) as n from f group by 1, 2)
select lang, count(*) as types_sampled, count(*) * 8 as types_est,
       sum(n) as tokens_sampled, sum(n) * 8 as tokens_est,
       sum(case when n = 1 then 1 else 0 end) as hapax_sampled,
       sum(case when n = 1 then 1 else 0 end) * 8 as hapax_est
from p group by lang order by lang
""").fetchall()}
    got = {r.lang: (r.types_sampled, r.types_est, r.tokens_sampled,
                    r.tokens_est, r.hapax_sampled, r.hapax_est) for r in
           K.vocab_sample_stats(docs, "text", ["lang"], m=8).collect()}
    assert got == want and len(got) == 5


def test_vocab_sample_stats_estimates_track_truth(docs):
    """m=2 halves the type space: scale-ups land near the full-shuffle
    truth (synthetic vocab is small, so allow generous sampling error)."""
    truth = {r.lang: (r.types, r.toks) for r in
             (docs.select("lang", F.explode(F.split("text", r"\s+"))
                          .alias("token"))
                  .where("token <> ''")
                  .groupBy("lang")
                  .agg(F.countDistinct("token").alias("types"),
                       F.count(F.lit(1)).alias("toks"))).collect()}
    got = {r.lang: (r.types_est, r.tokens_est) for r in
           K.vocab_sample_stats(docs, "text", ["lang"], m=2).collect()}
    for lang, (t_est, m_est) in got.items():
        types, toks = truth[lang]
        assert abs(t_est - types) / types < 0.8, (lang, t_est, types)
        assert abs(m_est - toks) / toks < 0.8, (lang, m_est, toks)


def test_vocab_sample_stats_m1_is_exact_and_guards(docs, spark):
    """m=1 keeps everything: estimates ARE the exact full statistics."""
    got = {r.lang: (r.types_sampled, r.types_est, r.tokens_sampled)
           for r in K.vocab_sample_stats(docs, "text", ["lang"],
                                         m=1).collect()}
    truth = {r.lang: r.types for r in
             (docs.select("lang", F.explode(F.split("text", r"\s+"))
                          .alias("token"))
                  .where("token <> ''")
                  .groupBy("lang")
                  .agg(F.countDistinct("token").alias("types"))).collect()}
    for lang, (ts, te, _) in got.items():
        assert ts == te == truth[lang]
    with pytest.raises(ValueError, match="m must be >= 1"):
        K.sampled_token_postings(docs, "text", m=0)
    # lowercase folds BEFORE hashing (sampled set changes consistently)
    lc = K.sampled_token_postings(
        spark.createDataFrame([Row(text="Foo foo FOO bar")]),
        "text", m=1, lowercase=True).collect()
    assert {(r.token, r.n) for r in lc} == {("foo", 3), ("bar", 1)}


@_settings(max_examples=10, deadline=None)
@_given(vals=_st.lists(_st.integers(min_value=-1000, max_value=1000),
                       min_size=1, max_size=80),
        k=_st.integers(min_value=2, max_value=12),
        cut=_st.integers(min_value=0, max_value=7))
def test_quantile_sketch_merge_property(spark, vals, k, cut):
    """Property: for ANY value multiset, any k, and any 2-way split,
    merging the split's sketches reproduces the whole-data sketch
    cell-for-cell, and below k the q50 equals exact percentile_disc
    (hypothesis-generated)."""
    import math
    rows = [Row(id=i, v=v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id int, v int")
    a = df.where(f"id % 8 <= {cut}")
    b = df.where(f"id % 8 > {cut}")
    whole = K.quantile_sketch(df, "v", "id", k=k).first()
    parts = K.quantile_sketch(a, "v", "id", k=k).unionByName(
        K.quantile_sketch(b, "v", "id", k=k))
    merged = K.quantile_sketch_merge(parts, k=k, built_k=k).first()
    # a split side may be empty -> merge still reproduces the whole
    assert (list(merged.qs_h), list(merged.qs_v), merged.n_sample,
            merged.q50) == \
        (list(whole.qs_h), list(whole.qs_v), whole.n_sample, whole.q50)
    distinct_pairs = len({(i, v) for i, v in enumerate(vals)})
    if distinct_pairs <= k:
        sv = sorted(vals)
        assert whole.q50 == sv[max(1, math.ceil(0.5 * len(sv))) - 1]


def test_quantile_sketch_null_keys_and_nan_values_excluded(spark):
    """r12 review fix: NULL keys (NULL pair hash — nulls-first on Spark,
    nulls-last on DuckDB) and NaN values (x != x breaks the dedup) are
    excluded from the sample on every path, keeping the partitioning /
    local-combine invariance and the cross-engine replay sound."""
    rows = [Row(id=None if i % 3 == 0 else i,
                v=float("nan") if i % 5 == 0 else float(i))
            for i in range(30)]
    df = spark.createDataFrame(rows, "id int, v double")
    clean_n = len([r for r in rows
                   if r.id is not None and r.v == r.v])
    def norm(d):
        r = d.first()
        return (tuple(r.qs_h), tuple(r.qs_v), r.n_sample, r.q50)
    a = norm(K.quantile_sketch(df, "v", "id", k=64))
    b = norm(K.quantile_sketch(df.repartition(7), "v", "id", k=64,
                               local_combine=False))
    assert a == b
    assert a[2] == clean_n
    assert all(v == v for v in a[1])  # no NaN entered the sample


def test_vocab_sample_stats_global_empty_sample_is_zero(spark):
    """r12 review fix: the group_cols=None face emits ONE row of zeros
    (not NULL sums) when nothing hashes into the 1/m slice."""
    df = spark.createDataFrame([Row(text="alpha beta gamma")])
    # find an m where none of the three tokens is sampled
    import hashlib
    m = 3
    while True:
        thr = (1 << 48) // m
        if all(int(hashlib.md5(t.encode()).hexdigest()[:12], 16) >= thr
               for t in ("alpha", "beta", "gamma")):
            break
        m += 1
    r = K.vocab_sample_stats(df, "text", m=m).first()
    assert tuple(r) == (0, 0, 0, 0, 0, 0)
