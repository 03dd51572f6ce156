"""Dataset-assembly operators (functions/splits.py): leakage-safe splits,
deterministic shard export, filter cascades."""

import glob
import os

import pytest
from pyspark.sql import Row, functions as F

from dataweb_spark.functions import splits as S


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


# -- leakage-safe splits ----------------------------------------------------

def test_split_by_content_is_map_only(docs):
    out = S.split_by_content(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "content split must not shuffle"


def test_split_by_content_exact_dups_never_straddle(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i % 7}") for i in range(70)])
    out = S.split_by_content(df)
    per_text = (out.groupBy("text")
                   .agg(F.countDistinct("split").alias("ns")).collect())
    assert all(r.ns == 1 for r in per_text)


def test_split_by_content_weights_roughly_hold(docs):
    out = S.split_by_content(
        docs, weights={"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert total == docs.count()
    assert counts["train"] / total == pytest.approx(0.8, abs=0.1)
    # deterministic: a second run assigns identically
    again = {r.split: r.n for r in
             S.split_by_content(docs).groupBy("split")
              .agg(F.count("*").alias("n")).collect()}
    assert counts == again


def test_split_by_cluster_keeps_members_together(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"unique text {i}") for i in range(40)])
    # two near-dup clusters: {0..9} rep 0, {10..19} rep 10
    clusters = spark.createDataFrame(
        [Row(doc_id=i, cluster_rep=(0 if i < 10 else 10))
         for i in range(20)])
    out = S.split_by_cluster(df, clusters)
    rows = {r.doc_id: r.split for r in out.collect()}
    assert len(rows) == 40
    assert len({rows[i] for i in range(10)}) == 1
    assert len({rows[i] for i in range(10, 20)}) == 1
    assert "cluster_rep" not in out.columns


def test_split_expr_rejects_empty_weights(docs):
    with pytest.raises(ValueError):
        S.split_by_content(docs, weights={})


# -- shard export -----------------------------------------------------------

def test_assign_shards_bounds(docs):
    out = S.assign_shards(docs, "doc_id", 8)
    agg = out.agg(F.min("shard"), F.max("shard"),
                  F.countDistinct("shard")).first()
    assert agg[0] >= 0 and agg[1] <= 7 and agg[2] == 8


def test_write_shards_one_sorted_file_per_shard(docs, spark, tmp_path):
    path = str(tmp_path / "shards")
    S.write_shards(docs.limit(200), path, "doc_id", 4)
    for k in range(4):
        files = glob.glob(os.path.join(path, f"shard={k}", "*.parquet"))
        assert len(files) == 1, f"shard {k}: expected exactly one file"
    # within-shard order is the md5 order hash
    back = spark.read.parquet(path)
    one = (back.where(F.col("shard") == 0)
               .withColumn("ok", F.md5(F.col("doc_id").cast("string")))
               .select("ok").collect())
    vals = [r.ok for r in one]
    assert vals == sorted(vals)


def test_shard_manifest_covers_corpus(docs):
    man = S.shard_manifest(docs, "doc_id", 8)
    rows = man.collect()
    assert [r.shard for r in rows] == list(range(8))
    assert sum(r.n_docs for r in rows) == docs.count()
    assert all(r.first_key <= r.last_key for r in rows)


# -- filter cascade ---------------------------------------------------------

def test_filter_cascade_first_failure_attribution(spark):
    from dataweb_spark.functions import text as T
    df = spark.createDataFrame([
        Row(doc_id=0, text="short"),                      # fails both rules
        Row(doc_id=1, text="one two three four five"),    # passes min, no '!'
        Row(doc_id=2, text="a b c d e f!"),               # passes both
        Row(doc_id=3, text=None),                         # null → first rule
    ])
    rules = [
        ("too_short", T.token_count("text") >= 5),
        ("no_bang", F.col("text").contains("!")),
    ]
    out = {r.doc_id: r.rejected_by
           for r in S.filter_cascade(df, rules).collect()}
    assert out == {0: "too_short", 1: "no_bang", 2: None, 3: "too_short"}


def test_cascade_stats_sum_to_corpus(docs):
    from dataweb_spark.functions import text as T
    rules = [("too_short", T.token_count("text") >= 20),
             ("punct_heavy", T.punct_ratio("text") <= 0.15)]
    stats = S.cascade_stats(docs, rules).collect()
    assert sum(r.n_docs for r in stats) == docs.count()
    stages = {r.stage for r in stats}
    assert stages <= {"too_short", "punct_heavy", "kept"}


def test_filter_cascade_single_projection_no_shuffle(docs):
    from dataweb_spark.functions import text as T
    rules = [("too_short", T.token_count("text") >= 20),
             ("punct_heavy", T.punct_ratio("text") <= 0.15)]
    out = S.filter_cascade(docs, rules)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# -- epoch upsampling -------------------------------------------------------

def test_upsample_epochs_counts(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, lang=("en" if i < 100 else "fr"))
         for i in range(200)])
    up = S.upsample_epochs(df, "doc_id", "lang", {"en": 2.0, "fr": 0.0})
    counts = {r.lang: r.n for r in
              up.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 200}  # fr dropped, en exactly doubled
    epochs = {r.epoch for r in up.select("epoch").distinct().collect()}
    assert epochs == {1, 2}


def test_upsample_epochs_fractional_is_deterministic_slice(spark):
    df = spark.createDataFrame([Row(doc_id=i, lang="en")
                                for i in range(1000)])
    up = S.upsample_epochs(df, "doc_id", "lang", {"en": 1.5})
    n = up.count()
    # every doc once + a ~50% hash slice twice
    assert 1000 < n < 2000
    assert abs(n - 1500) < 100
    # the extra copies are the same docs on every run
    again = S.upsample_epochs(df, "doc_id", "lang", {"en": 1.5})
    ids = sorted(r.doc_id for r in up.where(F.col("epoch") == 2).collect())
    ids2 = sorted(r.doc_id for r in
                  again.where(F.col("epoch") == 2).collect())
    assert ids == ids2 and len(ids) == n - 1000


def test_upsample_epochs_is_map_only(spark, sf_dir):
    import os
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    up = S.upsample_epochs(docs, "doc_id", "lang", {"en": 2.5})
    plan = up._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_upsample_epochs_rejects_negative(spark, sf_dir):
    import os
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    with pytest.raises(ValueError):
        S.upsample_epochs(docs, "doc_id", "lang", {"en": -1.0})


def test_split_assignment_invariant_under_partitioning(docs):
    """The split/shard decisions are pure row functions — physical layout
    (partition count, row order) cannot change membership."""
    base = {r.doc_id: r.split for r in
            S.split_by_content(docs).select("doc_id", "split").collect()}
    repart = {r.doc_id: r.split for r in
              S.split_by_content(docs.repartition(7))
               .select("doc_id", "split").collect()}
    assert base == repart
    m1 = [(r.shard, r.n_docs) for r in
          S.shard_manifest(docs, "doc_id", 8).collect()]
    m2 = [(r.shard, r.n_docs) for r in
          S.shard_manifest(docs.repartition(5), "doc_id", 8).collect()]
    assert m1 == m2


def test_cascade_and_split_work_in_streaming(spark, sf_dir, tmp_path):
    """The assembly ops are stateless row functions, so the SAME code runs
    under Structured Streaming: an availableNow drain over the documents
    file stream produces exactly the batch assignment."""
    from dataweb_spark.functions import text as T
    from dataweb_spark.streaming.events import run_available_now

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (spark.readStream.schema(schema).format("parquet")
              .option("pathGlobFilter", "documents.parquet")
              .load(sf_dir))
    assert stream.isStreaming
    rules = [("too_short", T.token_count("text") >= 20)]

    def assemble(df):
        return (S.split_by_content(S.filter_cascade(df, rules))
                 .select("doc_id", "rejected_by", "split"))

    out = run_available_now(assemble(stream), str(tmp_path / "cp_asm"))
    got = {(r.doc_id, r.rejected_by, r.split) for r in out.collect()}
    batch = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exp = {(r.doc_id, r.rejected_by, r.split)
           for r in assemble(batch).collect()}
    assert got == exp and len(got) == batch.count()


def test_assign_shards_large_count_path(docs):
    """>256 shards: xxhash64 path — uniform-ish, bounded, deterministic."""
    out = S.assign_shards(docs, "doc_id", 1000)
    agg = out.agg(F.min("shard"), F.max("shard")).first()
    assert agg[0] >= 0 and agg[1] <= 999
    a = {r.doc_id: r.shard for r in
         out.select("doc_id", "shard").collect()}
    b = {r.doc_id: r.shard for r in
         S.assign_shards(docs.repartition(3), "doc_id", 1000)
          .select("doc_id", "shard").collect()}
    assert a == b


# -- token-budget selection -------------------------------------------------

def test_select_token_budget_greedy_prefix(spark):
    rows = [Row(doc_id=i, text="w " * 100, quality=q)
            for i, q in enumerate([0.9, 0.9, 0.5, 0.5, 0.1])]
    df = spark.createDataFrame(rows)
    # 100 tokens/doc; budget 250 → the two 0.9-bucket docs (200 tokens);
    # doc 2 would overflow to 300
    kept = sorted(r.doc_id for r in
                  S.select_token_budget(df, 250).collect())
    assert kept == [0, 1]
    # budget 300 → exactly one 0.5-bucket doc joins, in doc_id order
    kept = sorted(r.doc_id for r in
                  S.select_token_budget(df, 300).collect())
    assert kept == [0, 1, 2]
    # budget covers everything → whole corpus
    assert S.select_token_budget(df, 10_000).count() == 5
    # budget smaller than the best doc → nothing
    assert S.select_token_budget(df, 50).count() == 0


def test_select_token_budget_is_deterministic(docs):
    from dataweb_spark.functions import text as T
    q = docs.withColumn("quality", T.quality_score("text"))
    a = sorted(r.doc_id for r in S.select_token_budget(q, 5000).collect())
    b = sorted(r.doc_id for r in
               S.select_token_budget(q.repartition(7), 5000).collect())
    assert a == b and len(a) > 0


# -- temperature mixture sampling -------------------------------------------

def test_temperature_mixture_quotas_exact_and_flattened(spark):
    import math
    rows = [Row(doc_id=i, lang=("big" if i < 900 else
                                "mid" if i < 990 else "small"))
            for i in range(1000)]
    df = spark.createDataFrame(rows)
    sel = S.temperature_mixture(df, "lang", 100, alpha=0.5)
    by = {r.lang: r.n for r in
          sel.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # quotas sum to the budget exactly (largest-remainder apportionment)
    assert sum(by.values()) == 100
    # integer-exact expected quotas, replayed in plain Python
    w = {"big": round(math.sqrt(900) * 1e6),
         "mid": round(math.sqrt(90) * 1e6),
         "small": round(math.sqrt(10) * 1e6)}
    W = sum(w.values())
    base = {k: (100 * v) // W for k, v in w.items()}
    rem = {k: (100 * v) % W for k, v in w.items()}
    leftover = 100 - sum(base.values())
    for k in sorted(rem, key=lambda k: (-rem[k], k))[:leftover]:
        base[k] += 1
    assert by == base
    # alpha flattens: small stratum gets far more than its 1% raw share
    assert by["small"] >= 5 and by["big"] <= 75


def test_temperature_mixture_deterministic_and_capped(spark):
    rows = [Row(doc_id=i, lang=("a" if i % 10 else "b"))
            for i in range(200)]          # a: 180 docs, b: 20 docs
    df = spark.createDataFrame(rows)
    # budget big enough that b's quota exceeds its size → capped at 20,
    # never silently reassigned (total may fall short of the budget)
    sel = S.temperature_mixture(df, "lang", 190, alpha=0.5)
    by = {r.lang: r.n for r in
          sel.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by["b"] == 20 and by["a"] <= 180
    # same kept SET under a different partitioning (hash order, not
    # partition order)
    k1 = sorted(r.doc_id for r in sel.select("doc_id").collect())
    k2 = sorted(r.doc_id for r in
                S.temperature_mixture(df.repartition(7), "lang", 190,
                                      alpha=0.5)
                .select("doc_id").collect())
    assert k1 == k2


def test_temperature_mixture_alpha_one_is_proportional(spark):
    rows = [Row(doc_id=i, lang=("x" if i < 750 else "y"))
            for i in range(1000)]
    df = spark.createDataFrame(rows)
    by = {r.lang: r.n for r in
          S.temperature_mixture(df, "lang", 100, alpha=1.0)
          .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by == {"x": 75, "y": 25}


# -- sequence packing -------------------------------------------------------

def _tok(s):
    s = s.strip()
    return s.split() if s else []


def test_pack_sequences_conserves_tokens_and_fills(docs):
    sub = docs.where("doc_id < 120")
    packed = S.pack_sequences(sub, seq_len=32, n_shards=4).collect()
    n_docs, total_doc_tokens = (
        sub.agg(F.count("*"), F.sum(F.size(F.split(F.trim("text"), r"\s+")))
                ).first())
    # every token + one <eos> per doc lands in exactly one sequence
    # (F.split on empty trimmed text yields [''], matching tokens()=[]+eos=1)
    rows = {(r.shard, r.seq_id): r for r in packed}
    assert sum(r.n_tokens for r in packed) >= n_docs  # eos per doc present
    for (shard, seq_id), r in rows.items():
        assert len(r.seq_text.split(" ")) == r.n_tokens
        assert r.is_full == (r.n_tokens == 32)
    # per shard: seq_ids contiguous from 0, only the LAST may be partial
    by_shard = {}
    for r in packed:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.seq_id)
        assert [r.seq_id for r in rs] == list(range(len(rs)))
        assert all(r.n_tokens == 32 for r in rs[:-1])


def test_pack_sequences_replays_exact_stream_order(spark):
    import hashlib
    rows = [Row(doc_id=i, text=f"w{i}a w{i}b w{i}c"[: 3 + 4 * (i % 3)])
            for i in range(17)]
    df = spark.createDataFrame(rows)
    packed = S.pack_sequences(df, seq_len=5, n_shards=2).collect()
    # reference stream: md5-bucket shard, md5 order within shard
    hexd = "0123456789abcdef"
    streams = {0: [], 1: []}
    for r in sorted(rows, key=lambda r: (hashlib.md5(
            str(r.doc_id).encode()).hexdigest(), r.doc_id)):
        h = hashlib.md5(str(r.doc_id).encode()).hexdigest()
        shard = ((hexd.index(h[0]) * 16) + hexd.index(h[1])) % 2
        streams[shard].extend(_tok(r.text) + ["<eos>"])
    for shard, stream in streams.items():
        got = [t for r in sorted((p for p in packed if p.shard == shard),
                                 key=lambda p: p.seq_id)
               for t in r.seq_text.split(" ")]
        assert got == stream


def test_pack_sequences_drop_partial_and_validation(spark):
    df = spark.createDataFrame([Row(doc_id=i, text="a b c") for i in range(8)])
    full = S.pack_sequences(df, seq_len=4, keep_partial=True)
    only_full = S.pack_sequences(df, seq_len=4, keep_partial=False)
    # 8 docs x 4 tokens(incl eos) = 32 = exactly 8 full sequences
    assert full.count() == only_full.count() == 8
    with pytest.raises(ValueError):
        S.pack_sequences(df, seq_len=0)
    with pytest.raises(ValueError):
        S.pack_sequences(df, eos="two words")


def test_pack_sequences_single_exchange(docs):
    import re
    packed = S.pack_sequences(docs.where("doc_id < 60"),
                              seq_len=64, n_shards=4)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    # the window's shuffle is the only one: the groupBy(shard, seq_id)
    # reuses HashPartitioning(shard)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_pack_sequences_matches_duckdb_replay(spark, sf_dir):
    """The exact layout is SQL-replayable (the future r12 oracle shape)."""
    import duckdb
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')")
    hexlist = "['" + "','".join("0123456789abcdef") + "']"
    want = con.execute(f"""
with docs as (select doc_id, text from documents where doc_id < 90),
tk as (
  select doc_id, md5(cast(doc_id as varchar)) as ord,
         ((list_position({hexlist},
             substr(md5(cast(doc_id as varchar)), 1, 1)) - 1) * 16
          + (list_position({hexlist},
             substr(md5(cast(doc_id as varchar)), 2, 1)) - 1)) % 3 as shard,
         list_append(case when length(trim(text)) = 0 then []::varchar[]
              else string_split_regex(trim(text), '\\s+') end, '<eos>') as t
  from docs),
off as (
  select *, sum(len(t)) over (partition by shard order by ord, doc_id
       rows between unbounded preceding and current row) - len(t) as off0
  from tk),
ex as (
  select shard, doc_id, off0 + u - 1 as pos, t[u] as tok
  from (select shard, doc_id, off0, t,
               unnest(range(1, len(t) + 1)) as u from off)),
g as (
  select shard, cast(floor(pos / 48) as bigint) as seq_id,
         pos % 48 as pis, tok, doc_id from ex)
select shard, seq_id,
       string_agg(tok, ' ' order by pis) as seq_text,
       count(*) as n_tokens,
       count(distinct doc_id) as n_docs,
       count(*) = 48 as is_full
from g group by shard, seq_id
order by shard, seq_id
""").fetchall()
    docs90 = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).where("doc_id < 90")
    got = [tuple(r) for r in
           S.pack_sequences(docs90, seq_len=48, n_shards=3)
            .orderBy("shard", "seq_id").collect()]
    assert got == [tuple(r) for r in want]


# -- best-fit document packing ----------------------------------------------

def test_best_fit_hand_case_exact(spark):
    # sizes 5,4,3,2,1 into capacity 8: BFD -> b0=[5,3], b1=[4,2,1]
    rows = [Row(doc_id=i, text=" ".join(f"t{j}" for j in range(n)))
            for i, n in enumerate([5, 4, 3, 2, 1])]
    got = {(r.doc_id, r.piece_idx): (r.bin_id, r.bin_offset, r.piece_tokens)
           for r in S.pack_documents_best_fit(
               spark.createDataFrame(rows), seq_len=8).collect()}
    assert got == {(0, 0): (0, 0, 5), (2, 0): (0, 5, 3),
                   (1, 0): (1, 0, 4), (3, 0): (1, 4, 2), (4, 0): (1, 6, 1)}


def test_best_fit_oversize_docs_split_not_truncated(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join(f"t{j}" for j in range(20))),
         Row(doc_id=2, text=""), Row(doc_id=3, text="   "),
         Row(doc_id=4, text=None)])
    out = S.pack_documents_best_fit(df, seq_len=8).collect()
    # 20 = 8+8+4; empty/whitespace/NULL docs emit nothing
    assert sorted((r.piece_idx, r.piece_tokens) for r in out) == \
        [(0, 8), (1, 8), (2, 4)]
    assert all(r.doc_id == 1 for r in out)


def test_best_fit_preserves_string_key_type(spark):
    df = spark.createDataFrame(
        [Row(url=f"https://ex.com/{i}", text="a b c") for i in range(6)])
    out = S.pack_documents_best_fit(df, key_col="url", seq_len=8)
    assert dict(out.dtypes)["url"] == "string"
    rows = out.collect()
    assert {r.url for r in rows} == {f"https://ex.com/{i}" for i in range(6)}


def test_pack_sequences_null_text_contributes_eos(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text="a b"), Row(doc_id=1, text=None),
         Row(doc_id=2, text="")])
    packed = S.pack_sequences(df, seq_len=4).collect()
    # 2 tokens + 3 eos markers = 5 stream elements: NULL and empty both
    # contribute exactly their eos (no silent document drop)
    assert sum(r.n_tokens for r in packed) == 5
    assert " ".join(r.seq_text for r in
                    sorted(packed, key=lambda r: r.seq_id)).count("<eos>") == 3


def test_best_fit_capacity_offsets_and_fill_bound(docs):
    out = S.pack_documents_best_fit(docs.where("doc_id < 300"),
                                    seq_len=64, n_shards=4).collect()
    bins = {}
    for r in out:
        assert 0 < r.piece_tokens <= 64
        bins.setdefault((r.shard, r.bin_id), []).append(r)
    for (shard, b), rs in bins.items():
        rs.sort(key=lambda r: r.bin_offset)
        load = 0
        for r in rs:                      # offsets contiguous in fill order
            assert r.bin_offset == load
            load += r.piece_tokens
        assert load <= 64
    # best-fit invariant: at most ONE bin per shard at <= half capacity
    for shard in {s for s, _ in bins}:
        small = [b for (s, b), rs in bins.items() if s == shard
                 and sum(r.piece_tokens for r in rs) <= 32]
        assert len(small) <= 1, (shard, small)
    # piece sizes per doc sum to the doc's token count
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, 0)
        per_doc[r.doc_id] += r.piece_tokens
    want = {r.doc_id: r.n for r in
            docs.where("doc_id < 300")
                .select("doc_id",
                        F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
                .where("length(trim(text)) > 0").collect()}
    assert per_doc == want


def test_best_fit_deterministic_under_partitioning(docs):
    sub = docs.where("doc_id < 200")
    a = {(r.shard, r.doc_id, r.piece_idx): (r.bin_id, r.bin_offset)
         for r in S.pack_documents_best_fit(sub, seq_len=96,
                                            n_shards=3).collect()}
    b = {(r.shard, r.doc_id, r.piece_idx): (r.bin_id, r.bin_offset)
         for r in S.pack_documents_best_fit(sub.repartition(7), seq_len=96,
                                            n_shards=3).collect()}
    assert a == b and len(a) > 0


def test_best_fit_single_exchange_narrow_group(docs):
    import re
    out = S.pack_documents_best_fit(docs.where("doc_id < 50"),
                                    seq_len=64, n_shards=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    with pytest.raises(ValueError):
        S.pack_documents_best_fit(docs, seq_len=0)


def test_pack_sequence_spans_tile_packed_rows_exactly(docs):
    sub = docs.where("doc_id < 150")
    packed = {(r.shard, r.seq_id): r for r in
              S.pack_sequences(sub, seq_len=40, n_shards=3).collect()}
    spans = S.pack_sequence_spans(sub, seq_len=40, n_shards=3).collect()
    by_seq = {}
    for r in spans:
        by_seq.setdefault((r.shard, r.seq_id), []).append(r)
    assert set(by_seq) == set(packed)
    for key, rs in by_seq.items():
        rs.sort(key=lambda r: r.span_start)
        # spans tile the row: contiguous starts, lengths sum to n_tokens
        cursor = 0
        for r in rs:
            assert r.span_start == cursor and r.span_len > 0
            cursor += r.span_len
        assert cursor == packed[key].n_tokens
        # one span per contributing doc
        assert len(rs) == packed[key].n_docs


def test_pack_sequence_spans_straddling_doc_appears_per_sequence(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join(f"t{j}" for j in range(9)))])
    spans = sorted(S.pack_sequence_spans(df, seq_len=4).collect(),
                   key=lambda r: r.seq_id)
    # 10 stream elements (9 + eos) over seq_len 4 -> seqs 0,1,2
    assert [(r.seq_id, r.span_start, r.span_len) for r in spans] == \
        [(0, 0, 4), (1, 0, 4), (2, 0, 2)]


def test_pack_sequence_spans_single_exchange(docs):
    import re
    out = S.pack_sequence_spans(docs.where("doc_id < 50"),
                                seq_len=64, n_shards=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_pack_sequence_spans_keep_partial_false_aligns(docs):
    sub = docs.where("doc_id < 150")
    packed = {(r.shard, r.seq_id) for r in
              S.pack_sequences(sub, seq_len=40, n_shards=3,
                               keep_partial=False).collect()}
    spans = {(r.shard, r.seq_id) for r in
             S.pack_sequence_spans(sub, seq_len=40, n_shards=3,
                                   keep_partial=False).collect()}
    assert spans == packed  # no orphan span rows for dropped partials


# -- corpus drift -----------------------------------------------------------

def test_corpus_drift_report_statuses_and_shares(spark):
    old = spark.createDataFrame(
        [Row(doc_id=i, lang=("en" if i < 80 else "fr"), text="a b c")
         for i in range(100)])
    # new snapshot: fr gone, de new, en unchanged share-wise, zh tiny
    new = spark.createDataFrame(
        [Row(doc_id=i,
             lang=("en" if i < 80 else ("de" if i < 99 else "zh")),
             text="a b c d")
         for i in range(100)])
    rows = {r.stratum: r for r in
            S.corpus_drift_report(old, new).collect()}
    assert rows["fr"].status == "gone" and rows["fr"].docs_new == 0
    # NULL strata in BOTH snapshots stay ONE row (null-safe grouping),
    # and NULL text counts 0 tokens, 1 doc
    from pyspark.sql import SparkSession
    sp = SparkSession.getActiveSession()
    sch = "doc_id long, lang string, text string"
    nr = {r.stratum: r for r in S.corpus_drift_report(
        sp.createDataFrame([(0, None, None)], sch),
        sp.createDataFrame([(0, None, "x y")], sch),
        ).collect()}
    assert set(nr) == {"(null)"}
    assert nr["(null)"].status == "stable"
    assert nr["(null)"].toks_old == 0 and nr["(null)"].toks_new == 2
    assert rows["de"].status == "new" and rows["de"].docs_old == 0
    assert rows["en"].status == "stable"
    assert rows["en"].share_old_e6 == rows["en"].share_new_e6 == 800_000
    assert rows["zh"].share_new_e6 == 10_000
    # token sums follow each snapshot's text
    assert rows["en"].toks_old == 80 * 3 and rows["en"].toks_new == 80 * 4


def test_corpus_drift_matches_duckdb_replay(docs, spark, sf_dir):
    """Future r12 oracle shape: drift between two deterministic halves."""
    import duckdb
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')")
    want = {r[0]: tuple(r[1:]) for r in con.execute(r"""
with old as (select * from documents where doc_id % 2 = 0),
new as (select * from documents where doc_id % 3 = 0),
o as (select lang as stratum, count(*) as docs_old,
             sum(case when length(trim(text)) = 0 then 0
                 else len(string_split_regex(trim(text), '\s+')) end)
               as toks_old
      from old group by lang),
n as (select lang as stratum, count(*) as docs_new,
             sum(case when length(trim(text)) = 0 then 0
                 else len(string_split_regex(trim(text), '\s+')) end)
               as toks_new
      from new group by lang),
j as (select coalesce(o.stratum, n.stratum) as stratum,
             coalesce(docs_old, 0) as docs_old,
             coalesce(docs_new, 0) as docs_new,
             coalesce(toks_old, 0) as toks_old,
             coalesce(toks_new, 0) as toks_new
      from o full outer join n on o.stratum = n.stratum),
t as (select *, (select sum(docs_old) from j) as _to,
             (select sum(docs_new) from j) as _tn from j)
select stratum, docs_old, docs_new, toks_old, toks_new,
       docs_old * 1000000 // greatest(_to, 1) as share_old_e6,
       docs_new * 1000000 // greatest(_tn, 1) as share_new_e6,
       docs_new * 1000000 // greatest(_tn, 1)
         - docs_old * 1000000 // greatest(_to, 1) as delta_e6,
       case when docs_old = 0 then 'new'
            when docs_new = 0 then 'gone'
            when docs_new * 1000000 // greatest(_tn, 1)
                 - docs_old * 1000000 // greatest(_to, 1) > 1000
              then 'grew'
            when docs_new * 1000000 // greatest(_tn, 1)
                 - docs_old * 1000000 // greatest(_to, 1) < -1000
              then 'shrank'
            else 'stable' end as status
from t order by stratum
""").fetchall()}
    got = {r.stratum: tuple(r)[1:] for r in
           S.corpus_drift_report(docs.where("doc_id % 2 = 0"),
                                 docs.where("doc_id % 3 = 0")).collect()}
    assert got == want and len(want) >= 3
