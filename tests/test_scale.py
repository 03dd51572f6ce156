"""Scale utilities: salted joins must be value-equal to plain joins; bucketed
tables must join without an exchange on the bucket key."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share key 0 — the classic hot-key shape
    left = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"))
    right = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    return left, right


def test_salted_join_matches_plain(spark, skewed):
    from dataweb_spark.functions.scale import salted_join
    left, right = skewed
    plain = left.join(right, "k").select("k", "v", "w")
    salted = salted_join(left, right, "k", salt=4).select("k", "v", "w")
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark, skewed):
    from dataweb_spark.functions.scale import salted_join
    left, _ = skewed
    right = spark.range(0, 1).select(F.col("id").alias("k"),
                                     F.lit("hit").alias("w"))
    out = salted_join(left, right, "k", salt=4, how="left")
    assert out.count() == left.count()
    assert out.where("w is null").count() == left.where("k != 0").count()


def test_bucketed_join_has_no_shuffle(spark, tmp_path_factory):
    from dataweb_spark.functions.scale import write_bucketed
    d = tmp_path_factory.mktemp("buckets")
    a = spark.range(0, 1000).select(F.col("id").alias("k"),
                                    (F.col("id") * 3).alias("x"))
    b = spark.range(0, 1000).select(F.col("id").alias("k"),
                                    (F.col("id") * 5).alias("y"))
    write_bucketed(a, "bt_a", "k", num_buckets=4, path=str(d / "a"))
    write_bucketed(b, "bt_b", "k", num_buckets=4, path=str(d / "b"))
    joined = spark.table("bt_a").join(spark.table("bt_b"), "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, \
        "bucketed equi-join should not shuffle"
    assert joined.count() == 1000


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    from dataweb_spark.functions.scale import write_partitioned
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .withColumn("ship_month", F.date_format("l_shipdate", "yyyy-MM"))
    out = str(tmp_path / "li_part")
    write_partitioned(li, out, ["ship_month"])

    back = spark.read.parquet(out).where(F.col("ship_month") == "1997-06")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the month filter must land as a partition (directory) filter, not a
    # row-level data filter
    assert "PartitionFilters" in plan
    assert "1997-06" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    expected = li.where(F.col("ship_month") == "1997-06").count()
    assert back.count() == expected and expected > 0


def test_compact_parquet_reduces_files(spark, sf_dir, tmp_path):
    from dataweb_spark.functions.scale import compact_parquet
    import glob

    src = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    path = str(tmp_path / "many_small")
    # simulate a small-file-littered ingest: 64 tiny files
    src.repartition(64).write.parquet(path)
    before = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 64
    n_rows = src.count()

    n_after = compact_parquet(spark, path, target_file_mb=256)
    after = len(glob.glob(f"{path}/*.parquet"))
    assert after == n_after and after < 8
    assert spark.read.parquet(path).count() == n_rows


def test_compact_parquet_refuses_stale_backup(spark, sf_dir, tmp_path):
    """A leftover .compact.bak from a crashed run must abort the swap
    before anything is moved or deleted (r1 ADVICE, scale.py)."""
    from dataweb_spark.functions.scale import compact_parquet
    import os

    import pytest

    src = spark.read.parquet(f"{sf_dir}/region.parquet")
    path = str(tmp_path / "ds")
    src.write.parquet(path)
    os.makedirs(path + ".compact.bak")
    n_rows = src.count()
    with pytest.raises(IOError, match="stale backup"):
        compact_parquet(spark, path, target_file_mb=256)
    # original untouched
    assert spark.read.parquet(path).count() == n_rows


def test_zorder_write_tightens_file_ranges(spark, sf_dir, tmp_path):
    """Z-ordered layout: per-file [min,max] spans for BOTH cluster columns
    must be far tighter than the unsorted layout — what parquet stat-based
    file skipping depends on."""
    from dataweb_spark.functions import scale

    df = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_orderkey", "l_partkey", "l_quantity"))
    plain, zord = str(tmp_path / "plain"), str(tmp_path / "zord")
    df.repartition(8).write.parquet(plain)
    scale.zorder_write(df, zord, ["l_orderkey", "l_partkey"], n_files=8)

    def avg_span(path, col):
        stats = scale.file_stats(spark, path, [col]).collect()
        lo = min(r[f"{col}_min"] for r in stats)
        hi = max(r[f"{col}_max"] for r in stats)
        return sum((r[f"{col}_max"] - r[f"{col}_min"]) / max(hi - lo, 1)
                   for r in stats) / len(stats)

    assert spark.read.parquet(zord).count() == df.count()
    for col in ("l_orderkey", "l_partkey"):
        tight, loose = avg_span(zord, col), avg_span(plain, col)
        assert tight < loose * 0.7, (col, tight, loose)


def test_merge_upsert_insert_update_delete(spark, tmp_path):
    from dataweb_spark.functions.scale import merge_upsert
    path = str(tmp_path / "lake")
    spark.createDataFrame(
        [(i, f"v{i}", "old") for i in range(10)],
        "k long, payload string, tag string").write.parquet(path)
    updates = spark.createDataFrame(
        [(3, "v3-new", "new", False),    # update
         (7, "v7-new", "new", False),    # update
         (42, "v42", "new", False),      # insert
         (5, None, None, True)],         # delete
        "k long, payload string, tag string, _deleted boolean")
    stats = merge_upsert(spark, path, updates, key="k",
                         deleted_col="_deleted")
    assert stats == {"inserted": 1, "updated": 2, "deleted": 1, "total": 10}
    after = {r["k"]: (r["payload"], r["tag"])
             for r in spark.read.parquet(path).collect()}
    assert len(after) == 10
    assert 5 not in after
    assert after[3] == ("v3-new", "new")
    assert after[7] == ("v7-new", "new")
    assert after[42] == ("v42", "new")
    assert after[0] == ("v0", "old")


def test_merge_upsert_without_tombstones(spark, tmp_path):
    from dataweb_spark.functions.scale import merge_upsert
    path = str(tmp_path / "lake2")
    spark.range(5).selectExpr("id as k", "id * 10 as v").write.parquet(path)
    updates = spark.createDataFrame([(4, 99), (5, 50)], "k long, v long")
    stats = merge_upsert(spark, path, updates, key="k")
    assert stats == {"inserted": 1, "updated": 1, "deleted": 0, "total": 6}
    after = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert after[4] == 99 and after[5] == 50 and after[0] == 0


def test_merge_upsert_failed_write_leaves_original(spark, tmp_path):
    """A staged write that fails must leave the base dataset untouched."""
    from dataweb_spark.functions.scale import merge_upsert
    path = str(tmp_path / "lake3")
    spark.range(5).selectExpr("id as k", "id as v").write.parquet(path)
    bad = spark.range(3).selectExpr(
        "id as k", "assert_true(id < 2) as v")  # fails mid-job
    with pytest.raises(Exception):
        merge_upsert(spark, path, bad, key="k")
    assert spark.read.parquet(path).count() == 5


def test_vacuum_lake_reclaims_crash_debris(spark, tmp_path):
    """vacuum_lake removes age-expired .tmp/.bak siblings and _temporary
    job dirs, honors retention for fresh artifacts, refuses to drop a
    .bak while the live path is unreadable, and dry_run deletes
    nothing."""
    import os

    from dataweb_spark.functions.scale import vacuum_lake

    lake = str(tmp_path / "lake")
    spark.range(100).write.parquet(lake)
    # crash debris: a staged rewrite, a swap backup, a Spark job temp dir
    spark.range(5).write.parquet(lake + ".compact.tmp")
    spark.range(5).write.parquet(lake + ".merge.bak")
    os.makedirs(f"{lake}/_temporary/0")

    listed = vacuum_lake(spark, lake, retain_hours=0, dry_run=True)
    assert len(listed) == 3
    assert os.path.exists(lake + ".compact.tmp")      # dry run: intact

    # fresh artifacts survive a retention window
    assert vacuum_lake(spark, lake, retain_hours=1.0) == []
    assert os.path.exists(lake + ".merge.bak")

    removed = vacuum_lake(spark, lake, retain_hours=0)
    assert len(removed) == 3
    assert not os.path.exists(lake + ".compact.tmp")
    assert not os.path.exists(lake + ".merge.bak")
    assert not os.path.exists(f"{lake}/_temporary")
    assert spark.read.parquet(lake).count() == 100    # live data untouched

    # a .bak guarding a BROKEN live path is recovery data — kept
    broken = str(tmp_path / "broken")
    spark.range(10).write.parquet(broken + ".merge.bak")
    os.makedirs(broken)
    open(f"{broken}/not_parquet", "w").write("junk")
    kept = vacuum_lake(spark, broken, retain_hours=0)
    assert os.path.exists(broken + ".merge.bak")
    assert broken + ".merge.bak" not in kept

    import pytest as _pytest
    with _pytest.raises(ValueError, match="no lake"):
        vacuum_lake(spark, str(tmp_path / "missing"), retain_hours=0)
