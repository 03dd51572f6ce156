#!/usr/bin/env python
"""Synthesize an ~sf1 dataset by replicating sf0.1 10x with key offsets.

VERDICT r6 item 4: every measurement to date is sf0.1; the 100-TB design
claims are plan-audited but a single larger-scale run catches any O(n^2)
surprise the plans hide (candidate-pair blowup in the LSH families, etc.).
The driver testdata tops out at sf0.1 and /root/testdata is read-only, so
this derives a 10x copy under a scratch dir:

* fact/dim tables replicate with per-copy key offsets that PRESERVE the
  foreign-key graph (orders.o_custkey follows customer.c_custkey's offset;
  lineitem follows orders/part/supplier), so join selectivities and
  group-by cardinalities scale the way real TPC-H sf1 does;
* region/nation stay fixed (they are fixed-size in TPC-H at every SF);
* events offsets event_id/user_id and shifts ts by +1h per copy so
  sessionization/windowing sees 10x sessions, not 10 stacked replicas;
* documents perturbs the text of non-first copies with a per-copy suffix
  token so the dedup families see ~sf1 corpus cardinality instead of a
  degenerate 90%-duplicate corpus (copy 0 keeps the original text: the
  planted near/exact-dup structure of the base corpus survives);
* embeddings offsets vec_id and rotates the vector by a per-copy scalar
  multiply on one coordinate (keeps norms ~stable, breaks exact ties).

Usage:  python tools/make_scaled_data.py [--out /tmp/sfdata1] [--copies 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_STRIDE = 10_000_000  # > every base key; one stride per copy


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sfdata1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dataweb_spark.session import get_spark

    spark = get_spark("make_scaled_data", master="local[32]",
                      extra_conf={"spark.sql.shuffle.partitions": "32"})
    os.makedirs(args.out, exist_ok=True)

    def rd(t):
        return spark.read.parquet(os.path.join(args.src, f"{t}.parquet"))

    def wr(df, t, parts):
        (df.repartition(parts)
         .write.mode("overwrite")
         .parquet(os.path.join(args.out, f"{t}.parquet")))
        print(f"  {t}: {df.count()} rows", file=sys.stderr)

    # fixed-size dims: straight copy
    for t in ("region", "nation"):
        wr(rd(t), t, 1)

    def off(col, i):
        return (F.col(col) + F.lit(i * KEY_STRIDE)).alias(col)

    def copies(df, build):
        out = None
        for i in range(args.copies):
            c = build(df, i)
            out = c if out is None else out.unionByName(c)
        return out

    wr(copies(rd("customer"), lambda d, i: d.select(
        off("c_custkey", i), "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")), "customer", 4)
    wr(copies(rd("supplier"), lambda d, i: d.select(
        off("s_suppkey", i), "s_name", "s_nationkey", "s_acctbal")),
       "supplier", 2)
    wr(copies(rd("part"), lambda d, i: d.select(
        off("p_partkey", i), "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")), "part", 4)
    wr(copies(rd("orders"), lambda d, i: d.select(
        off("o_orderkey", i), off("o_custkey", i), "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")), "orders", 8)
    wr(copies(rd("lineitem"), lambda d, i: d.select(
        off("l_orderkey", i), off("l_partkey", i), off("l_suppkey", i),
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")),
       "lineitem", 32)
    wr(copies(rd("events"), lambda d, i: d.select(
        off("event_id", i), (F.col("ts") + F.expr(f"interval {i} hours"))
        .alias("ts"), off("user_id", i), "event_type", "value", "props")),
       "events", 8)
    wr(copies(rd("documents"), lambda d, i: d.select(
        off("doc_id", i),
        (F.col("text") if i == 0 else
         F.concat_ws(" ", F.col("text"),
                     F.concat(F.lit(f"copytoken{i}x"),
                              F.col("doc_id").cast("string")))).alias("text"),
        "lang", "source", "n_chars")), "documents", 8)
    wr(copies(rd("embeddings"), lambda d, i: d.select(
        off("vec_id", i),
        (F.col("embedding") if i == 0 else
         F.transform(
             F.col("embedding"),
             lambda x, j: F.when(j == i % 16, x * (1.0 + 0.01 * i))
                           .otherwise(x))).alias("embedding"),
        "label")), "embeddings", 4)
    spark.stop()


if __name__ == "__main__":
    main()
