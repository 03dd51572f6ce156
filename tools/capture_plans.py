#!/usr/bin/env python
"""Capture ``.explain("formatted")`` output for named queries into
``plans/r15/<query>_<tag>.txt`` (the optimization round's before/after
evidence; the judge reads these files instead of running Spark).

    python tools/capture_plans.py --tag before q1 q2 ...
    python tools/capture_plans.py --tag before --headline

Queries that execute side effects on construction (streaming drains,
index builds, peer spawns) run them once here — the capture reflects the
DataFrame each query RETURNS, which is what the bench times.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE_DEFAULT = [
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q5_regional_volume", "tpch_q7_nation_volume",
    "tpch_q8_market_share", "tpch_q9_product_profit",
    "tpch_q10_returned_items", "tpch_q13_customer_distribution",
    "tpch_q16_supplier_part_counts", "tpch_q18_large_volume",
    "tpch_q21_waiting_suppliers", "window_topn_per_customer",
    "rollup_counts", "events_hourly_rollup", "fed_lineitem_q1",
    "fed_lineitem_q1_all_access", "dedup_exact_groups",
    "dedup_minhash_lsh", "dedup_simhash_recall", "dedup_embedding_cosine",
    "text_stats", "text_quality_langid", "text_repetition_gopher",
    "knn_bruteforce_cosine", "knn_ivf_approx", "events_sessionization",
    "asof_join_purchase_click", "range_join_price_bands",
    "streaming_sliding_rollup", "streaming_dedup_ingest",
    "multimodal_features", "text_tfidf_top_terms", "text_pii_scrub",
    "dedup_semantic_clusters", "embedding_quantize_int8",
    "fed_source_pruning", "dedup_duplicated_spans",
    "dedup_contamination_check",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--headline", action="store_true")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args()

    names = list(args.names)
    if args.headline:
        names = HEADLINE_DEFAULT + [n for n in names
                                    if n not in HEADLINE_DEFAULT]
    if not names:
        ap.error("no query names given")

    out_dir = args.out_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)

    from dataweb_spark.queries import queries, register_views
    from dataweb_spark.session import get_spark

    spark = get_spark("capture_plans")
    register_views(spark, args.sf_dir)
    qs = queries()
    for name in names:
        try:
            df = qs[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # capture the failure instead of dying
            plan = f"ERROR capturing plan: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
