"""Benchmark harness — one JSON line on stdout (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` plus the flagship
extraction-throughput job on the deterministic synthetic interleaved
corpus (corpus.py — bit-identical at any parallelism, which is what makes
the two-parallelism scaling evidence in tools/scaling.py valid).

Each query is executed to completion with the ``noop`` sink: full plan
runs (scan → UDF → shuffle → agg), nothing is collected to the driver.

Output: {"metric": ..., "value": <total sec>, "unit": "sec",
         "queries": {name: sec}, "sf": ..., "extract_docs_per_sec": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

N_DOCS_EXTRACT = int(os.environ.get("BENCH_EXTRACT_DOCS", "40000"))


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from ocr_search_spark.session import get_spark

    spark = get_spark("bench", cores=cpus, shuffle_partitions=2 * cpus)

    import __spark_entry__ as entry
    from ocr_search_spark import corpus
    from ocr_search_spark.operators import extract, tokenize

    qs = entry.queries()
    bench_queries = [
        "extract_columnar",
        "extract_pandas",
        "postings",
        "search_topk",
        "term_correlations",
        "delete_cascade",
        "tpch_q1",
        "tpch_q3",
        "tpch_q5",
        "window_top_orders",
        "events_hourly",
        "events_sessionize",
    ]

    # Two estimators per query (VERDICT r1 item 10): BEST of the samples
    # (least-interference estimate given the 2-3x host noise — the number
    # compared against the gate) and the MEDIAN of 5 samples (robust
    # center — the number to compare round-over-round, since the best is
    # a noise-floor estimate that improves with luck).
    #
    # Contention robustness (VERDICT r4 item 2): the r4 driver run showed
    # every headline query ~2x slow while the extended leg got faster —
    # host contention concentrated on the first/cold leg. Counters:
    # (a) samples are taken ROUND-ROBIN across the whole headline list
    #     (pass 1 runs q1..q13, then pass 2, ...), so a contention burst
    #     degrades one sample of many queries instead of all samples of
    #     a few — and the per-query best is taken across well-separated
    #     points in time;
    # (b) 5 passes instead of 3;
    # (c) the 1-minute host load average is recorded before each pass
    #     (headline_loadavg_per_pass) so an inflated record is
    #     distinguishable from a plan regression after the fact.
    import statistics

    def _load1() -> float:
        try:
            return round(os.getloadavg()[0], 2)
        except OSError:
            return -1.0

    n_passes = 5
    samples: dict[str, list[float]] = {name: [] for name in bench_queries}
    pass_loads: list[float] = []
    for _ in range(n_passes):
        pass_loads.append(_load1())
        for name in bench_queries:
            t0 = time.time()
            _noop(qs[name](spark, sf_dir))
            samples[name].append(time.time() - t0)

    times: dict[str, float] = {}
    medians: dict[str, float] = {}
    total = 0.0
    total_med = 0.0
    for name in bench_queries:
        times[name] = round(min(samples[name]), 3)
        medians[name] = round(statistics.median(samples[name]), 3)
        total += times[name]
        total_med += medians[name]

    # Extended section: round-2 operators, single-sample (informational —
    # NOT part of `value`, which stays comparable round-over-round).
    extended = [
        "cjk_postings",
        # session-24 additions
        "setjoin_prefix",
        "search_sharded",
        "click_coec",
        "click_cascade",
        "query_reformulations",
        "team_draft_interleave",
        "interleave_credit",
        "ddsketch_quantiles",
        "crawl_apportion",
        "search_qld",
        "search_blockmax",
        "corpus_psi",
        "events_cusum",
        "stream_cusum",
        "span_corruption",
        "fim_transform",
        "fs_linkage",
        "skipgram_pairs",
        "negative_sampling",
        "snapshot_branch",
        "snapshot_agg_pushdown",
        "snapshot_txn",
        "ltr_features",
        "bm25_grid",
        "embed_matryoshka",
        "cjk_postings_search",
        "postings_skewed",
        "correlations_skewed",
        "extract_density",
        "search_tfidf",
        "search_batch",
        "embed_ann_kmeans",
        "dedup_clusters",
        "decontaminate",
        "lm_quality",
        "dedup_skewed",
        "correlations_incremental",
        "search_batch_bm25",
        "png_pixel_stats",
        "postings_wordnet",
        "phrase_search",
        "embed_neardup",
        "dedup_containment",
        "events_sliding",
        "corpus_ngrams",
        "redact_pii",
        "repetition_signals",
        "tpch_q6",
        "tpch_q10",
        "tpch_q17",
        "tpch_q9",
        "tpch_q21",
        "quantiles_pricing",
        "rolling_revenue",
        "zorder_curve",
        "search_fuzzy",
        "events_outliers",
        "dup_passages",
        "passage_dup_stats",
        "pack_sequences",
        "source_mix",
        "pagerank_centrality",
        "embed_quantize",
        "bpe_merges",
        "postings_compression",
        "semantic_dedup",
        "weighted_sample",
        "gopher_filters",
        "minhash_incremental",
        "doc_similarity",
        "hist_quantiles",
        "postings_nltk_stop",
        "span_coalesce",
        "passage_removal",
        "collocations_pmi",
        "char_entropy",
        "layout_reading_order",
        "search_hybrid_rrf",
        "search_maxsim",
        "search_champion",
        "term_neighbors",
        "ivf_incremental",
        # session 8
        "layout_page_chrome",
        "extract_dehyphen",
        "lm_kn_score",
        "kn_incremental",
        "unigram_encode",
        "media_dedup",
        "skew_profile",
        "communities_lpa",
        "ann_recall",
        "bloom_join",
        "search_maxscore",
        "source_temperature",
        "extract_clean_pipeline",
        "dedup_report",
        "search_proximity",
        "chunks_cdc",
        # session-9: lakehouse + crawl-cleaning flagships
        "snapshot_merge",
        "snapshot_incremental_postings",
        "webtext_normalize",
        "dedup_sentences",
        "crawl_clean_pipeline",
        "layout_table_markdown",
        # session-10: boolean retrieval, sketch set ops, SNM, IVF-PQ,
        # lakehouse partition/restate/mview, gap fill
        "search_boolean",
        "kmv_term_audiences",
        "dedup_snm",
        "embed_ann_ivfpq",
        "snapshot_partition_scan",
        "snapshot_replace_where",
        "snapshot_mview",
        "events_gapfill",
        "search_substring",
        "ann_eval_metrics",
        "embed_ann_filtered",
        "search_prefix",
        "events_paths",
        "layout_figures",
        "snapshot_spec_evolution",
        "snapshot_tags",
        "search_mmr",
        "snapshot_forget",
        "snapshot_drop_column",
        "snapshot_checks",
        "snapshot_bloom_scan",
        "html_main_content",
        "html_spans",
        "snapshot_dsv2_write",
        "convert_interleaved",
        "pdf_roundtrip",
        "ocr_page_text",
        # session-15: WARC crawl-archive ingestion + URL canonicalization
        "warc_extract",
        "warc_main_content",
        "url_canonical",
        "domain_stats",
        "link_extract",
        "link_graph",
        "robots_filter",
        "html_meta_policy",
        "sitemap_frontier",
        "warc_postings",
        "wet_roundtrip",
        # session-16: the acceptance invariant as a corpus-wide audit
        "span_diff",
        "span_repair",
        # session-17: anchor-text index + anchor-boosted retrieval
        "anchor_texts",
        "search_anchor_boost",
        "snapshot_extract",
        "extraction_lineage",
        "anchors_incremental",
        # session-18: code-corpus curation signals (codetext)
        "code_blocks",
        "code_language",
        "license_detect",
        "script_profile",
        # session-19: crawl discovery + page metadata
        "html_tables",
        "html_table_markdown",
        "html_metadata",
        "publish_date",
        "feed_frontier",
        # session-20: crawl scheduling + retrieval evaluation
        "frontier_schedule",
        "search_eval_ndcg",
        # session-21: graph signals + dataset assembly
        "link_hits",
        "crawl_depth",
        "url_traps",
        "dataset_split",
        "epoch_order",
        "trustrank_seeds",
        "training_triplets",
        # session-22/23: mixture planning, crawl freshness, alias mining,
        # subword trio completion, graph density + log-round CC, fielded
        # and feedback retrieval, ER blocking, seeding
        "mixture_budget",
        "recrawl_priority",
        "domain_templates",
        "kcore_spam",
        "dust_params",
        "search_bm25f",
        "lsh_tuning",
        "wordpiece_encode",
        "source_overlap",
        "vocab_growth",
        "textrank_keywords",
        "gazetteer_match",
        "search_prf",
        "phonetic_blocking",
        "cc_star",
        "blocking_quality",
        "homoglyph_fold",
        "kmeanspp_seeds",
        # round-5 additions
        "zipf_fit",
        "ngram_novelty",
        "wav_energy_segments",
        "wav_resample_stats",
        "snapshot_orphan_cleanup",
        "bpe_fertility",
        "ocr_confidence",
        "cer_audit",
        "shard_manifest",
        "index_drift",
        "bpe_vocab_coverage",
        # session-3 recompute-fix targets, tracked so regressions show
        "dedup_minhash_lsh",
        "dedup_minhash_estimate",
        "fingerprint_winnow",
        "winnow_overlap",
        "dsir_weights",
        "ocr_layout_reading_order",
        "page_media_render",
        "nb_calibration",
    ]
    load_before_ext = _load1()
    times_ext: dict[str, float] = {}
    for name in extended:
        t0 = time.time()
        _noop(qs[name](spark, sf_dir))
        times_ext[name] = round(time.time() - t0, 3)

    # Flagship: extraction throughput on the interleaved synthetic corpus
    # (skew tail enabled — exercises the salted/size-bucketed path).
    # Input is materialized to parquet untimed (the north_star reads
    # tables; generation cost is not extraction cost), and the pipeline is
    # warmed once so JVM/codegen JIT doesn't pollute the throughput
    # number. Timed region = the production job shape (§3.1): read →
    # salted repartition → Arrow extraction (+ span-split for mega-docs)
    # → write extracted_spans → read → tokenize → postings.
    docs_path = "/tmp/spark_graft_bench_docs"
    ext_path = "/tmp/spark_graft_bench_extracted"
    corpus.documents_table(spark, N_DOCS_EXTRACT, skew=True).write.mode(
        "overwrite"
    ).parquet(docs_path)
    src = spark.read.parquet(docs_path)

    def pipeline(inp):
        ext = extract.extract_spans(
            inp, impl="arrow", skew_threshold=64, num_partitions=2 * cpus
        )
        ext.drop("error").write.mode("overwrite").parquet(ext_path)
        _noop(tokenize.term_postings(spark.read.parquet(ext_path)))

    pipeline(src.limit(2000))  # warmup (JIT, codegen, python workers)
    # best-of-2: this sandbox's host steals CPU with 2-3x wall-clock
    # noise; the minimum is the least-interference estimate
    pipe_samples = []
    pipe_loads = []
    for _ in range(2):
        pipe_loads.append(_load1())
        t0 = time.time()
        pipeline(src)
        pipe_samples.append(time.time() - t0)
    dt = min(pipe_samples)
    times["extract_pipeline_synthetic"] = round(dt, 3)
    medians["extract_pipeline_synthetic"] = round(
        statistics.median(pipe_samples), 3
    )
    total += dt
    total_med += medians["extract_pipeline_synthetic"]
    docs_per_sec = N_DOCS_EXTRACT / dt

    print(
        json.dumps(
            {
                "metric": "headline query latency + extraction throughput "
                f"(pipeline on {N_DOCS_EXTRACT} interleaved docs)",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "queries_median": medians,
                "queries_extended": times_ext,
                "value_median": round(total_med, 3),
                "sf": sf,
                "extract_docs_per_sec": round(docs_per_sec, 1),
                "cpus": cpus,
                "headline_passes": n_passes,
                "headline_loadavg_per_pass": pass_loads,
                "pipeline_loadavg_per_sample": pipe_loads,
                "loadavg_before_extended": load_before_ext,
                "loadavg_end": _load1(),
            }
        )
    )


if __name__ == "__main__":
    main()
