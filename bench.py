"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS], plus quality-filter pipeline throughput on a
deterministic synthetic corpus.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "filter_docs_per_sec": ..., "synth_docs": ...}

Noise defense (VERDICT r05 #2 — this host is a shared VM where identical
runs vary ±50%): every query is timed in $SPARK_GRAFT_BENCH_RUNS (default
2) INTERLEAVED passes — pass 1 runs the whole list, then pass 2 — and the
per-query minimum is reported, so a transient load spike cannot hit the
same query in every pass. The JSON records runs + /proc loadavg at
start/end so a contended capture is identifiable after the fact.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from data_quality_autohealer_spark import synth  # noqa: E402
from data_quality_autohealer_spark.plans import pipeline  # noqa: E402
from data_quality_autohealer_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "quality_decision",
    "quality_drop_summary",
    "pii_scrub",
    "pipeline_full_decision",
    "pipeline_heuristic_decision",
    "profile_documents",
    "outlier_iqr_lineitem",
    "outlier_iqr_approx",
    "pricing_summary",
    "top_customers",
    "exact_dedup_groups",
    "minhash_signatures",
    "simhash",
    "knn_cosine_topk",
    "embedding_near_dup_pairs",
    "embedding_near_dup_fast",
    "token_count_bpe",
    "top_order_per_customer",
    "lsh_jaccard_pairs",
    "neardup_groups",
    "salted_event_stats",
    "session_windows",
    "asof_join_events",
    "time_range_join_events",
    "cross_corpus_neardup",
    "domain_quality",
    # heavy tail (VERDICT r03 #4): the most expensive queries must be
    # tracked round-over-round or regressions there are invisible
    "kmeans_embeddings",
    "semantic_neardup",
    "semantic_neardup_fast",
    "sequence_pack",
    "stratified_sample",
    "quality_strata_approx",
    "snapshot_delta",
    # round-4 operators
    "line_dedup",
    "canonical_dedup_groups",
    "token_budget_sample",
    "url_canonical_dedup",
    # round-5 operators
    "ngram_novelty",
    "charset_quality",
    "dup_cluster_histogram",
    "boilerplate_by_source",
    "bloom_decontaminate",
    "decontaminate_chain",
    "substring_dup_summary",
    "incremental_novelty",
    # round-6 operators
    "main_content_extract",
    "bpe_vocab",
    "bpe_token_count",
    "quality_classifier",
    # round-6 continuation operators
    "gopher_repetition",
    "dedup_keep_best",
    "domain_blocklist",
    "temperature_mix",
    "ccnet_buckets",
    "unicode_clean",
    "simhash_neardup_pairs",
    "c4_line_filter",
    "dsir_importance",
    "bpe_fertility_by_lang",
    "paragraph_dedup",
    "classifier_calibration",
    "rule_ablation",
    "corpus_report",
    "similarity_histogram",
]

SYNTH_DOCS = int(os.environ.get("SPARK_GRAFT_SYNTH_DOCS", "200000"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    loadavg_start = os.getloadavg()
    spark = get_spark(app_name="dqa-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    qs = entry_mod.queries()
    # JVM + parquet-reader warmup so the first timed query isn't charged
    # session-startup cost (long-running clusters amortize this)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # interleaved best-of-N: whole list per pass, min per query across
    # passes — a transient host-load spike degrades one pass, not the
    # reported number (tools/bench_scaling.py uses the same defense)
    timings: dict[str, float] = {}
    for _ in range(n_runs):
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.count()
            sec = round(time.perf_counter() - t0, 3)
            if name not in timings or sec < timings[name]:
                timings[name] = sec

    # quality-filter throughput on the deterministic synthetic corpus
    pages = synth.gen_pages_df(spark, SYNTH_DOCS, num_partitions=cpus * 2)
    pages = pages.persist()
    n_pages = pages.count()  # materialize generation outside the timed window
    # warmup: spawn+warm every Python worker (long-running executors amortize
    # this over the whole corpus at cluster scale; we measure steady state)
    pipeline.score_pages(pages).where("keep").count()
    filter_sec = None
    for _ in range(n_runs):
        t0 = time.perf_counter()
        scored = pipeline.score_pages(pages)
        kept = scored.where("keep").count()
        sec = time.perf_counter() - t0
        if filter_sec is None or sec < filter_sec:
            filter_sec = sec
    pages.unpersist()
    timings["synth_filter"] = round(filter_sec, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(json.dumps({
        "metric": "headline queries + quality-filter wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "synth_docs": n_pages,
        "synth_docs_kept": kept,
        "filter_docs_per_sec": round(n_pages / filter_sec, 1),
        "cpus": cpus,
        "runs_per_query": n_runs,
        "loadavg_start": [round(x, 2) for x in loadavg_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
    }))


if __name__ == "__main__":
    main()
