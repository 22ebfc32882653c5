"""The end-to-end quality-filter pipeline: profile → detect → remediate →
checkpoint, as ONE Spark job graph.

Reference analogue: run_auto_healing.py:16-131 (generate → profile → detect →
remediate → validate), re-expressed Spark-first. The scoring stage is
shuffle-free (partition-parallel: native exprs + one Arrow UDF crossing);
the only shuffle is the per-bucket metrics groupBy. Column pruning matters:
the scoring path never reads ``html`` (BINARY) — only url/text/lang/warc_ts
reach the scan.

Resume: before scoring, anti-join against buckets already present in the
metrics table for this run_id (broadcast left_anti — the completed set is at
most ``num_buckets`` rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text_heuristics as th
from ..operators import decision as dec
from ..operators import scoring
from ..warehouse import AUDIT_SCHEMA, METRICS_SCHEMA, Warehouse

SCORED_COLUMNS = [
    "url", "warc_ts", "lang", "bucket",
    "word_count", "mean_word_len", "symbol_ratio", "distinct_stopwords",
    "alpha_word_frac", "dup_2gram_frac", "dup_3gram_frac", "dup_4gram_frac",
    "lang_pred", "lang_conf", "log_pplx",
    "n_email", "n_ssn", "n_phone", "n_ip", "n_tox",
    "scrubbed_text", "reasons", "confidences", "keep",
]


def score_pages(
    pages: DataFrame,
    gopher: th.GopherThresholds = th.DEFAULT_THRESHOLDS,
    model: dec.ModelThresholds = dec.DEFAULT_MODEL_THRESHOLDS,
    include_model_rules: bool = True,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """DataFrame → DataFrame scorer (pure function; identical code path for
    batch and Structured Streaming).

    Deliberately selects only the needed columns first so Parquet/Iceberg
    column pruning drops ``html`` at the scan. ``extra_cols`` ride through
    untouched (e.g. the C4 page flag the caller merges into the decision).
    """
    cols = [c for c in ["url", "warc_ts", "text", "lang", "bucket"]
            if c in pages.columns] + [c for c in extra_cols
                                      if c in pages.columns]
    df = pages.select(*cols)
    if include_model_rules:
        # ALL per-doc text signals ride in the one scoring UDF crossing
        # (tokens split once per doc in batched Python — ~50× cheaper than
        # Spark's interpreted higher-order functions; native-expr twins are
        # asserted equal in tests and used for SQL-oracle-checked queries)
        df = scoring.with_model_scores(df, "text")
    else:
        df = th.with_signal_columns(df, "text", gopher)
    df = dec.with_decision(df, gopher, model,
                           include_model_rules=include_model_rules)
    keep_cols = [c for c in SCORED_COLUMNS if c in df.columns]
    passthrough = [c for c in extra_cols if c in df.columns]
    return df.select("text", *keep_cols, *passthrough)


def c4_pre_clean(pages: DataFrame) -> DataFrame:
    """Projection-only C4 stage (functions/c4.py): rewrite ``text`` to the
    line-cleaned form and carry the page flag as ``_c4_keep`` for
    :func:`c4_merge_decision` after scoring. No shuffle, no state — safe
    in batch AND Structured Streaming unchanged."""
    from ..functions import c4 as c4f

    return (c4f.with_c4(pages, "text")
            .withColumn("text", F.col("c4_text_clean"))
            .withColumnRenamed("c4_page_keep", "_c4_keep")
            .drop("c4_text_clean", "c4_n_lines", "c4_n_lines_kept",
                  "c4_drop_reason"))


def c4_merge_decision(scored: DataFrame) -> DataFrame:
    """Fold the carried C4 page flag into the decision: flagged pages get
    reason code ``c4.page`` (sorted in) and ``keep`` goes false."""
    return (scored.withColumn(
        "reasons",
        F.when(~F.col("_c4_keep"),
               F.array_sort(F.array_union(
                   "reasons", F.array(F.lit("c4.page")))))
        .otherwise(F.col("reasons")))
        .withColumn("keep", F.col("keep") & F.col("_c4_keep"))
        .drop("_c4_keep"))


def bucket_metrics(scored: DataFrame, run_id: str) -> DataFrame:
    """Per-bucket lineage + rule-hit metrics (the checkpoint rows).

    ONE shuffle (groupBy bucket), no row explosion: rule hits are conditional
    sums (one fixed-width counter per reason code), assembled into the map
    after aggregation. All sums are algebraic → map-side partial aggregation;
    shuffle volume is O(buckets × codes), independent of document count.
    """
    from ..operators.decision import REASON_CODES

    hit_sums = [
        F.sum(F.array_contains("reasons", c).cast("long")).alias(f"_hit_{i}")
        for i, c in enumerate(REASON_CODES)
    ]
    base = scored.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("docs_in"),
        F.sum(F.col("keep").cast("long")).alias("docs_kept"),
        F.sum((~F.col("keep")).cast("long")).alias("docs_dropped"),
        F.map_from_arrays(
            F.array(F.lit("email"), F.lit("ssn"), F.lit("phone"), F.lit("ip")),
            F.array(F.sum("n_email"), F.sum("n_ssn"),
                    F.sum("n_phone"), F.sum("n_ip")),
        ).alias("pii_scrubbed"),
        *hit_sums,
    )
    rule_hits = F.map_from_arrays(
        F.array(*[F.lit(c) for c in REASON_CODES]),
        F.array(*[F.col(f"_hit_{i}") for i in range(len(REASON_CODES))]),
    )
    return (
        base.withColumn("rule_hits", rule_hits)
        .withColumn("run_id", F.lit(run_id))
        .withColumn("completed_at", F.current_timestamp())
        .select("run_id", "bucket", "docs_in", "docs_kept", "docs_dropped",
                "rule_hits", "pii_scrubbed", "completed_at")
    )


def quality_alerts(metrics: DataFrame) -> DataFrame:
    """Alert rows derived from per-bucket metrics.

    Reference analogue: the Kafka alert topic + severity mapping
    (kafka_producer.py:send_quality_alert, kafka_consumer.py:83-94 severity
    cuts 0.9/0.8/0.6). One alert per bucket whose drop rate crosses the
    'medium' cut, with a JSON payload (F.to_json) mirroring the reference's
    event shape.
    """
    rate = F.col("docs_dropped") / F.greatest(F.col("docs_in"), F.lit(1))
    sev = (F.when(rate > 0.9, "critical")
           .when(rate > 0.8, "high")
           .when(rate > 0.6, "medium"))
    return (metrics
            .withColumn("severity", sev)
            .where(F.col("severity").isNotNull())
            .select(
                "run_id", "bucket", "severity",
                F.round(rate, 6).alias("drop_rate"),
                F.to_json(F.struct(
                    "run_id", "bucket", "docs_in", "docs_dropped",
                    "rule_hits", "completed_at")).alias("payload"),
            ))


def run_filter(
    wh: Warehouse,
    run_id: str,
    pages_table: str = "pages",
    clean_table: str = "pages_clean",
    gopher: th.GopherThresholds = th.DEFAULT_THRESHOLDS,
    model: dec.ModelThresholds = dec.DEFAULT_MODEL_THRESHOLDS,
    storage_level: str = "MEMORY_AND_DISK",
    bucket_subset: list[int] | None = None,
    c4: bool = False,
) -> dict:
    """Full run with resume. Returns summary counters.

    ``storage_level``: cache level for the scored frame shared by the two
    sinks (clean write + metrics). Use "DISK_ONLY" at cluster scale — the
    scored text of a whole bucket wave needn't fit executor memory.
    ``bucket_subset``: restrict this invocation to the given buckets (the
    wave unit used by :func:`run_filter_in_waves`); partition pruning makes
    the restriction a scan-level filter.
    ``c4``: apply the C4 line rules (functions/c4.py) BEFORE scoring —
    signals and scrubbing run over the line-cleaned text — and merge the
    page flag into the decision as reason code ``c4.page``. Both steps are
    pure projections; the plan gains zero exchanges.
    """
    from pyspark import StorageLevel

    pages = wh.read_pages(pages_table)
    if bucket_subset is not None:
        pages = pages.where(F.col("bucket").isin(list(bucket_subset)))
    todo = wh.resume_filter(pages, run_id)
    extra: tuple[str, ...] = ()
    if c4:
        todo = c4_pre_clean(todo)
        extra = ("_c4_keep",)
    scored = score_pages(todo, gopher, model, extra_cols=extra)
    if c4:
        scored = c4_merge_decision(scored)
    # prune columns NEITHER sink reads before materializing the cache —
    # the confidences map in particular is per-doc strings+doubles that
    # would be computed and cached for nothing (clean write needs
    # url/ts/lang/bucket/scrubbed/reasons; metrics needs bucket/keep/
    # reasons/pii counts)
    needed = [c for c in scored.columns if c not in ("confidences",)]
    scored = scored.select(*needed)
    scored = scored.persist(getattr(StorageLevel, storage_level))
    try:
        # an 'und' CLAIM (WARC ingest: unlabeled pages) adopts the model's
        # predicted language in the clean table, so downstream per-lang
        # curation (export mixtures, severity censuses) sees real languages;
        # labeled corpora pass through untouched
        lang_out = F.col("lang")
        if "lang_pred" in scored.columns:
            lang_out = (F.when((F.col("lang") == "und")
                               & (F.col("lang_pred") != "und"),
                               F.col("lang_pred"))
                        .otherwise(F.col("lang")))
        kept = scored.where(F.col("keep")).select(
            "url", "warc_ts", lang_out.alias("lang"), "bucket",
            F.col("scrubbed_text").alias("text"),
            F.array_join("reasons", ",").alias("reasons_csv"),
        )
        # 1) commit the data, 2) checkpoint the metrics LAST (crash between
        # the two ⇒ the bucket is rescored on resume and its clean partition
        # rewritten idempotently via dynamic partition overwrite).
        wh.write_clean(kept, clean_table, run_id=run_id)
        # Collect the ≤num_buckets metric rows to the driver BEFORE appending:
        # writing to the metrics path would invalidate this cached plan (its
        # lineage READS that path for resume) and trigger a rescore that then
        # sees its own checkpoint rows.
        metrics_rows = bucket_metrics(scored, run_id).collect()
        n_alerts = 0
        if metrics_rows:
            metrics_df = wh.spark.createDataFrame(metrics_rows, METRICS_SCHEMA)
            wh.append_metrics(metrics_df)
            alerts = quality_alerts(metrics_df)
            n_alerts = alerts.count()
            if n_alerts:
                wh.append_alerts(alerts)
        return {"run_id": run_id,
                "docs_in": sum(r["docs_in"] for r in metrics_rows),
                "docs_kept": sum(r["docs_kept"] for r in metrics_rows),
                "alerts": n_alerts}
    finally:
        scored.unpersist()


def validate_run(
    wh: Warehouse,
    run_id: str,
    clean_table: str = "pages_clean",
    tolerance: float = 0.02,
    gopher: th.GopherThresholds = th.DEFAULT_THRESHOLDS,
    model: dec.ModelThresholds = dec.DEFAULT_MODEL_THRESHOLDS,
) -> dict:
    """Validate-remediation + completion-notification tail (reference
    schema_drift_remediation.py:143-204: every DAG ends validate → notify).

    Re-scores the CLEAN table through the identical scorer and asserts the
    re-drop rate ≈ 0 (kept docs were scrubbed, so signals can shift slightly
    — e.g. ``<EMAIL>`` tokens change the symbol ratio — hence ``tolerance``).
    Appends one audit row (the notification artifact) and returns it as a
    dict. One full scan of the clean table; the agg is a 1-row fence.
    """
    import datetime

    clean = wh.read_clean(clean_table)
    rescored = score_pages(clean, gopher, model)
    row = rescored.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum((~F.col("keep")).cast("long")).alias("redropped"),
    ).collect()[0]
    docs = int(row["docs"])
    drop_rate = round(int(row["redropped"]) / max(docs, 1), 6)
    status = "ok" if drop_rate <= tolerance else "degraded"
    message = (f"revalidated {docs} kept docs; re-drop rate {drop_rate}"
               f" (tolerance {tolerance})")
    audit = wh.spark.createDataFrame(
        [(run_id, "validate_remediation", docs, float(drop_rate), status,
          message, datetime.datetime.now())], AUDIT_SCHEMA)
    wh.append_audit(audit)
    return {"run_id": run_id, "docs_validated": docs,
            "revalidation_drop_rate": drop_rate, "status": status}


def run_filter_in_waves(
    wh: Warehouse,
    run_id: str,
    wave_buckets: int = 16,
    pages_table: str = "pages",
    clean_table: str = "pages_clean",
    gopher: th.GopherThresholds = th.DEFAULT_THRESHOLDS,
    model: dec.ModelThresholds = dec.DEFAULT_MODEL_THRESHOLDS,
    storage_level: str = "MEMORY_AND_DISK",
    c4: bool = False,
) -> dict:
    """Run the filter in bucket WAVES, checkpointing metrics after each —
    this is what makes the kill/resume contract bucket-granular in practice:
    a SIGKILL mid-run loses at most the current wave, not the whole run
    (plain run_filter appends metrics once at the end, so a first-run crash
    before the append rescored everything). At 10^12 docs an orchestrator
    issues waves anyway; this makes one driver invocation do it.
    """
    pages = wh.read_pages(pages_table)
    done = {r["bucket"] for r in wh.completed_buckets(run_id).collect()}
    todo = sorted({r["bucket"] for r in
                   pages.select("bucket").distinct().collect()} - done)
    total = {"run_id": run_id, "docs_in": 0, "docs_kept": 0, "alerts": 0,
             "waves": 0, "buckets_skipped": len(done)}
    for lo in range(0, len(todo), wave_buckets):
        chunk = todo[lo:lo + wave_buckets]
        wave_pages_table = pages_table  # resume_filter inside re-checks
        summary = run_filter(
            wh, run_id, wave_pages_table, clean_table, gopher, model,
            storage_level, bucket_subset=chunk, c4=c4)
        total["docs_in"] += summary["docs_in"]
        total["docs_kept"] += summary["docs_kept"]
        total["alerts"] += summary["alerts"]
        total["waves"] += 1
    return total


def metrics_drift(wh: Warehouse, run_id: str, baseline_run_id: str
                  ) -> DataFrame:
    """Per-bucket drift of the CURRENT run's metrics vs a baseline run —
    the reference's baseline-vs-current comparison (spark_profiler.py:261-289)
    re-expressed over the metrics table: broadcast join of two ≤num_buckets
    frames (no data scan), drop-rate delta and per-rule hit-rate deltas.
    """
    def slim(rid, tag):
        m = wh.read_metrics().where(F.col("run_id") == rid)
        return m.select(
            "bucket",
            (F.col("docs_dropped") / F.greatest(F.col("docs_in"), F.lit(1)))
            .alias(f"drop_rate_{tag}"),
            F.col("docs_in").alias(f"docs_in_{tag}"),
            F.col("rule_hits").alias(f"hits_{tag}"),
        )

    cur, base = slim(run_id, "cur"), slim(baseline_run_id, "base")
    j = cur.join(F.broadcast(base), "bucket", "left")
    # per-rule hit-rate delta: map_zip_with over the union of rule keys
    delta = F.expr(
        "map_zip_with(hits_cur, coalesce(hits_base, map()), "
        "(k, c, b) -> round(coalesce(c, 0) / greatest(docs_in_cur, 1) "
        "- coalesce(b, 0) / greatest(coalesce(docs_in_base, 0), 1), 6))")
    return j.select(
        "bucket",
        F.round(F.col("drop_rate_cur")
                - F.coalesce("drop_rate_base", F.lit(0.0)), 6)
        .alias("drop_rate_delta"),
        delta.alias("rule_hit_rate_delta"),
    )


def _run_drop_rate(wh: Warehouse, run_id: str) -> float:
    r = (wh.read_metrics().where(F.col("run_id") == run_id)
         .agg(F.sum("docs_in").alias("n"),
              F.sum("docs_dropped").alias("d")).collect()[0])
    return float(r["d"] or 0) / max(float(r["n"] or 0), 1.0)


def drift_retrain(
    wh: Warehouse,
    run_id: str,
    baseline_run_id: str,
    shift_threshold: float = 0.15,
    sample_docs: int = 2000,
    clean_table: str = "pages_clean",
) -> dict:
    """Drift-triggered model retrain (reference
    distribution_shift_remediation.py:69-104: detect shift → retrain on the
    new distribution → persist the model).

    Drift signal = |drop_rate(run) − drop_rate(baseline_run)| from the
    metrics table (two 1-row aggs over ≤num_buckets rows — no data scan).
    On drift, retrain the perplexity LM on a DETERMINISTIC sample of the
    current clean corpus (orderBy xxhash64(url), limit N — stable across
    partitionings) and persist the artifact next to the warehouse for
    ``spark-submit --py-files`` shipping. Appends an audit row either way.
    """
    import datetime
    import os

    from ..functions.perplexity import PerplexityModel

    cur = _run_drop_rate(wh, run_id)
    base = _run_drop_rate(wh, baseline_run_id)
    drift = round(abs(cur - base), 6)
    if drift <= shift_threshold:
        audit = wh.spark.createDataFrame(
            [(run_id, "drift_retrain", 0, float(drift), "skipped",
              f"drop-rate shift {drift} <= threshold {shift_threshold}",
              datetime.datetime.now())], AUDIT_SCHEMA)
        wh.append_audit(audit)
        return {"run_id": run_id, "retrained": False, "drift": drift}

    sample = (wh.read_clean(clean_table)
              .orderBy(F.xxhash64("url")).limit(sample_docs)
              .select("text").collect())
    texts = [r["text"] for r in sample]
    model = PerplexityModel.train_texts(texts)
    model_dir = os.path.join(wh.root, "models")
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, f"pplx_{run_id}.npz")
    model.save(path)
    audit = wh.spark.createDataFrame(
        [(run_id, "drift_retrain", len(texts), float(drift), "retrained",
          f"drop-rate shift {drift} > {shift_threshold}; retrained LM on "
          f"{len(texts)} docs -> {path}",
          datetime.datetime.now())], AUDIT_SCHEMA)
    wh.append_audit(audit)
    return {"run_id": run_id, "retrained": True, "drift": drift,
            "model_path": path, "sample_docs": len(texts)}
