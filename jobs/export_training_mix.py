"""Training-mix export CLI: the BACK edge of the pipeline — filtered clean
pages -> per-language mixture sampling -> sharded JSONL.gz, the artifact a
training job actually consumes.

  python jobs/export_training_mix.py --warehouse /wh --out /mix \
      --rates en=1.0,de=0.5,fr=0.5 --shards 64

Design for 100 TB:
- Mixture sampling is the deterministic hash-fraction predicate
  (operators/curation.stratified_sample): shuffle-free, resumable
  (same salt => same sample), exact on the 1e-6 grid.
- Sharding is pmod(xxhash64(url), shards): content-addressed, so a re-run
  (or a second cluster) produces the same url->shard mapping; one
  repartition on the shard key is the job's only shuffle, sized so each
  output file is one executor task's write.
- Output is gzip JSONL (sources/tables.write_jsonl): line-oriented,
  splittable at the FILE level, the interchange format downstream
  tokenizer/packing jobs expect.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_rates(spec: str) -> dict[str, float]:
    out = {}
    for part in filter(None, (p.strip() for p in spec.split(","))):
        k, _, v = part.partition("=")
        out[k] = float(v)
    return out


def export_mix(spark, clean, out_dir: str, rates: dict[str, float],
               shards: int, salt: str = "mix",
               default_rate: float = 1.0,
               token_budgets: dict[str, int] | None = None,
               default_budget: int = 0,
               tokenizer: str = "words",
               bpe_merges: int = 16,
               bpe_vocab: str | None = None,
               bpe_vocab_out: str | None = None,
               total_token_budget: int | None = None,
               temperature: float = 0.5,
               dsir_target: str | None = None,
               dsir_weights: str | None = None,
               dsir_weights_out: str | None = None) -> dict:
    """clean(url, warc_ts, lang, text) -> sharded JSONL.gz + summary.

    Two mixture modes: ``rates`` (per-lang doc-rate hash sampling, the
    default) or ``token_budgets`` (per-lang running-TOKEN budget via
    curation.token_budget_sample — training mixes are usually specified
    in tokens; whole docs, deterministic hash order). With token budgets,
    ``tokenizer`` picks the counting scheme: ``'words'`` (whitespace
    census) or ``'bpe'`` (train a deterministic BPE vocab on the clean
    corpus — functions/bpe.py — and budget by trained-vocab token counts,
    the unit a real training mix is specified in; counting stays a
    shuffle-free per-row replace chain).

    ``total_token_budget`` derives the per-lang budgets instead of taking
    them literally: temperature-weighted allocation
    (curation.temperature_mix_allocation, default alpha=0.5 up-samples
    low-resource languages) over the chosen tokenizer's counts; the
    n_langs-row allocation is collected (bounded) and fed to the same
    token sampler. Explicit ``token_budgets`` wins if both are given."""
    from pyspark.sql import functions as F

    from data_quality_autohealer_spark.functions import text_heuristics as th
    from data_quality_autohealer_spark.operators.curation import (
        _hash_frac_sql, _rate_case_sql, stratified_sample,
        token_budget_sample,
    )
    from data_quality_autohealer_spark.sources.tables import write_jsonl

    dsir_summary = None
    if dsir_target or dsir_weights:
        # DSIR gate (operators/importance.py): score against hashed-ngram
        # importance weights — learned in-flight against the target slice
        # of THIS corpus (--dsir-target), or loaded from a stored table
        # (--dsir-weights: train once on the reference target, score every
        # crawl wave) — and keep only target-like docs before budgeting.
        # One broadcast scoring join + one url equi-join.
        from data_quality_autohealer_spark.operators import importance

        pre = clean.count()
        if dsir_weights:
            w = importance.load_weights(spark, dsir_weights)
        else:
            w = importance.dsir_weights(clean, dsir_target, id_col="url")
        if dsir_weights_out:
            importance.save_weights(w, dsir_weights_out,
                                    target_desc=dsir_target or "")
            # read the persisted table back so scoring consumes the same
            # artifact a later wave will
            w = importance.load_weights(spark, dsir_weights_out)
        scores = importance.dsir_scores(
            clean, dsir_target or "false", id_col="url", weights=w)
        kept_ids = scores.where("selected").select("url")
        clean = clean.join(kept_ids, "url")
        post = clean.count()
        dsir_summary = {"target": dsir_target, "weights": dsir_weights,
                        "docs_in": pre, "docs_selected": post}

    if token_budgets or total_token_budget:
        if tokenizer == "bpe":
            from data_quality_autohealer_spark.functions import bpe
            # train once, tokenize everywhere: a persisted vocab
            # (--bpe-vocab) skips retraining, so every export of a
            # growing corpus counts with the SAME tokenizer
            if bpe_vocab:
                merges = bpe.load_merges(spark, bpe_vocab)
            else:
                merges = bpe.train_bpe_merges(clean, text_col="text",
                                              num_merges=bpe_merges)
            if bpe_vocab_out:
                bpe.save_merges(spark, merges, bpe_vocab_out)
            counted = bpe.with_bpe_token_counts(
                clean, merges, text_col="text", out_col="word_count")
        elif tokenizer == "words":
            wc = (f"case when text is null or trim(text) = '' then 0 "
                  f"else size({th._spark_words('text')}) end")
            counted = clean.withColumn("word_count", F.expr(wc))
        else:
            raise ValueError(f"tokenizer must be 'words' or 'bpe', "
                             f"got {tokenizer!r}")
        allocation = None
        if not token_budgets:
            from data_quality_autohealer_spark.operators.curation import (
                temperature_mix_allocation,
            )
            alloc_rows = temperature_mix_allocation(
                counted, total_token_budget, alpha=temperature,
                token_col="word_count", strata_col="lang").collect()
            token_budgets = {r["lang"]: int(r["alloc_tokens"])
                             for r in alloc_rows}
            allocation = {r["lang"]: {"tokens_in": r["token_count"],
                                      "weight": r["weight"],
                                      "budget": int(r["alloc_tokens"])}
                          for r in sorted(alloc_rows,
                                          key=lambda r: r["lang"])}
        sampled = token_budget_sample(
            counted,
            token_budgets, token_col="word_count", strata_col="lang",
            id_col="url", default_budget=default_budget, salt=salt,
            keep_cols=("text",))
        sharded = (sampled
                   .withColumn("shard",
                               F.expr(f"pmod(xxhash64(url), {shards})"))
                   .repartition(shards, "shard"))
        write_jsonl(sharded.select("url", "lang", "text", "shard")
                    .sortWithinPartitions("url"), out_dir)
        stats = (sampled.groupBy("lang")
                 .agg(F.count("*").alias("n_out"),
                      F.max("cum_tokens").alias("tokens_out"))
                 .collect())
        n_in = clean.count()
        out = {
            "out": out_dir,
            "shards": shards,
            "docs_in": n_in,
            "docs_out": sum(r["n_out"] for r in stats),
            "by_lang": {r["lang"]: {"out": r["n_out"],
                                    "tokens": r["tokens_out"]}
                        for r in sorted(stats, key=lambda r: r["lang"])},
        }
        if allocation is not None:
            out["allocation"] = allocation
        if dsir_summary is not None:
            out["dsir"] = dsir_summary
        return out

    sampled = stratified_sample(clean, rates, strata_col="lang",
                                id_col="url", default_rate=default_rate,
                                salt=salt)
    sharded = (sampled
               .withColumn("shard", F.expr(f"pmod(xxhash64(url), {shards})"))
               .repartition(shards, "shard"))
    write_jsonl(sharded.select("url", "lang", "text", "shard")
                .sortWithinPartitions("url"), out_dir)
    # in/out counts in ONE scan: re-evaluate the (deterministic) sample
    # predicate as a conditional sum instead of recomputing the sample
    pred = (f"({_hash_frac_sql('url', salt, 'spark')})"
            f" < ({_rate_case_sql('lang', rates, default_rate)})")
    counts = (clean.groupBy("lang")
              .agg(F.count("*").alias("n_in"),
                   F.sum(F.expr(pred).cast("long")).alias("n_out"))
              .collect())
    out = {
        "out": out_dir,
        "shards": shards,
        "docs_in": sum(r["n_in"] for r in counts),
        "docs_out": sum(r["n_out"] for r in counts),
        "by_lang": {r["lang"]: {"in": r["n_in"], "out": r["n_out"]}
                    for r in sorted(counts, key=lambda r: r["lang"])},
    }
    if dsir_summary is not None:
        out["dsir"] = dsir_summary
    return out


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--warehouse", required=True)
    p.add_argument("--clean-table", default="pages_clean")
    p.add_argument("--out", required=True)
    p.add_argument("--rates", default="",
                   help="lang=rate[,lang=rate...]; unlisted langs default "
                        "to --default-rate")
    p.add_argument("--default-rate", type=float, default=1.0)
    p.add_argument("--token-budgets", default="",
                   help="lang=tokens[,lang=tokens...]; when set, overrides "
                        "--rates with per-lang running-token budgets "
                        "(whole docs, deterministic hash order)")
    p.add_argument("--default-budget", type=int, default=0)
    p.add_argument("--tokenizer", choices=["words", "bpe"],
                   default="words",
                   help="token counting for --token-budgets: whitespace "
                        "words, or a BPE vocab trained deterministically "
                        "on the clean corpus (--bpe-merges rounds)")
    p.add_argument("--bpe-merges", type=int, default=16)
    p.add_argument("--bpe-vocab", default=None,
                   help="path of a persisted merge table (bpe.save_merges)"
                        " to tokenize with instead of retraining")
    p.add_argument("--bpe-vocab-out", default=None,
                   help="persist the (trained or loaded) merge table here")
    p.add_argument("--total-token-budget", type=int, default=None,
                   help="derive per-lang budgets from ONE total via "
                        "temperature-weighted allocation (alpha = "
                        "--temperature) instead of listing them; "
                        "--token-budgets wins if both are given")
    p.add_argument("--temperature", type=float, default=0.5)
    p.add_argument("--dsir-target", default=None,
                   help="SQL predicate over the clean table naming the "
                        "TARGET slice (e.g. \"lang = 'en'\"); learns "
                        "DSIR importance weights against it and exports "
                        "only target-like docs")
    p.add_argument("--dsir-weights", default=None,
                   help="path of a persisted DSIR weight table "
                        "(importance.save_weights) to score against "
                        "instead of training in-flight")
    p.add_argument("--dsir-weights-out", default=None,
                   help="persist the (trained or loaded) weight table "
                        "here for later waves")
    p.add_argument("--shards", type=int, default=64)
    p.add_argument("--salt", default="mix")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from data_quality_autohealer_spark.session import get_spark
    from data_quality_autohealer_spark.warehouse import Warehouse

    spark = get_spark(app_name="dqa-export-mix", master=args.master)
    wh = Warehouse(spark, args.warehouse)
    clean = wh.read_clean(args.clean_table)
    budgets = {k: int(v) for k, v in parse_rates(args.token_budgets).items()}
    # default_rate keeps unlisted languages rather than silently dropping
    return export_mix(spark, clean, args.out, parse_rates(args.rates),
                      args.shards, args.salt,
                      default_rate=args.default_rate,
                      token_budgets=budgets or None,
                      default_budget=args.default_budget,
                      tokenizer=args.tokenizer,
                      bpe_merges=args.bpe_merges,
                      bpe_vocab=args.bpe_vocab,
                      bpe_vocab_out=args.bpe_vocab_out,
                      total_token_budget=args.total_token_budget,
                      temperature=args.temperature,
                      dsir_target=args.dsir_target,
                      dsir_weights=args.dsir_weights,
                      dsir_weights_out=args.dsir_weights_out)


if __name__ == "__main__":
    json.dump(main(), sys.stdout)
    print()
