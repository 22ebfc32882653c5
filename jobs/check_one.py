"""Synchronous ad-hoc quality check — the batch twin of the reference's
``POST /quality/check`` endpoint (/root/reference/src/api/quality_service.py:57-123):
score a small uploaded document set NOW through the IDENTICAL scorer the
pipeline uses, and return the reference-shaped response dict
(detected_issues / scores / severity / recommendations, severity cuts
0.9/0.8/0.6, ensemble selection threshold 0.7, ['clean'] fallback).

CLI:  python jobs/check_one.py --file docs.txt          # one document per line
      python jobs/check_one.py --text "some document"   # repeatable
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# reference ensemble threshold (ensemble_classifier.py:94 / quality_thresholds.yaml)
ENSEMBLE_THRESHOLD = 0.7

# issue → recommendation, the web-text port of quality_service.py:89-105
RECOMMENDATION_FOR_REASON = {
    "gopher.word_count": "Drop document: word count outside Gopher bounds",
    "gopher.mean_word_length": "Drop document: mean word length out of range",
    "gopher.symbol_ratio": "Drop document: symbol-to-word ratio too high "
                           "(markup/code debris)",
    "gopher.stopwords": "Drop document: too few required stopwords for "
                        "claimed language",
    "gopher.alpha_ratio": "Drop document: too few alphabetic words",
    "gopher.dup_ngram": "Drop document: repeated n-gram boilerplate",
    "langid": "Drop or relabel document: language-ID disagrees with claimed "
              "language",
    "perplexity": "Drop document: LM perplexity indicates non-natural text",
    "toxicity": "Drop document: toxicity hits above threshold "
                "(below it the scrub suffices)",
}


def check_documents(spark, texts: list[str],
                    langs: list[str] | None = None,
                    pipeline_id: str = "adhoc") -> dict:
    """Score ad-hoc documents through the pipeline scorer; return the
    reference-shaped response plus per-document decisions."""
    from data_quality_autohealer_spark.plans.pipeline import score_pages

    langs = langs or ["en"] * len(texts)
    df = spark.createDataFrame(
        [(f"adhoc://doc/{i}", t, lg) for i, (t, lg) in
         enumerate(zip(texts, langs))],
        "url string, text string, lang string")
    rows = (score_pages(df)
            .select("url", "keep", "reasons", "confidences", "scrubbed_text")
            .collect())
    # numeric index sort — lexicographic url order would put doc/10 before
    # doc/2 and break the caller's input-order contract past 9 documents
    rows.sort(key=lambda r: int(r["url"].rsplit("/", 1)[1]))

    scores: dict[str, float] = {}
    for r in rows:
        for rule, conf in (r["confidences"] or {}).items():
            scores[rule] = max(scores.get(rule, 0.0), float(conf))
    detected = sorted(r for r, s in scores.items()
                      if s >= ENSEMBLE_THRESHOLD)
    # any fired rule below the ensemble cut still surfaces via reasons
    fired = sorted({c for r in rows for c in (r["reasons"] or [])})
    if not detected:
        detected = fired or ["clean"]
    max_score = max(scores.values()) if scores else 0.0
    severity = ("critical" if max_score > 0.9 else
                "high" if max_score > 0.8 else
                "medium" if max_score > 0.6 else "low")
    recommendations = [
        RECOMMENDATION_FOR_REASON.get(i, "No quality issues detected")
        for i in detected
    ] if detected != ["clean"] else ["No quality issues detected"]
    return {
        "pipeline_id": pipeline_id,
        "detected_issues": detected,
        "scores": {k: round(v, 6) for k, v in sorted(scores.items())},
        "severity": severity,
        "recommendations": recommendations,
        "documents": [
            {"url": r["url"], "keep": bool(r["keep"]),
             "reasons": list(r["reasons"] or []),
             "scrubbed_text": r["scrubbed_text"]}
            for r in rows
        ],
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--text", action="append", default=[])
    p.add_argument("--file", help="one document per line")
    p.add_argument("--lang", default="en")
    p.add_argument("--pipeline-id", default="adhoc")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    texts = list(args.text)
    if args.file:
        with open(args.file) as f:
            texts.extend(line.rstrip("\n") for line in f if line.strip())
    if not texts:
        p.error("provide --text or --file")

    from data_quality_autohealer_spark.session import get_spark
    spark = get_spark(app_name="dqa-check-one", master=args.master)
    resp = check_documents(spark, texts, [args.lang] * len(texts),
                           args.pipeline_id)
    json.dump(resp, sys.stdout, indent=2)
    print()


if __name__ == "__main__":
    main()
