"""Synchronous ad-hoc check (jobs/check_one.py) — the reference's
POST /quality/check analogue — verified against the pandas oracle labels."""

import numpy as np
import pytest

from data_quality_autohealer_spark import synth
from jobs.check_one import ENSEMBLE_THRESHOLD, check_documents
from oracle.rules import reference_labels


def test_clean_documents_report_clean(spark):
    pdf = synth.gen_pages_pdf(np.arange(400))
    labels = reference_labels(pdf)
    good = labels[labels["keep"]].head(5)
    resp = check_documents(spark, good["text"].tolist(),
                           good["lang"].tolist())
    assert resp["detected_issues"] == ["clean"]
    assert resp["severity"] == "low"
    assert resp["recommendations"] == ["No quality issues detected"]
    assert all(d["keep"] for d in resp["documents"])


def test_bad_documents_match_oracle_labels(spark):
    pdf = synth.gen_pages_pdf(np.arange(400))
    labels = reference_labels(pdf)
    bad = labels[~labels["keep"]].head(10)
    resp = check_documents(spark, bad["text"].tolist(), bad["lang"].tolist())
    assert resp["detected_issues"] != ["clean"]
    assert resp["severity"] in {"critical", "high", "medium", "low"}
    assert len(resp["recommendations"]) == len(resp["detected_issues"])
    # per-document keep/reasons must match the oracle exactly
    for doc, (_, orc) in zip(resp["documents"], bad.iterrows()):
        assert doc["keep"] == bool(orc["keep"])
        assert ",".join(doc["reasons"]) == orc["reasons_csv"]


def test_scores_are_rule_confidences(spark):
    # a pathological doc: short + symbol soup → multiple confident rules
    resp = check_documents(spark, ["### {} => ~~ @@@"], ["en"])
    assert resp["detected_issues"] != ["clean"]
    assert resp["scores"], "expected nonempty per-rule scores"
    assert all(0.0 <= s <= 1.0 for s in resp["scores"].values())
    confident = [r for r, s in resp["scores"].items()
                 if s >= ENSEMBLE_THRESHOLD]
    assert set(confident) <= set(resp["detected_issues"])
    assert not resp["documents"][0]["keep"]


def test_documents_preserve_input_order_past_ten(spark):
    """≥10 docs: lexicographic url sort would put doc/10 before doc/2
    (ADVICE r02) — the response must follow the caller's input order."""
    import numpy as np
    from data_quality_autohealer_spark import synth
    pdf = synth.gen_pages_pdf(np.arange(200))
    good = pdf[reference_labels(pdf)["keep"]].head(12)
    resp = check_documents(spark, good["text"].tolist(),
                           good["lang"].tolist())
    urls = [d["url"] for d in resp["documents"]]
    assert urls == [f"adhoc://doc/{i}" for i in range(12)]
