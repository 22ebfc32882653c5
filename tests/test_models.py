"""Model artifact persistence (reference S7: pickle scaler / torch
state_dict → here np.savez artifacts shipped via --py-files) and
deterministic retraining."""

import numpy as np
import pandas as pd

from data_quality_autohealer_spark.functions.langid import LangIdModel
from data_quality_autohealer_spark.functions.perplexity import PerplexityModel


def test_langid_save_load_roundtrip(tmp_path):
    m = LangIdModel.train()
    p = str(tmp_path / "langid.npz")
    m.save(p)
    m2 = LangIdModel.load(p)
    assert m2.langs == m.langs
    s = pd.Series(["the cat sat on the mat", "der hund läuft im park"])
    a, b = m.predict_series(s), m2.predict_series(s)
    assert (a["lang_pred"] == b["lang_pred"]).all()
    assert np.allclose(a["lang_conf"], b["lang_conf"])


def test_perplexity_save_load_roundtrip(tmp_path):
    m = PerplexityModel.train()
    p = str(tmp_path / "pplx.npz")
    m.save(p)
    m2 = PerplexityModel.load(p)
    s = pd.Series(["the quick brown fox", "zzz qqq www"])
    assert (m.log_perplexity_series(s) == m2.log_perplexity_series(s)).all()


def test_training_is_deterministic():
    a, b = LangIdModel.train(), LangIdModel.train()
    assert np.array_equal(a.weights, b.weights)
    pa, pb = PerplexityModel.train(), PerplexityModel.train()
    assert np.array_equal(pa.uni, pb.uni) and np.array_equal(pa.bi, pb.bi)


def test_langid_heldout_slice_accuracy():
    from data_quality_autohealer_spark.functions.langid import (
        SEED_CORPORA, get_model,
    )
    m = get_model()
    tests = []
    for lang, corpus in SEED_CORPORA.items():
        ws = corpus.split()
        step = max(1, len(ws) // 12)
        for i in range(0, len(ws) - 12, step):
            for k in (5, 12):
                tests.append((lang, " ".join(ws[i:i + k])))
    s = pd.Series([t for _, t in tests])
    pred = m.predict_series(s)
    acc = np.mean([p == l for (l, _), p in zip(tests, pred["lang_pred"])])
    assert acc >= 0.98, f"langid slice accuracy {acc:.3f}"
