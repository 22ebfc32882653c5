"""CSV/JSONL source+sink round-trips (reference S2/S3: pd.read_csv /
df.to_csv edges in quality_service.py:65, outlier_remediation.py:100-104)
and the drift-retrained perplexity-model env override."""

import os

import pytest

from data_quality_autohealer_spark.sources import tables


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", -0.25), (3, None, 0.0)],
        "id long, name string, score double")
    path = str(tmp_path / "csv_out")
    tables.write_csv(df, path)
    back = tables.read_csv(spark, path,
                           schema="id long, name string, score double")
    rows = {r["id"]: (r["name"], r["score"]) for r in back.collect()}
    assert rows == {1: ("alpha", 1.5), 2: ("beta", -0.25), 3: (None, 0.0)}


def test_csv_infer_schema(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    path = str(tmp_path / "csv_inf")
    tables.write_csv(df, path)
    back = tables.read_csv(spark, path)
    assert back.collect()[0]["id"] == 1


def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    path = str(tmp_path / "jsonl")
    df.write.json(path)
    back = tables.read_jsonl(spark, path, schema="id long, s string")
    assert {r["id"] for r in back.collect()} == {1, 2}


def test_perplexity_model_env_override(tmp_path):
    import pandas as pd
    from data_quality_autohealer_spark.functions import perplexity as P

    retrained = P.PerplexityModel.train_texts(
        ["the zebra quokka axolotl wanders nightly"] * 5)
    path = str(tmp_path / "pplx.npz")
    retrained.save(path)
    try:
        os.environ[P.MODEL_PATH_ENV] = path
        P.reset_model_cache()
        m = P.get_model()
        # the override model knows the retrain corpus words; the seed model
        # treats them as OOV — log-pplx must be far lower under the override
        sample = pd.Series(["zebra quokka axolotl wanders nightly"])
        override_pplx = float(m.log_perplexity_series(sample)[0])
    finally:
        del os.environ[P.MODEL_PATH_ENV]
        P.reset_model_cache()
    seed_pplx = float(P.get_model().log_perplexity_series(
        pd.Series(["zebra quokka axolotl wanders nightly"]))[0])
    assert override_pplx < seed_pplx - 2.0


def test_pyfiles_zip_matches_package():
    """dist/dqa_spark.zip is build-on-demand (gitignored): the builder must
    package exactly the current package sources, byte-identical — a stale
    zip shipped to --py-files is a silent version skew (VERDICT r02 item 7)."""
    import os
    import zipfile

    from tools import make_pyfiles

    out = make_pyfiles.main()
    root = make_pyfiles.ROOT
    expected = {}
    for base, _, files in os.walk(os.path.join(root, make_pyfiles.PKG)):
        if "__pycache__" in base:
            continue
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(base, f)
                expected[os.path.relpath(full, root)] = open(full, "rb").read()
    with zipfile.ZipFile(out) as z:
        got = {n: z.read(n) for n in z.namelist()}
    assert got == expected
