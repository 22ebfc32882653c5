"""DAG-shaped remediation artifacts (VERDICT r02 item 5): the five
reference Airflow chains (src/remediation/airflow_dags/*.py) as importable,
executable Task/DAG definitions over the repo's real operators."""

import pytest

from data_quality_autohealer_spark.plans import dags as D

# (dag_id, expected chain as Airflow declares it — lists are fan-out stages)
REFERENCE_CHAINS = {
    # outlier_remediation.py:227
    "outlier_remediation": [
        "detect_outliers", ["quarantine_outliers",
                            "apply_statistical_correction"],
        "validate_remediation", "send_notification"],
    # missing_data_remediation.py:195
    "missing_data_remediation": [
        "analyze_missing_patterns", "impute_missing_values",
        "validate_imputation", "send_notification"],
    # type_mismatch.py:193
    "type_mismatch_remediation": [
        "detect_type_mismatches", "coerce_data_types",
        "validate_type_coercion", "send_notification"],
    # schema_drift_remediation.py:251
    "schema_drift_remediation": [
        "detect_schema_changes", "update_schema_registry",
        "trigger_data_reingestion", "validate_remediation",
        "send_completion_notification"],
    # distribution_shift_remediation.py:231
    "distribution_shift_remediation": [
        "collect_new_data", "retrain_model", "validate_model",
        "deploy_model", "send_notification"],
}


def _stages(chain):
    return [s if isinstance(s, list) else [s] for s in chain]


@pytest.mark.parametrize("dag_id", sorted(REFERENCE_CHAINS))
def test_dag_structure_matches_reference(dag_id):
    dag = D.all_dags()[dag_id]
    stages = _stages(REFERENCE_CHAINS[dag_id])
    assert sorted(dag.tasks) == sorted(t for s in stages for t in s)
    assert sorted(dag.roots()) == sorted(stages[0])
    assert sorted(dag.leaves()) == sorted(stages[-1])
    # each task's upstream set == the full previous stage (the >> contract)
    for prev, cur in zip(stages, stages[1:]):
        for tid in cur:
            assert dag.tasks[tid].upstream == set(prev), \
                f"{dag_id}.{tid} upstream {dag.tasks[tid].upstream}"
    # topo order respects stage boundaries
    pos = {tid: i for i, tid in enumerate(dag.topo_order())}
    for prev, cur in zip(stages, stages[1:]):
        assert max(pos[t] for t in prev) < min(pos[t] for t in cur)


def test_outlier_fanout_is_the_only_fanout():
    counts = {dag_id: max(len(t.downstream)
                          for t in dag.tasks.values())
              for dag_id, dag in D.all_dags().items()}
    assert counts.pop("outlier_remediation") == 2
    assert all(v == 1 for v in counts.values())


def test_cycle_detection():
    a, b = D.Task("a", lambda c: None), D.Task("b", lambda c: None)
    a >> b >> a
    with pytest.raises(ValueError, match="cycle"):
        D.DAG("cyclic", "boom", [a, b])


def test_outlier_dag_executes(spark):
    rows = [(float(v),) for v in [10, 11, 12, 10, 11, 13, 12, 11, 500.0]]
    df = spark.createDataFrame(rows, "x double")
    ctx = D.build_outlier_dag().run({"df": df, "column": "x"})
    assert ctx["validated"] and ctx["n_quarantined"] == 1
    assert ctx["census"]["outlier_count"] == 1
    assert ctx["clean"].count() == 8
    assert ctx["winsorized"].agg({"x": "max"}).collect()[0][0] < 500.0
    assert ctx["notifications"][-1]["dag_id"] == "outlier_remediation"


def test_missing_and_type_dags_execute(spark):
    df = spark.createDataFrame(
        [(1.0, "a", "7"), (None, "b", "8"), (3.0, None, "oops")],
        "v double, s string, k string")
    ctx = D.build_missing_data_dag().run({"df": df})
    assert ctx["validated"]
    assert ctx["imputed"].where("v is null or s is null").count() == 0

    ctx2 = D.build_type_mismatch_dag().run(
        {"df": df, "targets": {"k": "double"}})
    assert ctx2["validated"] and ctx2["mismatches"] == {"k": 1}
    assert dict(ctx2["coerced"].dtypes)["k"] == "double"


def test_schema_drift_dag_executes(spark, tmp_path):
    from data_quality_autohealer_spark.operators.schema_drift import (
        SchemaRegistry,
    )
    reg = SchemaRegistry(str(tmp_path / "registry.json"))
    v1 = spark.createDataFrame([(1, "x")], "id int, name string")
    reg.record("t", v1)
    v2 = spark.createDataFrame([(1, "x", 0.5)],
                               "id int, name string, score double")
    ctx = D.build_schema_drift_dag().run(
        {"df": v2, "registry": reg, "table": "t"})
    assert ctx["drift"]["has_drift"] and ctx["drift"]["new_columns"] == ["score"]
    assert ctx["validated"] and ctx["reingested_rows"] == 1


def test_distribution_shift_dag_executes(spark, tmp_path):
    import numpy as np

    from data_quality_autohealer_spark import synth
    from data_quality_autohealer_spark.plans.pipeline import run_filter
    from data_quality_autohealer_spark.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "dagwh"), num_buckets=4)
    wh.write_pages(synth.gen_pages_df(spark, 300, num_partitions=2))
    run_filter(wh, "r1")
    # no-shift path: same run as its own baseline → retrain skipped
    ctx = D.build_distribution_shift_dag().run(
        {"wh": wh, "run_id": "r1", "baseline_run_id": "r1",
         "sample_docs": 50})
    assert ctx["clean_docs"] > 0
    assert ctx["validated"] and not ctx["retrain"]["retrained"]
    assert ctx["deployed_model"] is None
    # forced-shift path: threshold 0 under any nonzero drift would retrain;
    # instead drive the documented env hook through a real retrain
    ctx2 = D.build_distribution_shift_dag().run(
        {"wh": wh, "run_id": "r1", "baseline_run_id": "missing",
         "shift_threshold": 0.01, "sample_docs": 50})
    assert ctx2["retrain"]["retrained"] and ctx2["validated"]
    assert ctx2["deploy_env"]["DQA_PPLX_MODEL"] == ctx2["deployed_model"]


def test_crawl_to_mix_dag_executes_end_to_end(spark, tmp_path):
    """The capstone pipeline DAG: synth crawl -> ingest -> filter ->
    {dedup, census} -> export, executed topologically for real."""
    from data_quality_autohealer_spark.plans.dags import (
        build_crawl_to_mix_dag,
    )

    dag = build_crawl_to_mix_dag()
    ctx = dag.run({
        "spark": spark,
        "crawl_dir": str(tmp_path / "crawl"),
        "warehouse_dir": str(tmp_path / "wh"),
        "out_dir": str(tmp_path / "mix"),
        "synth_segments": 2,
        "docs_per_segment": 150,
        "num_buckets": 4,
        "shards": 4,
    })
    assert ctx["pages_in"] == 300
    s = ctx["filter_summary"]
    assert s["docs_in"] == 300 and 0 < s["docs_kept"] <= 300
    assert 0 < ctx["docs_deduped"] <= ctx["docs_clean"] == s["docs_kept"]
    assert sum(ctx["lang_census"].values()) == s["docs_kept"]
    assert ctx["export_summary"]["docs_out"] == ctx["docs_deduped"]
    back = spark.read.json(str(tmp_path / "mix"))
    assert back.count() == ctx["docs_deduped"]
    assert ctx["notifications"][-1]["dag_id"] == "crawl_to_training_mix"


def test_crawl_to_mix_dag_dsir_gate(spark, tmp_path):
    """ctx['dsir_target'] threads the DSIR importance gate into the
    export stage: the summary carries the gate block and the exported
    set is the selected subset."""
    from data_quality_autohealer_spark.plans.dags import (
        build_crawl_to_mix_dag,
    )

    dag = build_crawl_to_mix_dag()
    ctx = dag.run({
        "spark": spark,
        "crawl_dir": str(tmp_path / "crawl"),
        "warehouse_dir": str(tmp_path / "wh"),
        "out_dir": str(tmp_path / "mix"),
        "synth_segments": 2,
        "docs_per_segment": 150,
        "num_buckets": 4,
        "shards": 4,
        "dsir_target": "lang = 'en'",
    })
    es = ctx["export_summary"]
    assert es["dsir"]["target"] == "lang = 'en'"
    assert 0 < es["dsir"]["docs_selected"] <= es["dsir"]["docs_in"]
    assert es["docs_in"] == es["dsir"]["docs_selected"]
    back = spark.read.json(str(tmp_path / "mix"))
    assert back.count() == es["docs_out"]


def test_incremental_crawl_dag_two_waves(spark, tmp_path):
    """Two crawl waves through the incremental DAG: wave 1 builds the
    signature index from nothing; wave 2 (a superset crawl re-containing
    wave 1's docs) is decontaminated against it — the overlap never
    re-enters, the index grows by exactly wave 2's clean docs."""
    from data_quality_autohealer_spark.plans.dags import (
        build_incremental_crawl_dag,
    )

    base = {
        "spark": spark,
        "warehouse_dir": str(tmp_path / "wh"),
        "num_buckets": 4,
        "shards": 4,
    }
    dag = build_incremental_crawl_dag()
    w1 = dag.run({**base, "run_id": "w1",
                  "crawl_dir": str(tmp_path / "crawl1"),
                  "out_dir": str(tmp_path / "mix1"),
                  "synth_segments": 2, "docs_per_segment": 100})
    assert w1["pages_in"] == 200
    # wave 1: no index yet -> nothing decontaminated
    assert w1["pages_novel"] == 200
    w1_clean = w1["filter_summary"]["docs_kept"]
    assert 0 < w1_clean <= 200
    assert w1["index_docs"] == w1_clean

    # wave 2: same generator, more docs per segment -> ids 0..399, whose
    # first 200 are byte-identical to wave 1's crawl
    w2 = dag.run({**base, "run_id": "w2",
                  "crawl_dir": str(tmp_path / "crawl2"),
                  "out_dir": str(tmp_path / "mix2"),
                  "synth_segments": 2, "docs_per_segment": 200})
    assert w2["pages_in"] == 400
    # every wave-1 clean doc reappears in wave 2's crawl and must be
    # dropped by decontamination (plus near-dups); novel docs survive
    assert 0 < w2["pages_novel"] <= 400 - w1_clean
    w2_clean = w2["filter_summary"]["docs_kept"]
    assert w2["index_docs"] == w1_clean + w2_clean
    assert w2["export_summary"]["docs_out"] == w2_clean
    assert ctx_last_dag_id(w2) == "incremental_crawl"

    # REPLAY wave 2 (review finding: rerun-safety): the wave's own index
    # partition is excluded from decontamination and overwritten, so the
    # replay reproduces identical outputs and the index does NOT grow
    w2b = dag.run({**base, "run_id": "w2",
                   "crawl_dir": str(tmp_path / "crawl2"),
                   "out_dir": str(tmp_path / "mix2b"),
                   "synth_segments": 2, "docs_per_segment": 200})
    assert w2b["pages_novel"] == w2["pages_novel"]
    # run_filter RESUMES under the same run_id (docs_in 0 in the summary —
    # nothing rescored); the clean table itself is unchanged
    assert w2b["filter_summary"]["docs_in"] == 0
    assert w2b["wh"].read_clean("clean_w2").count() == w2_clean
    assert w2b["index_docs"] == w1_clean + w2_clean


def ctx_last_dag_id(ctx):
    return ctx["notifications"][-1]["dag_id"]
