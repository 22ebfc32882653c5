"""In-suite DuckDB oracle parity for a representative subset of the driver
queries, so `python -m pytest -x -q` (the BASELINE verify command) exercises
the cross-engine gate end-to-end at sf0.001."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from tools.check_oracle import TABLES, value_hash  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "quality_signals", "quality_decision", "quality_drop_summary",
    "langid_stopword_heuristic", "exact_dedup_groups", "minhash_signatures",
    "simhash", "pii_scrub", "knn_cosine_topk", "token_count_bpe",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_duckdb_twin(name, spark, duck):
    sdf = entry_mod.queries()[name](spark, SF_DIR).toPandas()
    odf = duck.execute(entry_mod.oracle_sql()[name]).fetchdf()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert value_hash(sdf) == value_hash(odf)
