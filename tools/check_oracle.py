"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at a given sf, compare
row count + column names + order-insensitive value hash."""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from data_quality_autohealer_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = []
    for tup in pdf.itertuples(index=False):
        rows.append("|".join(_norm(v) for v in tup))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def _norm(v) -> str:
    # Deliberately STRICT: float 123.0 and int 123 normalize differently, so
    # a DuckDB HUGEINT-sum→float64 vs Spark int64 mismatch fails HERE the way
    # it fails in the driver (round-1 lesson: a loose normalizer masked four
    # driver hash mismatches).
    if v is None or v != v:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return repr(round(v, 9))
    try:
        import numpy as np
        if isinstance(v, (np.integer,)):
            return str(int(v))
        if isinstance(v, (np.floating,)):
            return repr(round(float(v), 9))
        if isinstance(v, (np.bool_,)):
            return str(int(v))
    except Exception:
        pass
    return str(v)


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None,
         master: str = "local[8]", shuffle_partitions: int = 8):
    spark = get_spark(master=master, shuffle_partitions=shuffle_partitions)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"{name:30s} SPARK ERROR: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"{name:30s} rows={len(sdf):6d} (rows-only check, no oracle)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"{name:30s} DUCKDB ERROR: {str(e)[:300]}")
            continue
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_cols and value_hash(sdf) == value_hash(odf)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(f"{name:30s} {status} rows={len(sdf)}/{len(odf)} "
              f"cols={'OK' if ok_cols else sorted(sdf.columns)!r}"
              f"{'' if ok_cols else sorted(odf.columns)} hash={'OK' if ok_hash else 'MISMATCH'}")
    print("\nFAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    only = sys.argv[2:] if len(sys.argv) > 2 else None
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
                  only))
