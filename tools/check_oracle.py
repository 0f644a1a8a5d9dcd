#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run DuckDB oracle
SQL against the same sf parquet tables and compare with the Verify output
parquet — columns sorted by name, exact value match (a stricter check
than any plausible driver compare).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import os
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        # The driver hashes serialized values, so -0.0 vs +0.0 (numerically
        # equal) is a FAIL there; mirror that by requiring same sign bit.
        return a == b and math.copysign(1.0, a) == math.copysign(1.0, b)
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> str:
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        return f"SCHEMA cols spark={list(s.columns)} duck={list(d.columns)}"
    if len(s) != len(d):
        return f"ROWS spark={len(s)} duck={len(d)}"
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if not cells_equal(a, b):
                return f"VALUE col={col} row={i} spark={a!r} duck={b!r}"
    # dtype drift worth knowing about even when values compare equal
    dt = [(c, str(s[c].dtype), str(d[c].dtype)) for c in s.columns
          if str(s[c].dtype) != str(d[c].dtype)]
    if dt:
        return f"OK (dtype drift: {dt})"
    return "OK"


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships one parquet FILE per table; derived
        # inputs (tools/stress.py) are Spark-written DIRECTORIES
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: NO SPARK OUTPUT ({e})")
            failures += 1
            continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE SQL FAILED ({e})")
            failures += 1
            continue
        verdict = compare(name, spark_df, duck_df)
        print(f"{name}: {verdict}")
        if not verdict.startswith("OK"):
            failures += 1
    print(f"\n{len(oracle) - failures}/{len(oracle)} oracle queries match")
    return 1 if failures else 0


def selftest() -> int:
    """Pin the failure classes the compare must catch — above all the
    signed zero that slipped past `a == b` in round 4 (q101)."""
    assert cells_equal(1.5, 1.5)
    assert cells_equal(float("nan"), float("nan"))
    assert cells_equal(None, None)
    assert not cells_equal(1.0, 1.0000001)
    assert not cells_equal(-0.0, 0.0), "signed zero must FAIL (driver hashes bytes)"
    assert not cells_equal(0.0, -0.0)
    assert cells_equal(-0.0, -0.0)
    print("selftest OK: signed-zero fixture flagged")
    return 0


if __name__ == "__main__":
    if sys.argv[1:] == ["--selftest"]:
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
