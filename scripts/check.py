#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`: for every query
result parquet in <outDir>, executes the matching oracle SQL from
oracle_sql.json in DuckDB over the same fixture tables, sorts columns by
name and rows by all columns, and compares cell-by-cell EXACTLY —
including floats. The driver hashes typed values bit-for-bit, so a float
oracle that only matches to 1e-9 locally would still fail the driver
(the r9 failure shape); oracle SQL must round/DECIMAL-ize floats to the
point of bit-identity. A per-query tolerance can be DECLARED in
TOLERANCES below for the rare oracle that genuinely needs one — the
declaration is visible and reviewable instead of a silent global 1e-9.

TYPE-STRICT (the r9 lesson): the driver's gate hashes TYPED values, so a
DuckDB HUGEINT (bare `sum()` over BIGINT, surfacing as float64/object)
against a Spark BIGINT fails the driver even when every value is equal.
This script therefore fails on dtype drift between the two frames
(DTYPE-MISMATCH) instead of coercing through a value compare — both on
int-vs-float kind drift AND on object-vs-numeric drift (HUGEINT can
surface as object dtype holding Python ints, r10 advice). The oracle
SQL must CAST to the exact type the Spark plan emits.

Usage: python3 scripts/check.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Per-query DECLARED relative float tolerance. Empty is the goal: every
# oracle is written to bit-identity (rounded/DECIMAL-ized floats), which
# is what the driver's typed hash requires anyway. Add an entry ONLY
# when an oracle provably cannot be stated bit-identically, and note why.
TOLERANCES: dict = {}


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cells_equal(a, b, tol: float = 0.0) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        if (a is None or (isinstance(a, float) and math.isnan(a))) and \
           (b is None or (isinstance(b, float) and math.isnan(b))):
            return True
        if a is None or b is None:
            return False
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        if tol > 0.0:
            return abs(fa - fb) <= tol * max(1.0, abs(fa), abs(fb))
        # Exact — what the driver's typed hash demands of the oracle.
        return fa == fb
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(cells_equal(x, y, tol) for x, y in zip(la, lb))
    return a == b


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    import os
    results = {}
    query_dirs = sorted(d for d in os.listdir(out_dir)
                        if os.path.isdir(f"{out_dir}/{d}"))
    for name in query_dirs:
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            results[name] = f"READ-FAIL {e}"
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(spark_df)} rows)" \
                if len(spark_df) > 0 else "EMPTY (rows-only FAIL)"
            continue
        try:
            oracle_df = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-SQL-FAIL {e}"
            continue
        a, b = canon(spark_df), canon(oracle_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(a.columns)} oracle={list(b.columns)}"
            continue
        # Type-strict gate: integer-vs-float drift (DuckDB HUGEINT/DOUBLE
        # widening) fails the driver's typed hash even when values match.
        # Also object-vs-numeric: HUGEINT can surface as object dtype
        # holding Python ints, which the old {i,u,f}-only gate let slip
        # through to the value compare (r10 advice).
        def _drift(ka, kb):
            num = {"i", "u", "f"}
            if ka in num and kb in num:
                return ka != kb
            return ("O" in (ka, kb)) and (ka in num or kb in num)
        dtype_bad = [
            (c, str(a[c].dtype), str(b[c].dtype)) for c in a.columns
            if str(a[c].dtype) != str(b[c].dtype)
            and _drift(a[c].dtype.kind, b[c].dtype.kind)]
        if dtype_bad:
            results[name] = f"DTYPE-MISMATCH {dtype_bad}"
            continue
        if len(a) != len(b):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(a)} oracle={len(b)}"
            continue
        bad = []
        tol = TOLERANCES.get(name, 0.0)
        av, bv = a.to_numpy(dtype=object), b.to_numpy(dtype=object)
        for i in range(len(a)):
            for j in range(len(a.columns)):
                if not cells_equal(av[i, j], bv[i, j], tol):
                    bad.append((i, a.columns[j], av[i, j], bv[i, j]))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        results[name] = "OK" if not bad else f"VALUE-MISMATCH {bad}"

    n_ok = sum(1 for v in results.values()
               if v == "OK" or v.startswith("rows-only"))
    for name, v in sorted(results.items()):
        mark = "✓" if (v == "OK" or v.startswith("rows-only")) else "✗"
        print(f"{mark} {name}: {v}")
    print(f"\n{n_ok}/{len(results)} passing")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
