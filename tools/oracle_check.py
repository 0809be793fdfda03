#!/usr/bin/env python3
"""Dev-only mimic of the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import glob
import json
import math
import os
import struct
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in files]))
        try:
            exp = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            continue
        # Dtype parity FIRST: the driver hashes the representation, so
        # int64 720 vs float64 720.0 is a FAIL even when values agree
        # (DuckDB HUGEINT sums land as float64 unless CAST AS BIGINT).
        # For columns carrying NULLs, pandas coerces nullable ints to
        # float64 on BOTH sides (r11 ADVICE false-positive), so the
        # int-vs-float question is resolved from type sources that
        # survive NULLs: the parquet schema (spark side) and a DESCRIBE
        # of the oracle SQL (duckdb side, plans without executing) —
        # the gate stays on instead of being skipped (r12 verdict 6).
        got_schema = pq.read_schema(files[0])
        try:
            duck_types = {r[0]: r[1] for r in
                          con.execute(f"DESCRIBE {sql}").fetchall()}
        except Exception:
            duck_types = {}
        DUCK_INTS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
                     "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}

        def kind_spark(c):
            t = got_schema.field(c).type
            return "i" if pa.types.is_integer(t) else (
                "f" if pa.types.is_floating(t) else "o")

        def kind_duck(c):
            base = duck_types.get(c, "").split("(")[0].upper()
            return "i" if base in DUCK_INTS else (
                "f" if base in {"FLOAT", "DOUBLE", "REAL"} else "o")

        dtype_bad = None
        for c in got.columns:
            if got[c].isna().any() or exp[c].isna().any():
                if c not in duck_types or got_schema.get_field_index(c) < 0:
                    continue  # no null-proof type source; value check still runs
                gk, ek = kind_spark(c), kind_duck(c)
                gd, ed = str(got_schema.field(c).type), duck_types.get(c, "?")
            else:
                gk, ek = got[c].dtype.kind, exp[c].dtype.kind
                gd, ed = str(got[c].dtype), str(exp[c].dtype)
            if (gk in "iu" and ek == "f") or (gk == "f" and ek in "iu"):
                dtype_bad = (c, gd, ed)
                break
        if dtype_bad:
            c, gd, ed = dtype_bad
            print(f"FAIL {name}: col {c} dtype spark={gd} duckdb={ed} (int/float mismatch)")
            continue
        bad = None
        for c in got.columns:
            a, b = got[c].tolist(), exp[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                if x is pd.NA or y is pd.NA or isinstance(x, float) or isinstance(y, float):
                    fx = float("nan") if (x is None or x is pd.NA) else float(x)
                    fy = float("nan") if (y is None or y is pd.NA) else float(y)
                    # BIT-level equality, like the driver's representation
                    # hash: -0.0 != 0.0, last-bit rounding diffs fail.
                    # (NaNs: any-NaN == any-NaN, pandas normalizes them.)
                    same = (math.isnan(fx) and math.isnan(fy)) or (
                        struct.pack("<d", fx) == struct.pack("<d", fy))
                else:
                    same = x == y
                if not same:
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col {c} row {i}: spark={x!r} duckdb={y!r}")
        else:
            n_ok += 1
            print(f"OK   {name} ({len(got)} rows)")
    print(f"{n_ok}/{len(oracle)} match")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
