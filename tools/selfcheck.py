#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare with the parquet that
graft.Verify dumped. Column order is normalized by sorting column names.

The comparison is dtype-strict, mirroring the driver's hash: an int64 Spark
column against a float64 oracle column (e.g. DuckDB HUGEINT sum widened to
float) FAILS even when every value is numerically equal — that is exactly
the q42/q43 round-3 miss the old tolerance-based compare let through.
Usage:

    python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cmp_frames(name, spark_df, duck_df):
    errs = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return [f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"]
    if len(spark_df) != len(duck_df):
        return [f"row count differs: spark={len(spark_df)} duck={len(duck_df)}"]
    a, b = norm(spark_df), norm(duck_df)
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        # Strict like the driver's hash: int-vs-float (or any numeric kind
        # mismatch) is a failure even when the values agree. 'O' (object,
        # e.g. decimal/str/None-holding) is compared value-wise below.
        if ka != kb and "O" not in (ka, kb):
            errs.append(
                f"col {c} dtype kind differs: spark={a[c].dtype} duck={b[c].dtype}")
    if errs:
        return errs
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            xf = isinstance(x, float) or isinstance(y, float)
            if xf:
                x = float("nan") if x is None else float(x)
                y = float("nan") if y is None else float(y)
                if math.isnan(x) and math.isnan(y):
                    continue
                if abs(x - y) > 1e-9 * max(1.0, abs(x), abs(y)):
                    errs.append(f"col {c} row {i}: spark={x} duck={y}")
                    break
            elif str(x) != str(y):
                errs.append(f"col {c} row {i}: spark={x!r} duck={y!r}")
                break
    return errs


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob
    produced = {p.rstrip("/").split("/")[-1]
                for p in glob.glob(f"{out_dir}/*/")}
    n_pass = n_fail = 0
    for name in sorted(produced):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            print(f"ROWS {name}: no oracle, rows={len(spark_df)}")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        errs = cmp_frames(name, spark_df, duck_df)
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs[:3]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    missing = set(oracle) - produced
    for m in sorted(missing):
        print(f"FAIL {m}: oracle present but no spark output")
        n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(produced - set(oracle))} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
