#!/usr/bin/env python3
"""Local pre-validation of SparkEntry's oracle contract, mimicking the
driver's correctness gate: run graft.Verify into an outDir, then compare
each query's parquet result against DuckDB executing the oracle SQL over
the same sf parquet tables. Columns sorted by name, rows sorted by all
columns, values compared exactly (after both sides' rounding).

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    import glob
    import os
    ok = fail = 0
    for qdir in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(qdir)
        spark = con.execute(
            f"SELECT * FROM '{qdir}/*.parquet'").fetchdf()
        if name not in oracle:
            status = "ROWS-ONLY" if len(spark) > 0 else "ROWS-ONLY-EMPTY!"
            if len(spark) == 0:
                fail += 1
            else:
                ok += 1
            print(f"{name}: {status} rows={len(spark)}")
            continue
        try:
            oracle_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE-SQL-ERROR {e}")
            fail += 1
            continue
        s, o = norm(spark), norm(oracle_df)
        if list(s.columns) != list(o.columns):
            print(f"{name}: COLS-MISMATCH spark={list(s.columns)} oracle={list(o.columns)}")
            fail += 1
            continue
        if [str(t) for t in s.dtypes] != [str(t) for t in o.dtypes]:
            print(f"{name}: DTYPES-DIFFER spark={[str(t) for t in s.dtypes]} "
                  f"oracle={[str(t) for t in o.dtypes]} (may still hash-match)")
        if len(s) != len(o):
            print(f"{name}: ROWS-MISMATCH spark={len(s)} oracle={len(o)}")
            fail += 1
            continue
        eq = s.reset_index(drop=True).astype(str).eq(
            o.reset_index(drop=True).astype(str))
        if eq.all().all():
            print(f"{name}: OK rows={len(s)}")
            ok += 1
        else:
            bad_cols = [c for c in eq.columns if not eq[c].all()]
            print(f"{name}: VALUES-MISMATCH cols={bad_cols}")
            for c in bad_cols[:3]:
                idx = (~eq[c]).idxmax()
                print(f"    {c}[{idx}]: spark={s[c][idx]!r} oracle={o[c][idx]!r}")
            fail += 1
    print(f"\n{ok} ok, {fail} failed")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
