#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: load each Verify
parquet output, run the corresponding oracle SQL in DuckDB over the same
testdata tables, and compare (schema by column names, values by
row-hashing after sorting columns by name).

Usage: check_oracle.py <verify_out_dir> <sf_dir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize value representations
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        else:
            import decimal

            def norm(v):
                if v is None:
                    return None
                if isinstance(v, decimal.Decimal):
                    s = format(v.normalize(), "f")
                    return s[:-1] if s.endswith(".") else s
                if isinstance(v, float):
                    s = format(decimal.Decimal(repr(v)).normalize(), "f")
                    return s[:-1] if s.endswith(".") else s
                return v
            try:
                if df[c].dtype == object or str(df[c].dtype).startswith("float"):
                    df[c] = df[c].map(norm)
            except Exception:
                pass
    return df.reset_index(drop=True)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark output missing ({e})")
            n_fail += 1
            continue
        try:
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns differ spark={list(got.columns)} duck={list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows differ spark={len(got)} duck={len(exp)}")
            n_fail += 1
            continue
        g = got.astype(str)
        e = exp.astype(str)
        if not g.equals(e):
            diff = (g != e).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: {int(diff.sum())}/{len(g)} rows differ; first diffs:")
            for i in idx:
                for c in g.columns:
                    if g.at[i, c] != e.at[i, c]:
                        print(f"  row {i} col {c}: spark={g.at[i, c]!r} duck={e.at[i, c]!r}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
