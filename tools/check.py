#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: load each Verify
parquet result, run the oracle SQL in DuckDB over the same testdata, and
compare rows / schema / values (columns sorted by name, like the driver).

Usage: python3 tools/check.py /tmp/verify_out /root/testdata/sf0.01 [query...]
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)


def tz_mismatch(a: pd.DataFrame, b: pd.DataFrame):
    """The driver compares schemas strictly: a tz-aware TIMESTAMPTZ on one
    side vs a naive TIMESTAMP on the other is a schema_match failure. Do
    NOT silently normalize it away here (that made the local gate pass
    queries the real driver failed in round 2)."""
    for c in a.columns:
        aw = isinstance(a[c].dtype, pd.DatetimeTZDtype)
        bw = isinstance(b[c].dtype, pd.DatetimeTZDtype)
        if aw != bw:
            return c
    return None


def int_float_mismatch(a: pd.DataFrame, b: pd.DataFrame):
    """The driver hashes values as-typed: an int64 column on one side vs a
    float64 on the other (e.g. a bare DuckDB integer sum() widening to
    HUGEINT, which pandas surfaces as float64) is a hash_match failure even
    when the values are numerically equal. Do NOT coerce it away here (that
    made the local gate pass queries the real driver failed in rounds 2 AND
    3 — fix the oracle SQL with an explicit CAST instead)."""
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if (ka in "iu" and kb == "f") or (ka == "f" and kb in "iu"):
            return c, "int vs float dtype — CAST the oracle aggregate (DuckDB sum() widens to HUGEINT)"
        # same-kind width mismatches (int32 vs int64, float32 vs float64):
        # the round-4 driver hashed these equal, but the local gate stays
        # stricter — an explicit CAST in the oracle costs nothing and
        # removes the bet on the driver's normalization
        if (ka in "iuf" and kb in "iuf" and a[c].dtype != b[c].dtype):
            return c, "same-kind width mismatch — CAST the oracle column to the exact Spark type"
    return None


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = norm(pd.concat([pd.read_parquet(f) for f in files]))
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}"); n_fail += 1; continue
        try:
            duck_df = norm(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}"); n_fail += 1; continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_fail += 1; continue
        tzc = tz_mismatch(spark_df, duck_df)
        if tzc:
            print(f"FAIL {name}: col {tzc}: tz-aware vs naive timestamp "
                  f"(spark={spark_df[tzc].dtype} duck={duck_df[tzc].dtype})")
            n_fail += 1; continue
        ifc = int_float_mismatch(spark_df, duck_df)
        if ifc:
            c, why = ifc
            print(f"FAIL {name}: col {c}: "
                  f"(spark={spark_df[c].dtype} duck={duck_df[c].dtype}) {why}")
            n_fail += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1; continue
        bad = None
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            try:
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    af = a.astype(float).to_numpy()
                    bf = b.astype(float).to_numpy()
                    eq = (af == bf) | (np.isnan(af) & np.isnan(bf))
                else:
                    eq = (a.astype(object).to_numpy() == b.astype(object).to_numpy()) | \
                         (a.isna().to_numpy() & b.isna().to_numpy())
            except Exception as e:
                bad = (c, f"compare error {e}"); break
            if not eq.all():
                i = int(np.argmax(~eq))
                bad = (c, f"row {i}: spark={a.iloc[i]!r} duck={b.iloc[i]!r} "
                          f"(+{int((~eq).sum())-1} more)")
                break
        if bad:
            print(f"FAIL {name}: col {bad[0]}: {bad[1]}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
