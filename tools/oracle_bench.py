#!/usr/bin/env python3
"""Same-host oracle timing: run each query's DuckDB oracle SQL over the
given testdata dir, min-of-N, and print per-query seconds — the
denominator of the judge's per-query 2x line. Pair with graft.Bench run
on the same machine for an honest ratio.

Usage: python3 tools/oracle_bench.py <oracle_sql.json> <sf_dir> [query...]
"""
import json, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sql_path, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(sql_path))
    # a stale oracle_sql.json silently dropping requested queries reads
    # as "that query is fast/absent" — make the mismatch fatal instead
    unknown = only - set(oracles)
    if unknown:
        sys.exit(f"[oracle] unknown queries (stale {sql_path}?): {sorted(unknown)}")
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    out, failed = {}, []

    def timed(name, sql):
        t0 = time.monotonic()
        try:
            con.execute(sql).fetchall()
        except Exception as e:
            print(f"[oracle] {name} failed: {e}", file=sys.stderr)
            return None
        return time.monotonic() - t0

    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        times = [timed(name, sql) for _ in range(2)]
        if any(t is None for t in times):
            failed.append(name)
            continue
        best = min(times)
        if best > 2.0:  # long queries: third run, still failure-guarded
            t3 = timed(name, sql)
            best = best if t3 is None else min(best, t3)
        out[name] = round(best, 3)
    print(json.dumps({"oracle_sec": out, "failed": failed, "sf": sf_dir}))


if __name__ == "__main__":
    main()
