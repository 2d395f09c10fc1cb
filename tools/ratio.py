#!/usr/bin/env python3
"""Per-query Spark/oracle ratio report: joins the committed bench
record (BENCH_LOCAL.json) with a same-host oracle timing run
(oracle_bench.py output, or runs it inline when given an
oracle_sql.json), and prints the queries sorted by ratio with the
weak-list rule applied (ratio > 2x AND spark >= 1s absolute).

Usage:
  python3 tools/ratio.py <oracle_times.json>
  python3 tools/ratio.py --run <oracle_sql.json> <sf_dir> [query...]
"""
import json
import subprocess
import sys


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    if sys.argv[1] == "--run":
        out = subprocess.run(
            [sys.executable, "tools/oracle_bench.py"] + sys.argv[2:],
            capture_output=True, text=True, check=True).stdout
        oracle = json.loads(out.strip().splitlines()[-1])["oracle_sec"]
    else:
        rec = json.load(open(sys.argv[1]))
        oracle = rec.get("oracle_sec", rec)
    bench = json.load(open("BENCH_LOCAL.json"))
    spark = bench["queries"]
    rows = []
    for q, osec in oracle.items():
        ssec = spark.get(q)
        if ssec is None or ssec < 0 or not osec:
            continue
        rows.append((ssec / osec, ssec, osec, q))
    rows.sort(reverse=True)
    weak = []
    print(f"{'ratio':>7} {'spark':>7} {'oracle':>7}  query")
    for ratio, ssec, osec, q in rows:
        flag = ""
        if ratio > 2.0 and ssec >= 1.0:
            flag = "  <-- WEAK"
            weak.append(q)
        print(f"{ratio:7.1f} {ssec:7.2f} {osec:7.2f}  {q}{flag}")
    print(f"\nweak (ratio > 2x AND spark >= 1s): {len(weak)} {weak}")
    missing = sorted(set(spark) - set(oracle))
    if missing:
        print(f"(no oracle timing for {len(missing)} bench queries — "
              f"pass them to --run for full coverage)")


if __name__ == "__main__":
    main()
