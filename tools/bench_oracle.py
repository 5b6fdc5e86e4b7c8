"""Time the DuckDB oracles at a given scale factor (the BASELINE ledger's
comparison column). Mirrors bench.py: median of N runs, one JSON line.

Usage: python tools/bench_oracle.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medvedi_spark.catalog import TABLES
from medvedi_spark.queries.registry import QUERIES, _ensure_loaded

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    _ensure_loaded()
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    timings: dict[str, float] = {}
    for name, q in QUERIES.items():
        if q.oracle is None or "nobench" in q.tags:
            continue
        samples = []
        for _ in range(max(1, RUNS)):
            t0 = time.perf_counter()
            con.execute(q.oracle).fetchall()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 4)
    total = round(sum(timings.values()), 4)
    print(json.dumps({"metric": "oracle_total_wall", "value": total, "unit": "sec", "queries": timings, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
