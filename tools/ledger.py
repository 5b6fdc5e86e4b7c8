"""Emit a BASELINE.md ledger table: engine medians (from BENCH_local.json)
beside a fresh single-sweep DuckDB-oracle timing of the same queries.

Usage: python tools/ledger.py [sf_dir]   # prints markdown to stdout
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from medvedi_spark.catalog import TABLES
from medvedi_spark.queries.registry import QUERIES, _ensure_loaded


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench = json.load(open(os.path.join(root, "BENCH_local.json")))
    engine = bench["queries"]
    engine_min = bench.get("queries_min")
    if not engine_min:
        raise SystemExit(
            "BENCH_local.json has no queries_min (pre-round-5 ledger?) — "
            "re-run bench.py first; refusing to print a zeroed min column"
        )
    _ensure_loaded()
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, name)}.parquet')"
        )
    duck: dict[str, float] = {}
    for name, q in QUERIES.items():
        if q.oracle is None or name not in engine:
            continue
        t0 = time.time()
        try:
            con.execute(q.oracle).fetchall()
            duck[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            print(f"<!-- oracle error {name}: {e} -->", file=sys.stderr)
    print("| query | engine s | engine min s | duckdb s |")
    print("|---|---|---|---|")
    for name in engine:
        d = f"{duck[name]:.3f}" if name in duck else "—"
        m = f"{engine_min[name]:.3f}" if name in engine_min else "—"
        print(f"| {name} | {engine[name]:.3f} | {m} | {d} |")
    print(
        f"\nengine total {sum(engine.values()):.1f} s "
        f"(min-sum {sum(engine_min.values()):.1f} s) over {len(engine)}; "
        f"duckdb oracle total {sum(duck.values()):.1f} s over {len(duck)}"
    )


if __name__ == "__main__":
    main()
