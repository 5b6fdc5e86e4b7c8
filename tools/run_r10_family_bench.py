"""Targeted family bench: bench.py's exact methodology (same session
config, warm-up trio, 3 warm `.count()` runs, median + min, control
anchor) over a named subset of queries — the per-change evidence runs
for OPTIMIZATION_r10.md without paying a full 145-query sweep.

Usage: python tools/run_r10_family_bench.py OUT.json q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_path, names = sys.argv[1], sys.argv[2:]
    os.environ.setdefault("SPARK_GRAFT_STREAM_INGEST_PARTITIONS", "32")

    from medvedi_spark.operators.llm import release_persisted
    from medvedi_spark.queries.registry import QUERIES, _ensure_loaded
    from medvedi_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("medvedi-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    for wname in ("c1_arrow_roundtrip", "q13_window_funcs", "d1_exact_dedup"):
        QUERIES[wname].builder(spark, SF).count()
    release_persisted()

    control: dict[str, float] = {}
    for cname in ("c1_arrow_roundtrip", "q13_window_funcs", "d1_exact_dedup"):
        cs = []
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[cname].builder(spark, SF).count()
            cs.append(time.perf_counter() - t0)
        control[cname] = round(sorted(cs)[1], 4)
    release_persisted()

    med, mn = {}, {}
    for name in names:
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[name].builder(spark, SF).count()
            samples.append(time.perf_counter() - t0)
        release_persisted()
        samples.sort()
        med[name] = round(samples[1], 4)
        mn[name] = round(samples[0], 4)

    out = {
        "sf_dir": SF,
        "control_sec": round(sum(control.values()), 4),
        "control": control,
        "queries": med,
        "queries_min": mn,
        "total": round(sum(med.values()), 4),
        "total_min": round(sum(mn.values()), 4),
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
