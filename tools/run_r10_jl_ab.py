"""Round-10 interleaved A/B: s13 corpus-projection fan-out
(_fan_out_narrow before the interpreted-decimal JL projection) vs the
un-fanned single-task scan. Arms flip by monkeypatching
``llm._fan_out_narrow`` to identity inside ONE session so host CPU
drift cancels; min-of-N per arm is the headline. Results ->
JL_AB_r10.json.

Usage: python tools/run_r10_jl_ab.py [reps=3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import medvedi_spark.operators.llm as llm
    from medvedi_spark.operators._persist import release_persisted
    from medvedi_spark.queries.registry import QUERIES, _ensure_loaded
    from medvedi_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("r10-jl-ab")
    spark.sparkContext.setLogLevel("ERROR")

    real_fan = llm._fan_out_narrow
    q = QUERIES["s13_jl_projection_topk"]

    def run() -> float:
        t0 = time.perf_counter()
        q.builder(spark, SF).count()
        dt = time.perf_counter() - t0
        release_persisted(spark)
        return round(dt, 3)

    # warm both arms
    for fn in (real_fan, lambda df: df):
        llm._fan_out_narrow = fn
        run()
    out = {"sf_dir": SF, "queries": {"s13_jl_projection_topk": {"fanned": [], "plain": []}}}
    res = out["queries"]["s13_jl_projection_topk"]
    for _ in range(reps):
        llm._fan_out_narrow = real_fan
        res["fanned"].append(run())
        llm._fan_out_narrow = lambda df: df
        res["plain"].append(run())
    llm._fan_out_narrow = real_fan
    res["fanned_min"] = min(res["fanned"])
    res["plain_min"] = min(res["plain"])
    print("fanned", res["fanned_min"], res["fanned"])
    print("plain ", res["plain_min"], res["plain"])
    with open(os.path.join(ROOT, "JL_AB_r10.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote JL_AB_r10.json")


if __name__ == "__main__":
    main()
