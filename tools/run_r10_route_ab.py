"""Round-10 interleaved A/B: in-row coarse routing (codebook literal,
zero-shuffle) vs the broadcast+window exchange path, flipped per run via
``llm._ROUTE_LITERAL_CAP`` inside ONE session so host-level CPU drift
(this sandbox measures 1.3-1.7x control swings between sessions) cancels.
Arms alternate A,B,A,B,... per query; min-of-N per arm is the headline
(the established discipline). Results -> ROUTE_AB_r10.json.

Usage: python tools/run_r10_route_ab.py [reps=3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES_AB = [
    "s2_ann_ivf",
    "s6_ivfadc_topk",
    "s8_ivfadc_residual",
    "s10_ivf_sq8_topk",
    "s11_ivf_sq8_index",
    "s15_ivfadc_index_rerank",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import medvedi_spark.operators.llm as llm
    from medvedi_spark.operators.llm import release_persisted
    from medvedi_spark.queries.registry import QUERIES, _ensure_loaded
    from medvedi_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("r10-route-ab")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["c1_arrow_roundtrip"].builder(spark, SF).count()
    # warm the session codebook caches so neither arm pays training
    from medvedi_spark.queries.llm_ops import _trained_codebook, _trained_residual_codebook

    _trained_codebook(spark, SF)
    _trained_residual_codebook(spark, SF)
    release_persisted()

    default_cap = llm._ROUTE_LITERAL_CAP
    out: dict = {"sf_dir": SF, "queries": {}}
    for name in QUERIES_AB:
        rec = {"inrow": [], "exchange": []}
        for _ in range(reps):
            for arm, cap in (("inrow", default_cap), ("exchange", 0)):
                llm._ROUTE_LITERAL_CAP = cap
                t0 = time.perf_counter()
                QUERIES[name].builder(spark, SF).count()
                rec[arm].append(round(time.perf_counter() - t0, 3))
                release_persisted()
        llm._ROUTE_LITERAL_CAP = default_cap
        rec["inrow_min"] = min(rec["inrow"])
        rec["exchange_min"] = min(rec["exchange"])
        out["queries"][name] = rec
        print(name, json.dumps(rec))
    with open(os.path.join(ROOT, "ROUTE_AB_r10.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
