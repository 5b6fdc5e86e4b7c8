"""Round-10 interleaved A/B: expr-path kernel construction
(``llm._EXPR_KERNELS = True`` — vector-distance kernels, the _pq_lut
LUT/scoring block, and pq_encode's subspace distances built as single
``F.expr`` SQL strings, one py4j round-trip each) vs the composed
functions-API construction (flag False — the pre-change path, identical
analyzed plans).

Motivation (guide §1.2 step 2 / §5): cProfile of one
``ivfadc_query_rerank`` plan construction measured 4.16 s, of which
3.34 s was 7 996 py4j ``send_command`` round-trips — pure driver-side
expression-building chatter; ``_pq_lut`` alone was 2.86 s. The bench
times ``builder().count()``, so every rep pays construction.

Arms share one session and alternate per rep (established discipline);
min-of-N per arm is the headline. Results -> EXPR_AB_r10.json.

Usage: python tools/run_r10_expr_ab.py [reps=4]
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
    "s1_cosine_topk",
    "s2_ann_ivf",
    "s3_kmeans_assign",
    "s5_pq_adc_topk",
    "s6_ivfadc_topk",
    "s7_ivfadc_rerank",
    "s8_ivfadc_residual",
    "s10_ivf_sq8_topk",
    "s11_ivf_sq8_index",
    "s12_ivfadc_index",
    "s13_jl_projection_topk",
    "s15_ivfadc_index_rerank",
    "s16_ivfadc_batched_serve",
    "d5_embedding_neardup",
    "d10_semantic_dedup",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    import medvedi_spark.operators.llm as llm
    from medvedi_spark.operators.llm import release_persisted
    from medvedi_spark.queries.registry import QUERIES, _ensure_loaded
    from medvedi_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("r10-expr-ab")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["c1_arrow_roundtrip"].builder(spark, SF).count()
    # warm the session codebook caches so neither arm pays training
    from medvedi_spark.queries.llm_ops import _trained_codebook, _trained_residual_codebook

    _trained_codebook(spark, SF)
    _trained_residual_codebook(spark, SF)
    release_persisted()

    out: dict = {"sf_dir": SF, "reps": reps, "queries": {}}
    for name in QUERIES_AB:
        rec = {"expr": [], "composed": []}
        q = QUERIES[name]
        q.builder(spark, SF).count()  # warm both machinery paths once
        release_persisted(spark)
        for rep in range(reps):
            arms = ("expr", "composed") if rep % 2 == 0 else ("composed", "expr")
            for arm in arms:
                llm._EXPR_KERNELS = arm == "expr"
                spark.sparkContext.setJobDescription(f"expr-ab {name} {arm} rep{rep}")
                t0 = time.perf_counter()
                q.builder(spark, SF).count()
                rec[arm].append(round(time.perf_counter() - t0, 3))
                release_persisted(spark)
        llm._EXPR_KERNELS = True
        rec["min_expr"] = min(rec["expr"])
        rec["min_composed"] = min(rec["composed"])
        out["queries"][name] = rec
        print(name, json.dumps(rec))

    tot_e = sum(r["min_expr"] for r in out["queries"].values())
    tot_c = sum(r["min_composed"] for r in out["queries"].values())
    out["total_min_expr"] = round(tot_e, 3)
    out["total_min_composed"] = round(tot_c, 3)
    with open(os.path.join(ROOT, "EXPR_AB_r10.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"total min: expr={tot_e:.1f}s composed={tot_c:.1f}s")
    print("wrote EXPR_AB_r10.json")


if __name__ == "__main__":
    main()
