"""Round-11 A/B: connected_components large-graph label propagation with
2 pointer jumps per round (llm._CC_JUMPS, HEAD) vs the single
path-halving jump (pre-r11). Measured on graphs that actually exercise
the iterative path — the bench-scale dedup graphs take the one-job
small-graph contraction, so this probe forces small_graph_edges=0:

- a CHAIN of N nodes (diameter N-1): the worst case the O(log) round
  bound exists for — rounds/jobs/wall per arm;
- the d17-shaped near-dup graph at sf0.1 (tiny components): regression
  check, both arms should converge in the same 1-2 rounds.

Equivalence: both arms reach the identical fixpoint (component = min
reachable id; jumps only accelerate the monotone descent) — asserted on
both graphs.

Usage: python tools/run_r11_cc_chain_ab.py [chain_n=20000]
Writes CC_CHAIN_AB_r11.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _job_count(spark) -> int:
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs") as r:
        return len(json.load(r))


def run_arm(spark, llm, edges, jumps):
    llm._CC_JUMPS = jumps
    j0 = _job_count(spark)
    t0 = time.perf_counter()
    comps = llm.connected_components(edges, "a", "b", small_graph_edges=0)
    rows = sorted(map(tuple, comps.collect()))
    wall = round(time.perf_counter() - t0, 3)
    return {"wall_s": wall, "jobs": _job_count(spark) - j0}, rows


def main() -> None:
    chain_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000

    import medvedi_spark.operators.llm as llm
    from medvedi_spark.session import get_spark

    spark = get_spark("r11-cc-chain-ab", ui=True)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"chain_n": chain_n}

    # chain graph: 0-1-2-...-N, one component, diameter N-1
    chain = spark.range(chain_n - 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    chain.count()  # warm the scan
    results = {}
    for label, jumps in (("jump2_warm", 2), ("jump1", 1), ("jump2", 2), ("jump1_b", 1)):
        stats, rows = run_arm(spark, llm, chain, jumps)
        results[label] = stats
        if "rows" in out:
            assert rows == out["rows_ref"], f"chain fixpoint diverged under {label}"
        else:
            out["rows"] = len(rows)
            out["rows_ref"] = rows
        print("chain", label, stats, flush=True)
    out.pop("rows_ref", None)
    out["chain"] = results

    # d17-shaped graph: verified near-dup pairs of the sf corpus
    from medvedi_spark.operators.llm import minhash_lsh_pairs, release_persisted
    from medvedi_spark.queries.llm_ops import _D16_THRESHOLD, load

    docs = load(spark, SF, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", _D16_THRESHOLD).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    ).localCheckpoint(eager=True)
    release_persisted()
    dd = {}
    ref = None
    for label, jumps in (("jump2", 2), ("jump1", 1), ("jump2_b", 2), ("jump1_b", 1)):
        stats, rows = run_arm(spark, llm, pairs, jumps)
        dd[label] = stats
        if ref is None:
            ref = rows
        else:
            assert rows == ref, f"dedup-graph fixpoint diverged under {label}"
        print("dedup", label, stats, flush=True)
    out["dedup_graph"] = dd
    llm._CC_JUMPS = 2

    with open(os.path.join(ROOT, "CC_CHAIN_AB_r11.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote CC_CHAIN_AB_r11.json")


if __name__ == "__main__":
    main()
