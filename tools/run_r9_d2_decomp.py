"""Round-9 (VERDICT r8 directive #6): decompose d2's 10× curve — at
14.7× the steepest ratio in the r8 probe set — into router decision +
per-stage timings, and A/B the router's tier choice at the 10× shape.

What it measures (one session, checksum_full_eval):
1. the router's inputs at 1× and 10× (n_vocab, n_docs, avg_set) and
   the tier each routes to (the probe corpus's Heap's-law vocab crosses
   tiers as the corpus grows — exactly the regime directive #6 asks
   about);
2. stage wall inside the prefix-filter tier: tokenize+distinct+stats,
   candidate generation (count + wall of the candidates subplan,
   reproduced from _jaccard_prefix_filter), exact verify (full op wall
   minus candidates — plus the full-op wall itself);
3. interleaved A/B of the routed tier against the FORCED alternative
   (wide-bitset-shuffled) at both sizes — if the dense_fraction
   threshold tuned at sf0.1 picks the wrong tier at 10×, this is where
   it shows; otherwise the rejection is recorded with numbers.

Run on an otherwise idle machine — wall times go into the record.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from tools import scale_probe
from tools.run_r9_ingest_probe import _existing_probe_root

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESHOLD = 0.95  # d2's registered threshold


def _candidates(tok, threshold: float):
    """The candidate subplan of _jaccard_prefix_filter, reproduced
    stage-for-stage so its wall/count can be measured in isolation."""
    df_map = tok.groupBy("t").agg(F.count(F.lit(1)).alias("tok_df"))
    ranked = tok.join(F.broadcast(df_map), "t")
    w = Window.partitionBy("doc_id").orderBy("tok_df", "t")
    w_sz = Window.partitionBy("doc_id")
    prefix = (
        ranked.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(w_sz))
        .filter(F.col("rn") <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1)
        .select("doc_id", "t", "n")
    )
    pa, pb = prefix.alias("pa"), prefix.alias("pb")
    return (
        pa.join(
            pb,
            (F.col("pa.t") == F.col("pb.t"))
            & (F.col("pa.doc_id") < F.col("pb.doc_id"))
            & (
                F.least(F.col("pa.n"), F.col("pb.n"))
                >= F.lit(threshold) * F.greatest(F.col("pa.n"), F.col("pb.n"))
            ),
        )
        .select(F.col("pa.doc_id").alias("doc_a"), F.col("pb.doc_id").alias("doc_b"))
        .distinct()
    )


def main() -> None:
    from medvedi_spark.operators import llm
    from medvedi_spark.operators._persist import release_persisted
    from medvedi_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = _existing_probe_root()
    dirs = {
        1: scale_probe.gen_corpus(os.path.join(root, "x1"), scale_probe.BASE_DOCS, scale_probe.BASE_VECS),
        10: scale_probe.gen_corpus(
            os.path.join(root, "x10"), scale_probe.BASE_DOCS * 10, scale_probe.BASE_VECS * 10
        ),
    }
    scale_probe._force_eval(spark.read.parquet(os.path.join(dirs[1], "documents.parquet")))

    report: dict = {"action": "checksum_full_eval", "threshold": THRESHOLD, "sizes": {}}
    for f, d in dirs.items():
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        entry: dict = {}

        # stage 0: tokenize+distinct+stats (the router's own agg job)
        release_persisted()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        tok = llm._persist_tracked(llm.tokenize_distinct(docs, "doc_id", "text"))
        stats = tok.agg(
            F.countDistinct("t").alias("n_vocab"),
            F.countDistinct("doc_id").alias("n_docs"),
            (F.count(F.lit(1)) / F.countDistinct("doc_id")).alias("avg_set"),
        ).first()
        entry["stats_sec"] = round(time.perf_counter() - t0, 3)
        entry["n_vocab"], entry["n_docs"] = stats.n_vocab, stats.n_docs
        entry["avg_set"] = round(stats.avg_set, 1)
        dense_gate = 0.25 * stats.n_vocab
        entry["tier"] = (
            "bitset" if stats.n_vocab <= 64
            else "wide_bitset" if stats.n_vocab <= 4096 and stats.avg_set >= dense_gate
            else "prefix_filter"
        )

        # stage 1: candidate volume. Exact count at x1; at x10 the exact
        # distinct-count stage itself runs tens of minutes (the explosion
        # being diagnosed), so the ANALYTIC upper bound Σ df·(df-1)/2
        # over the prefix tokens — one agg job — stands in.
        df_map = tok.groupBy("t").agg(F.count(F.lit(1)).alias("tok_df"))
        w = Window.partitionBy("doc_id").orderBy("tok_df", "t")
        w_sz = Window.partitionBy("doc_id")
        prefix_tok = (
            tok.join(F.broadcast(df_map), "t")
            .withColumn("rn", F.row_number().over(w))
            .withColumn("n", F.count(F.lit(1)).over(w_sz))
            .filter(F.col("rn") <= F.col("n") - F.ceil(F.lit(THRESHOLD) * F.col("n")) + 1)
        )
        t0 = time.perf_counter()
        bound = (
            prefix_tok.groupBy("t").agg(F.count(F.lit(1)).alias("pdf"))
            .select(F.sum(F.col("pdf") * (F.col("pdf") - 1) / 2).alias("b"))
            .first()["b"]
        )
        entry["candidate_upper_bound"] = int(bound or 0)
        entry["bound_sec"] = round(time.perf_counter() - t0, 3)
        if f == 1:
            t0 = time.perf_counter()
            entry["n_candidates"] = _candidates(tok, THRESHOLD).count()
            entry["candidates_sec"] = round(time.perf_counter() - t0, 3)
        release_persisted()

        # stage 2: the full routed op (tok re-derived inside — the real
        # query's cost), min of 2
        samples = []
        for _ in range(2):
            release_persisted()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            scale_probe._force_eval(
                llm.token_jaccard_pairs(docs, "doc_id", "text", threshold=THRESHOLD)
            )
            samples.append(round(time.perf_counter() - t0, 3))
        entry["full_op_sec_min2"] = min(samples)
        entry["full_op_samples"] = samples

        # stage 3: interleaved tier A/B. Three arms:
        #   routed           — the registered op exactly as shipped;
        #   routed_fanout    — same router, tok repartitioned to session
        #                      parallelism first (AQE coalesces the
        #                      small-bytes/CPU-heavy tok table to 1-2
        #                      partitions otherwise — the jstack'd
        #                      single-task straggler);
        #   forced_wide      — the wide-bitset-shuffled tier forced, tok
        #                      fanned out identically (else it
        #                      single-tasks and measures nothing).
        par = spark.sparkContext.defaultParallelism

        def _routed():
            return llm.token_jaccard_pairs(docs, "doc_id", "text", threshold=THRESHOLD)

        def _routed_fanout():
            tok2 = llm._persist_tracked(
                llm.tokenize_distinct(docs, "doc_id", "text").repartition(par)
            )
            return llm._jaccard_adaptive(tok2, THRESHOLD)

        def _forced_wide():
            tok2 = llm._persist_tracked(
                llm.tokenize_distinct(docs, "doc_id", "text").repartition(par)
            )
            nv = tok2.select(F.countDistinct("t")).first()[0]
            return llm._jaccard_bitset_wide_shuffled(
                tok2, tok2.select("t").distinct(), nv, THRESHOLD
            )

        arms_fn = {
            "routed": _routed,
            "routed_fanout": _routed_fanout,
            "forced_wide_shuffled": _forced_wide,
        }
        arms: dict[str, list[float]] = {a: [] for a in arms_fn}
        for _ in range(2):
            for arm, fn in arms_fn.items():
                release_persisted()
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                scale_probe._force_eval(fn())
                arms[arm].append(round(time.perf_counter() - t0, 3))
        entry["tier_ab_min2"] = {a: min(v) for a, v in arms.items()}
        entry["tier_ab_samples"] = arms
        report["sizes"][f"x{f}"] = entry
        print(f"x{f}: {json.dumps(entry)}")
        release_persisted()

    r1, r10 = report["sizes"]["x1"], report["sizes"]["x10"]
    report["full_op_ratio_10x"] = round(r10["full_op_sec_min2"] / r1["full_op_sec_min2"], 2)
    report["candidate_bound_ratio_10x"] = round(
        r10["candidate_upper_bound"] / max(r1["candidate_upper_bound"], 1), 2
    )
    with open(os.path.join(ROOT, "D2_DECOMP_r9.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "sizes"}))


if __name__ == "__main__":
    main()
