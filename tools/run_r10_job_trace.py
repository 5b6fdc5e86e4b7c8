"""Round-10 measurement: per-JOB trace of the serve/ingest phases the
lifecycle profile flagged (s15 serve = 16 jobs, d17 ingest = 24 jobs at
sf0.1 — job-count floor, not data volume, dominates these rows). Lists
every Spark job the phase submits with its duration and description so
the optimization targets the actual sequential-job chain.

Usage: python tools/run_r10_job_trace.py [s15|d17|s11]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _jobs(spark):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs") as r:
        return json.load(r)


def trace(spark, label, fn):
    before = {j["jobId"] for j in _jobs(spark)}
    t0 = time.perf_counter()
    fn()
    wall = time.perf_counter() - t0
    rows = [j for j in _jobs(spark) if j["jobId"] not in before]
    rows.sort(key=lambda j: j["jobId"])
    print(f"\n=== {label}: {wall:.2f}s, {len(rows)} jobs ===")
    for j in rows:
        from datetime import datetime
        t_sub = datetime.fromisoformat(j["submissionTime"].replace("GMT", "+00:00"))
        t_end = datetime.fromisoformat(j["completionTime"].replace("GMT", "+00:00"))
        dur = (t_end - t_sub).total_seconds()
        desc = (j.get("description") or j["name"])[:110]
        print(f"  job {j['jobId']:>4} {dur:6.2f}s  tasks={j['numTasks']:<4} {desc}")


def main() -> None:
    from medvedi_spark.operators import ann_index, dedup_index
    from medvedi_spark.queries import llm_ops as Q
    from medvedi_spark.queries.llm_ops import load
    from medvedi_spark.queries.registry import QUERIES, _ensure_loaded
    from medvedi_spark.session import get_spark

    which = sys.argv[1] if len(sys.argv) > 1 else "s15"
    _ensure_loaded()
    spark = get_spark("r10-job-trace", ui=True)
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["c1_arrow_roundtrip"].builder(spark, SF).count()  # warm-up

    if which in ("s15", "s11"):
        emb = load(spark, SF, "embeddings")
        coarse = emb.filter(F.col("vec_id") < Q._S6_COARSE).select(
            F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_emb")
        )
        path = f"/tmp/r10trace_{which}"
        shutil.rmtree(path, ignore_errors=True)
        if which == "s11":
            trace(spark, "save", lambda: ann_index.ivf_sq8_save(
                emb, coarse, "vec_id", "embedding", path))
            idx = ann_index.ivf_sq8_load(spark, path)
            for i in range(2):
                trace(spark, f"serve#{i}", lambda: ann_index.ivf_sq8_query(
                    idx, emb.filter(F.col("vec_id") < Q._S5_PROBES),
                    "vec_id", "embedding", k=Q._S5_K, nprobe=Q._S6_NPROBE).count())
        else:
            cent = Q._trained_codebook(spark, SF)
            trace(spark, "save", lambda: ann_index.ivfadc_save(
                emb, coarse, cent, "vec_id", "embedding", path,
                n_subspaces=Q._PQ_SUBS, n_codes=Q._PQ_K, store_vectors=True))
            idx = ann_index.ivfadc_load(spark, path)
            for i in range(2):
                trace(spark, f"serve#{i}", lambda: ann_index.ivfadc_query_rerank(
                    idx, emb.filter(F.col("vec_id") < Q._S5_PROBES),
                    "vec_id", "embedding", k=Q._S5_K,
                    shortlist=Q._S7_SHORTLIST, nprobe=Q._S6_NPROBE).count())
    elif which in QUERIES:
        # generic mode: trace any registered query's builder+count twice
        q = QUERIES[which]
        for i in range(2):
            trace(spark, f"{which}#{i}", lambda: q.builder(spark, SF).count())
            from medvedi_spark.operators.llm import release_persisted as _rp
            _rp(spark)
    elif which == "d17":
        docs = load(spark, SF, "documents")
        old = docs.filter(F.col("doc_id") % 3 != 0)
        new = docs.filter(F.col("doc_id") % 3 == 0)
        path = "/tmp/r10trace_d17"
        shutil.rmtree(path, ignore_errors=True)
        trace(spark, "save", lambda: dedup_index.minhash_index_save(
            old, "doc_id", "text", path, threshold=Q._D16_THRESHOLD))
        idx = dedup_index.minhash_index_load(spark, path)
        for i in range(2):
            trace(spark, f"ingest#{i}", lambda: dedup_index.fuzzy_dedup_ingest(
                idx, old, new, "doc_id", "text").count())
    from medvedi_spark.operators.llm import release_persisted
    release_persisted()


if __name__ == "__main__":
    main()
