"""Round-10 A/B: scoped AQE-off for bounded model-state/routing actions
(operators._actions.small_action) vs status quo.

OUTCOME: BUILT, MEASURED, REJECTED — the arm was reverted, so this
harness no longer runs at HEAD (the `_actions` module and its call-site
wraps were removed); it is kept, with AQE_AB_r10.json, as the record of
the negative result. Verdict from the artifact plus two job traces on
the same idle host: the ON arm was neutral-to-worse everywhere (s15
serve 3/4 pairwise losses; s11 serve 11 jobs vs 9 — without AQE the
``limit().collect()`` ramps 1→4→…→all partitions as SEPARATE
executeTake jobs, re-running the final stage's non-shuffle lineage each
time), and a full s15 lifecycle trace with the scope enabled measured
save 10.9 s / warm serve 15.2 s vs 5.5 s / 3.7 s with it disabled: AQE's
byte-based coalescing (parallelismFirst=false) is what keeps the tiny
model-state shuffles at 1 task, and removing it costs far more than the
stage-job re-optimization gaps it saves. The deferred-item hypothesis
("serve gaps are AQE re-optimization overhead") is REFUTED — the gaps
are driver-side query planning, which AQE-off does not remove.

Motivation: the round-10 job traces (LIFECYCLE_PROFILE_r10.json, the
end-of-round serve trace) measured the lifecycle rows as driver-job-gap
bound — the serve routing ``limit().collect()`` alone fans into SEVEN
AQE stage-jobs, and ~70% of first-serve wall is planning/re-optimization
gaps BETWEEN jobs. small_action runs such a bounded action as ONE job.

NOTE (ADVICE r10): this file is a negative-result RECORD, not a live
harness — the guarded sys.exit below fires before anything else so
nobody debugs the missing `_actions` import as a breakage.

Arms share one session and interleave rep-by-rep (established A/B
discipline): ON = small_action enabled (the candidate), OFF = flag
patched False (status quo execution, byte-identical plans otherwise).

Phases:
- serve: ivfadc_query_rerank (s15 shape) + ivf_sq8_query (s11 shape)
  against pre-built loaded indexes — wall + job count per serve.
- build: registered inline builders whose training collects are wrapped
  (s6 ivfadc, s10 ivf-sq8, d14 bloom fit) — builder().count() wall.

Writes AQE_AB_r10.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.exit(
    "run_r10_aqe_ab.py is an archived negative-result record: the measured "
    "arm (operators._actions.small_action) was rejected and removed from the "
    "tree, so this harness cannot run at HEAD. See AQE_AB_r10.json and the "
    "module docstring for the autopsy."
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AQE_AB_REPS", "4"))


def _job_count(spark) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs") as r:
        return len(json.load(r))


def main() -> None:
    from medvedi_spark.operators import _actions, ann_index
    from medvedi_spark.operators.llm import release_persisted
    from medvedi_spark.queries import llm_ops as Q
    from medvedi_spark.queries.llm_ops import load
    from medvedi_spark.queries.registry import QUERIES, _ensure_loaded
    from medvedi_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("r10-aqe-ab", ui=True)
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["c1_arrow_roundtrip"].builder(spark, SF).count()  # warm-up

    out: dict = {"sf_dir": SF, "reps": REPS, "serve": {}, "build": {}}

    # ---- serve phase: build indexes once (untimed) --------------------
    emb = load(spark, SF, "embeddings")
    coarse = emb.filter(F.col("vec_id") < Q._S6_COARSE).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_emb")
    )
    probes = emb.filter(F.col("vec_id") < Q._S5_PROBES)
    adc_path, sq8_path = "/tmp/r10aqe_adc", "/tmp/r10aqe_sq8"
    shutil.rmtree(adc_path, ignore_errors=True)
    shutil.rmtree(sq8_path, ignore_errors=True)
    cent = Q._trained_codebook(spark, SF)
    ann_index.ivfadc_save(
        emb, coarse, cent, "vec_id", "embedding", adc_path,
        n_subspaces=Q._PQ_SUBS, n_codes=Q._PQ_K, store_vectors=True,
    )
    ann_index.ivf_sq8_save(emb, coarse, "vec_id", "embedding", sq8_path)
    adc_idx = ann_index.ivfadc_load(spark, adc_path)
    sq8_idx = ann_index.ivf_sq8_load(spark, sq8_path)

    serves = {
        "s15_rerank_serve": lambda: ann_index.ivfadc_query_rerank(
            adc_idx, probes, "vec_id", "embedding",
            k=Q._S5_K, shortlist=Q._S7_SHORTLIST, nprobe=Q._S6_NPROBE,
        ).count(),
        "s11_sq8_serve": lambda: ann_index.ivf_sq8_query(
            sq8_idx, probes, "vec_id", "embedding", k=Q._S5_K, nprobe=Q._S6_NPROBE,
        ).count(),
    }
    for name, fn in serves.items():
        rows = {"on": [], "off": [], "jobs_on": [], "jobs_off": []}
        fn()  # warm both plans once before the arms
        release_persisted(spark)
        for rep in range(REPS):
            for arm in ("on", "off") if rep % 2 == 0 else ("off", "on"):
                _actions._SMALL_ACTION_ENABLED = arm == "on"
                spark.sparkContext.setJobDescription(f"aqe-ab {name} {arm} rep{rep}")
                j0 = _job_count(spark)
                t0 = time.perf_counter()
                fn()
                rows[arm].append(round(time.perf_counter() - t0, 3))
                rows[f"jobs_{arm}"].append(_job_count(spark) - j0)
                release_persisted(spark)
        _actions._SMALL_ACTION_ENABLED = True
        out["serve"][name] = rows
        print(name, json.dumps(rows))

    # ---- build phase: registered inline builders ----------------------
    for qname in ("s6_ivfadc_topk", "s10_ivf_sq8_topk", "d14_bloom_decontaminate"):
        q = QUERIES[qname]
        rows = {"on": [], "off": [], "jobs_on": [], "jobs_off": []}
        q.builder(spark, SF).count()  # warm
        release_persisted(spark)
        for rep in range(REPS):
            for arm in ("on", "off") if rep % 2 == 0 else ("off", "on"):
                _actions._SMALL_ACTION_ENABLED = arm == "on"
                spark.sparkContext.setJobDescription(f"aqe-ab {qname} {arm} rep{rep}")
                j0 = _job_count(spark)
                t0 = time.perf_counter()
                q.builder(spark, SF).count()
                rows[arm].append(round(time.perf_counter() - t0, 3))
                rows[f"jobs_{arm}"].append(_job_count(spark) - j0)
                release_persisted(spark)
        _actions._SMALL_ACTION_ENABLED = True
        out["build"][qname] = rows
        print(qname, json.dumps(rows))

    for phase in out["serve"], out["build"]:
        for name, rows in phase.items():
            rows["min_on"] = min(rows["on"])
            rows["min_off"] = min(rows["off"])
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "AQE_AB_r10.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote AQE_AB_r10.json")


if __name__ == "__main__":
    main()
