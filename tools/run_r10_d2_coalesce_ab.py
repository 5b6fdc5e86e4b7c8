"""Round-10 (VERDICT r9 directive #2): A/B the AQE byte-coalescing fix
for the Jaccard prefix tier's pair-expansion/verify stages.

The weak item: AQE coalesces post-shuffle partitions by BYTES, and the
prefix tier's pair-expansion and verify joins are small-bytes/CPU-heavy,
so at the 10× probe shape the routed plan rode a 1-2 partition stream
for its whole 142 s (D2_DECOMP_r9 jstack evidence). The fix
(`_jaccard_prefix_filter`): explicit-count key-based repartitions on the
two exchanges the joins insert anyway — coalesce-exempt, no net-new
shuffle — size-guarded by the exact Σ df·(df−1)/2 prefix-token bound so
tiny corpora keep AQE's coalesced plan.

Arms, interleaved min-of-2 per the established probe discipline:
  pinned   — the shipped op (guard trips at both probe shapes);
  unpinned — `_VERIFY_PIN_MIN_PAIRS` monkeypatched to +inf (the r9 plan).

Evidence recorded per arm: wall time AND the task counts of the
expansion/verify stages, read from the Spark UI REST API over the run's
stage-submission window — the directive's bar is the pinned verify
stages holding ≥8 tasks at 10× with neutral-or-better wall time.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import scale_probe
from tools.run_r9_ingest_probe import _existing_probe_root

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESHOLD = 0.95  # d2's registered threshold


def _stages(spark) -> list[dict]:
    """Completed-stage facts from the UI REST API (numTasks + executor
    CPU), keyed by submission time so a run window can be sliced out."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages?status=complete") as r:
        data = json.load(r)
    out = []
    for s in data:
        sub = s.get("submissionTime")
        out.append(
            {
                "stage_id": s["stageId"],
                "num_tasks": s["numTasks"],
                "cpu_ms": s.get("executorCpuTime", 0) / 1e6,
                "run_ms": s.get("executorRunTime", 0),
                "submitted": sub,
            }
        )
    return out


def main() -> None:
    from medvedi_spark.operators import llm
    from medvedi_spark.operators._persist import release_persisted
    from medvedi_spark.session import get_spark

    spark = get_spark("d2-coalesce-ab", ui=True)
    spark.sparkContext.setLogLevel("ERROR")
    root = _existing_probe_root()
    dirs = {
        1: scale_probe.gen_corpus(os.path.join(root, "x1"), scale_probe.BASE_DOCS, scale_probe.BASE_VECS),
        10: scale_probe.gen_corpus(
            os.path.join(root, "x10"), scale_probe.BASE_DOCS * 10, scale_probe.BASE_VECS * 10
        ),
    }

    report: dict = {
        "action": "checksum_full_eval",
        "threshold": THRESHOLD,
        "pin_guard_min_pairs": llm._VERIFY_PIN_MIN_PAIRS,
        "sizes": {},
    }
    real_guard = llm._VERIFY_PIN_MIN_PAIRS

    for f, d in dirs.items():
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        entry: dict = {"arms": {}}

        def _run(arm: str, guard: float) -> None:
            llm._VERIFY_PIN_MIN_PAIRS = guard
            try:
                release_persisted()
                spark.catalog.clearCache()
                seen = {s["stage_id"] for s in _stages(spark)}
                t0 = time.perf_counter()
                scale_probe._force_eval(
                    llm.token_jaccard_pairs(docs, "doc_id", "text", threshold=THRESHOLD)
                )
                wall = round(time.perf_counter() - t0, 3)
            finally:
                llm._VERIFY_PIN_MIN_PAIRS = real_guard
            new = [s for s in _stages(spark) if s["stage_id"] not in seen]
            # the expansion/verify stages are the CPU-dominant ones; keep
            # the top-3 by executor CPU as the evidence rows
            hot = sorted(new, key=lambda s: -s["cpu_ms"])[:3]
            rec = entry["arms"].setdefault(arm, {"walls": [], "hot_stages": None})
            rec["walls"].append(wall)
            if rec["hot_stages"] is None or wall == min(rec["walls"]):
                rec["hot_stages"] = [
                    {"num_tasks": s["num_tasks"], "cpu_s": round(s["cpu_ms"] / 1e3, 1)}
                    for s in hot
                ]
            print(f"x{f} {arm}: {wall}s hot={rec['hot_stages']}", flush=True)

        for _ in range(2):
            _run("pinned", real_guard)
            _run("unpinned", float("inf"))
        for arm, rec in entry["arms"].items():
            rec["wall_min2"] = min(rec["walls"])
        report["sizes"][f"x{f}"] = entry
        release_persisted()

    out = os.path.join(ROOT, "D2_COALESCE_AB_r10.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({k: {a: r["wall_min2"] for a, r in v["arms"].items()} for k, v in report["sizes"].items()}))
    print(f"wrote {out}", flush=True)




def sf01_interleave() -> None:
    """Registered-query interleave at sf0.1 (the bench shape): d2/d7
    walls with the pin guard live vs disabled — the directive's
    'neutral-or-better at sf0.1' check."""
    from medvedi_spark.operators import llm
    from medvedi_spark.operators._persist import release_persisted
    from medvedi_spark.queries import registry
    from medvedi_spark.session import get_spark

    registry._ensure_loaded()
    spark = get_spark("d2-coalesce-sf01", ui=True)
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    real_guard = llm._VERIFY_PIN_MIN_PAIRS
    out: dict = {}
    for _ in range(2):
        for arm, guard in (("pinned", real_guard), ("unpinned", float("inf"))):
            for qname in ("d2_token_jaccard", "d7_ngram_jaccard"):
                llm._VERIFY_PIN_MIN_PAIRS = guard
                try:
                    release_persisted()
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    scale_probe._force_eval(registry.QUERIES[qname].builder(spark, sf))
                    wall = round(time.perf_counter() - t0, 3)
                finally:
                    llm._VERIFY_PIN_MIN_PAIRS = real_guard
                out.setdefault(qname, {}).setdefault(arm, []).append(wall)
                print(f"sf0.1 {qname} {arm}: {wall}s", flush=True)
    path = os.path.join(ROOT, "D2_COALESCE_AB_r10.json")
    rep = json.load(open(path))
    rep["sf0.1_registered"] = {
        q: {a: {"walls": w, "wall_min2": min(w)} for a, w in arms.items()}
        for q, arms in out.items()
    }
    with open(path, "w") as fh:
        json.dump(rep, fh, indent=1)
    print("updated", path, flush=True)


if __name__ == "__main__":
    if "--sf01" in sys.argv:
        sf01_interleave()
    else:
        main()
