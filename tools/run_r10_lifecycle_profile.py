"""Round-10 measurement (guide §1: measure first): decompose the index-
LIFECYCLE bench rows — the slowest family in BENCH_local (s16 8.3,
st17 7.9, s15 7.4, s12 6.3, s11 4.4, d17 4.4 of a 165 s suite) — into
their build / save / load / serve phases with per-phase wall time and
per-phase Spark JOB COUNT (read from the UI REST API), so the round's
optimizations target the measured cost, not the assumed one.

Phases per ANN lifecycle query (s11/s12/s15/s16):
  save.codes      — quantize + route + write codes/ (cell-partitioned)
  save.model      — ranges|codebooks + centroids writes (model state)
  save.vectors    — vectors/ write (s15/s16 only; recomputes routing?)
  load            — open the artifacts (lazy; should be ~0 jobs)
  serve           — the registered query's count() over the loaded index

Per dedup lifecycle query (d17):
  save.sigs / save.pairs / load / ingest

Results → LIFECYCLE_PROFILE_r10.json (min of 2 per phase; phases run in
dependency order inside one session, artifacts in a throwaway tmp dir).
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

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _jobs_done(spark) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs") as r:
        return len(json.load(r))


class Phase:
    """Times a named phase and counts the Spark jobs it submitted."""

    def __init__(self, spark, report: dict):
        self.spark, self.report = spark, report

    def run(self, name: str, fn):
        j0 = _jobs_done(self.spark)
        t0 = time.perf_counter()
        out = fn()
        dt = round(time.perf_counter() - t0, 3)
        jobs = _jobs_done(self.spark) - j0
        cur = self.report.setdefault(name, {"wall": [], "jobs": jobs})
        cur["wall"].append(dt)
        cur["jobs"] = jobs  # last run's count (identical across runs)
        return out


def profile_ann(spark, report: dict, kind: str) -> None:
    """kind: 's11' (SQ8), 's12' (ADC), 's15' (ADC+vectors+rerank),
    's16' (s15's shape at 3x query rows)."""
    from medvedi_spark.operators import ann_index
    from medvedi_spark.queries import llm_ops as Q
    from medvedi_spark.queries.llm_ops import load

    emb = load(spark, SF, "embeddings")
    coarse = emb.filter(F.col("vec_id") < Q._S6_COARSE).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_emb")
    )
    path = os.path.join("/tmp", f"r10prof_{kind}")
    rep = report.setdefault(kind, {})
    ph = Phase(spark, rep)

    for _ in range(2):
        shutil.rmtree(path, ignore_errors=True)
        if kind == "s11":
            idx_b = ann_index.ivf_sq8_build(emb, coarse, "vec_id", "embedding")
            ph.run("save.codes", lambda: idx_b.codes.write.mode("overwrite")
                   .partitionBy("cell").parquet(os.path.join(path, "codes")))
            ph.run("save.model", lambda: (
                idx_b.ranges.write.mode("overwrite").parquet(os.path.join(path, "ranges")),
                idx_b.centroids.write.mode("overwrite").parquet(os.path.join(path, "centroids")),
            ))
            idx = ph.run("load", lambda: ann_index.ivf_sq8_load(spark, path))
            ph.run("serve", lambda: ann_index.ivf_sq8_query(
                idx, emb.filter(F.col("vec_id") < Q._S5_PROBES), "vec_id", "embedding",
                k=Q._S5_K, nprobe=Q._S6_NPROBE).count())
        else:
            cent = Q._trained_codebook(spark, SF)
            idx_b = ann_index.ivfadc_build(
                emb, coarse, cent, "vec_id", "embedding", Q._PQ_SUBS, Q._PQ_K
            )
            ph.run("save.codes", lambda: idx_b.codes.write.mode("overwrite")
                   .partitionBy("cell").parquet(os.path.join(path, "codes")))
            ph.run("save.model", lambda: (
                idx_b.pq_centroids.write.mode("overwrite").parquet(os.path.join(path, "pq_centroids")),
                idx_b.centroids.write.mode("overwrite").parquet(os.path.join(path, "centroids")),
            ))
            if kind in ("s15", "s16"):
                ph.run("save.vectors", lambda: idx_b.vectors.write.mode("overwrite")
                       .partitionBy("cell").parquet(os.path.join(path, "vectors")))
            with open(os.path.join(path, "meta.json"), "w") as fh:
                json.dump({"n_subspaces": Q._PQ_SUBS, "n_codes": Q._PQ_K}, fh)
            idx = ph.run("load", lambda: ann_index.ivfadc_load(spark, path))
            if kind == "s12":
                ph.run("serve", lambda: ann_index.ivfadc_query(
                    idx, emb.filter(F.col("vec_id") < Q._S5_PROBES), "vec_id", "embedding",
                    k=Q._S5_K, nprobe=Q._S6_NPROBE).count())
            else:
                nq = Q._S5_PROBES * (Q._S16_BATCHES if kind == "s16" else 1)
                ph.run("serve", lambda: ann_index.ivfadc_query_rerank(
                    idx, emb.filter(F.col("vec_id") < nq), "vec_id", "embedding",
                    k=Q._S5_K, shortlist=Q._S7_SHORTLIST, nprobe=Q._S6_NPROBE).count())
        from medvedi_spark.operators.llm import release_persisted
        release_persisted()


def profile_d17(spark, report: dict) -> None:
    from medvedi_spark.operators import dedup_index
    from medvedi_spark.queries import llm_ops as Q
    from medvedi_spark.queries.llm_ops import load

    docs = load(spark, SF, "documents")
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 3 == 0)
    path = "/tmp/r10prof_d17"
    rep = report.setdefault("d17", {})
    ph = Phase(spark, rep)
    from medvedi_spark.functions.hashing import MINHASH_COEFFS  # noqa: F401
    from medvedi_spark.operators.llm import minhash_band_index

    for _ in range(2):
        shutil.rmtree(path, ignore_errors=True)
        sigs, bands = minhash_band_index(old, "doc_id", "text")
        ph.run("save.sigs", lambda: sigs.write.mode("overwrite")
               .parquet(os.path.join(path, "sigs")))
        ba, bb = bands.alias("ba"), bands.alias("bb")
        candidates = (
            ba.join(
                bb,
                (F.col("ba.band_idx") == F.col("bb.band_idx"))
                & (F.col("ba.band_val") == F.col("bb.band_val"))
                & (F.col("ba.doc_id") < F.col("bb.doc_id")),
            )
            .select(F.col("ba.doc_id").alias("doc_a"), F.col("bb.doc_id").alias("doc_b"))
            .distinct()
        )
        ph.run("save.pairs", lambda: dedup_index._verified_pairs(
            candidates, sigs, Q._D16_THRESHOLD).write.mode("overwrite")
            .parquet(os.path.join(path, "pairs")))
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"threshold": Q._D16_THRESHOLD,
                       "hash_family": dedup_index._HASH_FAMILY}, f)
        idx = ph.run("load", lambda: dedup_index.minhash_index_load(spark, path))
        ph.run("ingest", lambda: dedup_index.fuzzy_dedup_ingest(
            idx, old, new, "doc_id", "text").count())
        from medvedi_spark.operators.llm import release_persisted
        release_persisted()


def main() -> None:
    from medvedi_spark.queries.registry import QUERIES, _ensure_loaded
    from medvedi_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("r10-lifecycle-profile", ui=True)
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up
    QUERIES["c1_arrow_roundtrip"].builder(spark, SF).count()

    report: dict = {"sf_dir": SF}
    for kind in ("s11", "s12", "s15", "s16"):
        profile_ann(spark, report, kind)
    profile_d17(spark, report)

    for q, phases in report.items():
        if not isinstance(phases, dict) or q == "sf_dir":
            continue
        for name, rec in phases.items():
            rec["wall_min"] = min(rec["wall"])
    out = os.path.join(ROOT, "LIFECYCLE_PROFILE_r10.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
