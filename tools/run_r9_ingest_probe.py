"""Round-9 ingest-path scale probe (VERDICT r8 directive #5): the
zero-corpus-recompute claim of the incremental dedup index, measured.

Protocol (checksum_full_eval action, one session):
- corpus A_f = doc_id % 3 != 0 of the f× probe corpus (f ∈ 1, 10, 100)
  — the INDEXED history, growing two orders of magnitude;
- batch B = a FIXED ~1.7k-doc arriving batch (doc_id % 3 == 0 and
  doc_id < 5000), the same size at every factor;
- per factor: build+save the index of A_f once (the per-generation
  cost, reported), then time d17's ingest of B against the LOADED
  index (min of 2, checksum action, plan facts recorded), and time the
  d16 one-shot rebuild of A_f ∪ B once for contrast.

The claim this probe grades: ingest cost scales with the BATCH, not
the corpus — the d17 rows should stay near-flat (the only
corpus-proportional term is the band join's (B+N) shuffle and the
stored-pairs union feeding the component closure) while the d16
rebuild grows with the corpus. Plan facts must be size-invariant.
Correctness ride-along: the ingest survivors checksum must equal the
one-shot rebuild's at every factor (the d17 ≡ d16 contract at probe
scale, not just sf0.01).

st17's serve half at 1×/10×: index built+saved untimed (model state),
then the streaming serve drain timed — the band-compatible map-side
projection of the loaded sigs should keep serve time ~linear in the
arriving volume.

Run on an otherwise idle machine — wall times go into the record.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools import scale_probe

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FACTORS = (1, 10, 100)
BATCH_LIMIT = 5_000  # doc_id cap for the fixed arriving batch


def _existing_probe_root() -> str:
    """Reuse a prior probe run's generated corpora when manifests match
    (gen_corpus validates the manifest itself)."""
    for cand in sorted(glob.glob(os.path.join(tempfile.gettempdir(), "medvedi_scale_probe_*"))):
        if os.path.isdir(os.path.join(cand, "x100")):
            return cand
    return os.path.join(tempfile.gettempdir(), f"medvedi_scale_probe_{os.getpid()}")


def _checksum(df) -> int:
    row = df.select(F.sum(F.xxhash64(*[F.col(c) for c in df.columns])).alias("c")).collect()[0]
    return row["c"] or 0


def main() -> None:
    from medvedi_spark.operators import dedup_index, llm
    from medvedi_spark.operators._persist import release_persisted
    from medvedi_spark.queries.llm_ops import _D16_THRESHOLD
    from medvedi_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = _existing_probe_root()
    dirs = {
        f: scale_probe.gen_corpus(
            os.path.join(root, f"x{f}"), scale_probe.BASE_DOCS * f, scale_probe.BASE_VECS * f
        )
        for f in FACTORS
    }
    scale_probe._force_eval(
        spark.read.parquet(os.path.join(dirs[1], "documents.parquet"))
    )  # warm-up

    report: dict = {"action": "checksum_full_eval", "batch_docs": None, "factors": {}}
    from tools.explain_audit import plan_facts

    for f in FACTORS:
        docs = spark.read.parquet(os.path.join(dirs[f], "documents.parquet"))
        hist = docs.filter(F.col("doc_id") % 3 != 0)
        batch = docs.filter((F.col("doc_id") % 3 == 0) & (F.col("doc_id") < BATCH_LIMIT))
        if report["batch_docs"] is None:
            report["batch_docs"] = batch.count()
        idx_path = os.path.join(root, f"ingest_idx_x{f}")
        shutil.rmtree(idx_path, ignore_errors=True)
        t0 = time.perf_counter()
        dedup_index.minhash_index_save(hist, "doc_id", "text", idx_path, threshold=_D16_THRESHOLD)
        build_sec = round(time.perf_counter() - t0, 3)
        release_persisted()
        idx = dedup_index.minhash_index_load(spark, idx_path)

        def ingest():
            return dedup_index.fuzzy_dedup_ingest(idx, hist, batch, "doc_id", "text")

        facts = plan_facts(ingest())
        facts = {k: facts[k] for k in ("exch", "smj", "shj", "bnlj", "pyudf")}
        samples = []
        for _ in range(2):
            release_persisted()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            scale_probe._force_eval(ingest())
            samples.append(round(time.perf_counter() - t0, 3))
        ingest_sec = min(samples)
        ingest_sum = _checksum(ingest())
        release_persisted()

        t0 = time.perf_counter()
        oneshot = llm.fuzzy_dedup_survivors(
            hist.unionByName(batch), "doc_id", "text", threshold=_D16_THRESHOLD
        )
        scale_probe._force_eval(oneshot)
        oneshot_sec = round(time.perf_counter() - t0, 3)
        oneshot_sum = _checksum(
            llm.fuzzy_dedup_survivors(
                hist.unionByName(batch), "doc_id", "text", threshold=_D16_THRESHOLD
            )
        )
        release_persisted()

        report["factors"][f"x{f}"] = {
            "index_build_save_sec": build_sec,
            "ingest_sec_min2": ingest_sec,
            "ingest_samples": samples,
            "oneshot_rebuild_sec": oneshot_sec,
            "plan_facts": facts,
            "ingest_equals_oneshot": ingest_sum == oneshot_sum,
        }
        print(f"x{f}: build={build_sec}s ingest(min2)={ingest_sec}s "
              f"rebuild={oneshot_sec}s equal={ingest_sum == oneshot_sum} facts={facts}")

    fx = report["factors"]
    base = fx["x1"]["plan_facts"]
    report["plan_facts_invariant"] = all(e["plan_facts"] == base for e in fx.values())
    report["ingest_ratio_x100_over_x1"] = round(
        fx["x100"]["ingest_sec_min2"] / fx["x1"]["ingest_sec_min2"], 2
    )
    report["rebuild_ratio_x100_over_x1"] = round(
        fx["x100"]["oneshot_rebuild_sec"] / fx["x1"]["oneshot_rebuild_sec"], 2
    )

    # ---- st17 serve half at 1x / 10x: fixed per-factor index (untimed
    # build — model state), timed streaming serve drain.
    from medvedi_spark.queries.stream_ops import _read_documents_stream, _stream_minhash_candidates
    from medvedi_spark.streaming.ops import run_to_memory

    st17 = {}
    for f in (1, 10):
        docs = spark.read.parquet(os.path.join(dirs[f], "documents.parquet"))
        hist = docs.filter(F.col("doc_id") % 3 != 0)
        idx_path = os.path.join(root, f"st17_idx_x{f}")
        shutil.rmtree(idx_path, ignore_errors=True)
        dedup_index.minhash_index_save(hist, "doc_id", "text", idx_path, threshold=_D16_THRESHOLD)
        release_persisted()
        idx = dedup_index.minhash_index_load(spark, idx_path)
        c_bands = dedup_index.bands_of_sigs(idx.sigs).withColumnRenamed("doc_id", "dup_of")
        c_toks = idx.sigs.select(F.col("doc_id").alias("dup_of"), F.col("toks").alias("toks_c"))
        samples = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            stream = _read_documents_stream(spark, dirs[f]).filter(F.col("doc_id") % 3 == 0)
            cand = _stream_minhash_candidates(stream)
            shared = F.size(F.array_intersect("toks", "toks_c"))
            union = F.size("toks") + F.size("toks_c") - shared
            served = (
                cand.join(c_bands, ["band_idx", "band_val"])
                .join(c_toks, "dup_of")
                .withColumn("jaccard", shared.cast("double") / union)
                .filter(F.col("jaccard") >= idx.threshold)
                .select("doc_id", "dup_of", "jaccard")
                .dropDuplicates(["doc_id", "dup_of"])
            )
            out = run_to_memory(served, output_mode="append")
            n = out.count()
            samples.append(round(time.perf_counter() - t0, 3))
        st17[f"x{f}"] = {"serve_sec_min2": min(samples), "samples": samples, "rows": n}
        print(f"st17 serve x{f}: min2={min(samples)}s rows={n}")
    st17["serve_ratio_x10_over_x1"] = round(
        st17["x10"]["serve_sec_min2"] / st17["x1"]["serve_sec_min2"], 2
    )
    report["st17_serve"] = st17

    with open(os.path.join(ROOT, "INGEST_PROBE_r9.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "factors"}))


if __name__ == "__main__":
    main()
