"""Round-10 (VERDICT r9 directive #3, final Done bit): a ≥150× curve
point for the span-Bloom family showing the FP-degradation warning path
is no longer exercised now that the 2^26 literal cap is lifted.

Through r9 the bitmap rode the plan as ONE split-string literal, so
`bloom_auto_m_bits` clamped at 2^26 bits — and the 100× corpus landed
EXACTLY at the cap (47% fill); any larger corpus warned and ran with an
elevated FP rate. r10 ships the bitmap as a broadcast one-row array
r10 first tried a broadcast one-row array past 2^17 words; this probe
measured that arm at 570 s (per-row bitmap inlining at the interpreted-
HOF boundary) and the design reverted to the plan literal at EVERY size,
cap now 2^28.

This probe runs the BATCH kernel of st18 (span_bloom_fit →
bloom_span_remove — the streaming query's exact model + projection,
minus the availableNow drain machinery, per the st16/st18 oracle
convention) at x1 / x150 and records per point:
  - the cross-doc gram count and the auto-chosen m_bits;
  - whether the saturation warning fired (the thing directive #3 says
    must NOT happen anymore at 150×);
  - which attach path the bitmap rode (literal vs broadcast);
  - checksum-forced wall time.
"""

from __future__ import annotations

import json
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import scale_probe
from tools.run_r9_ingest_probe import _existing_probe_root

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
K_GRAM, K_HASHES = 20, 3  # st16/st18's registered model shape


def main() -> None:
    from medvedi_spark.operators import llm
    from medvedi_spark.operators._persist import release_persisted
    from medvedi_spark.session import get_spark

    spark = get_spark("bloom-150x")
    spark.sparkContext.setLogLevel("ERROR")
    root = _existing_probe_root()
    dirs = {
        1: scale_probe.gen_corpus(os.path.join(root, "x1"), scale_probe.BASE_DOCS, scale_probe.BASE_VECS),
        150: scale_probe.gen_corpus(
            os.path.join(root, "x150"), scale_probe.BASE_DOCS * 150, scale_probe.BASE_VECS
        ),
    }

    report: dict = {
        "action": "checksum_full_eval",
        "kernel": "span_bloom_fit + bloom_span_remove (st18's batch kernel)",
        "caps": {
            "m_cap_bits": llm._BLOOM_M_CAP,
        },
        "sizes": {},
    }
    for f, d in dirs.items():
        # probe corpora are single-row-group parquet — without an
        # explicit fan-out the whole explode/agg pipeline up to the
        # first shuffle runs in ONE task (the established probe-harness
        # discipline: repartition both sizes identically)
        docs = spark.read.parquet(os.path.join(d, "documents.parquet")).repartition(32)
        release_persisted()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            words, m_bits = llm.span_bloom_fit(docs, "doc_id", "text", K_GRAM, K_HASHES)
        fit_sec = round(time.perf_counter() - t0, 3)
        warned = [str(w.message) for w in caught if "bloom_auto_m_bits" in str(w.message)]
        t0 = time.perf_counter()
        scale_probe._force_eval(
            llm.bloom_span_remove(docs, "doc_id", "text", words, m_bits, K_GRAM, K_HASHES)
        )
        op_sec = round(time.perf_counter() - t0, 3)
        set_words = sum(1 for w in words if w)
        report["sizes"][f"x{f}"] = {
            "m_bits": m_bits,
            "m_words": len(words),
            "attach_path": "literal",
            "cap_warning_fired": bool(warned),
            "warnings": warned,
            "nonzero_word_frac": round(set_words / max(len(words), 1), 4),
            "fit_sec": fit_sec,
            "remove_sec": op_sec,
        }
        print(f"x{f}: {json.dumps(report['sizes'][f'x{f}'])}", flush=True)
        release_persisted()

    out = os.path.join(ROOT, "BLOOM150_r10.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
