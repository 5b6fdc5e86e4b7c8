"""Round-9 (VERDICT r8 directive #2): recall@10 at a 10× corpus for the
loaded-index serving paths INCLUDING the new production composition
s15 = loaded IVFADC shortlist + exact rerank from the persisted
vectors/ store, beside its inline twin s7.

The r8 numbers showed the gap this closes: s12 (loaded raw ADC) serves
0.44 at 10× while inline s7 serves the 0.90 band — s15 must land in
s7's band AND return s7's identical rows (asserted, not assumed).

Re-measures the r8 pairs too so the section is one coherent snapshot;
rewrites RECALL_local.json's `loaded_at_10x` section.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import recall_report, scale_probe

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PAIRS = (  # (loaded lifecycle op, inline twin)
    ("s11_ivf_sq8_index", "s10_ivf_sq8_topk"),
    ("s12_ivfadc_index", "s6_ivfadc_topk"),
    ("s15_ivfadc_index_rerank", "s7_ivfadc_rerank"),
)
NQ = 5  # the quantized family's probe-set size (recall_report.OPS)


def main() -> None:
    import tempfile

    from medvedi_spark.queries.registry import QUERIES, _ensure_loaded
    from medvedi_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("medvedi-spark-recall-10x-r9")
    spark.sparkContext.setLogLevel("ERROR")

    root = os.path.join(tempfile.gettempdir(), f"medvedi_scale_probe_{os.getpid()}")
    x10 = scale_probe.gen_corpus(
        os.path.join(root, "x10"),
        scale_probe.BASE_DOCS * 10,
        scale_probe.BASE_VECS * 10,
    )
    exact = recall_report.exact_sets(spark, x10, "l2", NQ)
    denom = len(exact) * recall_report.K

    section: dict[str, dict] = {}
    for loaded, inline in PAIRS:
        rows = {}
        for name in (loaded, inline):
            got = QUERIES[name].builder(spark, x10).collect()
            # compare on the columns every variant shares
            rows[name] = sorted((r.query_id, r.neighbor_id) for r in got)
            hit = sum(1 for r in got if r.neighbor_id in exact.get(r.query_id, set()))
            section[name] = {
                "metric": "l2",
                "n_queries": NQ,
                "k": recall_report.K,
                "recall_at_10": round(hit / denom, 4),
                "corpus": "10x (20k vectors)",
            }
            print(f"{name:26s} recall@10={section[name]['recall_at_10']}")
        match = rows[loaded] == rows[inline]
        section[loaded]["rows_equal_inline_twin"] = match
        print(f"{loaded} rows == {inline} rows: {match}")
        if not match:
            raise SystemExit(f"{loaded} diverged from {inline} at 10x")

    path = os.path.join(ROOT, "RECALL_local.json")
    rep = json.load(open(path))
    rep["loaded_at_10x"] = section
    with open(path, "w") as fh:
        json.dump(rep, fh, indent=2)
    print(f"updated {path}")


if __name__ == "__main__":
    main()
