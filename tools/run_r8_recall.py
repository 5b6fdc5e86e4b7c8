"""Round-8 stretch (VERDICT r7 #8): recall@10 for the LOADED-index
serving paths (s11 = IVF+SQ8 lifecycle, s12 = IVFADC lifecycle) at a
10× corpus (20k vectors) — a size where nprobe's partition pruning is
real — alongside their inline twins (s10, s6), in ONE session.

Proves two things the inline RECALL_local.json rows cannot:
(a) recall survives the save/load split (the served result is not just
    bit-identical at sf0.01 by unit test, but measured at a pruning
    scale), and
(b) the loaded path returns the IDENTICAL rows to its inline twin at
    10× (asserted, not assumed).

Appends a `loaded_at_10x` section to RECALL_local.json.
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
)
NQ = 5  # the quantized family's probe-set size (recall_report.OPS)


def main() -> None:
    import tempfile

    from medvedi_spark.queries.registry import QUERIES, _ensure_loaded
    from medvedi_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("medvedi-spark-recall-10x")
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
            # compare on the columns both twins share (s6 emits only
            # (query_id, neighbor_id); s10/s11 add rank/d2)
            rows[name] = sorted((r.query_id, r.neighbor_id) for r in got)
            hit = sum(1 for r in got if r.neighbor_id in exact.get(r.query_id, set()))
            section[name] = {
                "metric": "l2",
                "n_queries": NQ,
                "k": recall_report.K,
                "recall_at_10": round(hit / denom, 4),
                "corpus": "10x (20k vectors)",
            }
            print(f"{name:24s} recall@10={section[name]['recall_at_10']}")
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
