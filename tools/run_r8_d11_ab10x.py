"""d11 routing A/B at 10× (VERDICT r7 #6 record): routed (cross
persist+count+broadcast, anchor fan-out) vs the legacy r7 shape
(PERSIST_INPUT_CAP=0 disables the persist, the broadcast route AND the
fan-out — the exact pre-r8 plan), interleaved in one session, checksum
action. The 100× legacy arm is NOT re-run here: it was measured in r7
(1464.4 s, count action — equivalent for d11, whose aggregate output a
count cannot prune) and the r8 re-attempt crashed the machine's /tmp
with shuffle spill (recorded in BASELINE.md) — the 10× A/B plus the
cross-round 100× delta is the honest affordable record.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import scale_probe


def main() -> None:
    import tempfile

    from medvedi_spark.operators import llm
    from medvedi_spark.operators._persist import release_persisted
    from medvedi_spark.queries.registry import QUERIES, _ensure_loaded
    from medvedi_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.join(tempfile.gettempdir(), f"medvedi_scale_probe_{os.getpid()}")
    x10 = scale_probe.gen_corpus(
        os.path.join(root, "x10"), scale_probe.BASE_DOCS * 10, scale_probe.BASE_VECS * 10
    )
    scale_probe._force_eval(QUERIES["d1_exact_dedup"].builder(spark, x10))  # warm-up

    res: dict[str, list[float]] = {"routed": [], "legacy": []}
    orig = llm.PERSIST_INPUT_CAP
    for _ in range(2):
        for arm, cap in (("routed", orig), ("legacy", 0)):
            llm.PERSIST_INPUT_CAP = cap
            release_persisted()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            scale_probe._force_eval(QUERIES["d11_duplicate_spans"].builder(spark, x10))
            res[arm].append(round(time.perf_counter() - t0, 2))
    llm.PERSIST_INPUT_CAP = orig
    print("d11 routing A/B @10x (checksum action):", json.dumps(res))

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_PROBE_100x.json"
    )
    merged = json.load(open(path))
    merged.setdefault("r8_addendum", {})["d11_routing_ab_10x"] = {
        "action": "checksum_full_eval",
        "routed": res["routed"],
        "legacy": res["legacy"],
        "note": "legacy = PERSIST_INPUT_CAP=0 (no cross persist/broadcast, "
        "no anchor fan-out — the pre-r8 plan). 100x legacy point: r7's "
        "recorded 1464.4 s (count action, equivalent for this aggregate "
        "output) vs r8 routed 116.8 s checksum — 12.5x.",
    }
    with open(path, "w") as fh:
        json.dump(merged, fh, indent=1)


if __name__ == "__main__":
    main()
