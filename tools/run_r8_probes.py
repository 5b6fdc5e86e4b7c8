"""Round-8 probe driver (one-shot): 100× curve points for the
ExactSubstr family — d11 (post join-back routing, VERDICT r7 #6), d18
(first 100× point, r7 #5) and st16 (post kernel rebuild, r7 #5) — plus
the d11 routing A/B at the same 100× corpus (interleaved, same session).

Every measurement is action-tagged `checksum_full_eval`; the merge into
SCALE_PROBE_100x.json keeps per-entry action fields (ADVICE r7).

Run on an otherwise idle machine — wall times go into the record.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import scale_probe

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

R8_OPS = (
    "d11_duplicate_spans",
    "d18_exact_substring_removal",
    "st16_stream_span_flag",
)


def main() -> None:
    rep = scale_probe.probe(100, 2, R8_OPS)
    path = os.path.join(ROOT, "SCALE_PROBE_100x.json")
    merged = json.load(open(path))
    tagged = {
        name: dict(e, action=rep.get("action", "unknown"))
        for name, e in rep["ops"].items()
    }
    merged["ops"].update(tagged)
    merged.setdefault("violations", []).extend(rep.get("violations", []))
    if rep.get("adaptive_flips"):
        merged.setdefault("adaptive_flips", []).extend(rep["adaptive_flips"])
    merged["r8_addendum"] = {
        "ops": list(rep["ops"]),
        "factor": rep["factor"],
        "action": rep.get("action"),
        "note": "d11 post join-back routing; d18 first 100x point; st16 "
        "post kernel rebuild (fit is cached model state: the untimed "
        "facts pass pays it, timed runs measure the serve path — the "
        "d14/st14 convention).",
    }
    with open(path, "w") as fh:
        json.dump(merged, fh, indent=1)
    for name, e in rep["ops"].items():
        print(f"{name}: x1={e['x1']['sec']}s x100={e['x100']['sec']}s ratio={e['ratio']}")
    if rep["violations"]:
        print("VIOLATIONS:", json.dumps(rep["violations"]))

    # ---- d11 routing A/B at the 100x point (same session, interleaved):
    # routed (persist+count+broadcast-under-cap) vs the pre-r8 shape
    # (PERSIST_INPUT_CAP=0 disables the persist AND the broadcast route,
    # leaving the shuffled semi join — the exact previous plan).
    import tempfile

    from medvedi_spark.operators import llm
    from medvedi_spark.operators._persist import release_persisted
    from medvedi_spark.queries.registry import QUERIES
    from medvedi_spark.session import get_spark

    spark = get_spark("scale-probe")
    x100 = os.path.join(
        tempfile.gettempdir(), f"medvedi_scale_probe_{os.getpid()}", "x100"
    )
    res: dict[str, list[float]] = {"routed": [], "shuffled": []}
    orig = llm.PERSIST_INPUT_CAP
    for _ in range(2):
        for arm, cap in (("routed", orig), ("shuffled", 0)):
            llm.PERSIST_INPUT_CAP = cap
            release_persisted()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            scale_probe._force_eval(
                QUERIES["d11_duplicate_spans"].builder(spark, x100)
            )
            res[arm].append(round(time.perf_counter() - t0, 2))
    llm.PERSIST_INPUT_CAP = orig
    print("d11 routing A/B @100x (checksum action):", json.dumps(res))
    merged["r8_addendum"]["d11_routing_ab"] = res
    with open(path, "w") as fh:
        json.dump(merged, fh, indent=1)


if __name__ == "__main__":
    main()
