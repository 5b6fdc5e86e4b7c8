"""Round-7 probe driver (one-shot): d2+d11 100x curve points (VERDICT r6
directive #6) merged into SCALE_PROBE_100x.json, then the t12 broadcast-
router interleaved A/B at the same 100x corpus (directive #2's recording).

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


def main() -> None:
    rep = scale_probe.probe(100, 2, ("d2_token_jaccard", "d11_duplicate_spans"))
    path = os.path.join(ROOT, "SCALE_PROBE_100x.json")
    merged = json.load(open(path))
    # Tag every merged entry with the report's timing action (ADVICE r7:
    # the earlier merge filed checksum-timed entries indistinguishably
    # next to count()-timed ones — the exact silent cross-action
    # comparison the action field exists to prevent), and merge into
    # whichever top-level shape ("ops" list vs dict) is present.
    tagged = {
        name: dict(e, action=rep.get("action", "unknown"))
        for name, e in rep["ops"].items()
    }
    if isinstance(merged.get("ops"), list):
        merged["ops"] = sorted(set(merged["ops"]) | set(tagged))
        merged.setdefault("checksum_action_ops", {}).update(tagged)
        # migrate the misnamed key from the earlier merge: its entries
        # were checksum-timed (probe ran after the action change)
        if "count_action_ops" in merged:
            for name, e in merged.pop("count_action_ops").items():
                merged["checksum_action_ops"].setdefault(
                    name, dict(e, action="checksum_full_eval")
                )
    else:
        merged["ops"].update(tagged)
    merged.setdefault("violations", []).extend(rep.get("violations", []))
    if rep.get("adaptive_flips"):
        merged.setdefault("adaptive_flips", []).extend(rep["adaptive_flips"])
    merged["r7_addendum"] = {"ops": list(rep["ops"]), "factor": rep["factor"]}
    with open(path, "w") as fh:
        json.dump(merged, fh, indent=1)
    for name, e in rep["ops"].items():
        print(f"{name}: x1={e['x1']['sec']}s x100={e['x100']['sec']}s ratio={e['ratio']}")
    if rep["violations"]:
        print("VIOLATIONS:", json.dumps(rep["violations"]))

    # ---- t12 router A/B at the 100x point (same session, interleaved) ----
    import tempfile

    from medvedi_spark.operators._persist import release_persisted
    from medvedi_spark.queries import text_ops
    from medvedi_spark.queries.registry import QUERIES
    from medvedi_spark.session import get_spark

    spark = get_spark("scale-probe")
    x100 = os.path.join(
        tempfile.gettempdir(), f"medvedi_scale_probe_{os.getpid()}", "x100"
    )
    res: dict[str, list[float]] = {"hint": [], "nohint": []}
    for _ in range(2):
        for arm, cap in (("hint", 1 << 60), ("nohint", 0)):
            text_ops._T12_BC_CAP = cap
            release_persisted()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            QUERIES["t12_bigram_surprisal"].builder(spark, x100).count()
            res[arm].append(round(time.perf_counter() - t0, 2))
    print("t12 A/B @100x:", json.dumps(res))


if __name__ == "__main__":
    main()
