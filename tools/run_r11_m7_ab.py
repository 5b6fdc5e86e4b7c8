"""Round-11 interleaved A/B: m7's shared aHash table size-guarded-persisted
(the opaque mapInPandas feeds 4 lineage branches — block self-join twice,
hamming verify x and y — so the Arrow decode+aHash pass re-executed 4x per
run, guide §4.2) vs the plain recompute.

Arms share one session and alternate per rep (established discipline);
min-of-N per arm is the headline. Results -> M7_AB_r11.json.

Usage: python tools/run_r11_m7_ab.py [reps=5]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    import medvedi_spark.operators._persist as persist_mod
    from medvedi_spark.operators.llm import release_persisted
    from medvedi_spark.queries.registry import QUERIES, _ensure_loaded
    from medvedi_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("r11-m7-ab")
    spark.sparkContext.setLogLevel("ERROR")

    builder = QUERIES["m7_image_ahash_neardup"].builder
    real = persist_mod.size_guarded_persist

    out: dict = {"reps": reps, "persisted": [], "plain": []}
    # warm-up (uncounted)
    builder(spark, SF).count()
    release_persisted()
    for i in range(reps):
        for arm in ("persisted", "plain"):
            persist_mod.size_guarded_persist = (
                real if arm == "persisted" else (lambda source, df, cap=None: df)
            )
            spark.sparkContext.setJobDescription(f"m7-ab:{arm}:rep{i}")
            t0 = time.perf_counter()
            n = builder(spark, SF).count()
            out[arm].append(round(time.perf_counter() - t0, 4))
            release_persisted()
            out.setdefault("rows", n)
    persist_mod.size_guarded_persist = real
    out["min"] = {a: min(out[a]) for a in ("persisted", "plain")}
    out["median"] = {a: sorted(out[a])[reps // 2] for a in ("persisted", "plain")}
    with open(os.path.join(ROOT, "M7_AB_r11.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
