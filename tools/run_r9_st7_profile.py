"""Round-9 (VERDICT r8 directive #1, second half): profile
st7_stream_stream_join against the NEW streaming control anchor, so the
2.17 → 8.31 s driver-to-driver drift (zero code change) is attributed —
machinery floor vs join work — with measured components:

  A. trivial drain (the bench's stream control row): ONE source, one
     projected column, no state — the irreducible availableNow floor.
  B. two-source drain, NO join: both event filters drained unioned —
     prices the second source + doubled listing/offset machinery.
  C. st7 as registered (stream-stream interval join, watermarks,
     4 state partitions).
  D. st7 at state_partitions=1 — isolates per-partition state-store
     spin-up (a stream-stream join allocates FOUR stores per
     partition: left/right × keyToNumValues/keyWithIndex).

All at sf0.1, one session, median of 3. If C − B ≈ (D − B) ≈ small,
the drift is machinery, not the join; if C − B dominates, profile the
join kernel next. Results → ST7_PROFILE_r9.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _med3(fn) -> tuple[float, list[float]]:
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        ts.append(round(time.perf_counter() - t0, 3))
    return sorted(ts)[1], ts


def main() -> None:
    from medvedi_spark.queries.registry import QUERIES, _ensure_loaded
    from medvedi_spark.queries.stream_ops import _read_documents_stream
    from medvedi_spark.session import get_spark
    from medvedi_spark.streaming.ops import read_events_stream, run_to_memory

    _ensure_loaded()
    spark = get_spark("st7-profile")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: one drain absorbs codegen/stream-machinery spin-up
    run_to_memory(
        _read_documents_stream(spark, SF).select("doc_id"), output_mode="append"
    ).count()

    report: dict = {"sf_dir": SF, "components": {}}

    def trivial():
        run_to_memory(
            _read_documents_stream(spark, SF).select("doc_id"), output_mode="append"
        ).count()

    def two_source_nojoin():
        views = (
            read_events_stream(spark, SF)
            .filter(F.col("event_type") == "view")
            .select("user_id", F.col("ts").alias("t"))
        )
        purchases = (
            read_events_stream(spark, SF)
            .filter(F.col("event_type") == "purchase")
            .select("user_id", F.col("ts").alias("t"))
        )
        run_to_memory(views.unionByName(purchases), output_mode="append").count()

    def st7():
        QUERIES["st7_stream_stream_join"].builder(spark, SF).count()

    def st7_sp1():
        os.environ["SPARK_GRAFT_STREAM_STATE_PARTITIONS"] = "1"
        import medvedi_spark.streaming.ops as sops

        old = sops._STATE_PARTITIONS
        sops._STATE_PARTITIONS = 1
        try:
            QUERIES["st7_stream_stream_join"].builder(spark, SF).count()
        finally:
            sops._STATE_PARTITIONS = old
            os.environ.pop("SPARK_GRAFT_STREAM_STATE_PARTITIONS", None)

    for name, fn in (
        ("A_trivial_drain", trivial),
        ("B_two_source_nojoin", two_source_nojoin),
        ("C_st7_registered", st7),
        ("D_st7_state_partitions_1", st7_sp1),
    ):
        med, samples = _med3(fn)
        report["components"][name] = {"median_sec": med, "samples": samples}
        print(f"{name:26s} median={med}s samples={samples}")

    c = report["components"]
    report["join_over_two_source"] = round(
        c["C_st7_registered"]["median_sec"] - c["B_two_source_nojoin"]["median_sec"], 3
    )
    report["state_partition_cost"] = round(
        c["C_st7_registered"]["median_sec"] - c["D_st7_state_partitions_1"]["median_sec"], 3
    )
    with open(os.path.join(ROOT, "ST7_PROFILE_r9.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "components"}))


if __name__ == "__main__":
    main()
