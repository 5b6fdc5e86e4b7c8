"""Round-11 interleaved A/B: t11 RAKE keywords as ONE windowed linear
pass (1 exchange, 0 joins — HEAD) vs the former groupBy+join-back shape
(3 exchanges, 2 broadcast joins, the scan→explode→window `content`
pipeline re-executed three times). Old arm reconstructed here so both
arms share one session (established discipline, run_r10_cc_ab.py).

Usage: python tools/run_r11_t11_ab.py [reps=5]   -> T11_AB_r11.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_t11(spark, sf_dir):
    from medvedi_spark.queries.llm_ops import load
    from medvedi_spark.queries.text_ops import _T11_STOPS, _tok

    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.posexplode(F.filter(F.split("text", " "), lambda t: t != "")).alias("pos", "w"),
    )
    is_stop = F.col("w").isin(*_T11_STOPS).cast("int")
    w_run = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    islands = words.withColumn("is_stop", is_stop).withColumn("pid", F.sum("is_stop").over(w_run))
    content = islands.filter(F.col("is_stop") == 0).select("doc_id", "pid", "pos", "w")
    plen = content.groupBy("doc_id", "pid").agg(F.count(F.lit(1)).alias("plen"))
    wstat = (
        content.join(plen, ["doc_id", "pid"])
        .groupBy("doc_id", "w")
        .agg(F.sum("plen").alias("deg"), F.count(F.lit(1)).alias("freq"))
    )
    wscore = wstat.select("doc_id", "w", F.expr("(deg * 1000000) DIV freq").alias("ws"))
    pscore = (
        content.join(wscore, ["doc_id", "w"])
        .groupBy("doc_id", "pid")
        .agg(
            F.sum("ws").alias("score_scaled"),
            F.array_join(
                F.transform(F.array_sort(F.collect_list(F.struct("pos", "w"))), lambda x: x["w"]),
                " ",
            ).alias("phrase"),
        )
    )
    w_top = Window.partitionBy("doc_id").orderBy(F.desc("score_scaled"), F.asc("phrase"))
    w_cnt = Window.partitionBy("doc_id")
    return (
        pscore.withColumn("n_phrases", F.count(F.lit(1)).over(w_cnt))
        .withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("phrase").alias("top_phrase"), "score_scaled",
                F.col("n_phrases").cast("long").alias("n_phrases"))
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    from medvedi_spark.queries.registry import QUERIES, _ensure_loaded
    from medvedi_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("r11-t11-ab")
    spark.sparkContext.setLogLevel("ERROR")
    new_builder = QUERIES["t11_rake_keywords"].builder

    # result-equality smoke first (bit-equal rows)
    a = sorted(map(tuple, new_builder(spark, SF).collect()))
    b = sorted(map(tuple, old_t11(spark, SF).collect()))
    assert a == b, "t11 windowed shape diverged from the join-back shape"

    out: dict = {"reps": reps, "windowed": [], "joinback": [], "rows": len(a)}
    for i in range(reps):
        for arm, fn in (("windowed", lambda: new_builder(spark, SF)),
                        ("joinback", lambda: old_t11(spark, SF))):
            spark.sparkContext.setJobDescription(f"t11-ab:{arm}:rep{i}")
            t0 = time.perf_counter()
            fn().count()
            out[arm].append(round(time.perf_counter() - t0, 4))
    out["min"] = {k: min(out[k]) for k in ("windowed", "joinback")}
    out["median"] = {k: sorted(out[k])[reps // 2] for k in ("windowed", "joinback")}
    with open(os.path.join(ROOT, "T11_AB_r11.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
