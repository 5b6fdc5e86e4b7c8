"""Round-11 measure-first probe: driver-side plan-CONSTRUCTION cost of
the composed-kernel call sites VERDICT r10 directive #4 names as the
residual expr-path candidates — `_sq8_code`'s literal-array transform,
the st13 per-centroid routing array, and the minhash/simhash aggregate
column builders.

Methodology = the r10 expr-path profile (guide §1.2 step 2 / §5): wall
time of pure expression/plan construction (no action executed) plus the
number of py4j `send_command` round-trips, counted by wrapping
ClientServerConnection.send_command. Round-trip counts are exact and
contention-free; walls are indicative (the construction is driver-only).

Usage: python tools/run_r11_constr_profile.py
Writes CONSTR_PROFILE_r11.json.
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
    from pyspark.sql import functions as F

    from medvedi_spark.catalog import load
    from medvedi_spark.session import get_spark

    spark = get_spark("r11-constr-profile")
    spark.sparkContext.setLogLevel("ERROR")

    # count py4j round-trips by wrapping the connection send_command
    import py4j.clientserver as cs

    counter = {"n": 0}
    orig = cs.ClientServerConnection.send_command

    def counting(self, command):
        counter["n"] += 1
        return orig(self, command)

    cs.ClientServerConnection.send_command = counting

    def measure(label, fn, results, reps=3):
        walls, trips = [], []
        for _ in range(reps):
            counter["n"] = 0
            t0 = time.perf_counter()
            fn()
            walls.append(round(time.perf_counter() - t0, 4))
            trips.append(counter["n"])
        results[label] = {"wall_s": walls, "py4j_round_trips": trips}
        print(label, results[label], flush=True)

    results: dict = {}

    # --- minhash/simhash/token_hash column construction ------------------
    from medvedi_spark.functions.hashing import (
        minhash_agg_cols,
        simhash_col,
        token_hash,
    )

    measure("minhash_agg_cols", lambda: minhash_agg_cols("h"), results)
    measure("simhash_col", lambda: simhash_col("h"), results)
    measure("token_hash", lambda: token_hash(F.col("t")), results)

    # --- sq8 encode projection (literal-array transform) -----------------
    from medvedi_spark.operators.llm import (
        _sq8_code,
        _sq8_range_literals,
        _sq8_train,
    )

    emb = load(spark, SF, "embeddings")
    stats = _sq8_train(emb, "embedding")  # one small job, untimed

    def build_sq8_proj():
        # the production call shape (llm._sq8_fit_encode / ann_index /
        # st13): str vec + value lists → expr path when the flag is on
        vmin_vals, vmax_vals = _sq8_range_literals(stats)
        e = emb.select(F.col("vec_id").alias("vec_id"), F.col("embedding").alias("embedding"))
        e.select("vec_id", _sq8_code("embedding", vmin_vals, vmax_vals).alias("codes"))

    measure("sq8_encode_projection", build_sq8_proj, results)

    # --- st13 per-centroid routing array ----------------------------------
    from medvedi_spark.operators.llm import _argmin_cell
    from medvedi_spark.queries.llm_ops import _S6_COARSE

    cents = (
        emb.filter(F.col("vec_id") < _S6_COARSE)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_emb"))
        .orderBy("cent_id")
        .collect()
    )
    results["n_centroids"] = len(cents)

    def build_routing():
        _argmin_cell("embedding", cents)

    measure("st13_routing_array", build_routing, results)

    # --- st10/st17 row-wise minhash band fold ------------------------------
    from medvedi_spark.queries.stream_ops import _st10_row_minhash_bands

    measure("st10_row_minhash_bands", lambda: _st10_row_minhash_bands("harr"), results)

    # --- full minhash band-index plan construction (d3 shape) ------------
    from medvedi_spark.operators.llm import minhash_band_index

    docs = load(spark, SF, "documents")

    def build_band_index():
        minhash_band_index(docs, "doc_id", "text")

    measure("minhash_band_index_plans", build_band_index, results)

    out = os.path.join(ROOT, "CONSTR_PROFILE_r11.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
