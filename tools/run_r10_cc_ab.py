"""Round-10 interleaved A/B: connected_components prologue — in-row
explode symmetrization + single eager localCheckpoint (new) vs the
pre-round-10 double-checkpoint self-union (old, reconstructed here so
both arms run in ONE session and host CPU drift cancels). Arms alternate
per rep; min-of-N per arm is the headline (established discipline).
Results -> CC_AB_r10.json.

Usage: python tools/run_r10_cc_ab.py [reps=3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES_AB = [
    "d6_dedup_clusters",
    "d16_fuzzy_dedup_corpus",
    "d17_fuzzy_dedup_ingest",
    "c11_mdf_dedup_pipeline",
]


def _old_connected_components(edges, a_col="doc_a", b_col="doc_b",
                              max_iter=25, small_graph_edges=5_000_000):
    """The pre-round-10 prologue: eager checkpoint of the edge list,
    self-union symmetrization, second eager checkpoint. Body past the
    prologue delegates to the same small/large-graph machinery by
    rebuilding it inline (copied from the r9 tree)."""
    from pyspark.sql import functions as F

    e = edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst")).localCheckpoint(eager=True)
    sym = (
        e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    return _cc_tail(sym, max_iter, small_graph_edges)


def _new_connected_components(edges, a_col="doc_a", b_col="doc_b",
                              max_iter=25, small_graph_edges=5_000_000):
    from pyspark.sql import functions as F

    src, dst = F.col(a_col), F.col(b_col)
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(src.alias("src"), dst.alias("dst")),
                    F.struct(dst.alias("src"), src.alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    return _cc_tail(sym, max_iter, small_graph_edges)


def _cc_tail(sym, max_iter, small_graph_edges):
    """Everything after symmetrization, shared verbatim by both arms
    (mirrors llm.connected_components past the prologue)."""
    from pyspark.sql import functions as F

    n_sym = sym.count()
    if n_sym <= small_graph_edges:
        node_t = sym.schema["src"].dataType.simpleString()

        def _contract(batches):
            import numpy as np
            import pandas as pd

            srcs, dsts = [], []
            for pdf in batches:
                srcs.append(pdf["src"].to_numpy())
                dsts.append(pdf["dst"].to_numpy())
            if not srcs:
                return
            src = np.concatenate(srcs)
            dst = np.concatenate(dsts)
            nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
            e_src, e_dst = inv[: len(src)], inv[len(src):]
            label = np.arange(len(nodes), dtype=np.int64)
            while True:
                new = label.copy()
                np.minimum.at(new, e_src, label[e_dst])
                new = np.minimum(new, new[new])
                if np.array_equal(new, label):
                    break
                label = new
            yield pd.DataFrame({"node": nodes, "component": nodes[label]})

        return sym.repartition(1).mapInPandas(_contract, f"node {node_t}, component {node_t}")

    labels = (
        sym.select(F.col("src").alias("node")).distinct().withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        stepped = labels.join(neighbor_min, labels.node == neighbor_min.src, "left").select(
            "node",
            F.col("component").alias("prev_component"),
            F.least(F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))).alias("component"),
        )
        lk = stepped.select(F.col("node").alias("jnode"), F.col("component").alias("jcomp"))
        new_labels = (
            stepped.join(lk, stepped.component == lk.jnode, "left")
            .select(
                "node",
                "prev_component",
                F.least(F.col("component"), F.coalesce(F.col("jcomp"), F.col("component"))).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("component") != F.col("prev_component")).count()
        labels = new_labels.select("node", "component")
        if changed == 0:
            break
    return labels


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import medvedi_spark.operators.dedup_index as dedup_index
    import medvedi_spark.operators.llm as llm
    from medvedi_spark.operators.llm import release_persisted
    from medvedi_spark.queries.registry import QUERIES, _ensure_loaded
    from medvedi_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("r10-cc-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def set_arm(fn) -> None:
        llm.connected_components = fn
        dedup_index.connected_components = fn

    out = {"sf_dir": SF, "queries": {}}
    for name in QUERIES_AB:
        q = QUERIES[name]
        # warm both arms once (parquet page cache, codebook caches)
        for fn in (_new_connected_components, _old_connected_components):
            set_arm(fn)
            q.builder(spark, SF).count()
            release_persisted(spark)
        res = {"new": [], "old": []}
        for _ in range(reps):
            for tag, fn in (("new", _new_connected_components),
                            ("old", _old_connected_components)):
                set_arm(fn)
                spark.sparkContext.setJobDescription(f"cc-ab:{name}:{tag}")
                t0 = time.perf_counter()
                q.builder(spark, SF).count()
                res[tag].append(round(time.perf_counter() - t0, 3))
                release_persisted(spark)
        res["new_min"] = min(res["new"])
        res["old_min"] = min(res["old"])
        out["queries"][name] = res
        print(name, "new", res["new_min"], "old", res["old_min"], flush=True)
    set_arm(_new_connected_components)
    with open(os.path.join(ROOT, "CC_AB_r10.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote CC_AB_r10.json")


if __name__ == "__main__":
    main()
