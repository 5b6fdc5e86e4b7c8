"""Round-9 probe driver (one-shot, VERDICT r8 directive #4): interleaved
A/B of the BLOCKED Bloom bitmap layout vs the r8 sliced layout for the
bloom family's hot kernels, at 10x and 100x, plus fresh 100x curve
points for st16/d14/st14 under the new layout (merged into
SCALE_PROBE_100x.json as the r9 addendum).

The A arm (r8's sliced scheme: k independent 60-bit digest slices, k
DRAM-random element_at fetches per key) is reproduced here VERBATIM
from commit 412f658's operators/llm.py so both arms run interleaved in
ONE session — the package itself only ships the blocked scheme. The B
arm is the shipped code. Arms alternate per repetition; min-of-2 per
arm is recorded (JIT warms interpreted expression paths across reps —
BASELINE.md r8 timing discipline).

Every measurement is action-tagged `checksum_full_eval`. Run on an
otherwise idle machine — wall times go into the record.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tools import scale_probe

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

K_GRAM, K_HASH = 20, 3  # st16's constants
D14_N = 8  # d14's word-gram width (_D9_N)


# ---------------------------------------------------------------- A arm
# r8 sliced scheme, verbatim from 412f658 (overlapping 15-hex slices at
# offsets 1/9/17; membership = k independent bitmap word fetches).


def _pos_sliced(digest: Column, i: int, m_bits: int) -> Column:
    return F.conv(F.substring(digest, 1 + 8 * i, 15), 16, 10).cast("long") % m_bits


def _member_sliced(digest: Column, bits: Column, m_bits: int, k: int) -> Column:
    cond = None
    for i in range(k):
        p = _pos_sliced(digest, i, m_bits)
        word = F.element_at(bits, (p / F.lit(64)).cast("int") + 1)
        c = F.bit_get(word, (p % 64).cast("int")) == 1
        cond = c if cond is None else cond & c
    return cond


def _sliced_span_fit(docs: DataFrame) -> tuple[list[int], int]:
    from medvedi_spark.operators import llm

    anchors = llm._span_anchors(llm._fan_out_narrow(docs), "doc_id", "text", K_GRAM)
    cross = (
        anchors.groupBy("gram")
        .agg((F.min("doc_id") != F.max("doc_id")).alias("__c__"))
        .filter(F.col("__c__"))
        .select("gram")
    )
    cross = llm._size_guarded_persist(docs, cross)
    m_bits = llm.bloom_auto_m_bits(cross.count(), K_HASH)
    digest = F.md5(F.col("gram"))
    pos = cross.select(
        F.explode(F.array(*[_pos_sliced(digest, i, m_bits) for i in range(K_HASH)])).alias("p")
    )
    return llm._collect_bitmap_words(pos, m_bits), m_bits


def _sliced_span_flag(docs: DataFrame, words: list[int], m_bits: int) -> DataFrame:
    """r8 bloom_span_flag verbatim (staged grams -> digests -> per-
    position sliced membership), minus the blocked word-prefetch stage."""
    from medvedi_spark.operators.llm import bits_array_expr

    bits = bits_array_expr(words)
    t = F.col("__t__")
    k = K_GRAM
    grams = F.when(
        F.length(t) >= k,
        F.expr(
            f"transform(sequence(1, length(__t__) - {k - 1}), i -> substring(__t__, i, {k}))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    digests = F.transform(F.col("__g__"), lambda g: F.md5(g))
    neg1 = F.lit(-1).cast("bigint")
    pos_or_neg = F.transform(
        F.col("__dg__"),
        lambda d, i: F.when(
            _member_sliced(d, bits, m_bits, K_HASH), (i + 1).cast("bigint")
        ).otherwise(neg1),
    )
    hit_positions = F.filter(F.col("__pn__"), lambda p: p > 0)
    empty_spans = F.array().cast("array<struct<s:bigint,e:bigint>>")
    neg = F.lit(-1).cast("bigint")
    folded = F.aggregate(
        F.col("__hits__"),
        F.struct(neg.alias("cs"), neg.alias("ce"), empty_spans.alias("sp")),
        lambda acc, p: F.struct(
            F.when((acc["cs"] >= 0) & (p <= acc["ce"] + 1), acc["cs"])
            .otherwise(p).alias("cs"),
            (p + F.lit(k - 1)).cast("bigint").alias("ce"),
            F.when(
                (acc["cs"] >= 0) & (p > acc["ce"] + 1),
                F.concat(
                    acc["sp"],
                    F.array(F.struct(acc["cs"].alias("s"), acc["ce"].alias("e"))),
                ),
            ).otherwise(acc["sp"]).alias("sp"),
        ),
        lambda acc: F.when(
            acc["cs"] >= 0,
            F.concat(
                acc["sp"],
                F.array(F.struct(acc["cs"].alias("s"), acc["ce"].alias("e"))),
            ),
        ).otherwise(acc["sp"]),
    )
    spans_str = F.array_join(
        F.transform(
            F.col("__sp__"),
            lambda x: F.concat_ws("-", x["s"].cast("string"), x["e"].cast("string")),
        ),
        ";",
    )
    dup_chars = F.aggregate(
        F.col("__sp__"),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + (x["e"] - x["s"] + 1),
    )
    row = F.when(
        F.size("__sp__") > 0,
        F.array(
            F.struct(
                F.size("__sp__").cast("bigint").alias("n_spans"),
                dup_chars.alias("dup_chars"),
                spans_str.alias("spans"),
            )
        ),
    ).otherwise(
        F.array().cast("array<struct<n_spans:bigint,dup_chars:bigint,spans:string>>")
    )
    return (
        docs.select(F.col("doc_id"), F.col("text").alias("__t__"))
        .select("doc_id", grams.alias("__g__"))
        .select("doc_id", digests.alias("__dg__"))
        .select("doc_id", pos_or_neg.alias("__pn__"))
        .select("doc_id", hit_positions.alias("__hits__"))
        .select("doc_id", folded.alias("__sp__"))
        .select("doc_id", F.explode(row).alias("__r__"))
        .select("doc_id", "__r__.n_spans", "__r__.dup_chars", "__r__.spans")
    )


def _sliced_gram_fit(eval_df: DataFrame) -> tuple[list[int], int]:
    """r8 bloom_fit: positions from md5(g || ':i') (the pre-sliced
    _bloom_pos scheme d14 used at fit+member time)."""
    from medvedi_spark.operators import llm
    from medvedi_spark.operators.llm import word_ngrams_of

    grams = (
        eval_df.select(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "").alias("__toks__")
        )
        .select(F.explode(F.array_distinct(word_ngrams_of(F.col("__toks__"), D14_N))).alias("g"))
        .distinct()
    )
    grams = llm._size_guarded_persist(eval_df, grams)
    m_bits = llm.bloom_auto_m_bits(grams.count(), K_HASH)

    def pos(i: int) -> Column:
        h = F.conv(F.substring(F.md5(F.concat(F.col("g"), F.lit(f":{i}"))), 1, 15), 16, 10)
        return h.cast("long") % m_bits

    p = grams.select(F.explode(F.array(*[pos(i) for i in range(K_HASH)])).alias("p"))
    return llm._collect_bitmap_words(p, m_bits), m_bits


def _sliced_gram_flag(corpus: DataFrame, words: list[int], m_bits: int) -> DataFrame:
    """r8 bloom_flag verbatim: per-gram membership inside one filter
    lambda — k md5s and k word fetches re-evaluated interpreted."""
    from medvedi_spark.operators.llm import bits_array_expr, word_ngrams_of

    bits = bits_array_expr(words)

    def member(g: Column) -> Column:
        cond = None
        for i in range(K_HASH):
            h = F.conv(F.substring(F.md5(F.concat(g, F.lit(f":{i}"))), 1, 15), 16, 10)
            p = h.cast("long") % m_bits
            word = F.element_at(bits, (p / F.lit(64)).cast("int") + 1)
            c = F.bit_get(word, (p % 64).cast("int")) == 1
            cond = c if cond is None else cond & c
        return cond

    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    hits = F.size(
        F.filter(
            F.array_distinct(word_ngrams_of(F.col("__toks__"), D14_N)),
            lambda g: member(g),
        )
    )
    return (
        corpus.select(F.col("doc_id"), toks.alias("__toks__"))
        .select("doc_id", hits.cast("long").alias("__hg__"))
        .select(
            "doc_id",
            F.explode(
                F.when(F.col("__hg__") > 0, F.array(F.col("__hg__")))
                .otherwise(F.array().cast("array<bigint>"))
            ).alias("hit_grams"),
        )
    )


# ---------------------------------------------------------------- probe


def _ab(spark, corpus_dir: str, kind: str, reps: int = 2) -> dict:
    """Interleaved A/B of one kernel family on one corpus. Fit runs once
    per arm (cached model state — the d14/st14/st16 convention: timed
    runs measure the serve kernel)."""
    from medvedi_spark.operators import llm
    from medvedi_spark.operators._persist import release_persisted

    docs = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
    # The probe corpora are single-row-group parquet files: without an
    # explicit exchange the flag kernels run as ONE task (parquet cannot
    # split inside a row group) and the A/B measures a serialized core,
    # not the kernel. Fan BOTH arms out identically — the same 32-way
    # round-robin st16's bench config applies to its micro-batches.
    docs = docs.repartition(32)
    if kind == "span":
        w_new, m_new = llm.span_bloom_fit(docs, "doc_id", "text", K_GRAM, K_HASH)
        release_persisted()
        w_old, m_old = _sliced_span_fit(docs)
        release_persisted()
        arms = {
            "blocked": lambda: llm.bloom_span_flag(docs, "doc_id", "text", w_new, m_new, K_GRAM, K_HASH),
            "sliced_r8": lambda: _sliced_span_flag(docs, w_old, m_old),
        }
    else:
        eval_df = docs.filter(F.col("doc_id") % 50 == 0)
        rest = docs.filter(F.col("doc_id") % 50 != 0)
        w_new, m_new = llm.bloom_fit(eval_df, "text", n=D14_N, m_bits=None, k_hashes=K_HASH)
        release_persisted()
        w_old, m_old = _sliced_gram_fit(eval_df)
        release_persisted()
        arms = {
            "blocked": lambda: llm.bloom_flag(rest, "doc_id", "text", w_new, m_new, n=D14_N, k_hashes=K_HASH),
            "sliced_r8": lambda: _sliced_gram_flag(rest, w_old, m_old),
        }
    out: dict = {"m_bits": {"blocked": m_new, "sliced_r8": m_old}, "sec": {}}
    times: dict[str, list[float]] = {a: [] for a in arms}
    for _ in range(reps):
        for arm, build in arms.items():
            release_persisted()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            scale_probe._force_eval(build())
            times[arm].append(round(time.perf_counter() - t0, 3))
    out["sec"] = times
    out["min"] = {a: min(v) for a, v in times.items()}
    out["speedup_blocked"] = round(out["min"]["sliced_r8"] / out["min"]["blocked"], 2)
    return out


def main() -> None:
    import tempfile

    from medvedi_spark.session import get_spark

    # Match the bench/driver st16 configuration (and r8's probe rows,
    # measured when 32 was the import-time default): the r9 production
    # default is 0, but the probe fixtures are single-row-group files.
    os.environ.setdefault("SPARK_GRAFT_STREAM_INGEST_PARTITIONS", "32")
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # reuse a prior run's generated corpora when present (gen_corpus
    # validates the manifest and regenerates on mismatch)
    import glob as _glob

    root = next(
        iter(sorted(_glob.glob(os.path.join(tempfile.gettempdir(), "medvedi_scale_probe_*")))),
        os.path.join(tempfile.gettempdir(), f"medvedi_scale_probe_{os.getpid()}"),
    )
    dirs = {
        10: scale_probe.gen_corpus(
            os.path.join(root, "x10"), scale_probe.BASE_DOCS * 10, scale_probe.BASE_VECS * 10
        ),
        100: scale_probe.gen_corpus(
            os.path.join(root, "x100"), scale_probe.BASE_DOCS * 100, scale_probe.BASE_VECS * 100
        ),
    }
    # untimed warm-up
    from medvedi_spark.queries.registry import QUERIES, _ensure_loaded

    _ensure_loaded()
    scale_probe._force_eval(QUERIES["d1_exact_dedup"].builder(spark, dirs[10]))

    ab: dict = {"action": "checksum_full_eval", "kernels": {}}
    for kind in ("span", "gram"):
        for factor, d in dirs.items():
            if kind == "gram" and factor == 100:
                continue  # d14's 100x story is st16's kernel at scale; 10x suffices
            key = f"{kind}_x{factor}"
            print(f"--- A/B {key}")
            ab["kernels"][key] = _ab(spark, d, kind)
            print(json.dumps(ab["kernels"][key]))
    with open(os.path.join(ROOT, "BLOOM_AB_r9.json"), "w") as fh:
        json.dump(ab, fh, indent=1)

    # fresh 100x curve point for st16 under the blocked kernel (merged
    # into SCALE_PROBE_100x.json, r9 addendum — comparable to the r8 row:
    # same probe harness, same corpus generator, same checksum action)
    rep = scale_probe.probe(100, 2, ("st16_stream_span_flag",), root=root)
    path = os.path.join(ROOT, "SCALE_PROBE_100x.json")
    merged = json.load(open(path))
    tagged = {
        f"{name}__r9_blocked": dict(e, action=rep.get("action", "unknown"))
        for name, e in rep["ops"].items()
    }
    merged["ops"].update(tagged)
    merged.setdefault("violations", []).extend(rep.get("violations", []))
    merged["r9_addendum"] = {
        "ops": list(tagged),
        "factor": rep["factor"],
        "action": rep.get("action"),
        "note": "st16 under the blocked bitmap layout (VERDICT r8 #4); "
        "the r8 row (sliced scheme) is retained for the cross-round "
        "curve. Interleaved same-session A/B lives in BLOOM_AB_r9.json.",
    }
    with open(path, "w") as fh:
        json.dump(merged, fh, indent=1)
    for name, e in rep["ops"].items():
        print(f"{name}: x1={e['x1']['sec']}s x100={e['x100']['sec']}s ratio={e['ratio']}")
    if rep["violations"]:
        print("VIOLATIONS:", json.dumps(rep["violations"]))


if __name__ == "__main__":
    main()
