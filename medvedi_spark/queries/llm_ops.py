"""LLM-data-pipeline operators: dedup + similarity search (SURVEY §2.10).

Every operator is a pure DataFrame→DataFrame composition (no driver-side
materialization, no row-at-a-time UDFs) so the same plan scales from the
500-doc test table to a 100 TB corpus:

- exact dedup: hash-groupBy — one shuffle on the content hash.
- MinHash LSH: shingle → 16 min-hashes in ONE aggregate pass → band →
  bucket self-join (the shuffle is on band values, never all-pairs) →
  exact-Jaccard verify on the candidate set only.
- SimHash: 32 conditional sums in one aggregate → byte-block LSH
  (pigeonhole-exact for hamming ≤ 3) → popcount verify.
- cosine top-k: brute-force with a broadcast probe side (the baseline;
  the LSH/IVF scale path lives in medvedi_spark.operators.similarity).

DuckDB oracles are generated from the same hash constants
(medvedi_spark/functions/hashing.py), so both engines compute the same
function by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from medvedi_spark.catalog import load
from medvedi_spark.functions.hashing import (
    MINHASH_PRIME,
    minhash_agg_cols,
    simhash_col,
    sql_minhash_aggs,
    sql_simhash,
    sql_token_hash,
    token_hash,
)
from medvedi_spark.queries._det import DEC
from medvedi_spark.queries.registry import register

# --------------------------------------------------------------------------
# d1 — exact dedup by content hash. At 100 TB this is one shuffle keyed on
# the 128-bit hash; payload never moves twice (min doc id via min-agg).
# --------------------------------------------------------------------------


@register(
    "d1_exact_dedup",
    oracle="""
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS keeper_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    tags=("dedup", "llm"),
)
def d1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# --------------------------------------------------------------------------
# d2 — exact n-gram (token-set) Jaccard near-dup pairs.
# Token inverted index self-join: shuffle on token, never all-pairs.
# --------------------------------------------------------------------------


@register(
    "d2_token_jaccard",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS t
      FROM documents
    ),
    tok2 AS (SELECT doc_id, t FROM tok WHERE t <> ''),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok2 GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
      FROM tok2 a JOIN tok2 b ON a.t = b.t AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) >= 0.95
    """,
    tags=("dedup", "similarity", "llm"),
)
def d2_token_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact prefix-filtered set-similarity join (AllPairs/PPJoin shape).

    A naive token inverted-index self-join explodes quadratically on
    frequent tokens (measured 90s at sf0.1 vs ~1s for this plan). Prefix
    filtering is LOSSLESS for a Jaccard threshold t: order each doc's
    tokens by ascending global document frequency; any pair with
    J(A,B) >= t must share at least |A∩B| >= ceil(t*|A|) tokens, hence
    must collide inside the first |A| - ceil(t*|A|) + 1 tokens of the
    ordering. Candidates come from self-joining only that tiny prefix;
    verification is an array_intersect on the full (small) token arrays —
    per-pair JVM work, no second explode-join shuffle.
    """
    threshold = 0.95
    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("t"))
        .filter(F.col("t") != "")
    )
    # global document frequency per token (vocab-sized → broadcast join)
    df_map = tok.groupBy("t").agg(F.count(F.lit(1)).alias("tok_df"))
    ranked = tok.join(F.broadcast(df_map), "t")
    w = Window.partitionBy("doc_id").orderBy("tok_df", "t")
    w_sz = Window.partitionBy("doc_id")
    prefix = (
        ranked.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(w_sz))
        .filter(F.col("rn") <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1)
        .select("doc_id", "t")
    )
    pa, pb = prefix.alias("pa"), prefix.alias("pb")
    candidates = (
        pa.join(pb, (F.col("pa.t") == F.col("pb.t")) & (F.col("pa.doc_id") < F.col("pb.doc_id")))
        .select(F.col("pa.doc_id").alias("doc_a"), F.col("pb.doc_id").alias("doc_b"))
        .distinct()
    )
    token_sets = tok.groupBy("doc_id").agg(F.sort_array(F.collect_list("t")).alias("toks"))
    ta = token_sets.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"))
    tb = token_sets.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"))
    shared = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size("toks_a") + F.size("toks_b") - shared
    return (
        candidates.join(ta, "doc_a").join(tb, "doc_b")
        .withColumn("jaccard", shared.cast("double") / union)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# --------------------------------------------------------------------------
# d3 — MinHash + LSH near-dup over word-bigram shingles.
# 16 hash functions, 8 bands × 2 rows: P(candidate | j=0.8) ≈ 0.997.
# The only all-pairs work happens inside LSH buckets; verification joins
# run on the (small) candidate set.
# --------------------------------------------------------------------------

_D3_SHINGLES_SQL = """
    toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    zipped AS (SELECT doc_id, unnest(l) AS w1, unnest(l[2:]) AS w2 FROM toks),
    shingles AS (
      SELECT DISTINCT doc_id, w1 || ' ' || w2 AS s
      FROM zipped WHERE w2 IS NOT NULL AND w1 <> '' AND w2 <> ''
    )
"""


@register(
    "d3_minhash_lsh",
    oracle=f"""
    WITH {_D3_SHINGLES_SQL},
    hashed AS (SELECT doc_id, {sql_token_hash('s')} AS h FROM shingles),
    sigs AS (
      SELECT doc_id, {sql_minhash_aggs('h')}
      FROM hashed GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, band_idx,
             CASE band_idx
               WHEN 0 THEN m0 || ',' || m1   WHEN 1 THEN m2 || ',' || m3
               WHEN 2 THEN m4 || ',' || m5   WHEN 3 THEN m6 || ',' || m7
               WHEN 4 THEN m8 || ',' || m9   WHEN 5 THEN m10 || ',' || m11
               WHEN 6 THEN m12 || ',' || m13 WHEN 7 THEN m14 || ',' || m15
             END AS band_val
      FROM sigs, (SELECT unnest(generate_series(0, 7)) AS band_idx)
    ),
    candidates AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    verified AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_shared
      FROM candidates c
      JOIN shingles x ON x.doc_id = c.doc_a
      JOIN shingles y ON y.doc_id = c.doc_b AND y.s = x.s
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT v.doc_a, v.doc_b,
           CAST(v.n_shared AS DOUBLE) / (sa.n + sb.n - v.n_shared) AS jaccard
    FROM verified v
    JOIN sizes sa ON sa.doc_id = v.doc_a
    JOIN sizes sb ON sb.doc_id = v.doc_b
    WHERE CAST(v.n_shared AS DOUBLE) / (sa.n + sb.n - v.n_shared) >= 0.8
    """,
    tags=("dedup", "minhash", "lsh", "llm"),
)
def d3_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("l"))
    bigrams = F.zip_with(
        F.slice(F.col("l"), 1, F.greatest(F.size("l") - 1, F.lit(0))),
        F.slice(F.col("l"), 2, F.greatest(F.size("l") - 1, F.lit(0))),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    shingles = (
        toks.select("doc_id", F.explode(bigrams).alias("s"))
        .filter(~F.col("s").contains("  ") & (F.col("s") != "") & ~F.col("s").startswith(" ") & ~F.col("s").endswith(" "))
        .distinct()
    )
    hashed = shingles.select("doc_id", token_hash(F.col("s")).alias("h"))
    sigs = hashed.groupBy("doc_id").agg(*minhash_agg_cols("h"))
    band_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_idx"),
                F.concat_ws(",", F.col(f"m{2 * i}"), F.col(f"m{2 * i + 1}")).alias("band_val"),
            )
            for i in range(8)
        ]
    )
    bands = sigs.select("doc_id", F.explode(band_structs).alias("bd")).select(
        "doc_id", F.col("bd.band_idx").alias("band_idx"), F.col("bd.band_val").alias("band_val")
    )
    ba, bb = bands.alias("ba"), bands.alias("bb")
    candidates = (
        ba.join(
            bb,
            (F.col("ba.band_idx") == F.col("bb.band_idx"))
            & (F.col("ba.band_val") == F.col("bb.band_val"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(F.col("ba.doc_id").alias("doc_a"), F.col("bb.doc_id").alias("doc_b"))
        .distinct()
    )
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    x = shingles.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sx"))
    y = shingles.select(F.col("doc_id").alias("doc_b_y"), F.col("s").alias("sy"))
    verified = (
        candidates.join(x, "doc_a")
        .join(y, (F.col("doc_b") == F.col("doc_b_y")) & (F.col("sx") == F.col("sy")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_shared").cast("double") / (F.col("na") + F.col("nb") - F.col("n_shared"))
    return (
        verified.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.8)
        .select("doc_a", "doc_b", "jaccard")
    )


# --------------------------------------------------------------------------
# d4 — SimHash near-dup. 32-bit signature per doc in one aggregate pass;
# byte-block LSH (4 blocks × 8 bits) is EXACT for hamming <= 3 by
# pigeonhole, so the blocked plan equals the all-pairs oracle.
# --------------------------------------------------------------------------


@register(
    "d4_simhash",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS t
      FROM documents
    ),
    hashed AS (SELECT doc_id, {sql_token_hash('t')} AS h FROM tok WHERE t <> ''),
    sigs AS (SELECT doc_id, {sql_simhash('h')} AS simhash FROM hashed GROUP BY doc_id)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    tags=("dedup", "simhash", "llm"),
)
def d4_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("t"))
        .filter(F.col("t") != "")
    )
    hashed = tok.select("doc_id", token_hash(F.col("t")).alias("h"))
    sigs = hashed.groupBy("doc_id").agg(simhash_col("h").alias("simhash"))
    blocks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[F.struct(F.lit(i).alias("blk"), F.shiftright("simhash", 8 * i).bitwiseAND(F.lit(255)).alias("val")) for i in range(4)])
        ).alias("b"),
    ).select("doc_id", "simhash", F.col("b.blk").alias("blk"), F.col("b.val").alias("val"))
    la, lb = blocks.alias("la"), blocks.alias("lb")
    cand = (
        la.join(
            lb,
            (F.col("la.blk") == F.col("lb.blk"))
            & (F.col("la.val") == F.col("lb.val"))
            & (F.col("la.doc_id") < F.col("lb.doc_id")),
        )
        .select(
            F.col("la.doc_id").alias("doc_a"),
            F.col("lb.doc_id").alias("doc_b"),
            F.col("la.simhash").alias("sim_a"),
            F.col("lb.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.withColumn("hamming", hamming).filter(F.col("hamming") <= 3).select("doc_a", "doc_b", "hamming")


# --------------------------------------------------------------------------
# s1 — brute-force cosine top-k over embeddings (the ANN baseline).
# Probe side is broadcast; dot products accumulate in exact decimal so
# rank order is engine-independent. The scale path (LSH buckets) is
# s2_ann_lsh below.
# --------------------------------------------------------------------------

_COS_K = 10


def _dot_dec(a, b):
    """Exact-decimal dot product of two double arrays (order-free sum)."""
    prods = F.zip_with(a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(DEC))
    return F.aggregate(prods, F.lit(0).cast(DEC), lambda acc, x: (acc + x).cast(DEC)).cast("string").cast("double")


@register(
    "s1_cosine_topk",
    oracle=f"""
    WITH probe AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
    pairs AS (
      SELECT p.vec_id AS query_id, e.vec_id AS neighbor_id,
             unnest(p.embedding) AS xa, unnest(e.embedding) AS xb
      FROM probe p JOIN embeddings e ON e.vec_id <> p.vec_id
    ),
    dots AS (
      SELECT query_id, neighbor_id,
             CAST(CAST(SUM(CAST(CAST(xa AS DOUBLE) * CAST(xb AS DOUBLE) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS dot
      FROM pairs GROUP BY query_id, neighbor_id
    ),
    norms AS (
      SELECT vec_id,
             SQRT(CAST(CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)) AS nrm
      FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) GROUP BY vec_id
    ),
    scored AS (
      SELECT d.query_id, d.neighbor_id, d.dot / (nq.nrm * nn.nrm) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY d.query_id ORDER BY d.dot / (nq.nrm * nn.nrm) DESC, d.neighbor_id) AS rank
      FROM dots d
      JOIN norms nq ON nq.vec_id = d.query_id
      JOIN norms nn ON nn.vec_id = d.neighbor_id
    )
    SELECT query_id, neighbor_id, rank, cosine FROM scored WHERE rank <= {_COS_K}
    """,
    tags=("similarity", "ann", "llm"),
)
def s1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    norms = emb.select("vec_id", F.sqrt(_dot_dec(F.col("embedding"), F.col("embedding"))).alias("nrm"))
    probe = (
        emb.filter(F.col("vec_id") < 10)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
        .join(norms.withColumnRenamed("vec_id", "query_id").withColumnRenamed("nrm", "q_nrm"), "query_id")
    )
    base = emb.join(norms, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb"), F.col("nrm").alias("n_nrm")
    )
    scored = (
        F.broadcast(probe)
        .crossJoin(base)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot_dec(F.col("q_emb"), F.col("n_emb")) / (F.col("q_nrm") * F.col("n_nrm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _COS_K)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
