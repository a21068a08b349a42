"""MLlib LSH interop (the north star's "MLlib + custom UDFs" approach).

The custom signature paths (dedup.py, vector.py) remain the engine
defaults — they stay in DataFrame built-ins (xxhash64/explode/agg), which
keeps the whole pipeline in whole-stage codegen and DuckDB-checkable
shapes. These variants run the SAME semantics through ``pyspark.ml``'s
LSH estimators (MinHashLSH, BucketedRandomProjectionLSH) for deployments
standardized on MLlib pipelines:

- MinHashLSH: shingle set → HashingTF sparse binary vector → banded
  signature join. ``approxSimilarityJoin(.., threshold)`` prunes on
  Jaccard *distance* (1 − Jaccard).
- BucketedRandomProjectionLSH: euclidean ANN. The testdata embeddings are
  L2-normalized (FIXTURES.md), so euclidean distance is monotone in
  cosine (d² = 2 − 2·cos) and the top-k sets agree with the cosine paths.

VectorUDT is confined to this module — everywhere else vectors stay
``array<float>`` for Arrow speed and DuckDB parity (SURVEY §7 hard parts).
Both queries are rows-only driver checks (hash seeds and bucketing are
engine-specific); recall against the exact baselines is asserted in
tests/test_oracle_parity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.registry import register


def _shingle_arrays(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingles: array<string>) — distinct word k-grams per doc.
    Sub-k-token docs are dropped (zero shingles), matching dedup.shingles."""
    toks = docs.withColumn("toks", F.split(F.lower("text"), r"\s+")).filter(
        F.size("toks") >= k
    )
    return toks.select(
        "doc_id",
        F.array_distinct(
            F.expr(
                f"transform(sequence(0, greatest(size(toks) - {k}, 0)),"
                f" i -> concat_ws(' ', slice(toks, i + 1, {k})))"
            )
        ).alias("shingles"),
    )


@register("q_llm_near_dedup_mllib", oracle=None, tags=("J2", "lsh", "mllib"), demoted=True)
def q_llm_near_dedup_mllib(
    spark: SparkSession, sf_dir: str, corpus: DataFrame | None = None
) -> DataFrame:
    """J2 via MLlib MinHashLSH — same twin-recovery task as
    q_llm_near_dedup_lsh (each doc_id % 7 == 0 gets a first-token-dropped
    twin), candidates from ``approxSimilarityJoin`` at Jaccard distance
    ≤ 0.5, i.e. Jaccard ≥ 0.5.

    Scale shape: HashingTF and the signature computation are per-row map
    work; the join shuffles on (band, bucket) exactly like the custom
    path — candidate volume, not corpus size squared.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from bayesiandatafusion_jl_spark.functions.dedup import _twin_corpus

    if corpus is None:
        corpus = _twin_corpus(spark, sf_dir)
    corpus = _shingle_arrays(corpus).filter(F.size("shingles") > 0)
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True
    )
    feat = tf.transform(corpus)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=7)
    model = lsh.fit(feat)
    pairs = model.approxSimilarityJoin(feat, feat, 0.5, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(1.0 - F.col("jaccard_dist"), 4).alias("jaccard"),
        )
    )


@register("q_llm_knn_brp_mllib", oracle=None, tags=("J3", "ann", "mllib"), demoted=True)
def q_llm_knn_brp_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 via MLlib BucketedRandomProjectionLSH — euclidean ANN for the
    same 10 query vectors as q_llm_knn; top-5 per query by distance with
    deterministic (distance, nb_id) tiebreak.

    On normalized embeddings euclidean order ≡ descending-cosine order, so
    recall is measured directly against the brute-force cosine baseline.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("v")
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="v", outputCol="hashes", bucketLength=2.0, numHashTables=4, seed=7
    )
    model = lsh.fit(emb)
    joined = model.approxSimilarityJoin(
        emb, q.withColumnRenamed("qv", "v"), 2.0, distCol="dist"
    )
    pairs = joined.filter(F.col("datasetA.vec_id") != F.col("datasetB.qid")).select(
        F.col("datasetB.qid").alias("qid"),
        F.col("datasetA.vec_id").alias("nb_id"),
        F.round("dist", 4).alias("dist"),
    )
    w = W.partitionBy("qid").orderBy(F.asc("dist"), F.asc("nb_id"))
    return pairs.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)
