"""Vector functions & similarity search (SURVEY §2 H4, J3, J4).

The dot product u·v is the reference's prediction kernel [paper:BPMF]; the
kNN/centroid queries are the north-star similarity-search surface over the
``embeddings`` table (dim=64, L2-normalized → dot ≡ cosine).

Scale design:
- brute-force top-k is the *correctness baseline*: |Q|×|N| dot products via
  a broadcast of the query side — embarrassingly parallel, no shuffle of
  the corpus;
- the scale path is LSH/IVF bucketing (see ``ann_ivf_topk``): corpus is
  partitioned by coarse centroid id, queries probe only their closest
  buckets — turns O(|Q|·|N|) into O(|Q|·|N|/√buckets) with a bounded
  recall loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.functions.exprs import dot, sql_dot
from bayesiandatafusion_jl_spark.registry import register


@register(
    "q_fn_array_dot",
    oracle=f"""
    SELECT vec_id, label,
           len(embedding) AS dim,
           ROUND({sql_dot('embedding', 'embedding')}, 4) AS self_dot,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS e1
    FROM embeddings
    """,
    tags=("H4",),
)
def q_fn_array_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 — array ops + dot product (the u·v prediction kernel
    [paper:BPMF]) as a pure codegen'd fold — no UDF."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(dot("embedding", "embedding"), 4).alias("self_dot"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("e1"),
    )


@register(
    "q_llm_knn",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
    pairs AS (
      SELECT q.qid, e.vec_id AS nb_id,
             ROUND({sql_dot('q.qe', 'e.embedding')}, 4) AS score
      FROM q JOIN embeddings e ON e.vec_id <> q.qid
    ),
    ranked AS (
      SELECT qid, nb_id, score,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, nb_id ASC) AS rk
      FROM pairs
    )
    SELECT qid, nb_id, score, rk FROM ranked WHERE rk <= 5
    """,
    tags=("J3",),
)
def q_llm_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — brute-force cosine top-k: 10 query vectors vs the corpus.

    Query side is broadcast (tiny); each corpus partition computes its dot
    products independently; row_number keeps top-5 with (rounded score,
    nb_id) tiebreak so selection is deterministic cross-engine. At 100 TB
    swap the corpus side to the IVF path below.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    pairs = emb.join(F.broadcast(q), F.col("vec_id") != F.col("qid")).select(
        "qid",
        F.col("vec_id").alias("nb_id"),
        F.round(dot("qe", "embedding"), 4).alias("score"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("score"), F.asc("nb_id"))
    return pairs.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)


@register(
    "q_llm_centroid",
    oracle="""
    SELECT label, pos,
           ROUND(SUM(CAST(v AS DOUBLE)) / COUNT(*), 6) AS c
    FROM (
      SELECT label, UNNEST(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ) t
    GROUP BY label, pos
    """,
    tags=("J4",),
)
def q_llm_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — per-label embedding centroid (element-wise mean, the D9 moment
    pattern). Output long-form (label, pos, c) for SQL parity; the array
    form is one ``array_agg(pos order)`` away."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select("label", F.posexplode("embedding").alias("pos0", "v")).select(
        "label", (F.col("pos0") + 1).alias("pos"), F.col("v").cast("double").alias("v")
    )
    return exploded.groupBy("label", "pos").agg(
        F.round(F.sum("v") / F.count(F.lit(1)), 6).alias("c")
    )


def ann_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style approximate nearest neighbor (the 100 TB scale path).

    1. Coarse quantizer: pick ``n_cells`` deterministic seed vectors (lowest
       vec_ids — at scale: k-means centroids refreshed offline).
    2. Assign every corpus vector to its nearest cell (broadcast join,
       argmax over n_cells dots — map-side only).
    3. Queries probe their ``n_probe`` closest cells; candidate set is the
       union of those cells' postings (join on cell_id — co-partitioned).
    4. Exact top-k re-rank inside candidates.

    Not SQL-oracle'd (approximation is engine-specific); recall vs the
    brute-force baseline is asserted in tests/test_vector.py.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cells = emb.orderBy("vec_id").limit(n_cells).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("ce")
    )
    # assign: nearest cell per corpus vector
    scored = emb.crossJoin(F.broadcast(cells)).select(
        "vec_id", "embedding", "cell_id", dot("embedding", "ce").alias("cd")
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("cd"), F.asc("cell_id"))
    assigned = (
        scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
        .select("vec_id", "embedding", "cell_id")
    )
    # queries probe n_probe cells
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    qcells = (
        q.crossJoin(F.broadcast(cells))
        .select("qid", "qe", "cell_id", dot("qe", "ce").alias("cd"))
        .withColumn("rk", F.row_number().over(W.partitionBy("qid").orderBy(F.desc("cd"), F.asc("cell_id"))))
        .filter(F.col("rk") <= n_probe)
        .select("qid", "qe", "cell_id")
    )
    cand = qcells.join(assigned, "cell_id").filter(F.col("vec_id") != F.col("qid"))
    rescored = cand.select(
        "qid", F.col("vec_id").alias("nb_id"), F.round(dot("qe", "embedding"), 4).alias("score")
    )
    wq = W.partitionBy("qid").orderBy(F.desc("score"), F.asc("nb_id"))
    return rescored.withColumn("rk", F.row_number().over(wq)).filter(F.col("rk") <= k)


@register("q_llm_knn_ivf", oracle=None, tags=("J3", "ann"), demoted=True)
def q_llm_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 (scale path) — IVF-bucketed ANN top-k; rows-only driver check,
    recall asserted against brute force in tests."""
    return ann_ivf_topk(spark, sf_dir)
