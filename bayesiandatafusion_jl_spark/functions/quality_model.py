"""Trained quality classifier for corpus filtering (MLlib interop).

The heuristic quality gates (functions/text.py: length/punct/stopword
rails, LM NLL, repetition) are rule-based. The complementary industry
pattern — the GPT-3 / CCNet-style quality CLASSIFIER — trains a linear
model on a small seed of known-good vs known-bad documents and scores
the whole corpus, keeping (or importance-sampling) the high-probability
side. This module is that op, Spark-first: features are hashed word uni-
and bigram counts (``pyspark.ml.feature.HashingTF`` — map-only, JVM-side,
no vocabulary state to ship), the model is MLlib ``LogisticRegression``
(iterative treeAggregate: per-round cost is one pass + a gradient the
size of ``n_features``, never data-sized), scoring is a map-only
transform. VectorUDT is confined to this module like mllib_lsh.py —
everything crossing its boundary is plain columns.

At 100 TB: training runs on the SEED (small by construction); scoring is
embarrassingly parallel with no shuffle at all — the exact shape a
corpus-wide quality sweep needs. Registered rows-only (L-BFGS float
reductions are partition-order sensitive in the last ulps; planted
separation and held-out AUC are pytest-gated instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.registry import register

_N_FEATURES = 4096


def _featurize(docs: DataFrame, text_col: str = "text", n_features: int = _N_FEATURES):
    """(…, features: VectorUDT) — hashed unigram+bigram term counts.
    Bigrams ride in the same hash space prefixed by a joiner the
    tokenizer can't produce, so the two gram orders never collide by
    construction (only by hashing, which is the point of HashingTF)."""
    from pyspark.ml.feature import HashingTF

    toks = docs.withColumn("__toks", F.split(F.lower(F.col(text_col)), r"\s+"))
    grams = toks.withColumn(
        "__grams",
        F.concat(
            F.col("__toks"),
            F.expr(
                "transform(sequence(1, greatest(size(__toks) - 1, 0)),"
                " i -> concat(element_at(__toks, i), '\\u0001',"
                " element_at(__toks, i + 1)))"
            ),
        ),
    )
    tf = HashingTF(
        inputCol="__grams", outputCol="features", numFeatures=n_features
    )
    return tf.transform(grams).drop("__toks", "__grams")


def train_quality_classifier(
    seed_docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n_features: int = _N_FEATURES,
    reg_param: float = 1e-3,
    max_iter: int = 50,
):
    """Fit the quality LR on a labeled seed frame (``label_col`` ∈ {0.0,
    1.0}; 1 = keep-quality). Returns the fitted MLlib model, whose
    ``coefficients`` live in the hashed gram space — reusable across any
    corpus featurized with the same ``n_features``."""
    from pyspark.ml.classification import LogisticRegression

    feats = _featurize(seed_docs, text_col, n_features)
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
        standardization=False,
    )
    return lr.fit(feats.select(F.col(label_col).cast("double").alias(label_col), "features"))


def score_quality(
    model,
    docs: DataFrame,
    text_col: str = "text",
    n_features: int = _N_FEATURES,
) -> DataFrame:
    """docs + ``p_good`` (the model's keep probability) — map-only: hash
    featurization + a dot product per row, zero shuffles, so a corpus
    sweep scales linearly with input splits."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(_featurize(docs, text_col, n_features))
    return scored.withColumn(
        "p_good", vector_to_array("probability").getItem(1).cast("double")
    ).drop("features", "rawPrediction", "probability", "prediction")


def quality_filter_trained(
    model, docs: DataFrame, threshold: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """The corpus gate: keep documents the classifier scores above
    ``threshold``. Pair with ``operators.sampling`` for Pareto-style
    importance sampling instead of a hard cut."""
    return score_quality(model, docs, text_col).filter(
        F.col("p_good") >= threshold
    )


@register(
    "q_llm_quality_model",
    oracle=None,  # L-BFGS float reductions are partition-order sensitive;
    # planted separation + held-out AUC are pytest-gated (rows-only check)
    tags=("text-quality", "mllib", "classifier"),
    demoted=True,
)
def q_llm_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed-classifier quality sweep over `documents`: the seed labels
    planted GOOD (real corpus docs) against synthesized BAD (their texts
    with every 2nd token replaced by a gibberish marker), the LR trains
    on that seed, and the whole corpus is scored map-only. Output: one
    row per score decile with its doc count and mean p_good — the
    distribution a filtering threshold is picked from."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    good = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
        "label", F.lit(1.0)
    )
    bad = good.select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.expr(
                "transform(split(lower(text), '\\\\s+'),"
                " (t, i) -> IF(i % 2 = 0, t, concat('zzq', i % 7)))"
            ),
        ).alias("text"),
        F.lit(0.0).alias("label"),
    )
    model = train_quality_classifier(good.unionByName(bad))
    scored = score_quality(model, docs)
    return (
        scored.groupBy(
            F.least(F.floor(F.col("p_good") * 10), F.lit(9))
            .cast("int")
            .alias("decile")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("p_good"), 4).alias("mean_p_good"),
        )
        .orderBy("decile")
    )
