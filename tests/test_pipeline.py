"""Composed-pipeline unit gates (functions/pipeline.py) — the stage
semantics the DuckDB oracle alone can't pin down as INTENT: the
prefix-dedup representative must be elected among QUALITY SURVIVORS, so
a quality-failing lowest-id duplicate never erases its whole family
(r12; the oracle mirrors whatever rule the code uses, hiding the bug)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.functions.pipeline import (
    pipeline_stage_counts,
)

# 8 shared tokens = one prefix-fingerprint group
_PREFIX = "the quick brown fox jumps over a lazy"
# 32 mostly-distinct tokens with enough 'en' markers to pass quality
_BODY = (
    "dog and the sun of fast slow table key rises while morning light"
    " spreads across quiet fields where farmers tend the crops and birds"
    " sing of summer"
)


def _docs(spark):
    rows = [
        # group A: doc 1 FAILS quality (10 tokens < min 20); doc 2 passes
        (1, "srcA", _PREFIX + " dog barks"),
        (2, "srcA", _PREFIX + " " + _BODY),
        # lone doc, passes
        (3, "srcA", "every good story starts somewhere " + _BODY),
        # group B: docs 4 and 5 BOTH pass — classic dedup keeps the lower id
        (4, "srcA", "once upon a midnight dreary pondered weak weary " + _BODY),
        (5, "srcA", "once upon a midnight dreary pondered weak weary and " + _BODY),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_dedup_representative_is_a_quality_survivor(spark):
    counts = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in pipeline_stage_counts(_docs(spark)).collect()
    }
    assert counts["raw"][0] == 5
    # docs 2, 3, 4, 5 pass quality; doc 1 is too short
    assert counts["quality"][0] == 4
    # doc 2 is RESCUED (its group's lowest id, doc 1, failed quality);
    # doc 5 deduplicates against the qualifying doc 4 → 3 survivors.
    # The pre-r12 rule (min over ALL docs) would have dropped doc 2 too.
    assert counts["dedup"][0] == 3
