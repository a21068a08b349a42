"""Streaming surface (SURVEY §2.J): windowed aggregations in their batch
(oracle-checkable) form here; true Structured Streaming pipelines with
watermarks/session windows in ``streaming.pipelines`` (tested in pytest,
no SQL oracle)."""

from bayesiandatafusion_jl_spark.streaming import queries  # noqa: F401
