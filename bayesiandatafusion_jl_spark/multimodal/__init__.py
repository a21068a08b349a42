"""Multimodal binary-column surface (north star).

Image/audio/video are opaque ``binary`` columns + typed metadata; the
decode step is stubbed (codec libs absent in this container) but the Spark
plumbing — schema, batching, mapInPandas signatures — is real and tested.
"""

from bayesiandatafusion_jl_spark.multimodal import queries  # noqa: F401
