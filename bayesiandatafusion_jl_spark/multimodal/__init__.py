"""Multimodal binary-column surface (north star).

Image/audio/video are opaque ``binary`` columns + typed metadata. The
UNCOMPRESSED formats decode for REAL (multimodal/codecs.py: RIFF/WAVE
PCM16 and 24-bit BI_RGB BMP — pure numpy+struct header parsing,
byte-exact round-trips, closed-form-verified features, malformed-input
rejection); only the compressed codecs (JPEG/MP3/H.264) remain stubbed
(codec libs absent in this container). The Spark plumbing — schema,
batching, mapInPandas signatures — is real and tested throughout.
"""

from bayesiandatafusion_jl_spark.multimodal import (  # noqa: F401
    codecs,
    ingest,
    queries,
)
