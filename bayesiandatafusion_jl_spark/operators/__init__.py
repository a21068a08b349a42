"""Relational operator surface (SURVEY.md §2.A–§2.G).

Importing this package registers every relational query in the registry.
"""

from bayesiandatafusion_jl_spark.operators import (  # noqa: F401
    aggregates,
    bloom,
    checks,
    filters,
    joins,
    maintenance,
    matview,
    sampling,
    scans,
    setops,
    sorts,
    temporal,
    windows,
)
