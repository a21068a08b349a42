"""Source/sink connectors (SURVEY §2.A)."""

from bayesiandatafusion_jl_spark.sources.io import (  # noqa: F401
    read_coo,
    read_csv,
    read_json,
    read_parquet,
    write_parquet,
)
